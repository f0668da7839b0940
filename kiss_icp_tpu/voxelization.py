"""Standalone voxel-downsample convenience API (numpy in/out).

Drop-in for the reference's `kiss_icp.voxelization.voxel_down_sample`
(python/kiss_icp/voxelization.py:28-30): one point kept per voxel. The
engine's in-graph op (`ops/voxel.voxel_downsample`) is what the pipeline
uses; this wrapper exists for users calling the utility directly on numpy
clouds (dataset preprocessing, notebooks).

Semantics note (PARITY.md): the reference keeps the FIRST point std::vector
iteration happens to visit (order-dependent, VoxelUtils.cpp:11-14); this
implementation keeps the lowest-original-index point per voxel —
deterministic, and identical to the reference when the input order is the
scan order.
"""

from __future__ import annotations

import numpy as np

from kiss_icp_tpu.ops import voxel as _voxel


def voxel_down_sample(frame: np.ndarray, voxel_size: float) -> np.ndarray:
    """Keep one point per `voxel_size` cell (lowest input index wins).

    frame: (N, 3)-ish numpy array (extra columns ignored). Returns the
    compact (M, 3) float32 result. Shapes are bucketed to powers of two so
    repeated calls with similar sizes reuse one compiled program.
    """
    frame = np.asarray(frame, np.float32)
    n = frame.shape[0]
    if n == 0:
        return np.zeros((0, 3), np.float32)
    cap = 1 << max(1, int(np.ceil(np.log2(n))))
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = frame[:, :3]
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    out = _voxel.voxel_downsample(pts, valid, voxel_size=float(voxel_size),
                                  capacity=cap)
    return np.asarray(out.points)[np.asarray(out.valid)]
