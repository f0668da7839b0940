"""Long-horizon f32-vs-f64 drift bound (VERDICT r2 missing #2 / weak #3).

The committed golden (tests/golden/long_horizon.npz, regenerate with
`python tests/make_goldens.py`) holds the float64 oracle trajectory and
per-frame ICP iteration counts over a 200-frame deskew-on drive. This test
runs the f32 TPU pipeline over the same frames and bounds:

  * drift GROWTH: Umeyama ATE and the KITTI segment metric
    (cpp/kiss_icp/metrics/Metrics.cpp:141-189 semantics) of the f32
    trajectory against the f64 oracle as pseudo ground truth — this is the
    long-horizon analog of the <= 0.55% KITTI target in BASELINE.md;
  * the iteration tail: the f32 while_loop must not spin materially longer
    than the oracle's f64 loop on the same frames (convergence-criterion
    wobble would show up here).

Measured envelope at the time the bounds were set (CPU backend, 2026-08-19):
ATE_trans 0.047 m, KITTI seg 0.11 %, RPE p99 0.072 m, iters p95 24 vs
oracle 24, max 42 vs 35. Bounds carry ~2-3x margin.
"""

import os

import numpy as np
import pytest

from make_goldens import LONG_HORIZON, long_horizon_scenario
from kiss_icp_tpu import metrics
from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu.odometry import KissICP

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "long_horizon.npz")


@pytest.fixture(scope="module")
def impl_run():
    g = np.load(GOLDEN)
    ds = long_horizon_scenario()
    n = LONG_HORIZON["n_scans"]

    cfg = KISSConfig()
    cfg.data.min_range = 1.0
    cfg.engine.max_points_per_frame = 16384
    cfg.engine.frame_capacity = 8192
    cfg.engine.source_capacity = 2048
    cfg.engine.map_capacity_log2 = 17
    cfg.mapping.voxel_size = 1.0

    icp = KissICP(cfg)
    k = 25
    poses, iters, drops = [], [], 0
    for c in range(n // k):
        frames, stamps = [], []
        for j in range(c * k, (c + 1) * k):
            f, t = ds[j]
            frames.append(f)
            stamps.append(t)
        poses.append(icp.register_frames_chunked(frames, stamps))
        s = icp.last_chunk_summary
        iters.append(np.asarray(s.num_iterations))
        drops += int(np.sum(np.asarray(s.num_dropped_downsample)))
        drops += int(np.sum(np.asarray(s.num_dropped_map_voxels)))
    return {
        "poses": np.concatenate(poses),
        "iters": np.concatenate(iters),
        "drops": drops,
        "oracle_poses": g["poses"],
        "oracle_iters": g["iters"],
        "gt_poses": g["gt_poses"],
    }


def test_no_capacity_drops(impl_run):
    assert impl_run["drops"] == 0


def test_drift_growth_bounded_vs_oracle(impl_run):
    """ATE of the f32 trajectory against the f64 oracle over 200 frames
    (~180 m of travel) stays at the centimeter level — f32 wobble must not
    compound."""
    ate_rot, ate_trans = metrics.absolute_trajectory_error(
        impl_run["oracle_poses"], impl_run["poses"])
    assert ate_trans < 0.15, f"ATE_trans={ate_trans:.3f} m (measured 0.047)"
    assert ate_rot < 0.02, f"ATE_rot={ate_rot:.4f} rad (measured 0.004)"

    err = np.linalg.norm(
        impl_run["poses"][:, :3, 3] - impl_run["oracle_poses"][:, :3, 3], axis=1)
    assert err.max() < 0.8, f"max abs divergence {err.max():.3f} m"


def test_kitti_segment_metric_vs_oracle(impl_run):
    """KITTI relative error (segments 100-800 m, every 10th frame) with the
    oracle as pseudo-GT: the f32-vs-f64 gap must sit far below the 0.55%
    end-to-end accuracy target, so the f32 engine cannot be what breaks the
    KITTI budget."""
    seg_t, seg_r = metrics.seq_error(impl_run["oracle_poses"],
                                     impl_run["poses"])
    assert seg_t < 0.35, f"seg trans err {seg_t:.3f}% (measured 0.11%)"
    assert seg_r < 0.01, f"seg rot err {seg_r:.5f} deg/m (measured 0.002)"


def test_relative_pose_error_per_step(impl_run):
    """Per-step deltas match the oracle's: errors stay local (flat-basin
    wobble), they do not trend."""
    poses, op = impl_run["poses"], impl_run["oracle_poses"]
    rpe = []
    for i in range(1, len(poses)):
        d_impl = np.linalg.inv(poses[i - 1]) @ poses[i]
        d_or = np.linalg.inv(op[i - 1]) @ op[i]
        rpe.append(np.linalg.norm((np.linalg.inv(d_or) @ d_impl)[:3, 3]))
    rpe = np.asarray(rpe)
    assert np.percentile(rpe, 99) < 0.15, (
        f"RPE p99 {np.percentile(rpe, 99):.3f} m (measured 0.072)")
    # No trend: the last quarter's median RPE must not exceed the first
    # quarter's by more than 3x (drift growth would show here first).
    q = len(rpe) // 4
    assert np.median(rpe[-q:]) < 3.0 * max(np.median(rpe[:q]), 0.01)


def test_iteration_tail_matches_oracle(impl_run):
    """The f32 convergence check must not spin the while_loop materially
    longer than the oracle's f64 loop (VERDICT r2 weak #3). Measured:
    identical p50/p95 (14/24), max 42 vs 35."""
    it_impl, it_or = impl_run["iters"], impl_run["oracle_iters"]
    assert np.percentile(it_impl, 50) <= 2.0 * np.percentile(it_or, 50)
    assert np.percentile(it_impl, 95) <= 2.0 * np.percentile(it_or, 95)
    assert it_impl.max() <= 3.0 * it_or.max()


def test_comparable_accuracy_vs_simulator_gt(impl_run):
    """Against the simulator's exact ground truth, the f32 pipeline ends
    within the oracle's own envelope (same algorithm, same drift class)."""
    gt = impl_run["gt_poses"]
    e_impl = np.linalg.norm(impl_run["poses"][-1, :3, 3] - gt[-1, :3, 3])
    e_or = np.linalg.norm(impl_run["oracle_poses"][-1, :3, 3] - gt[-1, :3, 3])
    assert e_impl < 1.5 * e_or + 0.5, (e_impl, e_or)
