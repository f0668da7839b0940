"""Scan preprocessing: motion deskewing + range cropping, as one fused XLA op.

TPU-native equivalent of the reference Preprocessor
(cpp/kiss_icp/core/Preprocessing.cpp:40-95). The reference runs a TBB
parallel_for over points computing per-point `exp((t-1)*omega) * p` and then a
sequential compaction of in-range points; here both are batched ops over a
fixed-shape padded buffer — the "compaction" is just a validity mask update, so
no data moves and the whole step fuses with downstream voxelization.

Behavior parity notes:
  * timestamps are min/max-normalized to [0, 1] over the *valid* points
    (Preprocessing.cpp:62-67);
  * the per-point pose is `exp((stamp - 1) * log(relative_motion))`, i.e. the
    scan is unwarped toward its END (Preprocessing.cpp:75-80);
  * deskew is skipped when disabled or when the scan carries no timestamps
    (Preprocessing.cpp:59-60) — here: `has_stamps` traced flag so one compiled
    program serves both cases;
  * crop keeps strictly `min_range < |p| < max_range` (Preprocessing.cpp:87-92).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from kiss_icp_tpu.ops import se3


class Preprocessed(NamedTuple):
    points: jnp.ndarray  # (N, 3) float32 — deskewed points (padding rows garbage)
    valid: jnp.ndarray  # (N,) bool — in-range AND input-valid


def preprocess(
    points: jnp.ndarray,
    timestamps: jnp.ndarray,
    valid: jnp.ndarray,
    relative_motion: jnp.ndarray,
    *,
    max_range: float,
    min_range: float,
    deskew: bool,
) -> Preprocessed:
    """Deskew (optional) and range-crop one padded scan.

    Args:
      points: (N, 3) float32 padded scan.
      timestamps: (N,) float32 per-point stamps (any range; normalized here).
        Pass zeros when the dataset has none.
      valid: (N,) bool mask of real points.
      relative_motion: (4, 4) last pose delta (constant-velocity prediction).
      deskew: static config flag; when False the stamps are ignored entirely.
    """
    if deskew:
        # A scan "has timestamps" when the valid stamps actually vary
        # (datasets without stamps feed all-zeros; reference skips on empty).
        big = jnp.float32(jnp.finfo(jnp.float32).max)
        t_min = jnp.min(jnp.where(valid, timestamps, big))
        t_max = jnp.max(jnp.where(valid, timestamps, -big))
        span = t_max - t_min
        has_stamps = span > 0.0

        safe_span = jnp.where(has_stamps, span, 1.0)
        stamps01 = (timestamps - t_min) / safe_span
        omega = se3.se3_log(relative_motion.astype(points.dtype))
        scale = jnp.where(has_stamps, stamps01 - 1.0, 0.0)  # exp(0)=I when no stamps
        pose_per_point = se3.exp_scaled_batch(omega, scale)  # (N, 4, 4)
        r = pose_per_point[:, :3, :3]
        t = pose_per_point[:, :3, 3]
        deskewed = jnp.einsum("nij,nj->ni", r, points) + t
    else:
        deskewed = points

    rng = jnp.linalg.norm(deskewed, axis=-1)
    in_range = (rng < max_range) & (rng > min_range)
    return Preprocessed(deskewed, valid & in_range)
