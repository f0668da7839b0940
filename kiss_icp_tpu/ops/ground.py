"""Ground-plane estimation + attitude stabilization (opt-in, beyond reference).

Point-to-point ICP constrains pitch/roll only through vertical structure; on
ground-dominated scans (rural/highway stretches — measured 3-10 % structure
points on the bench drive) the attitude is weakly observable and a
~0.005 deg/frame pitch drift accumulates into quadratic z error over long
drives (round-5 analysis: 13.6 m of z drift over 586 m with xy at 1.4 m;
the float64 reference algorithm drifts the same way — this is an algorithm
property, not an implementation defect, which is why the reference
(cpp/kiss_icp/core/Registration.cpp) has no answer to it either).

The stabilizer exploits what automotive LiDAR always sees: the ground
itself. Each frame it fits the ground plane in the BODY frame (band-limited
least squares over the lowest annulus points — one masked 3x3 solve, no
iteration) and softly rotates the estimated pose so the measured ground
normal stays aligned with the odometry frame's vertical, by a fraction
`engine.ground_align` per frame (complementary filter; translation is
untouched, so real terrain height changes pass through — only ATTITUDE is
corrected, under the assumption that the ground normal is globally vertical
up to mild slopes, which holds for every automotive dataset this framework
ships loaders for).

Everything is fixed-shape and mask-based: one nanquantile, one masked
normal-equation solve, a Rodrigues rotation — fuses into the register_frame
program with negligible cost.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def maybe_align(config, points, valid, pose):
    """The engine-facing 5d step: apply the configured stabilization (or
    nothing when engine.ground_align == 0). ONE implementation for the
    single-device step (odometry.register_frame) and the map-sharded step
    (sharded_map.frame_step_shard) — the same anti-divergence rule as
    hash_map._claim_slots."""
    lam = float(config.engine.ground_align)
    if lam <= 0.0:
        return pose
    plane = estimate_ground_plane(points, valid)
    return align_pose_to_ground(pose, plane, lam)


class GroundPlane(NamedTuple):
    normal_body: jnp.ndarray  # (3,) unit normal of the ground in body frame
    height: jnp.ndarray  # () sensor height above the plane (positive = above)
    num_points: jnp.ndarray  # () int32 — points in the fitted band
    ok: jnp.ndarray  # () bool — enough support and sane conditioning


def estimate_ground_plane(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    r_min: float = 3.0,
    r_max: float = 30.0,
    band: float = 0.3,
    quantile: float = 0.15,
    min_points: int = 200,
) -> GroundPlane:
    """Fit z = ax + by + c to the lowest band of the annulus [r_min, r_max].

    The band selection (points within `band` meters above the `quantile`
    lowest z) rejects structure/canopy without RANSAC: on a spinning LiDAR
    the ground is the lowest coherent surface in every azimuth. Degenerate
    fits (too few points, vertical-ish plane) report ok=False and callers
    skip the correction for that frame.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    r2 = x * x + y * y
    in_ring = valid & (r2 > r_min * r_min) & (r2 < r_max * r_max)

    # Quantile over a strided subsample: nanquantile lowers to a full sort,
    # and sorting the whole padded buffer would cost as much as a voxel
    # downsample (sorts are the dominant non-gather cost of the pipeline).
    # A 1/16 stride keeps thousands of ring samples — quantile jitter is
    # well inside `band` — at 1/16 the sort cost.
    z_masked = jnp.where(in_ring, z, jnp.nan)
    z_lo = jnp.nanquantile(z_masked.reshape(-1)[::16], quantile)
    sel = in_ring & (z < z_lo + band) & (z > z_lo - band)
    w = sel.astype(jnp.float32)
    n = jnp.sum(w).astype(jnp.int32)

    # Weighted normal equations for [a, b, c] — centered for conditioning.
    sw = jnp.maximum(jnp.sum(w), 1.0)
    mx = jnp.sum(w * x) / sw
    my = jnp.sum(w * y) / sw
    mz = jnp.sum(w * z) / sw
    xc, yc, zc = x - mx, y - my, z - mz
    sxx = jnp.sum(w * xc * xc)
    sxy = jnp.sum(w * xc * yc)
    syy = jnp.sum(w * yc * yc)
    sxz = jnp.sum(w * xc * zc)
    syz = jnp.sum(w * yc * zc)
    det = sxx * syy - sxy * sxy
    safe = jnp.abs(det) > 1e-6
    det_s = jnp.where(safe, det, 1.0)
    a = (syy * sxz - sxy * syz) / det_s
    b = (sxx * syz - sxy * sxz) / det_s
    c = mz - a * mx - b * my  # plane z at body origin

    normal = jnp.stack([-a, -b, jnp.ones_like(a)])
    normal = normal / jnp.linalg.norm(normal)
    # Sanity: the ground should be within ~30 deg of body-horizontal; a
    # steeper "plane" means the band latched onto structure.
    sane = normal[2] > 0.85
    height = -c * normal[2]  # signed distance from origin to the plane
    ok = (n >= min_points) & safe & sane & jnp.all(jnp.isfinite(normal))
    return GroundPlane(normal, height, n, ok)


def align_pose_to_ground(
    pose: jnp.ndarray,
    plane: GroundPlane,
    alignment: float,
    *,
    max_correction_rad: float = 0.05,
) -> jnp.ndarray:
    """Rotate `pose` about its own position so the measured body-frame
    ground normal moves toward the odometry frame's +z, by `alignment`
    (0..1) of the measured tilt. Translation is untouched (terrain height
    changes are real; only attitude drift is corrected). Per-frame
    correction is clamped to `max_correction_rad` so a bad fit can nudge
    but never yank.
    """
    n_w = pose[:3, :3] @ plane.normal_body  # measured ground normal, world
    e_z = jnp.array([0.0, 0.0, 1.0], pose.dtype)
    axis = jnp.cross(n_w, e_z)
    s = jnp.linalg.norm(axis)
    angle = jnp.arctan2(s, n_w[2])
    corr = jnp.clip(alignment * angle, 0.0, max_correction_rad)
    k = axis / jnp.maximum(s, 1e-9)

    # Rodrigues for the small correction rotation.
    kx, ky, kz = k[0], k[1], k[2]
    K = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]],
                  pose.dtype)
    ca, sa = jnp.cos(corr), jnp.sin(corr)
    R_corr = jnp.eye(3, dtype=pose.dtype) + sa * K + (1.0 - ca) * (K @ K)

    apply = plane.ok & (s > 1e-9) & jnp.all(jnp.isfinite(R_corr))
    new_r = jnp.where(apply, R_corr @ pose[:3, :3], pose[:3, :3])
    return pose.at[:3, :3].set(new_r)
