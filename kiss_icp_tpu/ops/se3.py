"""SE(3)/SO(3) Lie-group math as vectorized JAX ops.

TPU-native replacement for the reference's Sophus usage (exp/log/compose/apply;
see reference cpp/kiss_icp/core/Preprocessing.cpp:68-80, Registration.cpp:156-161,
Threshold.cpp:38-49). Everything here is batched, branch-free (jnp.where with
Taylor fallbacks instead of data-dependent branches) and works in float32 so the
whole odometry step stays inside one XLA program.

Conventions (matching Sophus so downstream parity holds):
  * twists are 6-vectors [v(3), w(3)]: translation part first, rotation second.
  * poses are (4, 4) homogeneous matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Below this angle (radians) we switch to Taylor series for the sinc-like terms.
# Safe for float32: theta^2 ~ 1e-6 keeps both branches finite and accurate.
_SMALL = 1e-3


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w, batched: (..., 3) -> (..., 3, 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _sinc_terms(theta2: jnp.ndarray):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (1-A)/t^2) batched, NaN-safe.

    These are the classic Rodrigues coefficients; C is used by the SE(3) V-matrix.
    """
    theta = jnp.sqrt(theta2)
    small = theta < _SMALL
    # Guard the denominators so the unused branch never produces NaN/Inf.
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe_t = jnp.sqrt(safe_t2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / safe_t2)
    return a, b, c


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) rotation vector -> (..., 3, 3) matrix."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_terms(theta2)
    k = hat(w)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def rotation_angle(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in [0, pi] from a rotation matrix (..., 3, 3).

    Same quantity as Eigen::AngleAxisd(R).angle() used by the adaptive threshold
    (reference Threshold.cpp:40-42). Computed as atan2(|skew(R)|, (tr-1)/2):
    the naive arccos((tr-1)/2) is catastrophically imprecise in float32 — for
    angles below ~3.5e-4 rad the cosine rounds to exactly 1.0 and the angle
    reads zero, silently deleting the threshold recurrence's rotation term
    (which multiplies by 2*max_range, so 1e-4 rad matters).
    """
    tr = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos = 0.5 * (tr - 1.0)
    sin = jnp.linalg.norm(0.5 * vee(r - jnp.swapaxes(r, -1, -2)), axis=-1)
    return jnp.arctan2(sin, cos)


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> rotation vector (..., 3), robust at 0 and pi."""
    theta = rotation_angle(r)
    theta2 = theta * theta
    a, _, _ = _sinc_terms(theta2)  # sin(theta)/theta
    skew = 0.5 * vee(r - jnp.swapaxes(r, -1, -2))  # = sin(theta) * axis
    # Generic branch: w = skew / sinc(theta). Valid away from pi.
    w_generic = skew / jnp.maximum(a, 1e-12)[..., None]
    # Near pi the skew part vanishes; recover the axis from the diagonal of
    # R = I + 2*sin^2(theta/2)*(aa^T - I) ~= 2 aa^T - I  =>  a_i^2 = (R_ii+1)/2.
    diag = jnp.stack([r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0, None))
    # Fix signs using the off-diagonal sums: (R + R^T)/2 off-diagonals = a_i a_j * k.
    # Pick the largest component positive and sign the others from products.
    largest = jnp.argmax(axis_abs, axis=-1)
    sym01 = r[..., 0, 1] + r[..., 1, 0]
    sym02 = r[..., 0, 2] + r[..., 2, 0]
    sym12 = r[..., 1, 2] + r[..., 2, 1]

    def _signed_axis(i_largest):
        s0 = jnp.where(
            i_largest == 0,
            axis_abs[..., 0],
            jnp.where(i_largest == 1, jnp.sign(sym01) * axis_abs[..., 0],
                      jnp.sign(sym02) * axis_abs[..., 0]),
        )
        s1 = jnp.where(
            i_largest == 0,
            jnp.sign(sym01) * axis_abs[..., 1],
            jnp.where(i_largest == 1, axis_abs[..., 1], jnp.sign(sym12) * axis_abs[..., 1]),
        )
        s2 = jnp.where(
            i_largest == 0,
            jnp.sign(sym02) * axis_abs[..., 2],
            jnp.where(i_largest == 1, jnp.sign(sym12) * axis_abs[..., 2], axis_abs[..., 2]),
        )
        return jnp.stack([s0, s1, s2], axis=-1)

    axis_pi = _signed_axis(largest)
    norm = jnp.linalg.norm(axis_pi, axis=-1, keepdims=True)
    axis_pi = axis_pi / jnp.maximum(norm, 1e-12)
    w_pi = theta[..., None] * axis_pi
    near_pi = theta > (jnp.pi - 1e-2)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _v_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V(w) of SE(3) exp: integrates rotation into translation."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, b, c = _sinc_terms(theta2)
    k = hat(w)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + b[..., None, None] * k + c[..., None, None] * k2


def _v_matrix_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of the left Jacobian V(w)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _SMALL
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe_t = jnp.sqrt(safe_t2)
    half = 0.5 * safe_t
    # coeff = (1 - theta/2 * cot(theta/2)) / theta^2
    cot_term = half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-12)
    coeff = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - cot_term) / safe_t2)
    k = hat(w)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye - 0.5 * k + coeff[..., None, None] * k2


def se3_exp(twist: jnp.ndarray) -> jnp.ndarray:
    """Twist (..., 6) [v, w] -> homogeneous pose (..., 4, 4). Matches Sophus exp."""
    v, w = twist[..., :3], twist[..., 3:]
    r = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", _v_matrix(w), v)
    return rt_to_matrix(r, t)


def se3_log(pose: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous pose (..., 4, 4) -> twist (..., 6) [v, w]. Matches Sophus log."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    w = so3_log(r)
    v = jnp.einsum("...ij,...j->...i", _v_matrix_inv(w), t)
    return jnp.concatenate([v, w], axis=-1)


def rt_to_matrix(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R (...,3,3), t (...,3)) -> (..., 4, 4) homogeneous matrix."""
    batch = r.shape[:-2]
    bottom = jnp.zeros(batch + (1, 4), dtype=r.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pose composition a @ b, batched."""
    return a @ b


def inverse(pose: jnp.ndarray) -> jnp.ndarray:
    """Closed-form rigid inverse (no general 4x4 inversion)."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    return rt_to_matrix(rt, -jnp.einsum("...ij,...j->...i", rt, t))


def orthonormalize(pose: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) (Gram-Schmidt).

    Sophus (the reference's SE3 type) stores rotations as quaternions and
    renormalizes on composition; raw 3x3 matrices in f32 accumulate scale
    drift MULTIPLICATIVELY across the thousands of compositions of a long
    sequence (measured: ||R^T R - I|| grows 1e-7 -> 1e-1 within ~200
    compositions, then the pose stream explodes). One per-frame projection
    keeps the drift at the single-composition level forever.
    """
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    c0 = r[..., :, 0]
    c1 = r[..., :, 1]
    eps = jnp.asarray(1e-30, pose.dtype)
    c0 = c0 / jnp.maximum(jnp.linalg.norm(c0, axis=-1, keepdims=True), eps)
    c2 = jnp.cross(c0, c1)
    c2 = c2 / jnp.maximum(jnp.linalg.norm(c2, axis=-1, keepdims=True), eps)
    c1 = jnp.cross(c2, c0)
    r_on = jnp.stack([c0, c1, c2], axis=-1)
    return rt_to_matrix(r_on, t)


def transform(pose: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (4, 4) pose to (..., 3) points.

    precision=HIGHEST is load-bearing: the TPU default would round the matmul
    through bfloat16, perturbing far-range coordinates by decimeters.
    """
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return (
        jnp.matmul(points, jnp.swapaxes(r, -1, -2), precision=jax.lax.Precision.HIGHEST)
        + t
    )


def exp_scaled_batch(twist: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """exp(scales[i] * twist) for a single twist and a batch of scalar scales.

    Used by motion deskewing (reference Preprocessing.cpp:68-80): per point pose
    exp((stamp - 1) * log(relative_motion)). Returns (N, 4, 4).
    """
    return se3_exp(scales[..., None] * twist)
