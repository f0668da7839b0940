"""SE3/SO3 kernel tests against scipy/numpy float64 oracles."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation
from scipy.linalg import expm

import jax.numpy as jnp

from kiss_icp_tpu.ops import se3


def _random_rotvecs(n, scale, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n, 3)) * scale).astype(np.float32)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5, 2.0])
def test_so3_exp_matches_scipy(scale):
    w = _random_rotvecs(64, scale)
    ours = np.asarray(se3.so3_exp(jnp.asarray(w)))
    theirs = Rotation.from_rotvec(w.astype(np.float64)).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5])
def test_so3_log_roundtrip(scale):
    w = _random_rotvecs(64, scale, seed=1)
    r = Rotation.from_rotvec(w.astype(np.float64)).as_matrix().astype(np.float32)
    w_back = np.asarray(se3.so3_log(jnp.asarray(r)))
    np.testing.assert_allclose(w_back, w, atol=2e-4 * max(scale, 1e-3) + 1e-6)


def test_so3_log_large_angle_canonical():
    # For |w| > pi the log returns the canonical representative; compare the
    # reconstructed rotation matrices instead of the vectors.
    w = _random_rotvecs(64, 2.0, seed=1)
    r = Rotation.from_rotvec(w.astype(np.float64)).as_matrix().astype(np.float32)
    w_back = np.asarray(se3.so3_log(jnp.asarray(r)))
    assert np.all(np.linalg.norm(w_back, axis=-1) <= np.pi + 1e-4)
    recovered = Rotation.from_rotvec(w_back.astype(np.float64)).as_matrix()
    # Samples that land within ~1e-2 of pi hit the inherent axis-sign ambiguity.
    np.testing.assert_allclose(recovered, r, atol=2e-2)


def test_so3_log_near_pi():
    # Rotations with angle close to pi exercise the diagonal-axis branch.
    rng = np.random.default_rng(2)
    axes = rng.standard_normal((32, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = np.pi - rng.uniform(0.0, 5e-3, size=(32, 1))
    w = (axes * angles).astype(np.float64)
    r = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    w_back = np.asarray(se3.so3_log(jnp.asarray(r)))
    recovered = Rotation.from_rotvec(w_back.astype(np.float64)).as_matrix()
    # Near pi the sign of the axis is inherently ambiguous (R(w) == R(-w) at
    # exactly pi); the matrix error of the "wrong" sign is O(pi - angle).
    np.testing.assert_allclose(recovered, r, atol=2e-2)
    np.testing.assert_allclose(
        np.linalg.norm(w_back, axis=-1), angles.squeeze(-1), atol=1e-3
    )


def test_rotation_angle():
    w = _random_rotvecs(32, 1.0, seed=3)
    rot = Rotation.from_rotvec(w.astype(np.float64))
    r = rot.as_matrix().astype(np.float32)
    ours = np.asarray(se3.rotation_angle(jnp.asarray(r)))
    theirs = rot.magnitude()  # canonical angle in [0, pi]
    np.testing.assert_allclose(ours, theirs, atol=1e-3)


def _se3_exp_oracle(twist):
    """Matrix exponential of the 4x4 twist matrix (float64 oracle)."""
    v, w = twist[:3], twist[3:]
    xi = np.zeros((4, 4))
    xi[:3, :3] = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], dtype=np.float64
    )
    xi[:3, 3] = v
    return expm(xi)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5, 2.0])
def test_se3_exp_matches_expm(scale):
    rng = np.random.default_rng(4)
    twists = (rng.standard_normal((16, 6)) * scale).astype(np.float32)
    ours = np.asarray(se3.se3_exp(jnp.asarray(twists)))
    for i in range(16):
        np.testing.assert_allclose(
            ours[i], _se3_exp_oracle(twists[i].astype(np.float64)), atol=1e-5
        )


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5])
def test_se3_log_roundtrip(scale):
    rng = np.random.default_rng(5)
    twists = (rng.standard_normal((16, 6)) * scale).astype(np.float32)
    poses = se3.se3_exp(jnp.asarray(twists))
    back = np.asarray(se3.se3_log(poses))
    np.testing.assert_allclose(back, twists, atol=1e-5 + 1e-4 * scale)


def test_inverse_and_compose():
    rng = np.random.default_rng(6)
    twist = rng.standard_normal(6).astype(np.float32)
    pose = se3.se3_exp(jnp.asarray(twist))
    ident = np.asarray(se3.compose(pose, se3.inverse(pose)))
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)


def test_transform_points():
    rng = np.random.default_rng(7)
    twist = rng.standard_normal(6).astype(np.float32)
    pose = np.asarray(se3.se3_exp(jnp.asarray(twist))).astype(np.float64)
    pts = rng.standard_normal((128, 3)).astype(np.float32)
    ours = np.asarray(se3.transform(jnp.asarray(pose.astype(np.float32)), jnp.asarray(pts)))
    theirs = pts @ pose[:3, :3].T + pose[:3, 3]
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_exp_scaled_batch():
    rng = np.random.default_rng(8)
    twist = (rng.standard_normal(6) * 0.1).astype(np.float32)
    scales = np.linspace(-1.0, 0.0, 16).astype(np.float32)
    ours = np.asarray(se3.exp_scaled_batch(jnp.asarray(twist), jnp.asarray(scales)))
    for i, s in enumerate(scales):
        np.testing.assert_allclose(
            ours[i], _se3_exp_oracle(s * twist.astype(np.float64)), atol=1e-5
        )
