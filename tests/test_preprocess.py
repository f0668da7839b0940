"""Deskew + range-crop tests against the float64 oracle."""

import numpy as np
import jax.numpy as jnp

import oracle
from kiss_icp_tpu.ops import preprocess, se3


def _scan(n=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    ts = np.sort(rng.uniform(0.0, 0.1, size=n)).astype(np.float32)
    return pts, ts


def _motion(seed=1, scale=0.1):
    rng = np.random.default_rng(seed)
    return oracle.se3_exp(rng.standard_normal(6) * scale).astype(np.float32)


def test_deskew_matches_oracle():
    pts, ts = _scan()
    motion = _motion()
    valid = np.ones(len(pts), bool)
    out = preprocess.preprocess(
        jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(valid), jnp.asarray(motion),
        max_range=1e9, min_range=0.0, deskew=True,
    )
    expected = oracle.deskew(pts.astype(np.float64), ts, motion)
    np.testing.assert_allclose(np.asarray(out.points), expected, atol=1e-4)
    assert np.all(np.asarray(out.valid))


def test_range_crop():
    pts, ts = _scan(seed=2)
    valid = np.ones(len(pts), bool)
    out = preprocess.preprocess(
        jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(valid), jnp.eye(4, dtype=jnp.float32),
        max_range=40.0, min_range=5.0, deskew=False,
    )
    expected_mask = oracle.range_crop(pts.astype(np.float64), 5.0, 40.0)
    np.testing.assert_array_equal(np.asarray(out.valid), expected_mask)
    # deskew off: points pass through untouched
    np.testing.assert_array_equal(np.asarray(out.points), pts)


def test_no_stamps_skips_deskew():
    """All-zero stamps == 'no timestamps' -> identity deskew (Preprocessing.cpp:59-60)."""
    pts, _ = _scan(seed=3)
    valid = np.ones(len(pts), bool)
    out = preprocess.preprocess(
        jnp.asarray(pts), jnp.zeros(len(pts), jnp.float32), jnp.asarray(valid),
        jnp.asarray(_motion(seed=4)),
        max_range=1e9, min_range=0.0, deskew=True,
    )
    np.testing.assert_allclose(np.asarray(out.points), pts, atol=1e-6)


def test_padding_rows_stay_invalid():
    pts, ts = _scan(seed=5)
    valid = np.ones(len(pts), bool)
    valid[100:] = False
    out = preprocess.preprocess(
        jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(valid), jnp.asarray(_motion(seed=6)),
        max_range=1e9, min_range=0.0, deskew=True,
    )
    assert not np.any(np.asarray(out.valid)[100:])


def test_stamp_normalization_invariance():
    """Stamps in any affine range give the same deskew (Preprocessing.cpp:62-67)."""
    pts, ts = _scan(seed=7)
    motion = _motion(seed=8)
    valid = jnp.ones(len(pts), bool)
    a = preprocess.preprocess(
        jnp.asarray(pts), jnp.asarray(ts), valid, jnp.asarray(motion),
        max_range=1e9, min_range=0.0, deskew=True,
    )
    b = preprocess.preprocess(
        jnp.asarray(pts), jnp.asarray(ts * 7.0 + 3.0), valid, jnp.asarray(motion),
        max_range=1e9, min_range=0.0, deskew=True,
    )
    np.testing.assert_allclose(np.asarray(a.points), np.asarray(b.points), atol=1e-4)
