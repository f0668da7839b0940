"""Fused Pallas candidate-evaluation NN (ops/pallas_nn.py) vs the jnp query.

Distances agree to the last few ulp (XLA contracts the jnp path's d2 sum
into FMAs, which a separately compiled program cannot reproduce bit-for-bit
— the reference itself pins no such order, its TBB reduction being
nondeterministic); the chosen neighbor must be *a* nearest point (ties may
break differently at ulp level). Runs the kernel in interpret mode on the
CPU mesh (compiled Mosaic validation happens on the real TPU via bench.py's
variant A/B)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kiss_icp_tpu.ops import hash_map as hm
from kiss_icp_tpu.ops import pallas_nn


def _build_map(storage, max_points=5, seed=0):
    rng = np.random.default_rng(seed)
    cfg = hm.MapConfig(voxel_size=1.0, max_distance=30.0,
                       max_points_per_voxel=max_points,
                       capacity_log2=12, storage=storage)
    m = hm.create_map(cfg)
    for _ in range(3):
        pts = rng.uniform(-12.0, 12.0, size=(700, 3)).astype(np.float32)
        m, _ = hm.insert(cfg, m, jnp.asarray(pts), jnp.ones((700,), bool))
    return cfg, m


@pytest.mark.parametrize("storage", ["f32", "u16"])
@pytest.mark.parametrize("max_points", [5, 20])
def test_fused_query_bit_identical(storage, max_points):
    cfg, m = _build_map(storage, max_points)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-14, 14, size=(300, 3)).astype(np.float32))
    valid = jnp.asarray(np.r_[np.ones(290, bool), np.zeros(10, bool)])

    ref = hm.query_nearest(cfg, m, q, valid)
    got = pallas_nn.query_nearest_fused(cfg, m, q, valid, interpret=True)

    f = np.asarray(ref.found)
    np.testing.assert_array_equal(f, np.asarray(got.found))
    np.testing.assert_allclose(np.asarray(ref.distances)[f],
                               np.asarray(got.distances)[f], rtol=1e-6)
    # The returned neighbor must be an actual nearest map point: its true
    # distance equals the reference's nearest distance (ulp-level ties may
    # pick a different but equally-near point).
    qn = np.asarray(q)[f]
    d_got = np.linalg.norm(qn - np.asarray(got.neighbors)[f], axis=1)
    np.testing.assert_allclose(d_got, np.asarray(ref.distances)[f], rtol=1e-5)


def test_fused_query_empty_map():
    cfg = hm.MapConfig(voxel_size=1.0, capacity_log2=10)
    m = hm.create_map(cfg)
    q = jnp.zeros((64, 3), jnp.float32)
    got = pallas_nn.query_nearest_fused(cfg, m, q, jnp.ones((64,), bool),
                                        interpret=True)
    assert not bool(np.any(np.asarray(got.found)))


def test_fused_query_tie_breaking():
    """Two stored points equidistant from the query: the lowest flat
    (neighbor, lane) index must win, as in the flat argmin."""
    cfg = hm.MapConfig(voxel_size=1.0, max_distance=30.0,
                       max_points_per_voxel=4, capacity_log2=10)
    m = hm.create_map(cfg)
    pts = np.array([[0.5, 0.5, 0.25], [0.5, 0.5, 0.75]], np.float32)
    m, _ = hm.insert(cfg, m, jnp.asarray(pts), jnp.ones((2,), bool))
    q = jnp.asarray(np.array([[0.5, 0.5, 0.5]], np.float32))
    ref = hm.query_nearest(cfg, m, q, jnp.ones((1,), bool))
    got = pallas_nn.query_nearest_fused(cfg, m, q, jnp.ones((1,), bool),
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.neighbors),
                                  np.asarray(got.neighbors))
