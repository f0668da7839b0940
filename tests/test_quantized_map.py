"""Quantized (u16 voxel-relative) map storage vs the f32 reference layout.

The u16 store must (a) roundtrip points to within the quantization step
(voxel_size / 65535), (b) return the same nearest neighbors as f32 up to that
epsilon, and (c) leave the closed-loop trajectory essentially unchanged.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu.ops import hash_map
from kiss_icp_tpu import odometry

F32 = hash_map.MapConfig(voxel_size=1.0, max_distance=60.0, capacity_log2=13)
U16 = dataclasses.replace(F32, storage="u16")
EPS = F32.voxel_size / 65535.0  # one quantization step


def _cloud(n=2000, seed=0, scale=30.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-scale, scale, (n, 3)).astype(np.float32)


def test_encode_decode_roundtrip():
    pts = jnp.asarray(_cloud())
    keys = hash_map.voxel_ops.point_to_voxel(pts, U16.voxel_size)
    enc = hash_map.encode_points(U16, pts, keys)
    assert enc.dtype == jnp.uint16
    dec = hash_map.decode_points(U16, enc, keys)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(pts), atol=EPS)
    # Re-encoding a decoded value is a fixpoint (untouched lanes keep bits).
    enc2 = hash_map.encode_points(U16, dec, keys)
    np.testing.assert_array_equal(np.asarray(enc2), np.asarray(enc))


def test_storage_dtype_and_memory():
    m16 = hash_map.create_map(U16)
    m32 = hash_map.create_map(F32)
    assert m16.points.dtype == jnp.uint16
    assert m16.points.nbytes * 2 == m32.points.nbytes


def test_query_matches_f32_within_quantization():
    pts = jnp.asarray(_cloud(3000, seed=1))
    valid = jnp.ones(3000, bool)
    m32, _ = hash_map.insert(F32, hash_map.create_map(F32), pts, valid)
    m16, _ = hash_map.insert(U16, hash_map.create_map(U16), pts, valid)

    q = jnp.asarray(_cloud(500, seed=2, scale=28.0))
    qv = jnp.ones(500, bool)
    r32 = hash_map.query_nearest(F32, m32, q, qv)
    r16 = hash_map.query_nearest(U16, m16, q, qv)

    np.testing.assert_array_equal(np.asarray(r32.found), np.asarray(r16.found))
    f = np.asarray(r32.found)
    np.testing.assert_allclose(
        np.asarray(r16.distances)[f], np.asarray(r32.distances)[f], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(r16.neighbors)[f], np.asarray(r32.neighbors)[f], atol=2 * EPS
    )


def test_insert_counts_match_f32():
    pts = jnp.asarray(_cloud(4000, seed=3))
    valid = jnp.ones(4000, bool)
    m32, s32 = hash_map.insert(F32, hash_map.create_map(F32), pts, valid)
    m16, s16 = hash_map.insert(U16, hash_map.create_map(U16), pts, valid)
    assert int(s32.num_added_points) == int(s16.num_added_points)
    np.testing.assert_array_equal(np.asarray(m32.counts), np.asarray(m16.counts))


def test_trim_matches_f32():
    pts = jnp.asarray(_cloud(3000, seed=4, scale=80.0))
    valid = jnp.ones(3000, bool)
    m32, _ = hash_map.insert(F32, hash_map.create_map(F32), pts, valid)
    m16, _ = hash_map.insert(U16, hash_map.create_map(U16), pts, valid)
    origin = jnp.zeros(3)
    t32 = hash_map.trim(F32, m32, origin)
    t16 = hash_map.trim(U16, m16, origin)
    np.testing.assert_array_equal(
        np.asarray(t32.counts) > 0, np.asarray(t16.counts) > 0
    )


def test_closed_loop_trajectory_parity():
    def run(storage):
        cfg = KISSConfig()
        cfg.data.max_range = 50.0
        cfg.data.min_range = 1.0
        cfg.mapping.voxel_size = 0.5
        cfg.engine.max_points_per_frame = 2048
        cfg.engine.frame_capacity = 2048
        cfg.engine.source_capacity = 512
        cfg.engine.map_capacity_log2 = 13
        cfg.engine.donate_state = False
        cfg.engine.map_storage = storage
        cfg.registration.max_num_iterations = 15
        rng = np.random.default_rng(11)
        base = rng.uniform(-30, 30, (2048, 3)).astype(np.float32)
        state = odometry.init_state(cfg)
        poses = []
        for i in range(4):
            pts = base + np.array([0.25 * i, 0.05 * i, 0], np.float32)
            state, res = odometry.register_frame(
                cfg, state, pts, np.zeros(2048, np.float32), np.ones(2048, bool)
            )
            poses.append(np.asarray(res.pose))
        return np.stack(poses)

    np.testing.assert_allclose(run("u16"), run("f32"), atol=2e-3)
