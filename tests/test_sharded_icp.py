"""Sharded single-sequence ICP vs the single-device solver (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from kiss_icp_tpu.ops import hash_map, registration
from kiss_icp_tpu.parallel import sharded_icp

import oracle


def _surface_cloud(n=2048, seed=0):
    rng = np.random.default_rng(seed)
    n3 = n // 3
    floor = np.stack(
        [rng.uniform(-20, 20, n3), rng.uniform(-20, 20, n3), np.full(n3, -2.0)], axis=1
    )
    wall_x = np.stack(
        [np.full(n3, 15.0), rng.uniform(-20, 20, n3), rng.uniform(-2, 6, n3)], axis=1
    )
    rest = n - 2 * n3
    wall_y = np.stack(
        [rng.uniform(-20, 20, rest), np.full(rest, -12.0), rng.uniform(-2, 6, rest)],
        axis=1,
    )
    return np.concatenate([floor, wall_x, wall_y]).astype(np.float32)


def test_sharded_align_matches_single_device():
    devices = np.asarray(jax.devices())
    mesh = Mesh(devices.reshape(8), (sharded_icp.PTS_AXIS,))

    cloud = _surface_cloud()
    cfg = hash_map.MapConfig(voxel_size=1.0, max_distance=100.0, capacity_log2=14)
    m = hash_map.create_map(cfg)
    m, _ = hash_map.insert(cfg, m, jnp.asarray(cloud), jnp.ones(len(cloud), bool))

    rng = np.random.default_rng(1)
    twist = np.concatenate([rng.uniform(-0.2, 0.2, 3), rng.uniform(-0.01, 0.01, 3)])
    gt = oracle.se3_exp(twist)
    inv = np.linalg.inv(gt)
    body = (cloud @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    guess = jnp.eye(4, dtype=jnp.float32)
    args = (
        jnp.asarray(body),
        jnp.ones(len(body), bool),
        guess,
        jnp.float32(2.0),
        jnp.float32(0.7),
    )

    single = registration.align_points_to_map(
        cfg, m, *args, max_iterations=60, convergence=1e-5
    )
    sharded = sharded_icp.make_sharded_align(
        cfg, mesh, max_iterations=60, convergence=1e-5
    )(m, *args)

    np.testing.assert_allclose(
        np.asarray(sharded.pose), np.asarray(single.pose), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(sharded.pose), gt, atol=5e-3)
    assert int(sharded.num_correspondences) == int(single.num_correspondences)
