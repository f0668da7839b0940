"""Map-sharded odometry vs the single-device pipeline (8-device CPU mesh).

Validates SURVEY.md section 7 step 7: pose parity with the replicated-map
path, D-fold per-device memory reduction, and voxel distribution across
shards.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry
from kiss_icp_tpu.parallel import sharded_map


def _config():
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 2048
    cfg.engine.frame_capacity = 2048
    cfg.engine.source_capacity = 512
    cfg.engine.map_capacity_log2 = 14
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 12
    return cfg


def _mesh(n=8):
    devices = np.asarray(jax.devices()[:n])
    return Mesh(devices, (sharded_map.MAP_AXIS,))


def _frames(k, n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    pts = np.stack(
        [base + np.array([0.25 * i, 0.04 * i, 0], np.float32) for i in range(k)]
    )
    ts = np.zeros((k, n), np.float32)
    valid = np.ones((k, n), bool)
    return pts, ts, valid


def test_pose_parity_with_single_device():
    cfg = _config()
    mesh = _mesh()
    k, n = 4, cfg.engine.max_points_per_frame
    pts, ts, valid = _frames(k, n)

    step = sharded_map.make_map_sharded_step(cfg, mesh)
    sstate = sharded_map.init_sharded_state(cfg, mesh)
    sharded_poses = []
    for i in range(k):
        sstate, res = step(sstate, pts[i], ts[i], valid[i])
        sharded_poses.append(np.asarray(res.pose))

    state = odometry.init_state(cfg)
    single_poses = []
    for i in range(k):
        state, res = odometry.register_frame(cfg, state, pts[i], ts[i], valid[i])
        single_poses.append(np.asarray(res.pose))

    np.testing.assert_allclose(
        np.stack(sharded_poses), np.stack(single_poses), atol=5e-4
    )


def test_per_device_memory_is_one_over_d():
    cfg = _config()
    mesh = _mesh()
    d = mesh.shape[sharded_map.MAP_AXIS]
    sstate = sharded_map.init_sharded_state(cfg, mesh)
    mcfg = odometry.map_config(cfg)
    # The big tensor: per-device addressable shard must be capacity/D rows.
    shard_shapes = [s.data.shape for s in sstate.points.addressable_shards]
    assert all(s[0] == mcfg.capacity // d for s in shard_shapes)
    # Local map config really is 1/D slots.
    assert sharded_map.local_map_config(cfg, mesh).capacity == mcfg.capacity // d


def test_voxels_distribute_across_shards():
    cfg = _config()
    mesh = _mesh()
    d = mesh.shape[sharded_map.MAP_AXIS]
    k, n = 3, cfg.engine.max_points_per_frame
    pts, ts, valid = _frames(k, n, seed=1)

    step = sharded_map.make_map_sharded_step(cfg, mesh)
    sstate = sharded_map.init_sharded_state(cfg, mesh)
    for i in range(k):
        sstate, _ = step(sstate, pts[i], ts[i], valid[i])

    per_shard = np.asarray(sharded_map.shard_live_voxels(sstate, d))
    # Every shard owns some voxels, none owns everything (hash balance).
    assert per_shard.shape == (d,)
    assert np.all(per_shard > 0)
    total = per_shard.sum()
    assert np.all(per_shard < total)

    # Total live voxels matches the single-device map's.
    state = odometry.init_state(cfg)
    for i in range(k):
        state, _ = odometry.register_frame(cfg, state, pts[i], ts[i], valid[i])
    single_live = int(jnp.sum((state.map.counts > 0).astype(jnp.int32)))
    assert int(total) == single_live


def test_chunked_map_sharded_matches_streaming():
    cfg = _config()
    mesh = _mesh()
    k, n = 3, cfg.engine.max_points_per_frame
    pts, ts, valid = _frames(k, n, seed=2)

    chunk = sharded_map.make_map_sharded_chunked_step(cfg, mesh)
    cstate = sharded_map.init_sharded_state(cfg, mesh)
    cstate, results = chunk(cstate, pts, ts, valid)
    poses = results.pose

    step = sharded_map.make_map_sharded_step(cfg, mesh)
    sstate = sharded_map.init_sharded_state(cfg, mesh)
    stream = []
    for i in range(k):
        sstate, res = step(sstate, pts[i], ts[i], valid[i])
        stream.append(np.asarray(res.pose))
    np.testing.assert_allclose(np.asarray(poses), np.stack(stream), atol=1e-5)


def test_u16_storage_honored_on_sharded_and_pod_state():
    """engine.map_storage='u16' must shape the sharded/pod point stores too
    (they hardcoded f32, silently defeating u16's halved footprint)."""
    import jax.numpy as jnp

    from kiss_icp_tpu.parallel import pod

    cfg = _config()
    cfg.engine.map_storage = "u16"
    st = sharded_map.init_sharded_state(cfg, _mesh())
    assert st.points.dtype == jnp.uint16

    pod_mesh = pod.make_pod_mesh(n_seq=2, n_map=4)
    pst = pod.init_pod_state(cfg, pod_mesh, batch=2)
    assert pst.points.dtype == jnp.uint16

    # And the sharded pipeline still tracks with u16 storage end-to-end.
    pts, ts, valid = _frames(4, 1024)
    step = sharded_map.make_map_sharded_step(cfg, _mesh())
    state = sharded_map.init_sharded_state(cfg, _mesh())
    for i in range(4):
        state, res = step(state, pts[i], ts[i], valid[i])
    assert np.all(np.isfinite(np.asarray(res.pose)))
