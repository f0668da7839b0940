"""The composed ("seq", "map") pod program (parallel/pod.py) on the 8-device
CPU mesh: pose parity with the single-axis map-sharded path and with the
single-device pipeline, 1/(S*D) per-device memory, and the wrapper API.
"""

import numpy as np
import jax
from jax.sharding import Mesh

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry
from kiss_icp_tpu.parallel import pod, sharded_map


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


def _frames(b, k, n, seed=0):
    """(B, K, N, 3) scans: per-sequence distinct drives over a shared base
    cloud so sequences converge in different iteration counts."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    pts = np.zeros((b, k, n, 3), np.float32)
    for i in range(b):
        vel = np.array([0.2 + 0.1 * i, 0.03 * i, 0], np.float32)
        for j in range(k):
            pts[i, j] = base + vel * j
    ts = np.zeros((b, k, n), np.float32)
    valid = np.ones((b, k, n), bool)
    return pts, ts, valid


def test_pod_matches_map_sharded_per_sequence():
    """seq=2 x map=4: each sequence's pod trajectory must match the
    standalone 4-shard map-sharded run of that sequence."""
    cfg = _config()
    mesh = pod.make_pod_mesh(2, 4)
    b, k, n = 4, 3, cfg.engine.max_points_per_frame
    pts, ts, valid = _frames(b, k, n)

    step = pod.make_pod_chunked_step(cfg, mesh)
    state = pod.init_pod_state(cfg, mesh, b)
    state, results = step(state, pts, ts, valid)
    pod_poses = np.asarray(results.pose)  # (B, K, 4, 4)
    assert pod_poses.shape == (b, k, 4, 4)

    ref_mesh = Mesh(np.asarray(jax.devices()[:4]), (sharded_map.MAP_AXIS,))
    ref_chunk = sharded_map.make_map_sharded_chunked_step(cfg, ref_mesh)
    for i in range(b):
        rstate = sharded_map.init_sharded_state(cfg, ref_mesh)
        rstate, rres = ref_chunk(rstate, pts[i], ts[i], valid[i])
        np.testing.assert_allclose(
            pod_poses[i], np.asarray(rres.pose), atol=1e-5,
            err_msg=f"sequence {i} diverged from the 1-axis sharded path",
        )


def test_pod_matches_single_device():
    cfg = _config()
    mesh = pod.make_pod_mesh(2, 4)
    b, k, n = 2, 4, cfg.engine.max_points_per_frame
    pts, ts, valid = _frames(b, k, n, seed=1)

    step = pod.make_pod_chunked_step(cfg, mesh)
    state = pod.init_pod_state(cfg, mesh, b)
    state, results = step(state, pts, ts, valid)
    pod_poses = np.asarray(results.pose)

    for i in range(b):
        st = odometry.init_state(cfg)
        for j in range(k):
            st, res = odometry.register_frame(cfg, st, pts[i, j], ts[i, j],
                                              valid[i, j])
            np.testing.assert_allclose(
                pod_poses[i, j], np.asarray(res.pose), atol=5e-4,
                err_msg=f"seq {i} frame {j}",
            )


def test_pod_memory_is_one_over_sd():
    cfg = _config()
    mesh = pod.make_pod_mesh(2, 4)
    b = 4
    state = pod.init_pod_state(cfg, mesh, b)
    mcfg = odometry.map_config(cfg)
    shard_shapes = [s.data.shape for s in state.points.addressable_shards]
    # Global (B, C, P, 3); per device (B/2, C/4, P, 3).
    assert all(s[0] == b // 2 and s[1] == mcfg.capacity // 4
               for s in shard_shapes), shard_shapes


def test_pod_surfaces_stats():
    cfg = _config()
    mesh = pod.make_pod_mesh(2, 4)
    b, k, n = 2, 3, cfg.engine.max_points_per_frame
    pts, ts, valid = _frames(b, k, n, seed=2)
    step = pod.make_pod_chunked_step(cfg, mesh)
    state = pod.init_pod_state(cfg, mesh, b)
    state, results = step(state, pts, ts, valid)
    iters = np.asarray(results.num_iterations)
    corr = np.asarray(results.num_correspondences)
    assert iters.shape == (b, k)
    assert np.all(iters[:, 0] == 0)  # first frame: empty map
    assert np.all(iters[:, 1:] > 0)
    assert np.all(corr[:, 1:] > 0)
    assert np.all(~np.asarray(results.used_fallback))
    assert np.all(np.asarray(results.num_dropped_map_voxels) == 0)


def test_pod_wrapper_api():
    cfg = _config()
    cfg.engine.map_shards = 4
    b, k, n = 2, 3, 1024
    pts, ts, valid = _frames(b, k, n, seed=3)
    po = pod.PodOdometry(cfg, batch=b)
    assert po.mesh.shape[sharded_map.MAP_AXIS] == 4
    frames = [[pts[i, j, valid[i, j]] for j in range(k)] for i in range(b)]
    poses = po.register_chunks(frames)
    assert poses.shape == (b, k, 4, 4)
    assert np.all(np.isfinite(poses))


def test_pod_oversized_scan_stride_subsampled():
    """Scans above max_points_per_frame are stride-subsampled with drop
    accounting (head truncation would angularly bias an azimuth-ordered
    scan; round-3 review finding)."""
    cfg = _config()
    cfg.engine.map_shards = 4
    b, k = 2, 1
    cap = cfg.engine.max_points_per_frame
    rng = np.random.default_rng(5)
    big = rng.uniform(-30, 30, (cap * 2, 3)).astype(np.float32)
    po = pod.PodOdometry(cfg, batch=b)
    poses = po.register_chunks([[big], [big[:100]]])
    assert poses.shape == (b, k, 4, 4)
    assert po.last_input_dropped == cap  # only the oversized scan drops
    assert po.total_input_dropped == cap
