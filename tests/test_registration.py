"""ICP solver tests: linear system vs oracle, full alignment recovery, and
end-to-end parity with the float64 reference-algorithm oracle."""

import numpy as np
import jax.numpy as jnp

import oracle
from kiss_icp_tpu.ops import hash_map, registration, se3


def _surface_cloud(n=2000, seed=0):
    """Points on a synthetic 'room': two walls + floor, so ICP is constrained
    in all 6 DoF."""
    rng = np.random.default_rng(seed)
    n3 = n // 3
    floor = np.stack(
        [rng.uniform(-20, 20, n3), rng.uniform(-20, 20, n3), np.full(n3, -2.0)], axis=1
    )
    wall_x = np.stack(
        [np.full(n3, 15.0), rng.uniform(-20, 20, n3), rng.uniform(-2, 6, n3)], axis=1
    )
    wall_y = np.stack(
        [rng.uniform(-20, 20, n - 2 * n3), np.full(n - 2 * n3, -12.0),
         rng.uniform(-2, 6, n - 2 * n3)], axis=1
    )
    return np.concatenate([floor, wall_x, wall_y]).astype(np.float32)


def _make_map(points, cfg):
    m = hash_map.create_map(cfg)
    m, _ = hash_map.insert(cfg, m, jnp.asarray(points), jnp.ones(len(points), bool))
    return m


def test_build_linear_system_matches_oracle():
    rng = np.random.default_rng(1)
    src = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
    tgt = (src + rng.normal(0, 0.1, (100, 3))).astype(np.float32)
    kernel = 0.5
    ls = registration.build_linear_system(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(100, bool),
        jnp.float32(kernel), jnp.zeros(3, jnp.float32),
    )
    jtj_o, jtr_o = oracle.build_linear_system(
        src.astype(np.float64), tgt.astype(np.float64), kernel
    )
    np.testing.assert_allclose(np.asarray(ls.jtj), jtj_o, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ls.jtr), jtr_o, rtol=1e-4, atol=1e-3)
    assert int(ls.num_correspondences) == 100


def test_build_linear_system_recentered_fixed_point():
    """At center c the system solves for the increment expressed at c: with a
    perfect correspondence set the solution conjugates back to the same pose."""
    rng = np.random.default_rng(2)
    src = rng.uniform(-10, 10, (200, 3)).astype(np.float32)
    twist = (rng.standard_normal(6) * 0.01).astype(np.float64)
    gt = oracle.se3_exp(twist)
    tgt = (src @ gt[:3, :3].T + gt[:3, 3]).astype(np.float32)
    center = jnp.asarray([100.0, -50.0, 3.0], jnp.float32)
    # Shifting both clouds by `center` makes the true transform between them
    # gt conjugated at center: T(c) @ gt @ T(-c). Solving the recentered
    # system undoes exactly that conjugation, so the LOCAL increment == gt.
    src_c = jnp.asarray(src) + center
    tgt_c = jnp.asarray(tgt) + center
    ls = registration.build_linear_system(
        src_c, tgt_c, jnp.ones(200, bool), jnp.float32(1.0), center
    )
    dx = registration.solve_increment(ls)
    est_local = np.asarray(se3.se3_exp(dx), np.float64)
    # One GN step on small perfect residuals ~= the ground-truth increment.
    np.testing.assert_allclose(est_local[:3, 3], gt[:3, 3], atol=5e-3)
    np.testing.assert_allclose(est_local[:3, :3], gt[:3, :3], atol=5e-4)


def test_align_recovers_known_transform():
    cloud = _surface_cloud()
    cfg = hash_map.MapConfig(voxel_size=1.0, max_distance=100.0, capacity_log2=15)
    m = _make_map(cloud, cfg)

    rng = np.random.default_rng(3)
    twist = np.concatenate([rng.uniform(-0.3, 0.3, 3), rng.uniform(-0.02, 0.02, 3)])
    gt_pose = oracle.se3_exp(twist)  # scan was taken at gt_pose
    # Scan points in body frame: world points pulled back through gt_pose.
    inv = np.linalg.inv(gt_pose)
    body = (cloud @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    res = registration.align_points_to_map(
        cfg, m, jnp.asarray(body), jnp.ones(len(body), bool),
        jnp.eye(4, dtype=jnp.float32), jnp.float32(2.0), jnp.float32(0.5),
        max_iterations=100, convergence=1e-5,
    )
    np.testing.assert_allclose(np.asarray(res.pose), gt_pose, atol=2e-3)
    assert int(res.num_iterations) < 100


def test_align_empty_map_returns_guess():
    cfg = hash_map.MapConfig(voxel_size=1.0, capacity_log2=12)
    m = hash_map.create_map(cfg)
    guess = np.asarray(oracle.se3_exp(np.array([1, 2, 3, 0.1, 0.2, 0.3])), np.float32)
    pts = np.zeros((16, 3), np.float32)
    res = registration.align_points_to_map(
        cfg, m, jnp.asarray(pts), jnp.ones(16, bool), jnp.asarray(guess),
        jnp.float32(2.0), jnp.float32(1.0), max_iterations=10, convergence=1e-4,
    )
    np.testing.assert_allclose(np.asarray(res.pose), guess, atol=1e-6)
    assert int(res.num_iterations) == 0


def test_align_matches_reference_oracle():
    """Full-solver parity with the float64 reimplementation of the reference
    algorithm on a well-conditioned problem."""
    cloud = _surface_cloud(n=1500, seed=4)
    cfg = hash_map.MapConfig(voxel_size=1.0, max_distance=100.0, capacity_log2=15)
    m = _make_map(cloud, cfg)
    orc_map = oracle.VoxelMapOracle(1.0, 100.0, 20)
    orc_map.add_points(cloud.astype(np.float64))

    rng = np.random.default_rng(5)
    twist = np.concatenate([rng.uniform(-0.2, 0.2, 3), rng.uniform(-0.01, 0.01, 3)])
    gt_pose = oracle.se3_exp(twist)
    inv = np.linalg.inv(gt_pose)
    body = (cloud[::3] @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    guess = np.eye(4, dtype=np.float32)

    ours = registration.align_points_to_map(
        cfg, m, jnp.asarray(body), jnp.ones(len(body), bool), jnp.asarray(guess),
        jnp.float32(1.5), jnp.float32(0.5), max_iterations=50, convergence=1e-4,
    )
    theirs = oracle.align_points_to_map(
        orc_map, body.astype(np.float64), guess.astype(np.float64), 1.5, 0.5,
        max_iterations=50,
    )
    np.testing.assert_allclose(np.asarray(ours.pose), theirs, atol=2e-3)


def test_gn_unroll_is_bit_exact():
    """engine.gn_unroll runs the GN body `unroll` times per while trip; the
    body freezes converged state, so the trajectory AND the reported
    iteration counts must be bit-identical to unroll=1 — the knob may only
    change wall time."""
    import numpy as np

    from kiss_icp_tpu.datasets.synthetic import SyntheticDataset
    from kiss_icp_tpu.config.schema import KISSConfig
    from kiss_icp_tpu.odometry import KissICP

    def cfg(unroll):
        c = KISSConfig()
        c.data.max_range = 30.0
        c.data.min_range = 1.0
        c.mapping.voxel_size = 1.0
        c.engine.max_points_per_frame = 4096
        c.engine.frame_capacity = 2048
        c.engine.source_capacity = 512
        c.engine.map_capacity_log2 = 14
        c.engine.use_pallas = False
        c.engine.gn_unroll = unroll
        return c

    ds = SyntheticDataset(sequence=0, n_scans=10, n_beams=16, n_azimuth=256,
                          max_range=30.0, speed=1.0, accel_frames=3)
    runs = {}
    for u in (1, 2, 3):
        icp = KissICP(cfg(u))
        poses, iters = [], []
        for i in range(10):
            f, t = ds[i]
            icp.register_frame(f, t)
            poses.append(np.asarray(icp.state.pose))
            iters.append(int(np.asarray(icp.last_result.num_iterations)))
        runs[u] = (np.asarray(poses), iters)
    for u in (2, 3):
        np.testing.assert_array_equal(runs[u][0], runs[1][0])
        assert runs[u][1] == runs[1][1]
