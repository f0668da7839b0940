"""nn_mode="cached" (cached top-C data association, registration.py
gauss_newton_loop_cached): trajectory parity with the exact re-gather modes.

Unlike the other nn modes, "cached" is NOT bit-identical by construction —
association can differ for a source point whose true NN left its cached
top-C candidates mid-loop. These tests pin that the deviation stays
negligible on realistic drives (GM weighting bounds the influence of any
single association), and that the refresh machinery engages on large
motion instead of letting the cache go stale.
"""

import numpy as np
import jax.numpy as jnp

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry
from kiss_icp_tpu.datasets.synthetic import SyntheticDataset
from kiss_icp_tpu.metrics import absolute_trajectory_error
from kiss_icp_tpu.ops import hash_map as hm


def _config(nn_mode):
    cfg = KISSConfig()
    cfg.data.min_range = 1.0
    cfg.data.max_range = 60.0
    cfg.mapping.voxel_size = 1.0
    cfg.engine.max_points_per_frame = 8192
    cfg.engine.frame_capacity = 8192
    cfg.engine.source_capacity = 2048
    cfg.engine.map_capacity_log2 = 16
    cfg.engine.nn_mode = nn_mode
    cfg.engine.donate_state = False
    return cfg


def _run(nn_mode, n_scans=12):
    ds = SyntheticDataset(sequence=0, n_scans=n_scans, n_beams=32,
                          n_azimuth=512, max_range=60.0)
    icp = odometry.KissICP(_config(nn_mode))
    poses, iters = [], []
    for i in range(n_scans):
        f, t = ds[i]
        res = icp.register_frame_lazy(f, t)
        poses.append(np.asarray(res.pose))
        iters.append(int(np.asarray(res.num_iterations)))
    return np.stack(poses), np.asarray(iters)


def test_query_topc_contains_true_nn():
    """The top-C candidate set always contains the exact query answer."""
    rng = np.random.default_rng(3)
    cfg = hm.MapConfig(voxel_size=1.0, max_distance=100.0,
                       max_points_per_voxel=8, capacity_log2=13,
                       probe_length=16, group_capacity=16)
    pts = rng.uniform(-20, 20, (3000, 3)).astype(np.float32)
    m = hm.create_map(cfg)
    m, _ = hm.insert(cfg, m, jnp.asarray(pts), jnp.ones(len(pts), bool))
    q = rng.uniform(-20, 20, (512, 3)).astype(np.float32)
    exact = hm.query_nearest(cfg, m, jnp.asarray(q), jnp.ones(512, bool))
    cand, cval = hm.query_topc(cfg, m, jnp.asarray(q), 8)
    cand, cval = np.asarray(cand), np.asarray(cval)
    d_exact = np.asarray(exact.distances)
    d_cand = np.linalg.norm(cand - q[:, None, :], axis=-1)
    d_cand = np.where(cval, d_cand, np.inf)
    best = d_cand.min(axis=1)
    finite = np.isfinite(d_exact)
    np.testing.assert_allclose(best[finite], d_exact[finite],
                               rtol=1e-5, atol=1e-5)
    # nearest-first ordering
    dsorted = np.sort(np.where(cval, d_cand, np.inf), axis=1)
    np.testing.assert_allclose(np.where(np.isfinite(d_cand), d_cand, 0),
                               np.where(np.isfinite(dsorted), dsorted, 0),
                               atol=1e-4)


def test_cached_trajectory_matches_exact_mode():
    """Over a 12-frame synthetic drive the cached-association trajectory
    stays in the exact mode's accuracy class.

    Two both-correct ICP variants diverge open-loop (a sub-mm association
    difference on frame k shifts every later map insert), so the inter-mode
    deviation bound is intentionally loose — the binding assertion is ATE
    against ground truth: cached must not be measurably WORSE than exact
    (measured 0.2260 vs 0.2267 m on this drive, i.e. slightly better)."""
    p_exact, it_exact = _run("gather27")
    p_cached, it_cached = _run("cached")
    err = np.linalg.norm(p_cached[:, :3, 3] - p_exact[:, :3, 3], axis=1)
    assert err.max() < 0.15, f"max translation deviation {err.max():.4f} m"
    # Rotation parity (loose for the same open-loop reason).
    for a, b in zip(p_cached, p_exact):
        np.testing.assert_allclose(a[:3, :3], b[:3, :3], atol=6e-3)
    # The invariant that matters: accuracy vs ground truth.
    ds = SyntheticDataset(sequence=0, n_scans=12, n_beams=32,
                          n_azimuth=512, max_range=60.0)
    gt = ds.gt_poses[:12]
    ate_exact, _ = absolute_trajectory_error(gt, p_exact)
    ate_cached, _ = absolute_trajectory_error(gt, p_cached)
    assert ate_cached <= ate_exact * 1.15 + 0.01, (
        f"cached ATE {ate_cached:.4f} m vs exact {ate_exact:.4f} m")
    # Convergence behavior stays in the same regime (no spinning).
    assert it_cached.mean() < 2.5 * max(it_exact.mean(), 1.0)


def test_cached_refresh_engages_on_bad_guess():
    """A large initial error (worst case for a stale cache) must still
    converge to the exact mode's pose — the per-point motion bound forces
    re-gathers rather than letting the solve trust stale candidates."""
    rng = np.random.default_rng(11)
    base = rng.uniform(-25, 25, (4096, 3)).astype(np.float32)

    def run(mode):
        icp = odometry.KissICP(_config(mode))
        icp.register_frame_lazy(base)          # seeds the map
        icp.register_frame_lazy(base + np.array([0.4, 0.1, 0], np.float32))
        # Big jump: constant-velocity guess is ~1.5 m off for this frame.
        icp.register_frame_lazy(base + np.array([2.4, 0.4, 0], np.float32))
        return icp.last_pose

    np.testing.assert_allclose(run("cached"), run("gather27"), atol=0.05)
