"""Pallas fused linear-system kernel vs the jnp implementation.

Runs in interpret mode on the CPU mesh; the TPU path compiles the same kernel
natively.
"""

import numpy as np
import jax.numpy as jnp

from kiss_icp_tpu.ops import registration
from kiss_icp_tpu.ops.pallas_kernels import build_linear_system_pallas


def _case(n, seed, kernel=0.7, center=(3.0, -2.0, 1.0)):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    tgt = (src + rng.normal(0, 0.3, (n, 3))).astype(np.float32)
    mask = rng.random(n) > 0.3
    return (
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.asarray(mask),
        jnp.float32(kernel),
        jnp.asarray(center, jnp.float32),
    )


def _check(args):
    ref = registration.build_linear_system(*args)
    pal = build_linear_system_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(pal.jtj), np.asarray(ref.jtj),
                               rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pal.jtr), np.asarray(ref.jtr),
                               rtol=2e-5, atol=1e-3)
    assert int(pal.num_correspondences) == int(ref.num_correspondences)


def test_matches_jnp_aligned_size():
    _check(_case(4096, seed=0))


def test_matches_jnp_ragged_size():
    _check(_case(5000, seed=1))  # exercises block padding


def test_matches_jnp_small():
    _check(_case(100, seed=2))


def test_all_masked_out():
    src, tgt, _, k, c = _case(2048, seed=3)
    mask = jnp.zeros(2048, bool)
    pal = build_linear_system_pallas(src, tgt, mask, k, c, interpret=True)
    np.testing.assert_allclose(np.asarray(pal.jtj), 0.0)
    assert int(pal.num_correspondences) == 0


def test_register_frame_pallas_path_matches_jnp():
    """engine.use_pallas=True must produce the same trajectory as the default
    path (interpret mode here; the TPU bench A/Bs the compiled kernel)."""
    from kiss_icp_tpu.config.schema import KISSConfig
    from kiss_icp_tpu import odometry

    def run(use_pallas):
        cfg = KISSConfig()
        cfg.data.max_range = 50.0
        cfg.data.min_range = 1.0
        cfg.mapping.voxel_size = 0.5
        cfg.engine.max_points_per_frame = 2048
        cfg.engine.frame_capacity = 2048
        cfg.engine.source_capacity = 512
        cfg.engine.map_capacity_log2 = 13
        cfg.engine.donate_state = False
        cfg.engine.use_pallas = use_pallas
        cfg.registration.max_num_iterations = 12
        rng = np.random.default_rng(7)
        base = rng.uniform(-30, 30, (2048, 3)).astype(np.float32)
        state = odometry.init_state(cfg)
        poses = []
        for i in range(3):
            pts = base + np.array([0.3 * i, 0.05 * i, 0], np.float32)
            state, res = odometry.register_frame(
                cfg, state, pts, np.zeros(2048, np.float32), np.ones(2048, bool)
            )
            poses.append(np.asarray(res.pose))
        return np.stack(poses)

    np.testing.assert_allclose(run(True), run(False), atol=1e-4)
