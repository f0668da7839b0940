"""Adaptive threshold recurrence vs the float64 oracle."""

import numpy as np
import jax.numpy as jnp

import oracle
from kiss_icp_tpu.ops import threshold


def test_initial_threshold():
    st = threshold.init_state(2.0)
    assert float(threshold.compute_threshold(st)) == 2.0


def test_recurrence_matches_oracle():
    rng = np.random.default_rng(0)
    max_range, min_motion = 100.0, 0.1
    st = threshold.init_state(2.0)
    orc = oracle.ThresholdOracle(2.0, min_motion, max_range)
    for i in range(20):
        # Mix of below-threshold (tiny) and above-threshold deviations.
        scale = 1e-4 if i % 3 == 0 else 0.05
        dev = oracle.se3_exp(rng.standard_normal(6) * scale)
        st = threshold.update_model_deviation(
            st, jnp.asarray(dev, jnp.float32), max_range=max_range, min_motion_th=min_motion
        )
        orc.update_model_deviation(dev)
        np.testing.assert_allclose(
            float(threshold.compute_threshold(st)), orc.compute_threshold(), rtol=1e-4
        )
    # The gating must have actually skipped some updates.
    assert orc.num_samples < 21
