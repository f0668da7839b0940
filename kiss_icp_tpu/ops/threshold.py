"""Adaptive correspondence threshold, as pure functional state updates.

Equivalent of the reference AdaptiveThreshold (cpp/kiss_icp/core/Threshold.{hpp:29-47,
cpp:30-51}) and the pure-Python FixedThreshold (python/kiss_icp/threshold.py:35-43).
The running sum-of-squares lives in a 2-scalar pytree that threads through the jitted
odometry step, so the whole recurrence stays on-device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from kiss_icp_tpu.ops import se3


class ThresholdState(NamedTuple):
    model_sse: jnp.ndarray  # () float32 — running sum of squared model errors
    sse_comp: jnp.ndarray  # () float32 — Kahan compensation of model_sse
    num_samples: jnp.ndarray  # () float32 — sample count (float for the division)


def init_state(initial_threshold: float) -> ThresholdState:
    """model_sse = initial^2, num_samples = 1 (reference Threshold.cpp:30-36)."""
    return ThresholdState(
        model_sse=jnp.asarray(initial_threshold * initial_threshold, jnp.float32),
        sse_comp=jnp.zeros((), jnp.float32),
        num_samples=jnp.asarray(1.0, jnp.float32),
    )


def compute_threshold(state: ThresholdState) -> jnp.ndarray:
    """sigma = sqrt(model_sse / num_samples) (reference Threshold.hpp:38)."""
    return jnp.sqrt(state.model_sse / state.num_samples)


def update_model_deviation(
    state: ThresholdState,
    model_deviation: jnp.ndarray,
    *,
    max_range: float,
    min_motion_th: float,
) -> ThresholdState:
    """Accumulate the model error of one frame (reference Threshold.cpp:38-49).

    model_error = |t| + 2 * max_range * sin(theta / 2), accumulated only when it
    exceeds `min_motion_th` (branch-free via jnp.where).
    """
    theta = se3.rotation_angle(model_deviation[:3, :3])
    delta_rot = 2.0 * max_range * jnp.sin(theta / 2.0)
    delta_trans = jnp.linalg.norm(model_deviation[:3, 3])
    # Clamp: a diverged registration can report astronomical deviations; an
    # inf/NaN running sum would poison every later sigma (f32 overflows where
    # the reference's f64 does not). 1e3 m of per-frame model error is
    # already far beyond recoverable.
    model_error = jnp.minimum(
        jnp.nan_to_num(delta_trans + delta_rot, nan=1e3, posinf=1e3), 1e3
    )
    moved = model_error > min_motion_th
    # Kahan-compensated accumulation: the reference runs this sum in float64
    # (Threshold.hpp:43-44); TPUs have no native f64, and a bare f32 running
    # sum loses low-order per-frame updates once model_sse outgrows them over
    # multi-thousand-frame sequences. Two f32 scalars recover f64-grade error.
    increment = jnp.where(moved, model_error * model_error, 0.0)
    y = increment - state.sse_comp
    t = state.model_sse + y
    comp = (t - state.model_sse) - y
    return ThresholdState(
        model_sse=t,
        sse_comp=jnp.where(jnp.isfinite(comp), comp, 0.0),
        num_samples=state.num_samples + jnp.where(moved, 1.0, 0.0),
    )
