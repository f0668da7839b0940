"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-device tests (pjit/psum/shard_map) run on a virtual CPU mesh, the standard
way to validate sharding without a real TPU pod (see SURVEY.md section 4).

This environment pre-registers a TPU PJRT plugin via sitecustomize and pins
``jax_platforms`` before conftest runs, so setting JAX_PLATFORMS here is too
late — we override the config directly before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
