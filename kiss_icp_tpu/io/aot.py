"""Ahead-of-time export of the odometry step (serialized StableHLO).

The reference deploys by compiling C++ (its pipeline is the binary); the
TPU-native deployment analog is an exported XLA program: `jax.export`
serializes the jitted `register_frame` step — its StableHLO, calling
convention, and pytree structure — to a self-contained artifact that a
serving process loads and calls WITHOUT tracing, without the framework's
Python on the hot path, and without the source config needing to match
tracing-time code (the program is frozen). This is the ctypes/pybind
boundary of the reference (SURVEY.md N10) redesigned for a compiler stack:
the artifact is the interface.

Uses:
  * pin an exact compiled behavior for reproduction/audit (the artifact
    hash identifies the program);
  * warm-start serving replicas with zero tracing cost (deserialize +
    jit-call; XLA compilation of the deserialized module is cached);
  * ship the odometry step into a non-JAX host (any PJRT runtime can
    compile the embedded StableHLO).

Format: npz with the serialized Exported bytes plus a JSON metadata record
(engine geometry, same validation contract as io/checkpoint.py).

NamedTuple state/result types are registered for serialization once at
import (jax.export requires explicit opt-in for custom pytree nodes).
"""

from __future__ import annotations

import functools
import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from kiss_icp_tpu import odometry
from kiss_icp_tpu.io.checkpoint import _metadata
from kiss_icp_tpu.ops import hash_map, registration, threshold, voxel

# v2: round 5 changed the serialized pytrees (VoxelMap/FrameResult gained
# the num_oob_points counter; ChunkSummary registered for the chunked
# export). Old artifacts would fail INSIDE jax.export deserialization with
# an opaque error — reject them at the format gate with a clear message
# instead (an AOT artifact is a build product: re-export it; unlike
# checkpoints there is no data to migrate).
FORMAT_VERSION = 2

_REGISTERED = False


def _register_types() -> None:
    """Register the framework's NamedTuple pytree nodes for export
    serialization (idempotent)."""
    global _REGISTERED
    if _REGISTERED:
        return
    for t in (
        odometry.OdometryState,
        odometry.FrameResult,
        odometry.ChunkSummary,
        hash_map.VoxelMap,
        threshold.ThresholdState,
    ):
        try:
            jexport.register_namedtuple_serialization(
                t, serialized_name=f"kiss_icp_tpu.{t.__name__}"
            )
        except ValueError:
            pass  # already registered in this process
    _REGISTERED = True


def export_step(config, platforms=None) -> bytes:
    """Serialize the jitted single-frame odometry step for `config`.

    `platforms`: lowering targets (e.g. ["tpu"], ["cpu", "tpu"]); defaults
    to the current backend. Returns the serialized bytes.
    """
    _register_types()
    n = int(config.engine.max_points_per_frame)
    state0 = jax.eval_shape(lambda: odometry.init_state(config))
    args = (
        state0,
        jax.ShapeDtypeStruct((n, 3), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.bool_),
    )
    step = jax.jit(functools.partial(odometry.register_frame, config))
    exp = jexport.export(step, platforms=platforms)(*args)
    return exp.serialize()


def export_chunked_step(config, chunk: int, platforms=None) -> bytes:
    """Serialize the K-frame chunked odometry step (`lax.scan` over `chunk`
    frames) — the PRODUCTION execution shape: every headline throughput
    number runs chunked, so the deployment artifact must cover it, not just
    the per-frame step (VERDICT r4 next #6). Same artifact contract as
    `export_step`; call signature
    `step(state, points (K,N,3), ts (K,N), valid (K,N))
    -> (state, ChunkSummary)`."""
    _register_types()
    n = int(config.engine.max_points_per_frame)
    k = int(chunk)
    state0 = jax.eval_shape(lambda: odometry.init_state(config))
    args = (
        state0,
        jax.ShapeDtypeStruct((k, n, 3), jnp.float32),
        jax.ShapeDtypeStruct((k, n), jnp.float32),
        jax.ShapeDtypeStruct((k, n), jnp.bool_),
    )
    step = odometry.make_chunked_step(config)
    exp = jexport.export(step, platforms=platforms)(*args)
    return exp.serialize()


def save_step(path, config, platforms=None, chunk: int = 0) -> None:
    """Export + write the artifact (atomic, with engine-geometry metadata).

    `chunk` > 0 exports the K-frame chunked step (the production shape)
    instead of the per-frame one; the chunk size is recorded in the
    metadata (`aot_chunk`, 0 = per-frame)."""
    if chunk > 0:
        blob = export_chunked_step(config, chunk, platforms=platforms)
    else:
        blob = export_step(config, platforms=platforms)
    meta = dict(_metadata(config), aot_format_version=FORMAT_VERSION,
                max_points_per_frame=int(config.engine.max_points_per_frame),
                aot_chunk=int(chunk))
    path = Path(path)
    tmp = path.with_name(path.name + f".{os.getpid()}.tmp.npz")
    np.savez_compressed(
        tmp,
        exported=np.frombuffer(blob, dtype=np.uint8),
        metadata_json=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )
    os.replace(tmp, path)


def load_step(path):
    """Load an artifact written by `save_step`.

    Returns `(step_fn, metadata)`: `step_fn(state, points, timestamps,
    valid) -> (state, FrameResult)` is the frozen program (jit-wrapped call
    of the deserialized export — no re-tracing of framework code), and
    `metadata` echoes the engine geometry it was built for. Feed it states
    from `odometry.init_state` built with the SAME geometry (or a matching
    checkpoint)."""
    _register_types()
    with np.load(Path(path)) as data:
        blob = bytes(data["exported"])
        meta = json.loads(bytes(data["metadata_json"]).decode())
    if meta.get("aot_format_version") != FORMAT_VERSION:
        raise ValueError(
            f"AOT artifact {path} has format "
            f"{meta.get('aot_format_version')}, expected {FORMAT_VERSION}"
        )
    exp = jexport.deserialize(blob)
    return jax.jit(exp.call), meta
