"""Odometry state checkpoint / resume.

The reference has no mid-run persistence of any kind (SURVEY.md section 5:
"Checkpoint / resume: none"; outputs are written once at the end of a run,
python/kiss_icp/pipeline.py:115-169). On TPU the entire odometry state is a
fixed-shape device pytree — pose, constant-velocity delta, threshold
scalars, and the voxel-map tensors — which makes exact save/resume cheap
and simple. That enables things the reference cannot do: warm-starting a
streaming node with a prebuilt local map, splitting a very long sequence
across jobs, and crash recovery at sensor rate.

Format: one ``.npz`` holding the flattened pytree leaves (``leaf_0`` ...)
plus a JSON metadata record of the map geometry. Loading validates every
leaf's shape and dtype against a template built from the target config and
fails loudly on mismatch (a checkpoint is only valid for the engine
capacities it was produced with — fixed shapes are the price of one XLA
program).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np

FORMAT_VERSION = 1


def _metadata(config) -> dict:
    e = config.engine
    return {
        "format_version": FORMAT_VERSION,
        "voxel_size": float(config.mapping.voxel_size),
        "max_points_per_voxel": int(config.mapping.max_points_per_voxel),
        "map_capacity_log2": int(e.map_capacity_log2),
        "map_storage": str(e.map_storage),
        "probe_length": int(e.probe_length),
        # Slot layout + state pytree differ between the single-device and
        # map-sharded engines (voxels hash to shards, then to home buckets
        # within a shard) — a checkpoint is only loadable by the engine
        # geometry that wrote it.
        "map_shards": int(getattr(e, "map_shards", 1)),
    }


def save_state(path, state) -> None:
    """Write an :class:`~kiss_icp_tpu.odometry.OdometryState` to ``path``.

    The state is materialized on the host (one d2h transfer of the map
    tensors) and stored compressed; a 2^18-slot f32 map is ~60 MB raw and
    compresses well while the map is far from full.

    The file lands at EXACTLY ``path`` (numpy's savez would silently append
    '.npz' to a suffixless name, which `load_checkpoint(path)` then cannot
    find).
    """
    _atomic_write(path, _state_arrays(state))


def _state_arrays(state) -> dict:
    leaves = jax.tree_util.tree_leaves(state)
    return {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}


def _atomic_write(path, arrays: dict) -> None:
    """ONE copy of the atomic-write protocol (tmp name ending in .npz so
    savez keeps it, then rename): a crash mid-write — the very scenario
    periodic checkpoints exist for — never leaves a truncated file, and a
    future hardening (e.g. fsync) lands in both save paths at once."""
    path = Path(path)
    tmp = path.with_name(path.name + f".{os.getpid()}.tmp.npz")
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def save_checkpoint(path, state, config, extras=None) -> None:
    """`save_state` plus a metadata record used for mismatch diagnostics.

    `extras`: optional {name: array} of engine-side host state stored
    alongside the device pytree (namespaced ``extra_<name>`` so the leaf
    count validation ignores them) — e.g. the rolling world origin. Read
    back with :func:`load_extra`.
    """
    arrays = _state_arrays(state)
    arrays["metadata_json"] = np.frombuffer(
        json.dumps(_metadata(config)).encode(), dtype=np.uint8
    )
    for name, value in (extras or {}).items():
        arrays[f"extra_{name}"] = np.asarray(value)
    _atomic_write(path, arrays)


def load_extra(path, name, default=None):
    """An ``extras`` array stored by :func:`save_checkpoint`, or `default`
    when the checkpoint predates the field (older format versions stay
    loadable)."""
    with np.load(Path(path)) as data:
        key = f"extra_{name}"
        return data[key] if key in data.files else default


def load_checkpoint(path, config, template=None):
    """Load an odometry state saved by :func:`save_checkpoint` /
    :func:`save_state`, validated against ``config``.

    Returns a host-side pytree with the exact structure of
    ``odometry.init_state(config)`` — or of ``template`` when given (the
    map-sharded engine passes its ShardedMapState so shapes/dtypes validate
    against the sharded layout). Pass it straight into the jitted step
    (JAX moves it to the device on first use).

    Raises ``ValueError`` when the checkpoint was produced under different
    engine capacities / map storage / shard count than ``config`` describes.
    """
    from kiss_icp_tpu.odometry import init_state

    path = Path(path)
    with np.load(path) as data:
        saved_meta = None
        if "metadata_json" in data:
            saved_meta = json.loads(bytes(data["metadata_json"]).decode())
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [data[f"leaf_{i}"] for i in range(n)]

    if template is None:
        template = init_state(config)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if saved_meta is not None:
        want = _metadata(config)
        # Keys added to the metadata record AFTER a checkpoint was written
        # must not invalidate it: compare against the value the writer's
        # engine implicitly had (its schema default), not None.
        defaults = {"map_shards": 1}
        mismatches = {
            k: (saved_meta.get(k, defaults.get(k)), want[k])
            for k in want
            if saved_meta.get(k, defaults.get(k)) != want[k]
        }
        if mismatches:
            raise ValueError(
                f"checkpoint {path} was written under a different map "
                f"configuration: {mismatches} (saved, current). Re-run with "
                "the matching config or rebuild the map."
            )
    if len(leaves) == len(t_leaves) - 1:
        # Round-5 migration: VoxelMap gained the num_oob_points counter
        # leaf. A checkpoint is DATA (a built map, a mid-drive resume
        # point) — older files must keep loading, so synthesize the missing
        # counter as zeros at its template position instead of refusing.
        # Identified by path name, not position guessing.
        flat_paths = jax.tree_util.tree_flatten_with_path(template)[0]
        idx = [i for i, (p, _) in enumerate(flat_paths)
               if str(p[-1]).find("num_oob_points") >= 0]
        if len(idx) == 1:
            i = idx[0]
            t_leaf = t_leaves[i]
            filler = np.zeros(tuple(np.shape(t_leaf)),
                              getattr(t_leaf, "dtype", np.int32))
            leaves = leaves[:i] + [filler] + leaves[i:]
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint {path} has {len(leaves)} arrays, expected "
            f"{len(t_leaves)} — produced by an incompatible version?"
        )
    for i, (got, want_leaf) in enumerate(zip(leaves, t_leaves)):
        # The template may be abstract (jax.eval_shape leaves carry
        # .shape/.dtype but cannot be materialized).
        want_shape = tuple(np.shape(want_leaf))
        want_dtype = getattr(want_leaf, "dtype", None)
        if want_dtype is None:
            want_dtype = np.asarray(want_leaf).dtype
        if tuple(got.shape) != want_shape or got.dtype != want_dtype:
            raise ValueError(
                f"checkpoint {path} leaf {i}: shape/dtype "
                f"{got.shape}/{got.dtype} does not match the current config's "
                f"{want_shape}/{want_dtype} (engine capacities must match)."
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)
