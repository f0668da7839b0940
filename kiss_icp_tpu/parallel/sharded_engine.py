"""Product wrapper for map-sharded odometry: `engine.map_shards > 1`.

`ShardedKissICP` is a drop-in `odometry.KissICP` (same host API: numpy scans
in, numpy poses out, chunked mode, overflow counters, checkpoints) backed by
the map-sharded device program (parallel/sharded_map.py): the voxel map's
slot tensor is split over a ("map",) mesh of `engine.map_shards` devices, NN
answers ring-combine over `ppermute`, and the Gauss-Newton normal equations
reduce with `psum` — so per-device map memory is 1/D of the single-device
engine while the trajectory matches it (tests/test_sharded_engine.py).

Selection is a config knob, not an API: `odometry.create_odometry(config)`
(used by the pipeline/CLI) returns this class when `engine.map_shards > 1`.
The reference has no analog — its local map lives in one robin_map on one
host (VoxelHashMap.hpp:38-57); this is the TPU-native scale-out of it.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry
from kiss_icp_tpu.ops import hash_map
from kiss_icp_tpu.parallel import sharded_map
from kiss_icp_tpu.parallel.sharded_map import MAP_AXIS


def make_map_mesh(config: KISSConfig) -> Mesh:
    """A ("map",) mesh of engine.map_shards devices (validated)."""
    d = int(config.engine.map_shards)
    devices = jax.devices()
    if d < 2:
        raise ValueError(f"map_shards must be >= 2 for the sharded engine, got {d}")
    if len(devices) < d:
        raise ValueError(
            f"engine.map_shards={d} but only {len(devices)} device(s) are "
            f"visible — shrink map_shards or run on a larger slice."
        )
    return Mesh(np.asarray(devices[:d]), (MAP_AXIS,))


class ShardedKissICP(odometry.KissICP):
    """KissICP with the local map sharded over `engine.map_shards` devices.

    Everything host-side (padding, truncation accounting, lazy dispatch,
    chunked mode) is inherited; only the device program and the state pytree
    differ. The per-frame step returns the deskewed frame + ICP source like
    the single-device FrameResult, so the visualizer path works unchanged.
    """

    def __init__(self, config: KISSConfig, mesh: Mesh = None):
        self._mesh = mesh if mesh is not None else make_map_mesh(config)
        super().__init__(config)

    @property
    def mesh(self) -> Mesh:
        return self._mesh

    def _build(self) -> None:
        self._step = sharded_map.make_map_sharded_step(
            self.config, self._mesh, with_points=True
        )
        self.state = sharded_map.init_sharded_state(self.config, self._mesh)

    def _make_chunk_step(self):
        return sharded_map.make_map_sharded_chunked_step(self.config, self._mesh)

    def _summary_poses(self, summary):
        # ShardFrameResult's stacked pose leaf is named `pose`.
        return summary.pose

    def load_checkpoint(self, path) -> None:
        """Restore a state saved by `save_checkpoint`, re-placing every leaf
        on this engine's mesh with its original sharding.

        The shape/sharding template is abstract (`jax.eval_shape`) — on an
        engine whose point is maps too big to replicate, materializing a
        second full sharded state just to read shapes would transiently
        double per-device map memory during a warm start."""
        from jax.sharding import NamedSharding

        from kiss_icp_tpu.io import checkpoint

        template = jax.eval_shape(
            lambda: sharded_map.init_sharded_state(self.config, self._mesh))
        shardings = jax.tree.map(
            lambda spec: NamedSharding(self._mesh, spec),
            sharded_map.state_specs())
        host = checkpoint.load_checkpoint(path, self.config,
                                          template=template)
        self.state = jax.tree.map(
            lambda h, s: jax.device_put(np.asarray(h), s),
            host, shardings,
        )
        # The rolling world origin travels with the checkpoint (same
        # contract as KissICP.load_checkpoint — a warm start from a
        # re-based drive must keep reporting continuous world poses, and
        # a stale origin from this engine's own past must not survive).
        self.origin = np.asarray(
            checkpoint.load_extra(path, "origin", np.zeros(3)), np.float64)

    def local_map_points(self) -> np.ndarray:
        """World-frame dump of the sharded map (reference Pointcloud(),
        VoxelHashMap.cpp:72-81) — gathers the global slot tensors to the
        host; for visualization/tests, not the hot path."""
        mcfg = odometry.map_config(self.config)
        m = hash_map.VoxelMap(
            vkeys=self.state.vkeys,
            fprints=self.state.fprints,
            counts=self.state.counts,
            points=self.state.points,
            total_points=jnp.sum(self.state.total_points).astype(jnp.int32),
            num_dropped_voxels=jnp.sum(
                self.state.num_dropped_voxels).astype(jnp.int32),
            num_oob_points=jnp.sum(
                self.state.num_oob_points).astype(jnp.int32),
        )
        pts, mask = hash_map.extract_points(mcfg, m)
        out = np.asarray(pts, np.float64)[np.asarray(mask)]
        out += self.origin
        return out

    def _apply_rebase(self, shift_vox: np.ndarray) -> None:
        """Cross-shard rolling-origin re-base (see hash_map.rebase for the
        single-device contract). Shifted keys re-hash to DIFFERENT owning
        shards (sharded_map.shard_of hashes the key), so the rebuild is a
        cross-shard exchange; at re-base cadence — once per
        `rebase_trigger_voxels` of travel, kilometers apart — a host
        round-trip of the map tensors is simpler and safer than a device
        all-gather that would transiently materialize the full map on every
        device of an engine whose purpose is maps too big per device.

        Placement is deterministic (ascending old global slot order mirrors
        the device claim rounds' lowest-row-wins) and preserves u16 payload
        rows bit-exactly (voxel-relative offsets are shift-invariant)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mcfg_local = sharded_map.local_map_config(self.config, self._mesh)
        d = self._mesh.shape[MAP_AXIS]
        cl, k = mcfg_local.capacity, mcfg_local.probe_length
        v = float(mcfg_local.voxel_size)

        vkeys = np.asarray(self.state.vkeys)
        counts = np.asarray(self.state.counts)
        points = np.asarray(self.state.points)
        new_keys = vkeys - shift_vox[None, :].astype(np.int32)
        if mcfg_local.storage == "f32":
            points = points - (shift_vox.astype(np.float32) * np.float32(v))[
                None, None, :]
        live_idx = np.flatnonzero(counts > 0)
        keys_live = new_keys[live_idx]
        shard = np.asarray(sharded_map.shard_of(jnp.asarray(keys_live), d))
        fp = np.asarray(hash_map.fingerprint(jnp.asarray(keys_live)))
        rows = np.asarray(hash_map.window_row(
            jnp.asarray(keys_live), mcfg_local.capacity_log2, k))

        # Vectorized deterministic placement (code-review r5: the previous
        # per-voxel Python loop was an O(live) interpreter stall on the
        # engine built for big maps). Semantics identical to sequential
        # placement in ascending old-slot order:
        #   * within a window, survivors take free slots in old-slot order
        #     (rank = position within the (shard,row) group);
        #   * a voxel whose window already holds an EARLIER voxel with the
        #     same fingerprint drops (shadow pair — all but the first of
        #     each (window, fp) run);
        #   * rank >= probe_length drops (window overflow).
        win = shard.astype(np.int64) * (cl // k) + rows.astype(np.int64)
        n_live = len(live_idx)
        pos = np.arange(n_live)
        # Shadow detection: first-by-pos of each (window, fp) survives.
        order_fp = np.lexsort((pos, fp, win))
        w_s, f_s = win[order_fp], fp[order_fp]
        dup_sorted = np.concatenate(
            [[False], (w_s[1:] == w_s[:-1]) & (f_s[1:] == f_s[:-1])])
        shadowed = np.zeros(n_live, bool)
        shadowed[order_fp] = dup_sorted
        # Rank among survivors within each window, in old-slot order.
        order_w = np.lexsort((pos, win))
        w_o = win[order_w]
        surv_o = (~shadowed)[order_w].astype(np.int64)
        csum = np.cumsum(surv_o)
        head = np.concatenate([[True], w_o[1:] != w_o[:-1]])
        seg_base = np.zeros(n_live, np.int64)
        seg_base[head] = csum[head] - surv_o[head]
        seg_base = np.maximum.accumulate(
            np.where(head, seg_base, np.int64(-1)))
        rank_o = csum - surv_o - seg_base
        rank = np.empty(n_live, np.int64)
        rank[order_w] = rank_o
        placed = ~shadowed & (rank < k)
        slots = win * k + rank  # global slot = (shard*cl/k + row)*k + rank

        out_vkeys = np.zeros_like(vkeys)
        out_fp = np.zeros(d * cl, np.int32)
        out_counts = np.zeros(d * cl, np.int32)
        out_points = np.zeros_like(points)
        src = live_idx[placed]
        dst = slots[placed]
        out_fp[dst] = fp[placed]
        out_vkeys[dst] = keys_live[placed]
        out_counts[dst] = counts[src]
        out_points[dst] = points[src]
        totals = np.bincount(shard[placed], weights=counts[src],
                             minlength=d).astype(np.int64)
        dropped = int(n_live - placed.sum())

        pose = np.asarray(self.state.pose, np.float64)
        pose[:3, 3] -= shift_vox.astype(np.float64) * v
        old_drops = np.asarray(self.state.num_dropped_voxels).copy()
        old_drops[0] += dropped

        def put(x, spec):
            return jax.device_put(np.asarray(x),
                                  NamedSharding(self._mesh, spec))

        self.state = self.state._replace(
            pose=put(pose.astype(np.float32), P()),
            vkeys=put(out_vkeys, P(MAP_AXIS)),
            fprints=put(out_fp, P(MAP_AXIS)),
            counts=put(out_counts, P(MAP_AXIS)),
            points=put(out_points, P(MAP_AXIS)),
            total_points=put(totals.astype(np.int32), P(MAP_AXIS)),
            num_dropped_voxels=put(old_drops, P(MAP_AXIS)),
        )
        return dropped

    def shard_occupancy(self) -> np.ndarray:
        """(D,) live-voxel count per shard — load-balance diagnostic."""
        return np.asarray(
            sharded_map.shard_live_voxels(
                self.state, self._mesh.shape[MAP_AXIS]
            )
        )
