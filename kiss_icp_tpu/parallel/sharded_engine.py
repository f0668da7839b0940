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
        )
        pts, mask = hash_map.extract_points(mcfg, m)
        return np.asarray(pts)[np.asarray(mask)]

    def shard_occupancy(self) -> np.ndarray:
        """(D,) live-voxel count per shard — load-balance diagnostic."""
        return np.asarray(
            sharded_map.shard_live_voxels(
                self.state, self._mesh.shape[MAP_AXIS]
            )
        )
