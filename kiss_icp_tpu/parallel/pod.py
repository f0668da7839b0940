"""The pod program: B sequences x map sharding on ONE ("seq", "map") mesh.

This is the BASELINE.json scale-out scenario ("all 11 KITTI sequences in
parallel across a pod slice") composed with maps too big to replicate
(VERDICT r2 missing #3): previously batched sequences (parallel/batch.py),
map sharding (parallel/sharded_map.py) and multihost (parallel/multihost.py)
were three disjoint programs on three separately-built meshes; this module
runs them as ONE shard_map over a 2-axis mesh.

Layout. Mesh ("seq", "map") with extents (S, D); B sequences total. Device
(s, d) holds, for each of its Lb = B/S local sequences, shard d of that
sequence's voxel map — so the dominant state tensor is 1/(S*D) per device.
Per-sequence pose/threshold state is replicated along "map" (tiny).

Execution. Inside the shard body, local sequences advance SEQUENTIALLY
(`lax.map`), each running its own chunked scan of the map-sharded frame step
(sharded_map.frame_step_shard: ppermute ring NN combine + psum'd normal
equations over "map"). Sequential-local is REQUIRED here for the collective
structure (see the lockstep note below); as a THROUGHPUT argument the
decoupled-trip-count story did not survive measurement — rounds 3/4 A/Bs
of the single-mesh batched program measured vmap lockstep >= lax.map
(BENCH_r04: vmap 1255 vs map 1137 seq-fps; round 3: statistical tie even
with real iteration skew), so the batched program defaults to vmap
(parallel/batch.py seq_mode) and the bench A/Bs both every round:

  * a vmap'ed ICP while_loop runs every sequence to the slowest member's
    iteration count; `lax.map` gives every sequence its own trip count, so
    per-device work is the SUM of per-seq iterations instead of Lb x max —
    but the lockstep coupling loss measures smaller than lax.map's
    serialization on real batches.
  * collectives stay in lockstep: all D members of a seq row scan the same
    local sequences in the same order, and within one sequence the while
    cond is replicated along "map" (psum'd dx), so the ring/psum inside the
    loop match across the row. Rows' collective GROUPS are disjoint, but XLA
    matches collective instances by program point across the whole launch,
    so the GN loop's trip count must still be uniform across rows: the cond
    psums an any-active flag over "seq" and finished rows freeze their state
    while continuing to fire collectives (sync_axis plumbing in
    sharded_map.frame_step_shard / registration.gauss_newton_loop — removing
    it deadlocks the ring rendezvous, measured on the CPU mesh). Within a
    row, `lax.map` still pays per-sequence trip counts, coupled only to the
    slowest ROW, not the slowest of all B sequences.

Multi-host: build the mesh over `jax.devices()` after
`multihost.initialize_from_env` and lay "seq" over DCN (sequences exchange
nothing) and "map" over ICI (the ring rides the fast links) — i.e. the
host dimension must split the "seq" axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry
from kiss_icp_tpu.ops import se3, threshold
from kiss_icp_tpu.parallel import sharded_map
from kiss_icp_tpu.parallel.sharded_map import (
    MAP_AXIS,
    ShardedMapState,
    ShardFrameResult,
)

SEQ_AXIS = "seq"


def make_pod_mesh(n_seq: int, n_map: int,
                  devices: Optional[np.ndarray] = None) -> Mesh:
    """A ("seq", "map") mesh of n_seq x n_map devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)[: n_seq * n_map].reshape(n_seq, n_map)
    return Mesh(devices, (SEQ_AXIS, MAP_AXIS))


class PodState(NamedTuple):
    """B sequences' odometry state on the ("seq", "map") mesh.

    Leading axis of every leaf is the global sequence axis B (sharded over
    "seq"); map leaves additionally shard their slot axis over "map". Same
    field meaning as sharded_map.ShardedMapState.
    """

    pose: jnp.ndarray  # (B, 4, 4)
    delta: jnp.ndarray  # (B, 4, 4)
    threshold: threshold.ThresholdState  # leaves (B, ...)
    vkeys: jnp.ndarray  # (B, C, 3)
    fprints: jnp.ndarray  # (B, C)
    counts: jnp.ndarray  # (B, C)
    points: jnp.ndarray  # (B, C, P, 3)
    total_points: jnp.ndarray  # (B, D)
    num_dropped_voxels: jnp.ndarray  # (B, D)
    num_oob_points: jnp.ndarray  # (B, D)


def pod_state_specs() -> PodState:
    rep = P(SEQ_AXIS)
    shd = P(SEQ_AXIS, MAP_AXIS)
    return PodState(
        pose=rep, delta=rep,
        threshold=threshold.ThresholdState(rep, rep, rep),
        vkeys=shd, fprints=shd, counts=shd, points=shd,
        total_points=shd, num_dropped_voxels=shd, num_oob_points=shd,
    )


def init_pod_state(config: KISSConfig, mesh: Mesh, batch: int) -> PodState:
    """Fresh state for `batch` sequences, placed sharded on the mesh."""
    s = mesh.shape[SEQ_AXIS]
    d = mesh.shape[MAP_AXIS]
    if batch % s:
        raise ValueError(f"batch {batch} must divide over the seq axis {s}")
    mcfg = odometry.map_config(config)
    c, p = mcfg.capacity, mcfg.max_points_per_voxel
    b = batch

    def put(x, spec):
        # make_array_from_callback instead of device_put: every process
        # materializes only its addressable shards, so the same init code
        # serves single-process meshes AND multi-host launches where the
        # "seq" axis spans processes (each host holds 1/S of the state).
        sh = NamedSharding(mesh, spec)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    thr = threshold.init_state(config.adaptive_threshold.initial_threshold)
    thr_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b,) + jnp.shape(x)), thr
    )
    return PodState(
        pose=put(eye, P(SEQ_AXIS)),
        delta=put(eye, P(SEQ_AXIS)),
        threshold=jax.tree.map(lambda x: put(x, P(SEQ_AXIS)), thr_b),
        vkeys=put(jnp.zeros((b, c, 3), jnp.int32), P(SEQ_AXIS, MAP_AXIS)),
        fprints=put(jnp.zeros((b, c), jnp.int32), P(SEQ_AXIS, MAP_AXIS)),
        counts=put(jnp.zeros((b, c), jnp.int32), P(SEQ_AXIS, MAP_AXIS)),
        points=put(jnp.zeros((b, c, p, 3), mcfg.point_dtype),
                   P(SEQ_AXIS, MAP_AXIS)),
        total_points=put(jnp.zeros((b, d), jnp.int32), P(SEQ_AXIS, MAP_AXIS)),
        num_dropped_voxels=put(jnp.zeros((b, d), jnp.int32),
                               P(SEQ_AXIS, MAP_AXIS)),
        num_oob_points=put(jnp.zeros((b, d), jnp.int32),
                           P(SEQ_AXIS, MAP_AXIS)),
    )


# PodState is ShardedMapState with a leading sequence axis on every leaf —
# the fields are identical by construction, so the per-sequence view and its
# inverse are positional splats (a field added to one class without the
# other now fails loudly here instead of silently desynchronizing two
# hand-maintained copy lists — code-review r4c). An explicit raise, not
# `assert`: `python -O` strips asserts, and this guard protects runtime
# state integrity (advisor r4).
if PodState._fields != ShardedMapState._fields:  # pragma: no cover
    raise ImportError(
        "PodState and ShardedMapState field lists diverged: "
        f"{PodState._fields} vs {ShardedMapState._fields}; the positional "
        "splats in _per_seq_state/_to_pod_state require exact parity"
    )


def _per_seq_state(state: PodState) -> ShardedMapState:
    """View one local sequence's leaves (no leading axis) as the
    single-sequence ShardedMapState that frame_step_shard expects."""
    return ShardedMapState(*state)


def _to_pod_state(s: ShardedMapState) -> PodState:
    return PodState(*s)


def make_pod_chunked_step(config: KISSConfig, mesh: Mesh):
    """Compile a (B sequences) x (K frames) pod advance in one execution.

    Returns `step(state, points (B,K,N,3), timestamps (B,K,N),
    valid (B,K,N)) -> (state, ShardFrameResult with leading (B, K) axes)`.
    Scan inputs are sharded over "seq" and replicated over "map".
    """
    n_map = mesh.shape[MAP_AXIS]
    # Per-shard map config: slots divided over "map" only (each sequence has
    # its own full-capacity map, split D ways).
    mcfg_local = sharded_map.local_map_config(
        config, Mesh(np.asarray(mesh.devices).reshape(-1)[:n_map],
                     (MAP_AXIS,)),
    )

    def shard_body(state: PodState, points, timestamps, valid):
        # Local shapes: state leaves (Lb, C/D, ...), points (Lb, K, N, 3).
        def one_seq(args):
            st, pts, ts, vd = args

            def frame(s, inp):
                p, t, v = inp
                return sharded_map.frame_step_shard(
                    config, mcfg_local, n_map, s, p, t, v,
                    sync_axis=SEQ_AXIS,
                )

            st2, results = jax.lax.scan(frame, _per_seq_state(st),
                                        (pts, ts, vd))
            return _to_pod_state(st2), results

        return jax.lax.map(one_seq, (state, points, timestamps, valid))

    rep_data = P(SEQ_AXIS)  # (B, K, N, ...) — B over seq, rest replicated
    res_specs = jax.tree.map(lambda _: P(SEQ_AXIS),
                             sharded_map.result_specs())
    mapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(pod_state_specs(), rep_data, rep_data, rep_data),
        out_specs=(pod_state_specs(), res_specs),
    )
    return jax.jit(mapped, donate_argnums=(0,)
                   if config.engine.donate_state else ())


class PodOdometry:
    """Host-side wrapper: B sequences, maps sharded, one device program.

    numpy scans in, (B, K, 4, 4) poses out. The product surface of the
    composed pod program (config knob: engine.map_shards plus a sequence
    batch), mirroring odometry.KissICP's chunked API.
    """

    def __init__(self, config: KISSConfig, batch: int, mesh: Optional[Mesh] = None,
                 n_map: Optional[int] = None):
        if mesh is None:
            n_dev = len(jax.devices())
            d = n_map if n_map else max(1, int(config.engine.map_shards))
            mesh = make_pod_mesh(max(1, n_dev // d), d)
        self.config = config
        self.mesh = mesh
        self.batch = batch
        self._step = make_pod_chunked_step(config, mesh)
        self.state = init_pod_state(config, mesh, batch)
        self._cap = int(config.engine.max_points_per_frame)
        self.last_results: Optional[ShardFrameResult] = None
        self.last_input_dropped = 0
        self.total_input_dropped = 0

    def register_chunks(self, frames, timestamps=None) -> np.ndarray:
        """frames: list of B lists of K (N_i, 3) scans. Returns (B, K, 4, 4).

        Oversized scans are stride-subsampled (same semantics and drop
        accounting as KissICP._pad — head-truncation would angularly bias an
        azimuth-ordered scan); losses accumulate in `total_input_dropped`.
        """
        b = len(frames)
        assert b == self.batch, (b, self.batch)
        k = len(frames[0])
        if any(len(seq) != k for seq in frames):
            raise ValueError(
                f"all sequences must supply the same chunk length; got "
                f"{[len(seq) for seq in frames]} (pad short sequences with "
                "empty scans or trim to the shortest)"
            )
        cap = self._cap
        pts = np.zeros((b, k, cap, 3), np.float32)
        ts = np.zeros((b, k, cap), np.float32)
        valid = np.zeros((b, k, cap), bool)
        self.last_input_dropped = 0
        for i in range(b):
            for j in range(k):
                t = None if timestamps is None else timestamps[i][j]
                f, t, dropped = odometry.subsample_to_capacity(
                    frames[i][j], t, cap)
                self.last_input_dropped += dropped
                n = len(f)
                pts[i, j, :n] = f[:, :3]
                valid[i, j, :n] = True
                if t is not None and len(t) == n:
                    ts[i, j, :n] = t
        self.total_input_dropped += self.last_input_dropped
        self.state, results = self._step(self.state, pts, ts, valid)
        self.last_results = results
        return np.asarray(results.pose)

    @property
    def poses(self) -> np.ndarray:
        return np.asarray(self.state.pose)
