"""Multi-device execution: batched multi-sequence odometry over a device mesh.

The reference has no distributed execution at all (SURVEY.md section 2.2); its
only parallelism is intra-frame TBB threading. The TPU-native scale-out plan:

  * **Sequence axis ("seq")** — many independent sequences advance in lockstep,
    one `vmap`-ed odometry step per frame; the batch axis is sharded across
    devices (pure data parallelism over ICI/DCN; no collectives in the hot
    path). This is the "Batched multi-sequence odometry" scenario of
    BASELINE.json (all 11 KITTI sequences in parallel on a pod slice).
  * **Point axis ("pts")** — within each frame, the padded point buffers are
    sharded; the per-point (JTJ, JTr) contraction in
    `registration.build_linear_system` becomes partial sums that XLA's SPMD
    partitioner combines with a psum over the "pts" axis (the TPU equivalent of
    the reference's tbb::parallel_reduce, Registration.cpp:101-118). The voxel
    map is replicated along "pts", so NN gathers stay device-local.

Everything is expressed with `jax.sharding.NamedSharding` annotations on one
jitted program — XLA inserts the collectives. Tested on a virtual 8-device CPU
mesh (tests/conftest.py) and dry-run compiled by `__graft_entry__.py`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry

SEQ_AXIS = "seq"
PTS_AXIS = "pts"


def make_mesh(n_devices: Optional[int] = None, pts_shards: Optional[int] = None) -> Mesh:
    """A ("seq", "pts") mesh over the available devices.

    The "pts" extent defaults to 1 (pure sequence parallelism) unless asked
    for; sequence parallelism is collective-free, so it gets the larger axis.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if pts_shards is None:
        pts_shards = 1
    assert n_devices % pts_shards == 0, (n_devices, pts_shards)
    grid = devices.reshape(n_devices // pts_shards, pts_shards)
    return Mesh(grid, (SEQ_AXIS, PTS_AXIS))


def init_batched_state(config: KISSConfig, batch: int) -> odometry.OdometryState:
    """Per-sequence odometry states stacked on a leading batch axis."""
    one = odometry.init_state(config)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), one)


def batched_state_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of a batched OdometryState: batch axis over "seq"; map contents
    replicated over "pts" so NN gathers stay device-local. Every state leaf has
    the batch axis leading, so one sharding serves the whole pytree."""
    return NamedSharding(mesh, P(SEQ_AXIS))


def make_batched_step(config: KISSConfig, mesh: Mesh):
    """Compile one lockstep frame-advance for B sequences on the mesh.

    Returns `step(state, points (B,N,3), timestamps (B,N), valid (B,N))
    -> (state, FrameResult)` with inputs sharded (seq, pts) and state sharded
    over seq. B must be divisible by the mesh's "seq" extent and N by its
    "pts" extent.
    """
    vstep = jax.vmap(functools.partial(odometry.register_frame, config))

    state_sh = NamedSharding(mesh, P(SEQ_AXIS))
    points_sh = NamedSharding(mesh, P(SEQ_AXIS, PTS_AXIS))
    seq_sh = NamedSharding(mesh, P(SEQ_AXIS))

    def _constrain(state, points, timestamps, valid):
        state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, state_sh), state
        )
        points = jax.lax.with_sharding_constraint(points, points_sh)
        timestamps = jax.lax.with_sharding_constraint(timestamps, points_sh)
        valid = jax.lax.with_sharding_constraint(valid, points_sh)
        new_state, result = vstep(state, points, timestamps, valid)
        new_state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, state_sh), new_state
        )
        return new_state, result

    return jax.jit(
        _constrain,
        in_shardings=(state_sh, points_sh, points_sh, points_sh),
        out_shardings=(state_sh, seq_sh),
        donate_argnums=(0,) if config.engine.donate_state else (),
    )


def make_batched_chunked_step(config: KISSConfig, mesh: Optional[Mesh] = None,
                              seq_mode: str = "vmap"):
    """Compile a (B sequences) x (K frames) advance in ONE device execution.
    This is the pod-throughput program (BASELINE "all sequences in
    parallel"): per-execution host overhead is paid once per B*K
    sequence-frames, and the batch axis shards over the mesh's "seq" axis
    when one is given.

    Returns `step(state, points (K,B,N,3), timestamps (K,B,N), valid (K,B,N))
    -> (state, poses (K,B,4,4))`.

    `seq_mode` picks how the sequence axis is laid onto ONE device:
      * "vmap"  — all B sequences advance in lockstep; the ICP while_loop
        runs every sequence to the slowest member's trip count (per-frame
        cost = max over sequences). Best when a single sequence underfills
        the chip and iteration counts are uniform.
      * "map"   — `lax.map` over sequences: each runs its own scan over the
        frame axis with its OWN trip count, so per-chunk device work is the
        SUM of per-sequence iterations rather than K x max. This is the
        break-even-by-construction formulation (round-2 measured the vmap
        coupling costing ~12-25% at B=4); the pod program
        (parallel/pod.py) uses the same layout per mesh row.
    "map" is single-device only — on a mesh the batch axis must stay vmapped
    for the partitioner (use parallel/pod.py for mesh-level decoupling).
    """
    if seq_mode not in ("vmap", "map"):
        raise ValueError(f"unknown seq_mode {seq_mode!r}")
    if seq_mode == "map" and mesh is not None:
        raise ValueError(
            "seq_mode='map' is the single-device program; on a mesh use "
            "parallel/pod.py (per-row decoupling with uniform collectives)")
    vstep = jax.vmap(functools.partial(odometry.register_frame, config))

    def chunk(state, points, timestamps, valid):
        def body(s, inp):
            p, t, v = inp
            s2, res = vstep(s, p, t, v)
            return s2, res.pose

        return jax.lax.scan(body, state, (points, timestamps, valid))

    if seq_mode == "map":
        def chunk_map(state, points, timestamps, valid):
            # (K, B, ...) -> (B, K, ...): one transpose per chunk so each
            # sequence's frames are contiguous for its private scan.
            pb = jnp.swapaxes(points, 0, 1)
            tb = jnp.swapaxes(timestamps, 0, 1)
            vb = jnp.swapaxes(valid, 0, 1)

            def one_seq(args):
                st, p, t, v = args

                def body(s, inp):
                    s2, res = odometry.register_frame(config, s, *inp)
                    return s2, res.pose

                return jax.lax.scan(body, st, (p, t, v))

            state, poses = jax.lax.map(one_seq, (state, pb, tb, vb))
            return state, jnp.swapaxes(poses, 0, 1)

        return jax.jit(
            chunk_map,
            donate_argnums=(0,) if config.engine.donate_state else (),
        )

    if mesh is not None:
        state_sh = NamedSharding(mesh, P(SEQ_AXIS))
        data_sh = NamedSharding(mesh, P(None, SEQ_AXIS, PTS_AXIS))
        out_sh = NamedSharding(mesh, P(None, SEQ_AXIS))

        def sharded(state, points, timestamps, valid):
            state = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, state_sh), state
            )
            state, poses = chunk(state, points, timestamps, valid)
            state = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, state_sh), state
            )
            return state, poses

        return jax.jit(
            sharded,
            in_shardings=(state_sh, data_sh, data_sh, data_sh),
            out_shardings=(state_sh, out_sh),
            donate_argnums=(0,) if config.engine.donate_state else (),
        )
    return jax.jit(
        chunk, donate_argnums=(0,) if config.engine.donate_state else ()
    )


class BatchedOdometry:
    """Host-side convenience wrapper: run B sequences in lockstep.

    numpy in/out like `odometry.KissICP`, but one device dispatch advances all
    sequences one frame.
    """

    def __init__(self, config: KISSConfig, batch: int, mesh: Optional[Mesh] = None):
        self.config = config
        self.batch = batch
        self.mesh = mesh if mesh is not None else make_mesh()
        self._step = make_batched_step(config, self.mesh)
        self.state = jax.device_put(
            init_batched_state(config, batch), NamedSharding(self.mesh, P(SEQ_AXIS))
        )
        self._cap = int(config.engine.max_points_per_frame)
        self.last_input_dropped = 0
        self.total_input_dropped = 0

    def register_frames(self, frames, timestamps=None) -> np.ndarray:
        """frames: list of B (N_i, 3) scans. Returns (B, 4, 4) poses.

        Oversized scans are stride-subsampled with drop accounting
        (odometry.subsample_to_capacity — head truncation would angularly
        bias an azimuth-ordered scan)."""
        assert len(frames) == self.batch
        pts = np.zeros((self.batch, self._cap, 3), np.float32)
        ts = np.zeros((self.batch, self._cap), np.float32)
        valid = np.zeros((self.batch, self._cap), bool)
        self.last_input_dropped = 0
        for i, f in enumerate(frames):
            t = None if timestamps is None else timestamps[i]
            f, t, dropped = odometry.subsample_to_capacity(f, t, self._cap)
            self.last_input_dropped += dropped
            n = len(f)
            pts[i, :n] = f[:, :3]
            valid[i, :n] = True
            if t is not None and len(t) == n:
                ts[i, :n] = np.asarray(t)
        self.total_input_dropped += self.last_input_dropped
        self.state, result = self._step(self.state, pts, ts, valid)
        return np.asarray(result.pose)

    @property
    def poses(self) -> np.ndarray:
        return np.asarray(self.state.pose)
