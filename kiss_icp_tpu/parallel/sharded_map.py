"""Map-sharded odometry: the voxel map's slots split across a device mesh axis.

Scale-out beyond one device's HBM (SURVEY.md section 7 step 7, the roadmap in
docs/ARCHITECTURE.md "Map sharding with voxel halos"): each device owns
`capacity / D` slots of the local map, so the dominant state tensor — the
`(capacity, max_points_per_voxel, 3)` point store — shrinks D-fold per device.

Sharding rule. A voxel belongs to the shard given by the LOW log2(D) bits of
its mixed spatial hash; home buckets inside a shard use the TOP bits
(`ops/hash_map.window_row`), so the two index sets are independent and every
shard-local table keeps the global load factor. Hash sharding balances load
perfectly (no spatial hot spots as the sensor moves) at the price that the 27
query neighbors (reference VoxelHashMap.cpp:35-41) scatter across all shards
— so instead of a spatial one-voxel halo, the "halo exchange" generalizes to
a ring combine of per-shard nearest-neighbor candidates:

  1. every device answers all queries against its own map shard
     (`hash_map.query_nearest`; misses for voxels it does not own),
  2. the per-query (distance, neighbor, shard) candidates rotate around the
     mesh axis with `jax.lax.ppermute`, min-combining at every hop
     (D-1 hops; ties broken by shard id so all devices agree bit-exactly),
  3. the Gauss-Newton normal equations are built on a 1/D stripe of the
     correspondences per device and reduced with `jax.lax.psum` — the
     distributed form of the reference's tbb::parallel_reduce
     (Registration.cpp:101-118, SURVEY.md section 2.2 P3).

Everything else (deskew, double downsample, threshold, pose update) runs
replicated: those ops are deterministic, so every device computes identical
values without communication.

Tested on the virtual 8-device CPU mesh against the single-device pipeline
(pose parity + per-device memory assertion), and exercised by
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry
from kiss_icp_tpu.ops import (ground, hash_map, preprocess, registration,
                              se3, threshold, voxel)
from kiss_icp_tpu.ops.hash_map import _hash_coords  # sharding uses the same mix

MAP_AXIS = "map"


class ShardedMapState(NamedTuple):
    """Odometry state with the map sharded over a mesh axis.

    Map leaves have their global (2^capacity_log2) slot extent on axis 0 and
    are sharded over `MAP_AXIS`; `total_points` / `num_dropped_voxels` become
    per-shard (D,) vectors. pose/delta/threshold stay replicated.
    """

    pose: jnp.ndarray  # (4, 4)
    delta: jnp.ndarray  # (4, 4)
    threshold: threshold.ThresholdState
    vkeys: jnp.ndarray  # (C, 3)
    fprints: jnp.ndarray  # (C,)
    counts: jnp.ndarray  # (C,)
    points: jnp.ndarray  # (C, P, 3)
    total_points: jnp.ndarray  # (D,) int32 per-shard totals
    num_dropped_voxels: jnp.ndarray  # (D,) int32 per-shard drop counts
    num_oob_points: jnp.ndarray  # (D,) int32 per-shard out-of-envelope points


def _shard_log2(mesh: Mesh) -> int:
    d = mesh.shape[MAP_AXIS]
    if d & (d - 1):
        raise ValueError(f"map axis extent must be a power of two, got {d}")
    return d.bit_length() - 1


def local_map_config(config: KISSConfig, mesh: Mesh) -> hash_map.MapConfig:
    """Per-shard map config: same semantics, 1/D the slots."""
    mcfg = odometry.map_config(config)
    d_log2 = _shard_log2(mesh)
    if mcfg.capacity_log2 <= d_log2:
        raise ValueError("map capacity must exceed the shard count")
    return dataclasses.replace(mcfg, capacity_log2=mcfg.capacity_log2 - d_log2)


def shard_of(coords: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Owning shard of voxel coords (..., 3): low bits of the mixed hash
    (home buckets use the top bits — independent index sets)."""
    return (_hash_coords(coords) & jnp.uint32(n_shards - 1)).astype(jnp.int32)


def init_sharded_state(config: KISSConfig, mesh: Mesh) -> ShardedMapState:
    """Fresh state, map leaves placed sharded over the mesh's map axis."""
    d = mesh.shape[MAP_AXIS]
    mcfg = odometry.map_config(config)
    c, p = mcfg.capacity, mcfg.max_points_per_voxel
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(MAP_AXIS))
    return ShardedMapState(
        pose=jax.device_put(se3.identity(), rep),
        delta=jax.device_put(se3.identity(), rep),
        threshold=jax.device_put(
            threshold.init_state(config.adaptive_threshold.initial_threshold), rep
        ),
        vkeys=jax.device_put(jnp.zeros((c, 3), jnp.int32), shd),
        fprints=jax.device_put(jnp.zeros((c,), jnp.int32), shd),
        counts=jax.device_put(jnp.zeros((c,), jnp.int32), shd),
        # Honor engine.map_storage: create_map (hash_map.py:127) uses
        # cfg.point_dtype; hardcoded f32 here silently defeated u16's
        # halved footprint on the sharded engine (code-review r4c).
        points=jax.device_put(jnp.zeros((c, p, 3), mcfg.point_dtype), shd),
        total_points=jax.device_put(jnp.zeros((d,), jnp.int32), shd),
        num_dropped_voxels=jax.device_put(jnp.zeros((d,), jnp.int32), shd),
        num_oob_points=jax.device_put(jnp.zeros((d,), jnp.int32), shd),
    )


def _ring_min_combine(
    d2: jnp.ndarray, nn: jnp.ndarray, axis: str, n_shards: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global per-query NN from per-shard candidates via a ppermute ring.

    Rotates each shard's original candidates one hop per step (D-1 steps);
    every device min-combines what passes through. Ties break toward the
    lower shard id so all replicas agree bit-exactly.
    """
    sid = jax.lax.axis_index(axis).astype(jnp.int32)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    best_d2, best_nn = d2, nn
    best_sid = jnp.full(d2.shape, sid, jnp.int32)
    recv_d2, recv_nn = d2, nn
    recv_sid = best_sid
    for _ in range(n_shards - 1):
        recv_d2 = jax.lax.ppermute(recv_d2, axis, perm)
        recv_nn = jax.lax.ppermute(recv_nn, axis, perm)
        recv_sid = jax.lax.ppermute(recv_sid, axis, perm)
        take = (recv_d2 < best_d2) | ((recv_d2 == best_d2) & (recv_sid < best_sid))
        best_d2 = jnp.where(take, recv_d2, best_d2)
        best_nn = jnp.where(take[:, None], recv_nn, best_nn)
        best_sid = jnp.where(take, recv_sid, best_sid)
    return best_d2, best_nn


class ShardFrameResult(NamedTuple):
    """Per-frame scalars of a map-sharded step (all replicated across the
    map axis — psum'd or deterministically recomputed on every member), so
    the product pipeline can surface the same health counters as the
    single-device FrameResult (VERDICT r2: per-shard stats were silently
    discarded)."""

    pose: jnp.ndarray  # (4, 4)
    sigma: jnp.ndarray  # ()
    num_iterations: jnp.ndarray  # () int32
    num_correspondences: jnp.ndarray  # () int32 — at convergence
    num_dropped_downsample: jnp.ndarray  # () int32
    num_dropped_map_voxels: jnp.ndarray  # () int32 — summed over shards
    num_oob_points: jnp.ndarray  # () int32 — summed over shards
    used_fallback: jnp.ndarray  # () bool
    # Point outputs for the visualizer / reference register_frame API
    # (kiss_icp.py:43-75 returns (frame, keypoints)). Populated only when the
    # step is built `with_points=True` (per-frame product path); None in the
    # chunked/pod programs, where stacking K x N x 3 buffers would dominate
    # the output payload. None is a structural pytree node, so both variants
    # trace cleanly.
    frame_points: jnp.ndarray = None  # (N, 3) deskewed + cropped frame
    frame_valid: jnp.ndarray = None  # (N,)
    source_points: jnp.ndarray = None  # (S, 3) ICP source (sensor frame)
    source_valid: jnp.ndarray = None  # (S,)


def frame_step_shard(
    config: KISSConfig,
    mcfg_local: hash_map.MapConfig,
    n_shards: int,
    state: ShardedMapState,
    points: jnp.ndarray,
    timestamps: jnp.ndarray,
    valid: jnp.ndarray,
    sync_axis: str = None,
    with_points: bool = False,
) -> Tuple[ShardedMapState, ShardFrameResult]:
    """One odometry frame on one map shard. MUST run inside a shard_map whose
    mesh has the `MAP_AXIS` axis (extent `n_shards`); state leaves carry the
    local 1/n_shards slot extent. Shared by the single-sequence map-sharded
    step below and the composed ("seq", "map") pod program (parallel/pod.py).

    `sync_axis`: when other independent solves share this SPMD program over
    another mesh axis (the pod's "seq"), the ICP loop's trip count must be
    uniform across that axis or the disjoint ring collectives deadlock —
    pass the axis name and the loop runs until every member converges
    (finished members freeze; see registration.gauss_newton_loop).
    """
    vsize = float(config.mapping.voxel_size)
    max_iterations = int(config.registration.max_num_iterations)
    convergence = float(config.registration.convergence_criterion)

    sid = jax.lax.axis_index(MAP_AXIS).astype(jnp.int32)
    m = hash_map.VoxelMap(
        vkeys=state.vkeys,
        fprints=state.fprints,
        counts=state.counts,
        points=state.points,
        total_points=state.total_points[0],
        num_dropped_voxels=state.num_dropped_voxels[0],
        num_oob_points=state.num_oob_points[0],
    )

    # 1.-2. Deskew + crop + double downsample: replicated, deterministic.
    prep = preprocess.preprocess(
        points, timestamps, valid, state.delta,
        max_range=float(config.data.max_range),
        min_range=float(config.data.min_range),
        deskew=bool(config.data.deskew),
    )
    frame_ds = voxel.voxel_downsample(
        prep.points, prep.valid, voxel_size=vsize * 0.5,
        capacity=int(config.engine.frame_capacity),
    )
    source = voxel.voxel_downsample(
        frame_ds.points, frame_ds.valid, voxel_size=vsize * 1.5,
        capacity=int(config.engine.source_capacity),
    )

    # 3.-4. Threshold + constant-velocity guess (replicated).
    fixed = config.adaptive_threshold.fixed_threshold
    sigma = (
        jnp.asarray(float(fixed), jnp.float32)
        if fixed is not None
        else threshold.compute_threshold(state.threshold)
    )
    initial_guess = state.pose @ state.delta
    max_distance = 3.0 * sigma

    # 5. ICP with sharded association + psum'd normal equations.
    guess = initial_guess.astype(jnp.float32)
    n_src = source.points.shape[0]
    my_stripe = (jnp.arange(n_src, dtype=jnp.int32) % n_shards) == sid
    global_empty = jax.lax.psum(m.total_points, MAP_AXIS) == 0

    def query_fn(src):
        q = hash_map.query_nearest(mcfg_local, m, src, source.valid)
        d2, nn = _ring_min_combine(
            jnp.square(q.distances), q.neighbors, MAP_AXIS, n_shards
        )
        return jnp.sqrt(d2), nn

    def reduce_fn(ls):
        return registration.LinearSystem(
            jax.lax.psum(ls.jtj, MAP_AXIS),
            jax.lax.psum(ls.jtr, MAP_AXIS),
            jax.lax.psum(ls.num_correspondences, MAP_AXIS),
        )

    if sync_axis is None:
        any_active_fn = lambda a: a  # noqa: E731
    else:
        def any_active_fn(a):
            return jax.lax.psum(a.astype(jnp.int32), sync_axis) > 0

    t_icp, iters = registration.gauss_newton_loop(
        source.points, source.valid, guess, max_distance, sigma,
        query_fn=query_fn, max_iterations=max_iterations,
        convergence=convergence, reduce_fn=reduce_fn,
        linsys_mask=my_stripe, any_active_fn=any_active_fn,
        unroll=int(config.engine.gn_unroll),
    )
    aligned = t_icp @ guess
    pose_finite = jnp.all(jnp.isfinite(aligned))
    new_pose = jnp.where(global_empty, guess,
                         jnp.where(pose_finite, aligned, guess))
    new_pose = se3.orthonormalize(new_pose)  # see se3.orthonormalize

    # Optional ground-plane attitude stabilization (engine.ground_align —
    # the same shared 5d step as odometry.register_frame, on the same
    # half-voxel downsample). Replicated, deterministic computation: no
    # collectives, every shard applies the identical correction.
    new_pose = ground.maybe_align(config, frame_ds.points, frame_ds.valid,
                                  new_pose)

    # Final correspondence count for diagnostics. Each shard counts its 1/D
    # stripe of the ring-combined result and the psum yields the (replicated)
    # global count — the combined distances are identical on every shard, but
    # only the psum makes that replication checkable (check_vma).
    dist_f, _ = query_fn(se3.transform(new_pose, source.points))
    corr_f = jnp.isfinite(dist_f) & source.valid & (dist_f < max_distance)
    n_corr = jax.lax.psum(
        jnp.sum((corr_f & my_stripe).astype(jnp.int32)), MAP_AXIS
    )

    # 6.-7. Threshold update (replicated).
    model_deviation = se3.inverse(initial_guess) @ new_pose
    new_threshold = threshold.update_model_deviation(
        state.threshold, model_deviation,
        max_range=float(config.data.max_range),
        min_motion_th=float(config.adaptive_threshold.min_motion_th),
    )

    # 8. Insert only the voxels this shard owns, then trim locally.
    world_points = se3.transform(new_pose, frame_ds.points)
    own = shard_of(
        voxel.point_to_voxel(world_points, vsize), n_shards
    ) == sid
    new_map, ins = hash_map.insert(
        mcfg_local, m, world_points, frame_ds.valid & own
    )
    new_map = hash_map.trim(mcfg_local, new_map, new_pose[:3, 3])
    # One stacked psum for both scalar drop counters (a second scalar
    # all-reduce would only add a collective for no payload).
    drops = jax.lax.psum(
        jnp.stack([ins.num_dropped_voxels, ins.num_oob_points]), MAP_AXIS)
    dropped_map, oob_points = drops[0], drops[1]

    new_state = ShardedMapState(
        pose=new_pose,
        delta=se3.inverse(state.pose) @ new_pose,
        threshold=new_threshold,
        vkeys=new_map.vkeys,
        fprints=new_map.fprints,
        counts=new_map.counts,
        points=new_map.points,
        total_points=new_map.total_points.reshape(1),
        num_dropped_voxels=new_map.num_dropped_voxels.reshape(1),
        num_oob_points=new_map.num_oob_points.reshape(1),
    )
    result = ShardFrameResult(
        pose=new_pose,
        sigma=sigma,
        num_iterations=jnp.where(global_empty, 0, iters),
        num_correspondences=n_corr,
        num_dropped_downsample=frame_ds.num_dropped + source.num_dropped,
        num_dropped_map_voxels=dropped_map,
        num_oob_points=oob_points,
        used_fallback=~pose_finite & ~global_empty,
        frame_points=prep.points if with_points else None,
        frame_valid=prep.valid if with_points else None,
        source_points=source.points if with_points else None,
        source_valid=source.valid if with_points else None,
    )
    return new_state, result


def state_specs() -> ShardedMapState:
    """PartitionSpecs of a ShardedMapState over the MAP_AXIS (per leaf)."""
    rep = P()
    shd = P(MAP_AXIS)
    return ShardedMapState(
        pose=rep, delta=rep,
        threshold=threshold.ThresholdState(rep, rep, rep),
        vkeys=shd, fprints=shd, counts=shd, points=shd,
        total_points=shd, num_dropped_voxels=shd, num_oob_points=shd,
    )


def result_specs(with_points: bool = False) -> ShardFrameResult:
    """All ShardFrameResult leaves are replicated across the map axis.
    The point-output fields are structural Nones unless `with_points`
    (must mirror the result the traced step actually returns)."""
    rep = P()
    pts = rep if with_points else None
    return ShardFrameResult(rep, rep, rep, rep, rep, rep, rep, rep,
                            pts, pts, pts, pts)


def make_map_sharded_step(config: KISSConfig, mesh: Mesh,
                          with_points: bool = False):
    """Compile one odometry step with the map sharded over `mesh`'s map axis.

    Returns `step(state, points (N,3), timestamps (N,), valid (N,))
    -> (state, ShardFrameResult)`. Inputs are replicated; per-frame semantics
    match `odometry.register_frame` (reference KissICP.cpp:35-68) except that
    overflowing voxels drop per-shard (each shard has 1/D capacity).
    `with_points` additionally returns the deskewed frame + ICP source
    buffers (the reference register_frame's return value) for the
    visualizer / product API.
    """
    n_shards = mesh.shape[MAP_AXIS]
    mcfg_local = local_map_config(config, mesh)

    def step_shard(state, points, timestamps, valid):
        return frame_step_shard(
            config, mcfg_local, n_shards, state, points, timestamps, valid,
            with_points=with_points,
        )

    rep = P()
    mapped = shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(state_specs(), rep, rep, rep),
        out_specs=(state_specs(), result_specs(with_points)),
    )
    # Donate the state like every sibling step factory: without aliasing the
    # dominant (C/D, P, 3) point store exists TWICE per device during the
    # step — on the engine whose purpose is maps too big per device.
    donate = (0,) if config.engine.donate_state else ()
    return jax.jit(mapped, donate_argnums=donate)


def make_map_sharded_chunked_step(config: KISSConfig, mesh: Mesh):
    """K-frame advance of the map-sharded step under one `lax.scan`.

    Returns `chunk(state, points (K,N,3), ts (K,N), valid (K,N))
    -> (state, ShardFrameResult with leading (K,) axis)`."""
    step = make_map_sharded_step(config, mesh)

    def chunk(state, points, timestamps, valid):
        def body(s, inp):
            p, t, v = inp
            return step(s, p, t, v)

        return jax.lax.scan(body, state, (points, timestamps, valid))

    donate = (0,) if config.engine.donate_state else ()
    return jax.jit(chunk, donate_argnums=donate)


@functools.partial(jax.jit, static_argnames=("n_shards",))
def shard_live_voxels(state: ShardedMapState, n_shards: int) -> jnp.ndarray:
    """(D,) live-voxel count per shard (diagnostics / load-balance checks)."""
    live = (state.counts > 0).astype(jnp.int32)
    return jnp.sum(live.reshape(n_shards, -1), axis=1)


# --------------------------------------------------------------------------
# Static communication model (VERDICT r3 next #7). The per-iteration
# collective traffic of the map-sharded GN loop is a pure function of the
# config and the shard count — asserting it in tests (against the lowered
# program) and publishing it in docs/SCALING.md turns the multi-chip scaling
# target into an analytic claim a real pod run can confirm or refute.
# --------------------------------------------------------------------------

def ring_payload_bytes(config: KISSConfig, n_shards: int) -> int:
    """ICI bytes EACH device sends per GN iteration for the NN ring combine.

    `_ring_min_combine` rotates three arrays one hop per step for D-1 steps:
    the squared distances (S,) f32, the neighbor points (S, 3) f32, and the
    tie-break shard ids (S,) i32 — 20 bytes per source-capacity row per hop.
    The psum'd normal equations (6x6 + 6 + 1 f32, `reduce_fn`) add ~172 B —
    latency-bound, not bandwidth-bound — and are excluded.
    """
    s = int(config.engine.source_capacity)
    return (n_shards - 1) * s * (4 + 12 + 4)


def ring_collective_permutes_per_gn_iteration(n_shards: int) -> int:
    """collective-permute ops executed per GN iteration per device: three
    arrays x (D-1) hops. The trace unrolls the hop loop, so this is also the
    static op count inside the while body."""
    return 3 * (n_shards - 1)


def expected_collective_permutes(n_shards: int) -> int:
    """Total collective-permute ops in the lowered single-frame program:
    3(D-1) inside the GN while body + 2(D-1) in the post-loop diagnostic
    correspondence count (its ring's neighbor payload is unused, so those
    D-1 permutes are dead-code-eliminated at trace time)."""
    return 5 * (n_shards - 1)
