"""Fixed-capacity voxel hash map: the TPU-native local map.

Replaces the reference's `tsl::robin_map<Voxel, std::vector<Vector3d>>`
(cpp/kiss_icp/core/VoxelHashMap.{hpp:38-57,cpp:33-133}) with flat arrays and
open addressing, designed so every operation is a fixed-shape XLA program:

  * slots:      `vkeys (C,3) i32` voxel coords, `fprints (C,) i32` nonzero hash
                fingerprint (0 = free slot), `counts (C,) i32`, and a dense
                point store `points (C,P,3) f32`.
  * probing:    over a BUCKET-ALIGNED window of `probe_length` slots (base =
                hash-row * K), so the window fingerprint scan is a row gather
                from the (capacity/K, K) view — ~2x faster on v5e than the
                equivalent scalar gather of K individual slots, and the
                matched slot is base + offset (arithmetic, no extra gather).
                All window slots are always scanned (no early exit), so
                removals never break probe chains and need no tombstones.
  * queries:    the reference's 27-voxel nearest-neighbor search
                (VoxelHashMap.cpp:35-70) becomes: fingerprint-match the 27
                neighbor windows, gather one point row per matched voxel, and
                take a masked min over 27*P distances. A fingerprint false
                positive can only *add* candidate points that belong to some
                other (far) voxel — they lose the min-distance race, so the
                returned neighbor is exact.
  * inserts:    batched and deterministic. New voxels claim free slots through
                scatter-min "claim rounds" (lowest batch row wins), so results
                do not depend on XLA scheduling — unlike the reference's
                tbb::concurrent_vector which is nondeterministic by design
                (SURVEY.md section 2.2).
  * removal:    `trim` clears slots whose first stored point is farther than
                max_distance from the sensor origin (VoxelHashMap.cpp:121-132)
                by zeroing count+fingerprint — a masked store, no compaction.

The per-voxel insert semantics mirror the reference exactly
(VoxelHashMap.cpp:97-119): at most `max_points_per_voxel` points per voxel, a
new point is rejected when any stored point lies within
`map_resolution = sqrt(voxel_size^2 / max_points_per_voxel)`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kiss_icp_tpu.ops import voxel as voxel_ops

# 27 neighbor offsets: the (0,0,0)-centered 3x3x3 cube, own voxel first
# (reference VoxelHashMap.cpp:35-41 shift table covers the same set).
# Kept as numpy so importing this module does not touch any device backend.
_NEIGHBOR_SHIFTS = np.array(
    [[dx, dy, dz] for dx in (0, 1, -1) for dy in (0, 1, -1) for dz in (0, 1, -1)],
    dtype=np.int32,
)


@dataclass(frozen=True)
class MapConfig:
    """Static (compile-time) configuration of the voxel map.

    `storage` selects the point-store layout:
      * "f32" — absolute float32 coordinates (bit-exact reference semantics).
      * "u16" — 16-bit fixed-point offsets from the owning voxel's corner.
        A point in voxel k lies in [k*v, (k+1)*v) per axis, so the offset
        fits [0, v) and u16 quantization resolves v/65535 (~15 um at 1 m
        voxels — two orders below sensor noise, and finer than f32 itself at
        kilometer world scale). HALVES the bytes moved by the hottest op in
        the pipeline (the 27-voxel NN point-row gather, SURVEY.md section
        3.1) and the map's HBM footprint. No reference analog: robin_map
        stores absolute Vector3d (f64); quantized voxel-relative storage is
        the TPU-native bandwidth play.
    """

    voxel_size: float = 1.0
    max_distance: float = 100.0
    max_points_per_voxel: int = 20
    capacity_log2: int = 18
    probe_length: int = 16
    group_capacity: int = 16
    storage: str = "f32"

    def __post_init__(self):
        k = self.probe_length
        if k <= 0 or (k & (k - 1)) != 0:
            raise ValueError(f"probe_length must be a power of two, got {k}")
        if k > (1 << self.capacity_log2):
            raise ValueError("probe_length exceeds the map capacity")
        if self.storage not in ("f32", "u16"):
            # A typo ('U16', 'fp32') would otherwise split the storage
            # predicates and silently run a mixed-mode map.
            raise ValueError(f"storage must be 'f32' or 'u16', got "
                             f"{self.storage!r}")

    @property
    def capacity(self) -> int:
        return 1 << self.capacity_log2

    @property
    def map_resolution_sq(self) -> float:
        return self.voxel_size * self.voxel_size / self.max_points_per_voxel

    @property
    def point_dtype(self):
        return jnp.uint16 if self.storage == "u16" else jnp.float32


class VoxelMap(NamedTuple):
    """Device state of the map (a pytree; config is carried separately)."""

    vkeys: jnp.ndarray  # (C, 3) int32
    fprints: jnp.ndarray  # (C,) int32, 0 = free
    counts: jnp.ndarray  # (C,) int32
    points: jnp.ndarray  # (C, P, 3) float32
    total_points: jnp.ndarray  # () int32
    num_dropped_voxels: jnp.ndarray  # () int32 — voxels lost to probe overflow
    # POINTS (not voxels) whose world coords left the ±16383-voxel key
    # envelope (voxel_ops.in_envelope) — its own counter because every other
    # drop diagnostic counts voxels and mixing units inflated the voxel
    # figure (advisor r4). Nonzero means the drive needs a rolling-origin
    # `rebase` (below) — the auto-rebase engines keep this at zero.
    num_oob_points: jnp.ndarray  # () int32


def create_map(cfg: MapConfig) -> VoxelMap:
    c, p = cfg.capacity, cfg.max_points_per_voxel
    return VoxelMap(
        vkeys=jnp.zeros((c, 3), jnp.int32),
        fprints=jnp.zeros((c,), jnp.int32),
        counts=jnp.zeros((c,), jnp.int32),
        points=jnp.zeros((c, p, 3), cfg.point_dtype),
        total_points=jnp.zeros((), jnp.int32),
        num_dropped_voxels=jnp.zeros((), jnp.int32),
        num_oob_points=jnp.zeros((), jnp.int32),
    )


_U16_SCALE = 65535.0


def encode_points(cfg: MapConfig, points: jnp.ndarray,
                  vkeys: jnp.ndarray) -> jnp.ndarray:
    """World f32 (..., 3) -> stored representation, given owning voxel coords
    (..., 3) int32. Identity for f32 storage."""
    if cfg.storage == "f32":
        return points.astype(jnp.float32)
    v = jnp.float32(cfg.voxel_size)
    off = points - vkeys.astype(jnp.float32) * v
    q = jnp.round(off * (_U16_SCALE / v))
    return jnp.clip(q, 0.0, _U16_SCALE).astype(jnp.uint16)


def decode_points(cfg: MapConfig, stored: jnp.ndarray,
                  vkeys: jnp.ndarray) -> jnp.ndarray:
    """Stored representation -> world f32, given owning voxel coords."""
    if cfg.storage == "f32":
        return stored
    v = jnp.float32(cfg.voxel_size)
    corner = vkeys.astype(jnp.float32) * v
    return stored.astype(jnp.float32) * (v / _U16_SCALE) + corner


def _mix(h: jnp.ndarray) -> jnp.ndarray:
    """lowbias32 finalizer: uint32 -> well-mixed uint32."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _hash_coords(coords: jnp.ndarray) -> jnp.ndarray:
    """Spatial hash of int32 voxel coords (..., 3) -> uint32 (...,).

    Sequential mixing (hash_combine style) rather than XOR-of-multiplies: the
    classic `x*P1 ^ y*P2 ^ z*P3` has structured collisions, e.g. negated
    coordinate pairs (x,y,z) vs (-x,-y,z) collide exactly, which a final
    mix cannot repair because the inputs are already equal.
    """
    x = coords[..., 0].astype(jnp.uint32)
    y = coords[..., 1].astype(jnp.uint32)
    z = coords[..., 2].astype(jnp.uint32)
    h = _mix(x * jnp.uint32(0x9E3779B1))
    h = _mix(h ^ (y * jnp.uint32(0x85EBCA77)))
    h = _mix(h ^ (z * jnp.uint32(0xC2B2AE3D)))
    return h


def fingerprint(coords: jnp.ndarray) -> jnp.ndarray:
    """Nonzero int32 fingerprint of voxel coords (0 is the free-slot marker)."""
    h = _mix(_hash_coords(coords) ^ jnp.uint32(0x9E3779B9))
    h = jnp.where(h == 0, jnp.uint32(1), h)
    return h.astype(jnp.int32)


def window_row(coords: jnp.ndarray, capacity_log2: int,
               probe_length: int) -> jnp.ndarray:
    """Probe-window row of a voxel: top bits of the mixed hash, one row per
    aligned window of `probe_length` slots.

    Windows are ALIGNED (base = row * probe_length) so the window fingerprint
    scan can be expressed as a row gather from a `(capacity/K, K)` view of the
    flat table — measured ~2x faster on v5e than the equivalent scalar gather
    of (..., K) individual slots, and the fingerprint probe is the single most
    expensive op of the NN query (see docs/ARCHITECTURE.md roofline notes).
    """
    row_bits = capacity_log2 - probe_length.bit_length() + 1
    if row_bits <= 0:
        # probe_length == capacity: one window covering the whole table. The
        # general expression would shift a uint32 by 32 — undefined (poison)
        # in XLA/LLVM, not zero.
        return jnp.zeros(coords.shape[:-1], jnp.int32)
    return (_hash_coords(coords) >> (32 - row_bits)).astype(jnp.int32)


def _window_fp(fprints: jnp.ndarray, rows: jnp.ndarray,
               probe_length: int) -> jnp.ndarray:
    """Fingerprints of the probe windows `rows`: (..., probe_length) via a
    row gather from the (capacity/K, K) view (see window_row)."""
    return fprints.reshape(-1, probe_length)[rows]


class QueryResult(NamedTuple):
    neighbors: jnp.ndarray  # (N, 3) closest map point (garbage when not found)
    distances: jnp.ndarray  # (N,) Euclidean distance (+inf when not found)
    found: jnp.ndarray  # (N,) bool


def _candidate_slab(cfg: MapConfig, m: VoxelMap, queries: jnp.ndarray):
    """Gather each query's 27-voxel candidate points: (pts (N,27,P,3),
    d2 (N,27,P) with +inf on unusable rows). The shared front half of
    `query_nearest` and `query_topc`."""
    k = cfg.probe_length
    p = cfg.max_points_per_voxel

    qvox = voxel_ops.point_to_voxel(queries, cfg.voxel_size)  # (N, 3)
    shifts = jnp.asarray(_NEIGHBOR_SHIFTS)
    neigh = qvox[:, None, :] + shifts[None, :, :]  # (N, 27, 3)
    target_fp = fingerprint(neigh)  # (N, 27)
    rows = window_row(neigh, cfg.capacity_log2, k)  # (N, 27)

    window_fp = _window_fp(m.fprints, rows, k)  # (N, 27, K) row gather
    match = window_fp == target_fp[..., None]
    has_voxel = jnp.any(match, axis=-1)  # (N, 27)
    first = jnp.argmax(match, axis=-1)  # (N, 27)
    # Aligned windows: the winning slot is base + offset — arithmetic,
    # not another gather.
    slot = (rows << (k.bit_length() - 1)) + first  # (N, 27)

    # Verify the matched slot's exact key: a fingerprint collision inside the
    # window (probability ~K/2^32 per lookup) must never surface another
    # voxel's points as this voxel's.
    exact = jnp.all(m.vkeys[slot] == neigh, axis=-1)  # (N, 27)
    has_voxel = has_voxel & exact

    # Nonexistent neighbors (~2/3 of probes on surface scans) all gather slot
    # 0 instead of a random slot: their rows are masked below anyway, and a
    # single repeated row is far kinder to the gather path than scattered
    # garbage rows.
    slot = jnp.where(has_voxel, slot, 0)

    cnt = m.counts[slot]  # (N, 27)
    # THE hot gather of the pipeline (reference GetClosestNeighbor's inner
    # probe, VoxelHashMap.cpp:46-70): u16 storage halves its bytes; the
    # decode corner is the neighbor voxel coordinate we already hold (only
    # exact-matched slots survive the mask, where slot vkey == neigh).
    pts = decode_points(cfg, m.points[slot], neigh[..., None, :])  # (N,27,P,3)

    d2 = jnp.sum((queries[:, None, None, :] - pts) ** 2, axis=-1)  # (N, 27, P)
    in_range = jnp.arange(p, dtype=jnp.int32)[None, None, :] < cnt[..., None]
    usable = in_range & has_voxel[..., None]
    d2 = jnp.where(usable, d2, jnp.inf)
    return pts, d2


@functools.partial(jax.jit, static_argnames=("cfg",))
def query_nearest(cfg: MapConfig, m: VoxelMap, queries: jnp.ndarray,
                  valid: jnp.ndarray) -> QueryResult:
    """Closest map point among the 27 voxels around each query point.

    Exact equivalent of VoxelHashMap::GetClosestNeighbor (VoxelHashMap.cpp:46-70)
    vectorized over all queries.
    """
    n = queries.shape[0]
    p = cfg.max_points_per_voxel
    pts, d2 = _candidate_slab(cfg, m, queries)

    d2_flat = d2.reshape(n, 27 * p)
    best = jnp.argmin(d2_flat, axis=-1)
    best_d2 = jnp.take_along_axis(d2_flat, best[:, None], axis=-1)[:, 0]
    nn = jnp.take_along_axis(
        pts.reshape(n, 27 * p, 3), best[:, None, None], axis=1
    )[:, 0, :]

    found = jnp.isfinite(best_d2) & valid
    return QueryResult(nn, jnp.sqrt(best_d2), found)


@functools.partial(jax.jit, static_argnames=("cfg", "c"))
def query_topc(cfg: MapConfig, m: VoxelMap, queries: jnp.ndarray,
               c: int):
    """The `c` nearest candidate map points per query from its 27-voxel
    neighborhood: (cand_pts (N, c, 3), cand_valid (N, c)), nearest first.

    The expensive half of data association (fingerprint probe + point-row
    gather) amortized for the cached-association ICP mode
    (registration.py): between Gauss-Newton iterations the source moves by
    millimeters, so the true nearest neighbor stays inside this tiny
    candidate set until the accumulated motion approaches the spacing
    between the c-th and 1st candidates — the caller re-gathers long before
    that (exact per-point motion bound). No reference analog: the C++ hash
    probe is cheap per query, re-associating every iteration is free there
    (Registration.cpp:151-164); on TPU the re-gather is ~all of the
    iteration's HBM traffic.
    """
    n = queries.shape[0]
    p = cfg.max_points_per_voxel
    pts, d2 = _candidate_slab(cfg, m, queries)
    neg_d2, idx = jax.lax.top_k(-d2.reshape(n, 27 * p), c)  # (N, c)
    cand = jnp.take_along_axis(
        pts.reshape(n, 27 * p, 3), idx[..., None], axis=1
    )  # (N, c, 3)
    return cand, jnp.isfinite(neg_d2)


@functools.partial(jax.jit, static_argnames=("cfg",))
def query_nearest_loop(cfg: MapConfig, m: VoxelMap, queries: jnp.ndarray,
                       valid: jnp.ndarray) -> QueryResult:
    """Same query as `query_nearest`, restructured as a sequential loop over
    the 27 neighbor offsets with running-min state.

    Rationale: the flat formulation materializes (N, 27, P, 3) gathered points
    and (N, 27, P) distances in HBM between fusions; here every intermediate
    is (N, P)-shaped, 27x smaller, trading parallel width (ample at N*P
    lanes) for memory traffic. Results are bit-identical: the sequential
    strict-< update keeps the first (lowest shift index) winner and the
    per-neighbor argmin keeps the lowest lane, matching the flat argmin's
    lowest-flat-index tie-break.
    """
    n = queries.shape[0]
    k = cfg.probe_length
    p = cfg.max_points_per_voxel

    qvox = voxel_ops.point_to_voxel(queries, cfg.voxel_size)  # (N, 3)
    shifts = jnp.asarray(_NEIGHBOR_SHIFTS)
    lanes = jnp.arange(p, dtype=jnp.int32)

    def neighbor_step(j, state):
        best_d2, best_pt = state
        neigh = qvox + shifts[j][None, :]  # (N, 3)
        target_fp = fingerprint(neigh)  # (N,)
        rows = window_row(neigh, cfg.capacity_log2, k)  # (N,)
        window_fp = _window_fp(m.fprints, rows, k)
        match = window_fp == target_fp[:, None]
        has_voxel = jnp.any(match, axis=-1)
        first = jnp.argmax(match, axis=-1)
        slot = (rows << (k.bit_length() - 1)) + first
        exact = jnp.all(m.vkeys[slot] == neigh, axis=-1)
        has_voxel = has_voxel & exact
        slot = jnp.where(has_voxel, slot, 0)

        cnt = m.counts[slot]  # (N,)
        pts = decode_points(cfg, m.points[slot], neigh[:, None, :])  # (N, P, 3)
        d2 = jnp.sum((queries[:, None, :] - pts) ** 2, axis=-1)  # (N, P)
        usable = (lanes[None, :] < cnt[:, None]) & has_voxel[:, None]
        d2 = jnp.where(usable, d2, jnp.inf)
        lane_best = jnp.argmin(d2, axis=-1)  # (N,)
        lane_d2 = jnp.take_along_axis(d2, lane_best[:, None], axis=-1)[:, 0]
        lane_pt = jnp.take_along_axis(pts, lane_best[:, None, None], axis=1)[:, 0]
        improve = lane_d2 < best_d2
        return (jnp.where(improve, lane_d2, best_d2),
                jnp.where(improve[:, None], lane_pt, best_pt))

    best_d2, best_pt = jax.lax.fori_loop(
        0, 27, neighbor_step,
        (jnp.full((n,), jnp.inf, jnp.float32), jnp.zeros((n, 3), jnp.float32)),
    )
    found = jnp.isfinite(best_d2) & valid
    return QueryResult(best_pt, jnp.sqrt(best_d2), found)


def _claim_slots(fprints, vkeys, coords, fp, rows, pending0, *,
                 probe_length: int, capacity: int):
    """Deterministic free-slot claiming for a batch of new voxels.

    Each pending row tries to claim a free slot in its bucket-aligned probe
    window through scatter-min "claim rounds" (lowest row index wins a
    contested slot), so the result is independent of XLA scheduling — the
    TPU replacement for robin_map's sequential insert. Rows whose window has
    no free slot, or whose fingerprint would shadow (or be shadowed by) a
    DIFFERENT voxel's equal-fingerprint entry in the same window, end
    unassigned (-1) — queries stop at a window's FIRST fingerprint match, so
    a shadow pair would make one of the two unfindable; refusing the claim
    keeps it a counted drop instead of a silent hole.

    Shared by `insert` (claims into the live table) and `rebase` (rebuilds
    into an empty table). Returns (fprints, vkeys, assigned) where
    `assigned[i]` is the claimed slot or -1.
    """
    k, cap = probe_length, capacity
    v = coords.shape[0]
    row_ids = jnp.arange(v, dtype=jnp.int32)

    def claim_round(state):
        fprints, vkeys, pending, assigned, _ = state
        wfp = _window_fp(fprints, rows, k)  # (V, K)
        free = wfp == 0
        any_free = jnp.any(free, axis=-1)
        tgt_pos = jnp.argmax(free, axis=-1)
        tgt_slot = (rows << (k.bit_length() - 1)) + tgt_pos
        attempt = pending & any_free
        claim_idx = jnp.where(attempt, tgt_slot, cap)  # cap = dropped
        claims = jnp.full((cap,), v, jnp.int32).at[claim_idx].min(
            jnp.where(attempt, row_ids, v), mode="drop"
        )
        won = attempt & (claims[jnp.minimum(tgt_slot, cap - 1)] == row_ids)
        fprints = fprints.at[jnp.where(won, tgt_slot, cap)].set(fp, mode="drop")
        vkeys = vkeys.at[jnp.where(won, tgt_slot, cap)].set(coords, mode="drop")
        assigned = jnp.where(won, tgt_slot, assigned)
        # Rows with no free slot anywhere in their window can never win: drop.
        # A row whose window just gained an equal-fp entry from ANOTHER voxel
        # (cross-round shadowing) drops too; within one round a window admits
        # at most one winner (every row attempts the window's first free
        # slot), so no same-round shadow pair can form.
        wfp2 = _window_fp(fprints, rows, k)
        wk2 = vkeys.reshape(cap // k, k, 3)[rows]
        now_shadowed = jnp.any(
            (wfp2 == fp[:, None])
            & ~jnp.all(wk2 == coords[:, None, :], axis=-1),
            axis=-1,
        )
        pending = pending & ~won & any_free & ~now_shadowed
        return fprints, vkeys, pending, assigned, won

    def claim_cond(state):
        return jnp.any(state[2])

    # Fresh loop-carry constants inherit pending0's varying-manual-axes type
    # (shard_map check_vma): `pending0 & False` is all-False but carries the
    # mesh-varying tag when this runs inside a map-sharded step; in the
    # single-device path XLA folds it to a constant.
    won0 = pending0 & False
    assigned0 = jnp.where(won0, 0, jnp.int32(-1))
    fprints, vkeys, _, assigned, _ = jax.lax.while_loop(
        claim_cond, claim_round, (fprints, vkeys, pending0, assigned0, won0)
    )
    return fprints, vkeys, assigned


class InsertStats(NamedTuple):
    num_added_points: jnp.ndarray  # () int32
    num_dropped_voxels: jnp.ndarray  # () int32 — new voxels with no free slot
    num_oob_points: jnp.ndarray  # () int32 — input POINTS outside the world
    #                                envelope (distinct unit from the voxel
    #                                counters above; advisor r4)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("m",))
def insert(cfg: MapConfig, m: VoxelMap, points: jnp.ndarray,
           valid: jnp.ndarray) -> Tuple[VoxelMap, InsertStats]:
    """Add one frame of (world-frame) points to the map.

    Mirrors VoxelHashMap::AddPoints (VoxelHashMap.cpp:97-119): group the frame
    by voxel, find-or-claim a slot per voxel, then run the sequential
    accept/reject loop over each voxel's candidates — vectorized across voxels.
    """
    k = cfg.probe_length
    p = cfg.max_points_per_voxel
    cap = cfg.capacity

    # World-extent envelope (voxel_ops.in_envelope): pack_voxel_keys masks
    # out-of-envelope points inside group_by_voxel so they can never alias
    # into a wrong voxel's group; count them here as a LOUD drop — a drive
    # leaving the +-16383-voxel world envelope must surface, not silently
    # thin the map (code-review r4c).
    num_oob = jnp.sum(
        (valid & ~voxel_ops.in_envelope(
            voxel_ops.point_to_voxel(points, cfg.voxel_size))
         ).astype(jnp.int32))  # point count -> InsertStats.num_oob_points
    groups = voxel_ops.group_by_voxel(
        points, valid, voxel_size=cfg.voxel_size, group_capacity=cfg.group_capacity
    )
    v = groups.coords.shape[0]  # rows (= input capacity)
    gvalid = groups.group_valid

    fp = fingerprint(groups.coords)  # (V,)
    rows = window_row(groups.coords, cfg.capacity_log2, k)  # (V,)

    # --- Phase A: find existing slots (full-window fingerprint + key compare).
    window_fp = _window_fp(m.fprints, rows, k)  # (V, K)
    fp_match = window_fp == fp[:, None]
    window_keys = m.vkeys.reshape(cap // k, k, 3)[rows]  # (V, K, 3) row gather
    key_match = jnp.all(window_keys == groups.coords[:, None, :], axis=-1)
    exact = fp_match & key_match
    has_existing = jnp.any(exact, axis=-1) & gvalid
    exist_pos = jnp.argmax(exact, axis=-1)
    # Fingerprint shadowing: queries stop at a window's FIRST fingerprint
    # match, so a new voxel whose fp equals a DIFFERENT voxel's entry in the
    # same window could be stored yet never found (or make the older entry
    # unfindable). Refuse the claim instead — the voxel drops and is COUNTED
    # (num_dropped_voxels), same surfacing as capacity overflow. Probability
    # ~K/2^32 per new voxel; correctness demands it be a counted event, not
    # a silent hole.
    shadowed = jnp.any(fp_match & ~key_match, axis=-1)

    # --- Phase B: claim free slots for new voxels (deterministic rounds;
    # shared machinery with `rebase` — see _claim_slots).
    pending0 = gvalid & ~has_existing & ~shadowed
    fprints, vkeys, assigned = _claim_slots(
        m.fprints, m.vkeys, groups.coords, fp, rows, pending0,
        probe_length=k, capacity=cap,
    )
    dropped = jnp.sum((gvalid & ~has_existing & (assigned < 0)).astype(jnp.int32))

    slot = jnp.where(
        has_existing,
        (rows << (k.bit_length() - 1)) + exist_pos,
        assigned,
    )
    has_slot = gvalid & (slot >= 0)
    slot_safe = jnp.where(has_slot, slot, 0)

    # --- Phase C: sequential accept/reject of candidates, vectorized over voxels.
    # Work in decoded f32 (the corner is this group's voxel: existing slots
    # matched exactly on the key, claimed slots have count 0 so their stale
    # contents are masked below).
    stored = decode_points(cfg, m.points[slot_safe], groups.coords[:, None, :])
    cnt = jnp.where(has_slot, m.counts[slot_safe], 0)  # claimed slots have count 0

    res_sq = jnp.asarray(cfg.map_resolution_sq, stored.dtype)
    lanes = jnp.arange(p, dtype=jnp.int32)

    def accept_step(j, state):
        stored, cnt, added = state
        cand = groups.candidates[:, j, :]  # (V, 3)
        cand_ok = groups.cand_valid[:, j] & has_slot
        d2 = jnp.sum((stored - cand[:, None, :]) ** 2, axis=-1)  # (V, P)
        d2 = jnp.where(lanes[None, :] < cnt[:, None], d2, jnp.inf)
        min_d2 = jnp.min(d2, axis=-1)
        accept = cand_ok & (cnt < p) & (min_d2 >= res_sq)
        write = (lanes[None, :] == cnt[:, None]) & accept[:, None]
        stored = jnp.where(write[..., None], cand[:, None, :], stored)
        cnt = cnt + accept.astype(jnp.int32)
        added = added + jnp.sum(accept.astype(jnp.int32)).astype(jnp.int32)
        return stored, cnt, added

    # 0 carrying pending0's varying-manual-axes type (see _claim_slots note).
    added0 = jnp.sum((pending0 & False).astype(jnp.int32))
    stored, cnt, added = jax.lax.fori_loop(
        0, cfg.group_capacity, accept_step, (stored, cnt, added0)
    )

    # --- Phase D: write rows back (re-encoded for quantized storage; the
    # u16 roundtrip is a fixpoint, so untouched lanes keep their exact bits).
    write_idx = jnp.where(has_slot, slot_safe, cap)
    stored_out = encode_points(cfg, stored, groups.coords[:, None, :])
    new_points = m.points.at[write_idx].set(stored_out, mode="drop")
    new_counts = m.counts.at[write_idx].set(cnt, mode="drop")

    new_map = VoxelMap(
        vkeys=vkeys,
        fprints=fprints,
        counts=new_counts,
        points=new_points,
        total_points=m.total_points + added,
        num_dropped_voxels=m.num_dropped_voxels + dropped,
        num_oob_points=m.num_oob_points + num_oob,
    )
    return new_map, InsertStats(added, dropped, num_oob)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("m",))
def trim(cfg: MapConfig, m: VoxelMap, origin: jnp.ndarray) -> VoxelMap:
    """Remove voxels whose FIRST stored point is >= max_distance from origin
    (reference RemovePointsFarFromLocation, VoxelHashMap.cpp:121-132)."""
    first_pt = decode_points(cfg, m.points[:, 0, :], m.vkeys)  # (C, 3)
    d2 = jnp.sum((first_pt - origin[None, :]) ** 2, axis=-1)
    live = m.counts > 0
    kill = live & (d2 >= cfg.max_distance * cfg.max_distance)
    removed = jnp.sum(jnp.where(kill, m.counts, 0))
    keep = ~kill
    return m._replace(
        fprints=jnp.where(keep, m.fprints, 0),
        counts=jnp.where(keep, m.counts, 0),
        total_points=m.total_points - removed,
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("m",))
def rebase(cfg: MapConfig, m: VoxelMap,
           shift_vox: jnp.ndarray) -> Tuple[VoxelMap, jnp.ndarray]:
    """Shift the map's world origin by `shift_vox` voxels: every stored voxel
    key moves to `key - shift_vox` and the table is rebuilt around the new
    keys.

    The rolling-origin re-base that keeps arbitrarily long drives inside the
    ±16383-voxel key envelope (voxel_ops.in_envelope): the reference's
    robin_map keys are unbounded int32 per axis (VoxelUtils.hpp:32-41) so it
    never needs this; our packed sort keys and fixed-point storage buy their
    bandwidth with a bounded world, and this restores the unbounded-drive
    capability. Called between frames by the engine wrappers when the pose
    approaches the envelope (`odometry.KissICP.maybe_rebase`) — the caller
    shifts the pose by `-shift_vox * voxel_size` and accumulates the offset
    for reporting.

    `shift_vox` must be voxel-ALIGNED (int32 (3,)): u16 voxel-relative
    offsets are then bit-identical under the shift, and f32 absolute points
    shift by an exactly-representable voxel multiple. Slot placement depends
    on the key hash, so live voxels re-claim slots in a fresh table through
    the same deterministic claim rounds as `insert`; with the production
    load factor (~0.1) re-claim drops are vanishingly rare, but any are
    counted into `num_dropped_voxels` (and returned) — same loud-surfacing
    contract as every other capacity event.

    Returns (rebased map, voxels dropped during the rebuild).
    """
    cap = cfg.capacity
    k = cfg.probe_length

    live = m.counts > 0
    new_coords = m.vkeys - shift_vox[None, :].astype(jnp.int32)
    fp = fingerprint(new_coords)
    rows = window_row(new_coords, cfg.capacity_log2, k)

    fprints, vkeys, assigned = _claim_slots(
        jnp.zeros_like(m.fprints), jnp.zeros_like(m.vkeys),
        new_coords, fp, rows, live, probe_length=k, capacity=cap,
    )
    dropped = live & (assigned < 0)
    n_dropped_voxels = jnp.sum(dropped.astype(jnp.int32))
    n_dropped_points = jnp.sum(jnp.where(dropped, m.counts, 0))

    # Move each surviving old slot's row to its claimed new slot. The point
    # payload shifts with the origin for absolute (f32) storage and is
    # untouched for voxel-relative (u16) storage.
    if cfg.storage == "f32":
        shifted = m.points - (shift_vox.astype(jnp.float32)
                              * jnp.float32(cfg.voxel_size))[None, None, :]
    else:
        shifted = m.points
    write_idx = jnp.where(assigned >= 0, assigned, cap)
    new_points = jnp.zeros_like(m.points).at[write_idx].set(
        shifted, mode="drop")
    new_counts = jnp.zeros_like(m.counts).at[write_idx].set(
        m.counts, mode="drop")

    new_map = VoxelMap(
        vkeys=vkeys,
        fprints=fprints,
        counts=new_counts,
        points=new_points,
        total_points=m.total_points - n_dropped_points,
        num_dropped_voxels=m.num_dropped_voxels + n_dropped_voxels,
        num_oob_points=m.num_oob_points,
    )
    return new_map, n_dropped_voxels


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_points(cfg: MapConfig, m: VoxelMap) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dump the map to a padded (C*P, 3) cloud + mask (reference Pointcloud(),
    VoxelHashMap.cpp:72-81). Mainly for visualization and tests."""
    p = cfg.max_points_per_voxel
    mask = jnp.arange(p, dtype=jnp.int32)[None, :] < m.counts[:, None]
    pts = decode_points(cfg, m.points, m.vkeys[:, None, :])
    return pts.reshape(-1, 3), mask.reshape(-1)


def is_empty(m: VoxelMap) -> jnp.ndarray:
    return m.total_points == 0
