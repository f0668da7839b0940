"""Per-frame compacted view of the voxel map for the NN hot loop.

The mutation-side hash map (ops/hash_map.py) is deliberately sparse: 2^19
slots at ~3% occupancy keep probe windows short and insert claim rounds rare.
But the registration hot loop (reference GetClosestNeighbor,
cpp/kiss_icp/core/VoxelHashMap.cpp:46-70, the **-hottest op per SURVEY.md
section 3.1) only ever *reads* the map, and it reads it ~20 times per frame
(once per Gauss-Newton iteration). Gathering point rows from the sparse
512k-slot store means every ICP iteration drags (queries x 27 x P x 3)
scattered bytes through HBM.

This module builds, once per frame (the map is frozen during the GN loop), a
dense *query view*:

  * `ckeys/ccounts/cpoints` — the live voxels only, packed into `live_capacity`
    contiguous rows (a few MB instead of the sparse store's tens),
  * `hfp/hval` — a small open-addressing index (fingerprint -> compact row)
    sized to ~4x the live count, so probe windows of 8 suffice.

The whole view fits in VMEM, which is what makes the fused Pallas NN kernel
(ops/pallas_nn.py) possible: fingerprint probe, point-row gather, and the
masked 27*P min all happen on-chip with zero per-iteration HBM gathers. The
jnp `query_nearest_compact` below is the oracle/CPU path over the identical
structure and must agree with `hash_map.query_nearest` bit-for-bit (same
distances, same tie-breaking) — tested in tests/test_compact_map.py.

No reference analog: robin_map is its own query structure. This split mirrors
what the TPU memory hierarchy wants, not what the C++ did.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from kiss_icp_tpu.ops import voxel as voxel_ops
from kiss_icp_tpu.ops.hash_map import (
    _NEIGHBOR_SHIFTS,
    MapConfig,
    QueryResult,
    VoxelMap,
    _window_fp,
    window_row,
    decode_points,
    fingerprint,
)


@dataclass(frozen=True)
class CompactConfig:
    """Static shape plan of the compact query view.

    live_capacity_log2 bounds the number of live voxels representable; a map
    with more live voxels than this overflows (surfaced via `num_dropped`,
    and registration.align_points_to_map falls back to the sparse-path query
    via lax.cond — accuracy preserved, compact speed advantage lost).
    hash_capacity_log2 should be live_capacity_log2 + 2 (load factor 0.25).
    """

    live_capacity_log2: int = 14
    hash_capacity_log2: int = 16
    probe_length: int = 8

    @property
    def live_capacity(self) -> int:
        return 1 << self.live_capacity_log2

    @property
    def hash_capacity(self) -> int:
        return 1 << self.hash_capacity_log2


class CompactMap(NamedTuple):
    """Dense, read-only view of the live voxels (device pytree)."""

    ckeys: jnp.ndarray  # (L, 3) int32 voxel coords (garbage beyond n_live)
    ccounts: jnp.ndarray  # (L,) int32 — 0 beyond n_live
    cpoints: jnp.ndarray  # (L, P, 3) map-storage dtype (f32 or u16)
    hfp: jnp.ndarray  # (H,) int32 fingerprint, 0 = free
    hval: jnp.ndarray  # (H,) int32 compact row for that fingerprint's voxel
    n_live: jnp.ndarray  # () int32
    num_dropped: jnp.ndarray  # () int32 — live voxels not representable


def _hash_rows(coords: jnp.ndarray, ccfg: "CompactConfig") -> jnp.ndarray:
    """Aligned probe-window row in the compact fingerprint table (same
    row-gather trick as hash_map.window_row)."""
    return window_row(coords, ccfg.hash_capacity_log2, ccfg.probe_length)


@functools.partial(jax.jit, static_argnames=("mcfg", "ccfg"))
def build_compact(mcfg: MapConfig, ccfg: CompactConfig, m: VoxelMap) -> CompactMap:
    """Pack the live voxels of `m` into the dense view. One XLA program, run
    once per frame right before registration."""
    l_cap = ccfg.live_capacity
    h_cap = ccfg.hash_capacity
    k = ccfg.probe_length

    live = m.counts > 0  # (C,)
    n_live_total = jnp.sum(live.astype(jnp.int32))
    # Deterministic packing: live slots in slot order. `size=` keeps the shape
    # static; overflow rows simply don't exist in the view.
    (slot_idx,) = jnp.nonzero(live, size=l_cap, fill_value=0)
    n_live = jnp.minimum(n_live_total, l_cap)
    rows = jnp.arange(l_cap, dtype=jnp.int32)
    row_valid = rows < n_live

    ckeys = m.vkeys[slot_idx]  # (L, 3)
    ccounts = jnp.where(row_valid, m.counts[slot_idx], 0)
    cpoints = m.points[slot_idx]  # (L, P, 3) storage dtype

    # --- Build the small fingerprint -> row index (deterministic claim rounds,
    # same scheme as hash_map.insert phase B; keys are unique so every valid
    # row claims exactly once unless its window fills).
    fp = fingerprint(ckeys)  # (L,)
    hrows = _hash_rows(ckeys, ccfg)  # (L,)

    def claim_round(state):
        hfp, hval, pending, n_shadowed = state
        wfp = _window_fp(hfp, hrows, k)  # (L, K) row gather
        # A pending row whose window already holds its fingerprint (claimed
        # by a DIFFERENT voxel in an earlier round — equal fingerprints can
        # coexist in the dense map via different dense windows) must be
        # refused as a COUNTED drop: lookup_rows stops at the first
        # fingerprint match, so placing it would make it permanently
        # unfindable while dropped stayed 0. Same hazard + remedy as
        # hash_map.insert's now_shadowed (code-review r4c).
        shadowed = pending & jnp.any(wfp == fp[:, None], axis=-1)
        pending = pending & ~shadowed
        n_shadowed = n_shadowed + jnp.sum(shadowed.astype(jnp.int32))
        free = wfp == 0
        any_free = jnp.any(free, axis=-1)
        tgt_pos = jnp.argmax(free, axis=-1)
        tgt_slot = (hrows << (k.bit_length() - 1)) + tgt_pos
        attempt = pending & any_free
        claim_idx = jnp.where(attempt, tgt_slot, h_cap)
        claims = jnp.full((h_cap,), l_cap, jnp.int32).at[claim_idx].min(
            jnp.where(attempt, rows, l_cap), mode="drop"
        )
        won = attempt & (claims[jnp.minimum(tgt_slot, h_cap - 1)] == rows)
        hfp = hfp.at[jnp.where(won, tgt_slot, h_cap)].set(fp, mode="drop")
        hval = hval.at[jnp.where(won, tgt_slot, h_cap)].set(rows, mode="drop")
        pending = pending & ~won & any_free
        return hfp, hval, pending, n_shadowed

    def claim_cond(state):
        return jnp.any(state[2])

    hfp0 = jnp.zeros((h_cap,), jnp.int32)
    hval0 = jnp.zeros((h_cap,), jnp.int32)
    hfp, hval, pending, n_shadowed = jax.lax.while_loop(
        claim_cond, claim_round,
        (hfp0, hval0, row_valid, jnp.zeros((), jnp.int32))
    )
    dropped_hash = jnp.sum(pending.astype(jnp.int32))  # always 0 at load 0.25
    dropped = (n_live_total - n_live) + dropped_hash + n_shadowed

    return CompactMap(ckeys, ccounts, cpoints, hfp, hval, n_live, dropped)


def lookup_rows(ccfg: CompactConfig, cm: CompactMap,
                coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Voxel coords (..., 3) -> (row (...,), found (...,)) in the compact view.

    Fingerprint probe + exact-key verification, identical discipline to
    hash_map.query_nearest (a window fingerprint collision must never surface
    another voxel's points).
    """
    fp = fingerprint(coords)
    hrows = _hash_rows(coords, ccfg)
    wfp = _window_fp(cm.hfp, hrows, ccfg.probe_length)
    match = wfp == fp[..., None]
    has = jnp.any(match, axis=-1)
    first = jnp.argmax(match, axis=-1)
    slot = (hrows << (ccfg.probe_length.bit_length() - 1)) + first
    row = jnp.where(has, cm.hval[slot], 0)
    exact = jnp.all(cm.ckeys[row] == coords, axis=-1)
    has = has & exact
    return jnp.where(has, row, 0), has


@functools.partial(jax.jit, static_argnames=("mcfg", "ccfg"))
def query_nearest_compact_loop(mcfg: MapConfig, ccfg: CompactConfig,
                               cm: CompactMap, queries: jnp.ndarray,
                               valid: jnp.ndarray) -> QueryResult:
    """27-voxel NN against the compact view as a sequential neighbor loop with
    running-min state (see hash_map.query_nearest_loop for the rationale —
    every intermediate is (N, P)-shaped instead of (N, 27, P)). Bit-identical
    tie-breaking to the flat formulations."""
    n = queries.shape[0]
    p = mcfg.max_points_per_voxel

    qvox = voxel_ops.point_to_voxel(queries, mcfg.voxel_size)  # (N, 3)
    shifts = jnp.asarray(_NEIGHBOR_SHIFTS)
    lanes = jnp.arange(p, dtype=jnp.int32)

    def neighbor_step(j, state):
        best_d2, best_pt = state
        neigh = qvox + shifts[j][None, :]  # (N, 3)
        row, has_voxel = lookup_rows(ccfg, cm, neigh)  # (N,)
        cnt = cm.ccounts[row]
        pts = decode_points(mcfg, cm.cpoints[row], neigh[:, None, :])  # (N,P,3)
        d2 = jnp.sum((queries[:, None, :] - pts) ** 2, axis=-1)  # (N, P)
        usable = (lanes[None, :] < cnt[:, None]) & has_voxel[:, None]
        d2 = jnp.where(usable, d2, jnp.inf)
        lane_best = jnp.argmin(d2, axis=-1)
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


@functools.partial(jax.jit, static_argnames=("mcfg", "ccfg"))
def query_nearest_compact(mcfg: MapConfig, ccfg: CompactConfig, cm: CompactMap,
                          queries: jnp.ndarray, valid: jnp.ndarray) -> QueryResult:
    """27-voxel nearest neighbor against the compact view (jnp path).

    Bit-identical to hash_map.query_nearest on the same map: same neighbor
    order (_NEIGHBOR_SHIFTS), same lane order, same f32 distance arithmetic,
    so ties break the same way.
    """
    n = queries.shape[0]
    p = mcfg.max_points_per_voxel

    qvox = voxel_ops.point_to_voxel(queries, mcfg.voxel_size)  # (N, 3)
    shifts = jnp.asarray(_NEIGHBOR_SHIFTS)
    neigh = qvox[:, None, :] + shifts[None, :, :]  # (N, 27, 3)
    row, has_voxel = lookup_rows(ccfg, cm, neigh)  # (N, 27)

    cnt = jnp.where(has_voxel, cm.ccounts[row], 0)  # (N, 27)
    pts = decode_points(mcfg, cm.cpoints[row], neigh[..., None, :])  # (N,27,P,3)

    d2 = jnp.sum((queries[:, None, None, :] - pts) ** 2, axis=-1)  # (N, 27, P)
    in_range = jnp.arange(p, dtype=jnp.int32)[None, None, :] < cnt[..., None]
    usable = in_range & has_voxel[..., None]
    d2 = jnp.where(usable, d2, jnp.inf)

    d2_flat = d2.reshape(n, 27 * p)
    best = jnp.argmin(d2_flat, axis=-1)
    best_d2 = jnp.take_along_axis(d2_flat, best[:, None], axis=-1)[:, 0]
    nn = jnp.take_along_axis(
        pts.reshape(n, 27 * p, 3), best[:, None, None], axis=1
    )[:, 0, :]

    found = jnp.isfinite(best_d2) & valid
    return QueryResult(nn, jnp.sqrt(best_d2), found)
