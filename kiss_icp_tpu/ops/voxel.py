"""Voxelization kernels: integer voxel keys, downsampling, per-voxel grouping.

TPU-native replacement for the reference's robin_map-based voxel grid
(cpp/kiss_icp/core/VoxelUtils.{hpp:32-51,cpp:7-21}). Dynamic hash maps do not
exist inside an XLA program, so:

  * voxel coordinates are packed into two int32 sort keys (16 bits per axis,
    lexicographic order preserved), and
  * first-point-wins downsampling becomes a multi-key `lax.sort` followed by a
    segment-head selection. The reference keeps the first point in *container
    iteration order* (nondeterministic across runs); we keep the point with the
    lowest original index — deterministic, and identical whenever the reference
    iterates in insertion order.

All functions take fixed-shape padded buffers with validity masks and return
fixed-shape results (SURVEY.md section 7, "Dynamic point counts -> masking").
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# 15 bits per axis: voxel coordinates in [-16384, 16383]. At the 0.5 m frame
# downsample grid this covers +/- 8 km of world, far beyond any local map, and
# (x << 15 | y) stays within a positive int32 so ordering is preserved.
_AXIS_OFFSET = 1 << 14
_AXIS_MASK = (1 << 15) - 1
KEY_SENTINEL = jnp.iinfo(jnp.int32).max


def point_to_voxel(points: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """floor(p / voxel_size) per axis (reference VoxelUtils.hpp:33-37).

    (...,3) float -> (...,3) int32.
    """
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def in_envelope(coords: jnp.ndarray, margin: int = 0) -> jnp.ndarray:
    """(..., ) bool: coords representable in the 15-bit-per-axis key space.

    The sort keys wrap coords to [-16384, 16383] per axis; two voxels 32768
    cells apart would alias to the SAME key, silently merging their groups
    during world-frame map insertion (code-review r4c). Callers that feed
    WORLD-frame coords (hash_map.insert) must mask + count what falls
    outside; sensor-frame callers (the range-cropped downsample) can never
    leave the envelope. `margin` shrinks the envelope (e.g. 1 for the
    27-neighborhood's +-1 shifts)."""
    lo, hi = -_AXIS_OFFSET + margin, _AXIS_OFFSET - margin
    return jnp.all((coords >= lo) & (coords < hi), axis=-1)


def pack_voxel_keys(coords: jnp.ndarray, valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack int32 voxel coords (..., 3) into two int32 lexicographic sort keys.

    key_hi = (x + off) << 15 | (y + off),  key_lo = (z + off).
    Invalid rows — including coords outside the representable envelope,
    which would otherwise wrap and alias (see in_envelope) — map to
    (KEY_SENTINEL, KEY_SENTINEL) so they sort to the end.
    Ordering of (key_hi, key_lo) equals lexicographic ordering of (x, y, z).
    """
    valid = valid & in_envelope(coords)
    x = (coords[..., 0] + _AXIS_OFFSET) & _AXIS_MASK
    y = (coords[..., 1] + _AXIS_OFFSET) & _AXIS_MASK
    z = (coords[..., 2] + _AXIS_OFFSET) & _AXIS_MASK
    hi = (x << 15) | y
    lo = z
    hi = jnp.where(valid, hi, KEY_SENTINEL)
    lo = jnp.where(valid, lo, KEY_SENTINEL)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def _sort_by_voxel_key(
    hi: jnp.ndarray, lo: jnp.ndarray, idx: jnp.ndarray, n: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort rows lexicographically by (hi, lo, idx).

    When row indices fit 17 bits, (lo, idx) packs into ONE u32 minor key
    (lo <= 15 bits for valid rows), cutting the sort from three keys to
    two — sorts are the dominant non-gather cost of the voxel kernels on
    TPU (BASELINE.md round-4 downsample-rank note). Invalid rows have
    hi = KEY_SENTINEL, the strict maximum of all valid hi keys, so they
    order after every valid row on the major key alone; their lo
    (= KEY_SENTINEL) wraps in the u32 shift to 0xFFFE0000 | idx, which
    still orders them deterministically by original index.
    """
    if n <= (1 << 17):
        packed = (lo.astype(jnp.uint32) << 17) | idx.astype(jnp.uint32)
        hi_s, packed_s = jax.lax.sort((hi, packed), num_keys=2)
        lo_s = (packed_s >> 17).astype(jnp.int32)
        idx_s = (packed_s & jnp.uint32((1 << 17) - 1)).astype(jnp.int32)
        # Restore the sentinel for invalid rows so callers' head detection
        # (lo_s equality between neighbors) sees the same values as the
        # unpacked path.
        lo_s = jnp.where(hi_s == KEY_SENTINEL, KEY_SENTINEL, lo_s)
        return hi_s, lo_s, idx_s
    return jax.lax.sort((hi, lo, idx), num_keys=3)


class Downsampled(NamedTuple):
    points: jnp.ndarray  # (M, 3) float32
    valid: jnp.ndarray  # (M,) bool
    num_kept: jnp.ndarray  # () int32 — unique voxels kept (<= M)
    num_dropped: jnp.ndarray  # () int32 — unique voxels lost to the M cap


@functools.partial(jax.jit, static_argnames=("voxel_size", "capacity"))
def voxel_downsample(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    voxel_size: float,
    capacity: int,
) -> Downsampled:
    """Keep one point per voxel (lowest original index wins).

    Equivalent of reference VoxelDownsample (VoxelUtils.cpp:7-21) on padded
    buffers: sort (key_hi, key_lo, index), keep segment heads, scatter the
    survivors into a fixed-size output buffer.
    """
    n = points.shape[0]
    coords = point_to_voxel(points, voxel_size)
    hi, lo = pack_voxel_keys(coords, valid)
    idx = jnp.arange(n, dtype=jnp.int32)
    # (hi, lo) groups voxels, idx breaks ties deterministically (min original
    # index first) without needing a stable sort; packed two-key form when
    # indices fit (see _sort_by_voxel_key).
    hi_s, lo_s, idx_s = _sort_by_voxel_key(hi, lo, idx, n)

    valid_s = hi_s != KEY_SENTINEL
    prev_same = jnp.concatenate(
        [
            jnp.zeros((1,), dtype=bool),
            (hi_s[1:] == hi_s[:-1]) & (lo_s[1:] == lo_s[:-1]),
        ]
    )
    head = valid_s & ~prev_same
    num_unique = jnp.sum(head.astype(jnp.int32))

    # Output position for each segment head. Heads are placed in HASH order of
    # their voxel key, not key order: when the unique count exceeds `capacity`
    # the dropped subset is then spatially unbiased, instead of truncating a
    # lexicographic corner of the scan (keys sort by x, then y, then z).
    h = (hi_s.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)) ^ (
        lo_s.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    )
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    # 0xFFFFFFFF is the non-head sentinel below: a head hashing exactly to it
    # would sort among the non-heads and be dropped even with spare capacity.
    h = jnp.where(h == jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFE), h)
    order_key = jnp.where(head, h, jnp.uint32(0xFFFFFFFF))
    # Hash rank of every row = inverse of the sort permutation. One
    # two-key sort (ties broken by row index, so the permutation is the
    # stable one) plus a unique-index scatter of iota — NOT
    # argsort(argsort(...)), which lowers to two full sorts of n; sorts
    # are the dominant non-gather cost of this kernel on TPU.
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((order_key, iota), num_keys=2)
    rank = jnp.zeros((n,), jnp.int32).at[perm].set(iota, mode="drop",
                                                   unique_indices=True)
    out_pos = jnp.where(head & (rank < capacity), rank, capacity)  # capacity = drop slot

    src_idx = jnp.full((capacity,), n, dtype=jnp.int32)  # n = gather of padded zero row
    src_idx = src_idx.at[out_pos].set(idx_s, mode="drop")
    out_valid = src_idx < n
    padded = jnp.concatenate([points, jnp.zeros((1, 3), dtype=points.dtype)], axis=0)
    out_points = padded[jnp.minimum(src_idx, n)]

    num_kept = jnp.minimum(num_unique, capacity)
    return Downsampled(out_points, out_valid, num_kept, num_unique - num_kept)


class VoxelGroups(NamedTuple):
    """Points of one frame grouped by voxel, as a dense (rows, group_cap) table."""

    coords: jnp.ndarray  # (rows, 3) int32 voxel coords of each group
    group_valid: jnp.ndarray  # (rows,) bool
    candidates: jnp.ndarray  # (rows, group_cap, 3) float32
    cand_valid: jnp.ndarray  # (rows, group_cap) bool
    num_groups: jnp.ndarray  # () int32


@functools.partial(jax.jit, static_argnames=("voxel_size", "group_capacity"))
def group_by_voxel(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    voxel_size: float,
    group_capacity: int,
) -> VoxelGroups:
    """Group (N, 3) points by voxel into a dense (N, G, 3) candidate table.

    Feeds the map-insert kernel: the reference adds points to a voxel's
    std::vector one by one (VoxelHashMap.cpp:97-119); on TPU we materialize up
    to G candidates per voxel and run the accept/reject loop vectorized over
    all voxels at once. Candidates beyond G per voxel are dropped (the
    reference's proximity rejection would discard most of them anyway).
    Within a group, candidates keep ascending original-index order.
    """
    n = points.shape[0]
    coords = point_to_voxel(points, voxel_size)
    hi, lo = pack_voxel_keys(coords, valid)
    idx = jnp.arange(n, dtype=jnp.int32)
    hi_s, lo_s, idx_s = _sort_by_voxel_key(hi, lo, idx, n)

    valid_s = hi_s != KEY_SENTINEL
    prev_same = jnp.concatenate(
        [
            jnp.zeros((1,), dtype=bool),
            (hi_s[1:] == hi_s[:-1]) & (lo_s[1:] == lo_s[:-1]),
        ]
    )
    head = valid_s & ~prev_same
    group_id = jnp.cumsum(head.astype(jnp.int32)) - 1  # (n,) position of my group
    # Rank within the group: distance (in sorted position) to the segment head.
    pos = jnp.arange(n, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(head, pos, -1))
    rank = pos - jnp.maximum(seg_start, 0)

    num_groups = jnp.sum(head.astype(jnp.int32))
    g = group_capacity

    flat = jnp.where(valid_s & (rank < g), group_id * g + rank, n * g)
    padded = jnp.concatenate([points, jnp.zeros((1, 3), dtype=points.dtype)], axis=0)
    pts_s = padded[jnp.minimum(idx_s, n)]

    cand = jnp.zeros((n * g, 3), dtype=points.dtype).at[flat].set(pts_s, mode="drop")
    cand_valid = jnp.zeros((n * g,), dtype=bool).at[flat].set(valid_s, mode="drop")

    coords_pad = jnp.concatenate([coords, jnp.zeros((1, 3), jnp.int32)], axis=0)
    coords_s = coords_pad[jnp.minimum(idx_s, n)]
    rep_coords = (
        jnp.zeros((n, 3), dtype=jnp.int32)
        .at[jnp.where(head, group_id, n)]
        .set(coords_s, mode="drop")
    )
    group_valid = jnp.arange(n, dtype=jnp.int32) < num_groups

    return VoxelGroups(
        coords=rep_coords,
        group_valid=group_valid,
        candidates=cand.reshape(n, g, 3),
        cand_valid=cand_valid.reshape(n, g),
        num_groups=num_groups,
    )
