"""Fused Pallas candidate-evaluation kernel for the 27-voxel NN search.

Division of labor, set by what the hardware can actually do (probed compiled
on the real chip, 2026-08-17 — see docs/ARCHITECTURE.md "NN gather" section):

  * Mosaic has NO vectorized gather: `jnp.take` / `take_along_axis` with
    vector indices fails to lower (or crashes the remote compiler); only
    serial per-row DMA loops compile, orders too slow for ~221k rows per ICP
    iteration. Irregular access is the XLA gather engine's job.
  * Mosaic also lowers no element-wise expansion (`jnp.repeat`,
    broadcast+reshape both fail; `pltpu.repeat` is tile-semantics), so
    per-neighbor metadata cannot be spread across a flat 27*P*3-lane row
    inside the kernel. The grid does it instead: neighbor j is a (minor)
    grid dimension, and BlockSpec index maps deliver exactly neighbor j's
    candidate slab and count column to each step — zero in-kernel shuffling.

So: XLA performs the fingerprint probe and the raw point-row gather (storage
dtype, never decoded on the XLA side); this kernel streams the gathered
candidates through VMEM once, doing u16 decode, distances, masking, and the
27*P-way running min over the j grid steps — the output block (N-blocked
best-d2/best-point) stays resident in VMEM across all 27 steps and is the
only thing ever written back. The (N, 27, P) distance tensor and the three
argmin/take passes of the jnp path never touch HBM.

No in-kernel gathers are needed for the u16 decode corners: neighbor j's
voxel is `floor(query / v) + SHIFT[j]`, and SHIFT[j] comes from j's base-3
digits — scalar arithmetic on the grid index.

Reference semantics mirrored exactly (VoxelHashMap.cpp:46-70): masked
candidates, lowest-flat-index tie-breaking (ascending-j strict-< update +
lowest lane within a step), f32 arithmetic in the same operation order as
ops/hash_map.query_nearest (bit-identical distances — tests/test_pallas_nn.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kiss_icp_tpu.ops import voxel as voxel_ops
from kiss_icp_tpu.ops.hash_map import (
    _NEIGHBOR_SHIFTS,
    _U16_SCALE,
    MapConfig,
    QueryResult,
    VoxelMap,
    _window_fp,
    fingerprint,
    window_row,
)

_BLOCK_Q = 512  # queries per grid step


def _candidate_kernel(q_ref, cand_ref, cnt_ref, scal_ref, d2_ref, pt_ref,
                      *, p: int, quantized: bool):
    lanes = 3 * p
    b = q_ref.shape[0]
    v = scal_ref[0, 0]
    dec = scal_ref[0, 1]  # v / 65535 for u16 storage (unused for f32)
    j = pl.program_id(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, lanes), 1)
    csel = lane % 3  # coordinate channel
    q_pat = lane // 3  # point lane within the voxel row

    q = q_ref[:]  # (B, 3) f32
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]  # (B, 1)

    def bc(col):  # (B, 1) -> (B, lanes)
        return jnp.broadcast_to(col, (b, lanes))

    qc = jnp.where(csel == 0, bc(qx), jnp.where(csel == 1, bc(qy), bc(qz)))

    cand = cand_ref[0]  # (B, lanes) storage dtype
    if quantized:
        # Neighbor j's voxel corner: floor(query/v) + SHIFT[j], with SHIFT[j]
        # from j's base-3 digits under {0: 0, 1: 1, 2: -1} (the enumeration
        # order of _NEIGHBOR_SHIFTS). Identical op order to
        # hash_map.decode_points (stored * dec + corner) for bit-identical
        # distances.
        def m3(t):
            return jnp.where(t == 2, -1, t).astype(jnp.float32)

        sx, sy, sz = m3(j // 9), m3((j // 3) % 3), m3(j % 3)
        vx = jnp.floor(qx / v) + sx
        vy = jnp.floor(qy / v) + sy
        vz = jnp.floor(qz / v) + sz
        qvc = jnp.where(csel == 0, bc(vx), jnp.where(csel == 1, bc(vy), bc(vz)))
        corner = qvc * v
        # u16 -> f32 via i32: Mosaic has no direct u16->f32 cast (probed on
        # hardware); the i32 hop is exact for the full 16-bit range.
        target = cand.astype(jnp.int32).astype(jnp.float32) * dec + corner
    else:
        target = cand

    diff = qc - target
    sq = diff * diff
    # d2 at c==0 lanes: sq_x + sq_y + sq_z in jnp.sum's (x+y)+z order.
    d2 = (sq + pltpu.roll(sq, lanes - 1, 1)) + pltpu.roll(sq, lanes - 2, 1)

    cnt = cnt_ref[0]  # (B, 1) i32 — this neighbor's count (0 if absent)
    mask = (csel == 0) & (q_pat < jnp.broadcast_to(cnt, (b, lanes)))
    inf = jnp.float32(jnp.inf)
    d2m = jnp.where(mask, d2, inf)

    best = jnp.min(d2m, axis=1, keepdims=True)  # (B, 1)
    at_min = mask & (d2m == best)
    big = jnp.int32(lanes)
    first_lane = jnp.min(jnp.where(at_min, lane, big), axis=1, keepdims=True)
    firstm = at_min & (lane == first_lane)  # exactly one lane set (or none)

    zero = jnp.zeros((b, lanes), jnp.float32)
    px = jnp.sum(jnp.where(firstm, target, zero), axis=1, keepdims=True)
    py = jnp.sum(jnp.where(firstm, pltpu.roll(target, lanes - 1, 1), zero),
                 axis=1, keepdims=True)
    pz = jnp.sum(jnp.where(firstm, pltpu.roll(target, lanes - 2, 1), zero),
                 axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        d2_ref[:] = best
        pt_ref[:, 0:1] = px
        pt_ref[:, 1:2] = py
        pt_ref[:, 2:3] = pz

    @pl.when(j > 0)
    def _():
        prev = d2_ref[:]
        improve = best < prev  # strict <: ascending j keeps the lowest j
        d2_ref[:] = jnp.where(improve, best, prev)
        pt = pt_ref[:]
        upd = jnp.concatenate([px, py, pz], axis=1)
        pt_ref[:] = jnp.where(jnp.broadcast_to(improve, (b, 3)), upd, pt)


@functools.partial(jax.jit, static_argnames=("p", "quantized", "interpret"))
def evaluate_candidates(
    queries: jnp.ndarray,  # (N, 3) f32
    cand: jnp.ndarray,  # (27, N, 3P) storage dtype (raw, undecoded rows)
    cnt: jnp.ndarray,  # (27, N, 1) int32 (0 for nonexistent neighbors)
    voxel_size: float,
    *,
    p: int,
    quantized: bool,
    interpret: bool = False,
):
    """Masked 27*P-way nearest candidate per query: (best_d2 (N,), pt (N, 3)).

    The neighbor axis leads (27, N, ...) because Mosaic block shapes must
    have their second-to-last dimension 8-divisible or full — the caller's
    gather produces this order directly from a transposed slot index, so no
    big transpose is ever materialized.
    """
    n = queries.shape[0]
    lanes = 3 * p
    pad = (-n) % _BLOCK_Q
    if pad:
        queries = jnp.pad(queries, ((0, pad), (0, 0)))
        cand = jnp.pad(cand, ((0, 0), (0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, 0), (0, pad), (0, 0)))
    blocks = queries.shape[0] // _BLOCK_Q

    # The decode scale is divided in f32 exactly as hash_map.decode_points
    # does it, so quantized distances stay bit-identical to the jnp path.
    v32 = jnp.float32(voxel_size)
    scal = jnp.stack([v32, v32 / jnp.float32(_U16_SCALE)]).reshape(1, 2)

    kern = functools.partial(_candidate_kernel, p=p, quantized=quantized)
    d2, pt = pl.pallas_call(
        kern,
        grid=(blocks, 27),  # j minor: the output block stays VMEM-resident
        in_specs=[
            pl.BlockSpec((_BLOCK_Q, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_Q, lanes), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_Q, 1), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_Q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_Q, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((blocks * _BLOCK_Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((blocks * _BLOCK_Q, 3), jnp.float32),
        ],
        interpret=interpret,
    )(queries, cand, cnt, scal)
    return d2[:n, 0], pt[:n]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def query_nearest_fused(cfg: MapConfig, m: VoxelMap, queries: jnp.ndarray,
                        valid: jnp.ndarray, *,
                        interpret: bool = False) -> QueryResult:
    """27-voxel NN: XLA fingerprint probe + raw row gather, Pallas candidate
    evaluation. Bit-identical results to hash_map.query_nearest."""
    k = cfg.probe_length
    p = cfg.max_points_per_voxel
    n = queries.shape[0]

    qvox = voxel_ops.point_to_voxel(queries, cfg.voxel_size)  # (N, 3)
    shifts = jnp.asarray(_NEIGHBOR_SHIFTS)
    neigh = qvox[:, None, :] + shifts[None, :, :]  # (N, 27, 3)
    target_fp = fingerprint(neigh)
    rows = window_row(neigh, cfg.capacity_log2, k)

    window_fp = _window_fp(m.fprints, rows, k)  # row gather (see window_row)
    match = window_fp == target_fp[..., None]
    has_voxel = jnp.any(match, axis=-1)
    first = jnp.argmax(match, axis=-1)
    slot = (rows << (k.bit_length() - 1)) + first
    exact = jnp.all(m.vkeys[slot] == neigh, axis=-1)
    has_voxel = has_voxel & exact
    slot = jnp.where(has_voxel, slot, 0)

    # Neighbor-major order for the kernel (see evaluate_candidates): the
    # transpose happens on the small (N, 27) i32 slot/count arrays; the big
    # point-row gather then PRODUCES (27, N, P, 3) directly.
    slot_t = jnp.swapaxes(slot, 0, 1)  # (27, N)
    cnt_t = jnp.where(jnp.swapaxes(has_voxel, 0, 1), m.counts[slot_t], 0)
    cand = m.points[slot_t].reshape(27, n, 3 * p)  # raw storage dtype

    best_d2, pt = evaluate_candidates(
        queries, cand, cnt_t[..., None], cfg.voxel_size,
        p=p, quantized=(cfg.storage == "u16"), interpret=interpret,
    )
    found = jnp.isfinite(best_d2) & valid
    return QueryResult(pt, jnp.sqrt(best_d2), found)


def query_nearest_fused_auto(cfg: MapConfig, m: VoxelMap, queries: jnp.ndarray,
                             valid: jnp.ndarray) -> QueryResult:
    """Compiled Mosaic on TPU, interpreter elsewhere (CPU tests run the
    identical program)."""
    interpret = jax.default_backend() != "tpu"
    return query_nearest_fused(cfg, m, queries, valid, interpret=interpret)
