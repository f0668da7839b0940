"""Pallas TPU kernels for the registration hot path.

`build_linear_system_pallas` fuses the whole per-correspondence pipeline of
the reference's BuildLinearSystem (cpp/kiss_icp/core/Registration.cpp:80-121)
— residuals, Geman-McClure weights, Jacobian construction, and the (JTJ, JTr)
reduction — into one VMEM-resident pass per point block: nothing (N,3,6)-sized
is ever materialized in HBM, and the 6x6 contraction runs on the MXU per
block. Data is laid out channels-first (3, N): the point axis rides the
128-lane dimension, which is what Mosaic tiles natively (a lane dimension of
3 does not lower). Falls back to interpret mode off-TPU so the same code path
is testable on the CPU mesh.

The jnp implementation (ops/registration.build_linear_system) remains the
default; this kernel is a drop-in replacement validated against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kiss_icp_tpu.ops.registration import LinearSystem

_BLOCK = 2048


def _linsys_kernel(src_ref, tgt_ref, mask_ref, scalars_ref, out_ref):
    """One grid step over a (3, BLOCK) channels-first slab of correspondences.

    Output is one TPU-tile-aligned (8, 128) slab per block holding the (8, 8)
    extended normal matrix in its first columns: JTJ in [0:6, 0:6] and JTr in
    [0:6, 6] (the residual rides as a 7th Jacobian row, so one MXU contraction
    produces both). scalars_ref holds [kernel_scale, cx, cy, cz] in SMEM.
    """
    k = scalars_ref[0, 0]
    cx, cy, cz = scalars_ref[0, 1], scalars_ref[0, 2], scalars_ref[0, 3]

    src = src_ref[:]  # (3, B)
    tgt = tgt_ref[:]  # (3, B)
    mask = mask_ref[:]  # (1, B)

    r = src - tgt  # (3, B)
    r2 = jnp.sum(r * r, axis=0, keepdims=True)  # (1, B)
    w = (k * k) / jnp.square(k + r2)  # GM weight (Registration.cpp:95-98)
    w = jnp.where(mask != 0, w, 0.0)  # (1, B)

    sx = src[0:1, :] - cx  # (1, B) recentered lever arms
    sy = src[1:2, :] - cy
    sz = src[2:3, :] - cz

    b = src.shape[1]
    # Per residual channel c, the Jacobian row J_c is a 6-vector per point:
    # J = [I3 | -hat(s)], -hat(s) = [[0, sz, -sy], [-sz, 0, sx], [sy, -sx, 0]].
    # Build each channel as a sublane-8-padded (8, B) slab with iota+select —
    # Mosaic does not lower sublane concats of 1-row pieces ("offset mismatch
    # on non-concat dimension"), while broadcasts and selects tile natively.
    row = jax.lax.broadcasted_iota(jnp.int32, (8, b), 0)

    def bc(v):  # (1, B) -> (8, B)
        return jnp.broadcast_to(v, (8, b))

    one = jnp.ones((8, b), src.dtype)
    zero = jnp.zeros((8, b), src.dtype)
    # Row 6 carries the channel residual, so ONE contraction yields both JTJ
    # ([0:6, 0:6]) and JTr ([0:6, 6]) — and no (1, 3B) residual vector needs
    # concatenating (lane-concats of sublane-offset slices do not lower).
    jc_x = (
        jnp.where(row == 0, one, zero)
        + jnp.where(row == 4, bc(sz), zero)
        + jnp.where(row == 5, bc(-sy), zero)
        + jnp.where(row == 6, bc(r[0:1, :]), zero)
    )
    jc_y = (
        jnp.where(row == 1, one, zero)
        + jnp.where(row == 3, bc(-sz), zero)
        + jnp.where(row == 5, bc(sx), zero)
        + jnp.where(row == 6, bc(r[1:2, :]), zero)
    )
    jc_z = (
        jnp.where(row == 2, one, zero)
        + jnp.where(row == 3, bc(sy), zero)
        + jnp.where(row == 4, bc(-sx), zero)
        + jnp.where(row == 6, bc(r[2:3, :]), zero)
    )

    # Fold the three residual channels into one lane-contraction (Mosaic
    # supports only constant accumulators, so no dot += dot loop): stack the
    # channel Jacobians side by side along the lanes (identical sublane
    # extents and offsets — the only concat Mosaic lowers).
    big_j = jnp.concatenate([jc_x, jc_y, jc_z], axis=1)  # (8, 3B)
    w3 = jnp.concatenate([bc(w), bc(w), bc(w)], axis=1)  # (8, 3B)
    wj = big_j * w3
    jtj8 = jax.lax.dot_general(
        wj, big_j, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (8, 8): JTJ block, JTr column/row at index 6, sum(w r^2) at [6, 6]

    out_ref[0] = jnp.concatenate(
        [jtj8, jnp.zeros((8, 120), jnp.float32)], axis=1
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def build_linear_system_pallas(
    source: jnp.ndarray,
    targets: jnp.ndarray,
    weights_mask: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    center: jnp.ndarray,
    *,
    interpret: bool = False,
) -> LinearSystem:
    """Drop-in fused equivalent of registration.build_linear_system."""
    n = source.shape[0]
    pad = (-n) % _BLOCK
    if pad:
        source = jnp.pad(source, ((0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, pad), (0, 0)))
        weights_mask = jnp.pad(weights_mask, (0, pad))
    blocks = source.shape[0] // _BLOCK

    scalars = jnp.concatenate(
        [jnp.reshape(kernel_scale.astype(jnp.float32), (1,)),
         center.astype(jnp.float32)]
    ).reshape(1, 4)

    src_t = source.T  # (3, N) channels-first
    tgt_t = targets.T
    mask_t = weights_mask.astype(jnp.float32).reshape(1, -1)

    slabs = pl.pallas_call(
        _linsys_kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((3, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((blocks, 8, 128), jnp.float32),
        interpret=interpret,
    )(src_t, tgt_t, mask_t, scalars)

    slab = jnp.sum(slabs, axis=0)  # (8, 128)
    return LinearSystem(
        jtj=slab[0:6, 0:6],
        jtr=slab[0:6, 6],
        num_correspondences=jnp.sum(weights_mask.astype(jnp.int32)),
    )


def build_linear_system_fused(
    source: jnp.ndarray,
    targets: jnp.ndarray,
    weights_mask: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    center: jnp.ndarray,
) -> LinearSystem:
    """`build_linear_system_pallas` with the interpret flag picked for the
    active backend: compiled Mosaic on TPU, interpreter elsewhere (CPU mesh
    tests run the identical program)."""
    interpret = jax.default_backend() != "tpu"
    return build_linear_system_pallas(
        source, targets, weights_mask, kernel_scale, center, interpret=interpret
    )
