"""Robust point-to-point ICP (Gauss-Newton + Geman-McClure), fully on-device.

TPU-native equivalent of the reference Registration
(cpp/kiss_icp/core/Registration.cpp:52-167). Structural differences from the
C++/TBB design, all deliberate:

  * Data association (the reference's tbb::parallel_for NN search +
    concurrent_vector, Registration.cpp:60-78) is the batched 27-voxel gather
    `hash_map.query_nearest`; rejected pairs become zero weights instead of
    being compacted away, so every iteration is one fixed-shape XLA program.
  * The normal-equation reduction (tbb::parallel_reduce of (JTJ, JTr),
    Registration.cpp:101-118) is a masked einsum — deterministic, and the exact
    op that becomes a `jax.lax.psum` across devices when points are sharded
    (SURVEY.md section 2.2, P3).
  * The ICP loop (Registration.cpp:151-164) is a `lax.while_loop` with the same
    early exit `|dx| < convergence_criterion`, so compile once, run to
    convergence on-device.
  * **Recentering for float32**: the reference solves in float64 with world-frame
    lever arms `hat(source)` (Registration.cpp:84-87); at kilometer scale that
    makes JTJ too ill-conditioned for float32. We build the linear system with
    lever arms about the current sensor position `c` (source - c), solving for
    the increment expressed at `c`: exp(dx) is conjugated back as
    `T(c) @ exp(dx) @ T(-c)`. Identical fixed point in exact arithmetic,
    well-conditioned in f32.

Geman-McClure weight, exactly as the reference (Registration.cpp:95-98):
    w(r2) = kernel_scale^2 / (kernel_scale + r2)^2.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from kiss_icp_tpu.ops import hash_map, se3


class LinearSystem(NamedTuple):
    jtj: jnp.ndarray  # (6, 6) float32
    jtr: jnp.ndarray  # (6,) float32
    num_correspondences: jnp.ndarray  # () int32


def build_linear_system(
    source: jnp.ndarray,
    targets: jnp.ndarray,
    weights_mask: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    center: jnp.ndarray,
) -> LinearSystem:
    """Accumulate (JTJ, JTr) over one correspondence set (masked, recentered).

    Equivalent of the reference BuildLinearSystem (Registration.cpp:80-121) with
    J = [I3 | -hat(source - center)] and residual r = source - target. This
    function is the per-shard payload of the distributed solver: shards psum its
    outputs (6x6 + 6 + 1 scalars) and solve replicated.
    """
    r = source - targets  # (N, 3)
    r2 = jnp.sum(r * r, axis=-1)  # (N,)
    k = kernel_scale
    w = (k * k) / jnp.square(k + r2)  # GM weight (Registration.cpp:95-98)
    w = jnp.where(weights_mask, w, 0.0)

    s = source - center[None, :]  # recentered lever arms
    n = source.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=source.dtype), (n, 3, 3))
    jac = jnp.concatenate([eye, -se3.hat(s)], axis=-1)  # (N, 3, 6)

    hi = jax.lax.Precision.HIGHEST  # bf16 MXU rounding would sink the GN solve
    jtj = jnp.einsum("nij,n,nik->jk", jac, w, jac,
                     preferred_element_type=jnp.float32, precision=hi)
    jtr = jnp.einsum("nij,n,ni->j", jac, w, r,
                     preferred_element_type=jnp.float32, precision=hi)
    return LinearSystem(jtj, jtr, jnp.sum(weights_mask.astype(jnp.int32)))


def solve_increment(ls: LinearSystem) -> jnp.ndarray:
    """dx = solve(JTJ, -JTr) (reference uses LDLT, Registration.cpp:156).

    Guarded: with no correspondences (zero system) the increment is zero, a
    relative Tikhonov floor keeps near-singular systems finite in f32, any
    non-finite solve result becomes a zero step, and the step norm is capped
    at 10 (units m/rad — far above any sane GN step, so it only engages once
    registration has already diverged; it stops f32 overflow cascading into
    NaN poses, which the reference's f64 merely postpones).
    """
    scale = jnp.max(jnp.abs(jnp.diagonal(ls.jtj)))
    eps = jnp.where(scale > 0, scale * 1e-7, 1.0)
    jtj = ls.jtj + eps * jnp.eye(6, dtype=ls.jtj.dtype)
    dx = jax.scipy.linalg.solve(jtj, -ls.jtr, assume_a="pos")
    dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
    norm = jnp.linalg.norm(dx)
    dx = jnp.where(norm > 10.0, dx * (10.0 / norm), dx)
    return jnp.where(ls.num_correspondences > 0, dx, jnp.zeros_like(dx))


class AlignResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4) new world pose of the scan
    num_iterations: jnp.ndarray  # () int32
    num_correspondences: jnp.ndarray  # () int32 — at the last iteration
    num_dropped_compact: jnp.ndarray  # () int32 — live voxels missing from the
    # compacted query view ("compact*" nn modes; 0 elsewhere)


def gauss_newton_loop(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    initial_guess: jnp.ndarray,
    max_distance: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    *,
    query_fn,
    max_iterations: int,
    convergence: float,
    linsys_fn=build_linear_system,
    reduce_fn=lambda ls: ls,
    linsys_mask=None,
    any_active_fn=lambda a: a,
    unroll: int = 1,
):
    """The shared ICP while-loop (reference Registration.cpp:151-164).

    One implementation serves the single-device solver and both distributed
    variants — they differ only in how neighbors are found and how the
    normal equations reduce:

      * query_fn(src) -> (distances (N,), neighbors (N,3)) — NN association
        (local 27-voxel gather, optionally combined across map shards).
      * reduce_fn(LinearSystem) -> LinearSystem — identity on one device,
        psum over a mesh axis when correspondences are sharded.
      * linsys_mask (N,) — optional extra mask on the correspondences used
        for the reduction (e.g. a 1/D stripe per device).
      * unroll — GN iterations executed per while_loop trip. The loop body
        already FREEZES a converged solve (state passes through unchanged,
        `it` stops counting), so running the body `unroll` times per trip
        is EXACTLY equivalent to unroll=1 — same trajectory, same reported
        iteration count — while paying the while_loop's per-trip overhead
        (cond evaluation, loop-carry scheduling) 1/unroll as often. The
        hot loop is latency-bound at ~40 us/iteration (capacity ablation,
        docs/ARCHITECTURE.md), so trip-count halving is a direct lever on
        the serial floor; the cost is up to unroll-1 wasted (frozen) body
        evaluations at convergence. Under a sync_axis, every member runs
        the same unrolled body, so collective counts stay uniform.
      * any_active_fn(bool) -> bool — identity on one device. When several
        independent solves share one SPMD program but communicate over
        DISJOINT collective groups (the pod program: each seq row ring-
        combines over its own "map" subgroup), every device must execute the
        same NUMBER of collectives — XLA matches collective instances by
        program point across the whole launch, so a row exiting its loop
        early deadlocks the rows still iterating (measured: CPU collective-
        permute rendezvous timeout). The caller passes a cross-row
        any-reduce (e.g. psum over "seq" > 0); rows that are done keep
        executing the loop body with their state frozen via jnp.where.

    Returns (t_icp (4,4), iterations ()) with t_icp the correction such that
    final pose = t_icp @ initial_guess.
    """
    guess = initial_guess.astype(jnp.float32)
    src0 = se3.transform(guess, points)
    center = guess[:3, 3]

    def cond(carry):
        _, _, it, done = carry
        return any_active_fn((it < max_iterations) & ~done)

    def body(carry):
        src, t_icp, it, done = carry
        dist, neighbors = query_fn(src)
        corr = jnp.isfinite(dist) & valid & (dist < max_distance)
        ls_mask = corr if linsys_mask is None else corr & linsys_mask
        ls = reduce_fn(linsys_fn(src, neighbors, ls_mask, kernel_scale, center))
        dx = solve_increment(ls)
        est_local = se3.se3_exp(dx)
        # Conjugate the recentered increment back to the world frame.
        est = est_local.at[:3, 3].add(center - est_local[:3, :3] @ center)
        new_src = se3.transform(est, src)
        new_t_icp = est @ t_icp
        # Convergence uses the increment expressed at the WORLD origin like
        # the reference (`dx.norm() < criterion`, Registration.cpp:163): the
        # recentered dx has the smaller translation |v - w x c| — stopping on
        # it alone would terminate earlier than the reference every frame.
        v, w = dx[:3], dx[3:]
        v_world = v - jnp.cross(w, center)
        new_done = jnp.sqrt(
            jnp.sum(v_world * v_world) + jnp.sum(w * w)) < convergence
        # Freeze once converged: under a shared SPMD program (any_active_fn)
        # a done row keeps executing the body — its collectives must still
        # fire — but its state stops moving. Single device: done rows never
        # re-enter the body, so the wheres are dead and fold away.
        frozen = done | (it >= max_iterations)
        src = jnp.where(frozen, src, new_src)
        t_icp = jnp.where(frozen, t_icp, new_t_icp)
        it = jnp.where(frozen, it, it + 1)
        done = done | new_done
        return src, t_icp, it, done

    # Fresh loop-carry constants derive their varying-manual-axes type from
    # max_distance (shard_map check_vma: under a mesh the loop outputs are
    # mesh-varying, so the initial carries must be too). done0 is always
    # False — `x < -inf` is False even for NaN — and everything folds to a
    # constant in the single-device path.
    def body_unrolled(carry):
        for _ in range(max(1, int(unroll))):
            carry = body(carry)
        return carry

    done0 = max_distance < -jnp.inf
    it0 = jnp.where(done0, jnp.int32(1), jnp.int32(0))
    t_icp0 = jnp.where(done0, jnp.zeros((4, 4), jnp.float32), se3.identity())
    _, t_icp, iters, _ = jax.lax.while_loop(
        cond, body_unrolled, (src0, t_icp0, it0, done0),
    )
    return t_icp, iters


def gauss_newton_loop_cached(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    initial_guess: jnp.ndarray,
    max_distance: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    *,
    gather_fn,
    refresh_dist: float,
    max_iterations: int,
    convergence: float,
    linsys_fn=build_linear_system,
):
    """ICP while-loop with CACHED data association (nn_mode="cached").

    The expensive half of an iteration is the 27-voxel candidate gather
    (~all of its HBM traffic); between iterations the source moves by
    millimeters, so the gather's result barely changes. This loop gathers
    each source point's `cache_size` nearest candidates once
    (`gather_fn(src) -> (cand (N,C,3), cand_valid (N,C))`), then iterates
    Gauss-Newton re-selecting the nearest WITHIN the cache — re-gathering
    only when the exact per-point motion since the last gather exceeds
    `refresh_dist` (so a bad initial guess degrades to the uncached cost,
    never to a wrong answer class). Association can differ from the
    reference's re-probe-every-iteration (Registration.cpp:151-164) only
    for points whose true NN left the cached top-C — bounded by the robust
    GM weighting and validated against the f64 oracle
    (tests/test_cached_assoc.py).

    Returns (t_icp, iterations, num_regathers).
    """
    guess = initial_guess.astype(jnp.float32)
    src0 = se3.transform(guess, points)
    center = guess[:3, 3]
    n = points.shape[0]

    def gather(src):
        return gather_fn(src)

    cand0, cval0 = gather(src0)

    def cond(carry):
        return (carry[2] < max_iterations) & ~carry[3]

    def body(carry):
        src, t_icp, it, done, cand, cval, moved, ref_src, n_regather = carry

        # Refresh when any point moved more than refresh_dist since the last
        # gather (exact bound: max |src - src_at_gather|).
        need = moved > refresh_dist

        def do_regather(_):
            c, v = gather(src)
            return c, v, src, n_regather + 1

        def keep(_):
            return cand, cval, ref_src, n_regather

        cand, cval, ref_src, n_regather = jax.lax.cond(
            need, do_regather, keep, None)

        d2 = jnp.sum((src[:, None, :] - cand) ** 2, axis=-1)  # (N, C)
        d2 = jnp.where(cval, d2, jnp.inf)
        best = jnp.argmin(d2, axis=-1)
        best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
        nn = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0]
        dist = jnp.sqrt(best_d2)

        corr = jnp.isfinite(dist) & valid & (dist < max_distance)
        ls = linsys_fn(src, nn, corr, kernel_scale, center)
        dx = solve_increment(ls)
        est_local = se3.se3_exp(dx)
        est = est_local.at[:3, 3].add(center - est_local[:3, :3] @ center)
        src = se3.transform(est, src)
        t_icp = est @ t_icp

        v, w = dx[:3], dx[3:]
        v_world = v - jnp.cross(w, center)
        done = jnp.sqrt(jnp.sum(v_world * v_world) + jnp.sum(w * w)) < convergence
        moved = jnp.max(
            jnp.where(valid, jnp.linalg.norm(src - ref_src, axis=-1), 0.0))
        return src, t_icp, it + 1, done, cand, cval, moved, ref_src, n_regather

    _, t_icp, iters, _, _, _, _, _, n_regather = jax.lax.while_loop(
        cond, body,
        (src0, se3.identity(), jnp.zeros((), jnp.int32), jnp.zeros((), bool),
         cand0, cval0, jnp.zeros(()), src0, jnp.zeros((), jnp.int32)),
    )
    return t_icp, iters, n_regather


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_iterations", "convergence", "use_pallas",
                     "nn_mode", "nn_live_capacity_log2", "nn_probe_length",
                     "assoc_cache_size", "assoc_refresh_dist", "gn_unroll"),
)
def align_points_to_map(
    cfg: hash_map.MapConfig,
    m: hash_map.VoxelMap,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    initial_guess: jnp.ndarray,
    max_distance: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    *,
    max_iterations: int,
    convergence: float,
    use_pallas: bool = False,
    nn_mode: str = "gather27",
    nn_live_capacity_log2: int = 15,
    nn_probe_length: int = 8,
    assoc_cache_size: int = 8,
    assoc_refresh_dist: float = 0.25,
    gn_unroll: int = 1,
) -> AlignResult:
    """Register one (body-frame) source scan against the local map.

    Mirrors Registration::AlignPointsToMap (Registration.cpp:138-167): empty map
    returns the guess; otherwise iterate NN association + robust GN until
    `|dx| < convergence` or `max_iterations`.

    `nn_mode` selects among bit-identical data-association strategies (see
    config.schema.EngineConfig.nn_mode); "compact*" modes build the dense
    live-voxel view once here and query it every iteration.
    """
    guess = initial_guess.astype(jnp.float32)

    if use_pallas:
        from kiss_icp_tpu.ops.pallas_kernels import build_linear_system_fused

        linsys = build_linear_system_fused
    else:
        linsys = build_linear_system

    num_dropped_compact = jnp.zeros((), jnp.int32)
    if nn_mode in ("compact", "compact_loop"):
        from kiss_icp_tpu.ops import compact_map as cmod

        ccfg = cmod.CompactConfig(
            live_capacity_log2=nn_live_capacity_log2,
            hash_capacity_log2=nn_live_capacity_log2 + 2,
            probe_length=nn_probe_length,
        )
        cm = cmod.build_compact(cfg, ccfg, m)
        num_dropped_compact = cm.num_dropped
        query = (cmod.query_nearest_compact if nn_mode == "compact"
                 else cmod.query_nearest_compact_loop)

        def nn(src):
            # Overflow fallback (CompactConfig docstring contract): when the
            # map has more live voxels than the compact view can represent,
            # query the full sparse map instead — accuracy is preserved, only
            # the speed advantage is lost. The drop count still surfaces
            # through FrameResult so the pipeline can tell the user to raise
            # nn_live_capacity_log2.
            return jax.lax.cond(
                cm.num_dropped > 0,
                lambda s: hash_map.query_nearest(cfg, m, s, valid),
                lambda s: query(cfg, ccfg, cm, s, valid),
                src,
            )
    elif nn_mode == "pallas_fused":
        from kiss_icp_tpu.ops import pallas_nn

        def nn(src):
            return pallas_nn.query_nearest_fused_auto(cfg, m, src, valid)
    elif nn_mode == "loop27":
        def nn(src):
            return hash_map.query_nearest_loop(cfg, m, src, valid)
    elif nn_mode in ("gather27", "cached"):
        def nn(src):
            return hash_map.query_nearest(cfg, m, src, valid)
    else:
        raise ValueError(f"unknown nn_mode: {nn_mode!r}")

    if nn_mode == "cached":
        def gather_fn(src):
            return hash_map.query_topc(cfg, m, src, assoc_cache_size)

        t_icp, iters, _ = gauss_newton_loop_cached(
            points, valid, guess, max_distance, kernel_scale,
            gather_fn=gather_fn,
            refresh_dist=float(assoc_refresh_dist),
            max_iterations=max_iterations, convergence=convergence,
            linsys_fn=linsys,
        )
    else:
        def query_fn(src):
            q = nn(src)
            return q.distances, q.neighbors

        t_icp, iters = gauss_newton_loop(
            points, valid, guess, max_distance, kernel_scale,
            query_fn=query_fn, max_iterations=max_iterations,
            convergence=convergence, linsys_fn=linsys,
            unroll=gn_unroll,
        )

    # Final correspondence count for diagnostics (one extra association).
    q = nn(se3.transform(t_icp @ guess, points))
    n_corr = jnp.sum((q.found & (q.distances < max_distance)).astype(jnp.int32))

    empty = hash_map.is_empty(m)
    pose = jnp.where(empty, guess, t_icp @ guess)
    return AlignResult(pose, jnp.where(empty, 0, iters), n_corr,
                       num_dropped_compact)
