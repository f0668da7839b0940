"""Per-op decomposition of one steady-state odometry frame, by measurement.

VERDICT r4 next #2 asked where the non-roofline third of the frame time
goes. jax.profiler traces through the axon dev tunnel return cost-model
output, not measurements (BASELINE.md round-4 "profiling dead end"), so the
attribution comes from timing each pipeline stage as its OWN XLA program on
representative full-occupancy inputs:

    preprocess       deskew + range crop of the raw padded scan
    downsample_frame voxel filter at 0.5 * voxel_size (map-update cloud)
    downsample_source voxel filter at 1.5 * voxel_size (ICP source)
    nn_query         ONE 27-voxel NN gather against the full map
    gn_iteration     nn_query + linear system + solve (one GN step)
    insert           merge the frame into the map (claim rounds + accept)
    trim             far-voxel removal

The parts model `prep + ds_f + ds_s + mean_iters * gn_iteration + insert +
trim` is compared against the measured fused per-frame time of the chunked
production program; the residual is what per-op isolation cannot see
(inter-op fusion wins, dispatch, scan overhead) and is reported, not hidden.

Caveats: each part is timed as a standalone program, so XLA may fuse it
differently than inside the fused frame (parts are an upper bound for the
element ops and the comparison says so); and the tunnel's slow-execution
lottery applies per program — the tool times `--rounds` rounds per op and
keeps the MIN, and flags the run when the fused frame time disagrees with
the bench band.

Usage:
    python -m kiss_icp_tpu.tools.op_breakdown [--config soak|headline]
        [--frames N] [--rounds R] [--json-out F] [--out F]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _soak_overrides(kind: str) -> dict:
    if kind == "soak":
        return {"engine.map_storage": "u16", "data.max_range": 70.0}
    return {}


def _scans(cfg, n_frames):
    """Bench drive cache when available (the numbers then decompose exactly
    the drive the soak child measures); small synthetic drive otherwise."""
    from kiss_icp_tpu.tools.error_budget import _bench_module

    bench = _bench_module()
    if bench is not None and bench._scan_cache_ready(bench._config(),
                                                     n_frames):
        _, pts, ts, valid = bench._scans(bench._config(), n_frames)
        return pts, ts, valid
    from kiss_icp_tpu.datasets.synthetic import SyntheticDataset

    cap = int(cfg.engine.max_points_per_frame)
    ds = SyntheticDataset(sequence=0, n_scans=n_frames,
                          n_beams=min(64, max(16, cap // 1024)),
                          n_azimuth=min(1024, max(256, cap // 64)),
                          max_range=float(cfg.data.max_range),
                          speed=1.0, accel_frames=min(30, n_frames // 2))
    pts = np.zeros((n_frames, cap, 3), np.float32)
    ts = np.zeros((n_frames, cap), np.float32)
    valid = np.zeros((n_frames, cap), bool)
    for i in range(n_frames):
        p, t = ds[i]
        n = min(len(p), cap)
        pts[i, :n] = p[:n]
        if len(t):
            ts[i, :n] = t[:n]
        valid[i, :n] = True
    return pts, ts, valid


def run_breakdown(config_kind: str = "soak", n_frames: int = 240,
                  rounds: int = 30, chunk: int = 24) -> dict:
    import functools

    import jax
    import jax.numpy as jnp

    from kiss_icp_tpu.odometry import (
        init_state, make_chunked_step, map_config, register_frame,
        resolve_use_pallas,
    )
    from kiss_icp_tpu.ops import hash_map, preprocess, registration, se3, voxel
    from kiss_icp_tpu.tools.error_budget import _bench_config

    cfg = _bench_config(**_soak_overrides(config_kind))
    mcfg = map_config(cfg)
    vsize = float(cfg.mapping.voxel_size)
    pts, ts, valid = _scans(cfg, n_frames)
    n_frames = pts.shape[0]

    # ---- build the full-occupancy state (timed only as a whole) -----------
    chunk_step = make_chunked_step(cfg)
    state = init_state(cfg)
    log(f"building steady state over {n_frames} frames...")
    t0 = time.perf_counter()
    summaries = []
    for c in range(n_frames // chunk):
        sl = slice(c * chunk, (c + 1) * chunk)
        state, summary = chunk_step(state, pts[sl], ts[sl], valid[sl])
        summaries.append(summary)
    jax.block_until_ready(summaries[-1].poses)
    build_s = time.perf_counter() - t0
    log(f"steady state built in {build_s:.1f}s")

    # ---- fused per-frame reference times ---------------------------------
    def timed(fn, *args, n=rounds):
        fn(*args)  # warmup (compile)
        best = np.inf
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    last = slice(n_frames - chunk, n_frames)

    def fused_chunk(state_in):
        st, summary = chunk_step(state_in, pts[last], ts[last], valid[last])
        return summary.poses

    # Chunked timing consumes (donates) its input state: pre-stage copies.
    state_host = jax.tree.map(np.asarray, state)
    cr = min(rounds, 8)
    staged = [jax.tree.map(jnp.asarray, state_host) for _ in range(cr + 1)]
    fused_chunk(staged.pop())
    best = np.inf
    for st in staged:
        t0 = time.perf_counter()
        out = fused_chunk(st)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    frame_fused_s = best / chunk
    log(f"fused chunked frame: {frame_fused_s * 1e3:.3f} ms")

    state = jax.tree.map(jnp.asarray, state_host)  # pristine steady state

    # ---- representative intermediates ------------------------------------
    fidx = n_frames - 1
    p_in = jnp.asarray(pts[fidx])
    t_in = jnp.asarray(ts[fidx])
    v_in = jnp.asarray(valid[fidx])

    @jax.jit
    def prep_fn(p, t, v, delta):
        return preprocess.preprocess(
            p, t, v, delta, max_range=float(cfg.data.max_range),
            min_range=float(cfg.data.min_range),
            deskew=bool(cfg.data.deskew))

    prep = prep_fn(p_in, t_in, v_in, state.delta)

    ds_frame_fn = jax.jit(functools.partial(
        voxel.voxel_downsample, voxel_size=vsize * 0.5,
        capacity=int(cfg.engine.frame_capacity)))
    ds_source_fn = jax.jit(functools.partial(
        voxel.voxel_downsample, voxel_size=vsize * 1.5,
        capacity=int(cfg.engine.source_capacity)))
    frame_ds = ds_frame_fn(prep.points, prep.valid)
    source = ds_source_fn(frame_ds.points, frame_ds.valid)

    from kiss_icp_tpu.ops import threshold as thr

    sigma = thr.compute_threshold(state.threshold)
    guess = state.pose @ state.delta
    src_world = se3.transform(guess.astype(jnp.float32), source.points)
    center = guess[:3, 3].astype(jnp.float32)
    world_points = se3.transform(guess.astype(jnp.float32), frame_ds.points)
    jax.block_until_ready(world_points)

    # ---- per-op programs --------------------------------------------------
    nn_fn = jax.jit(functools.partial(hash_map.query_nearest, mcfg))

    if resolve_use_pallas(cfg):
        from kiss_icp_tpu.ops.pallas_kernels import build_linear_system_fused
        linsys = build_linear_system_fused
    else:
        linsys = registration.build_linear_system

    @jax.jit
    def gn_iter_fn(m, src, v, sig, c):
        q = hash_map.query_nearest(mcfg, m, src, v)
        corr = jnp.isfinite(q.distances) & v & (q.distances < 3.0 * sig)
        ls = linsys(src, q.neighbors, corr, sig, c)
        dx = registration.solve_increment(ls)
        return dx

    # insert/trim donate their map argument: re-jit the raw functions
    # without donation so timed rounds can reuse one map.
    insert_fn = jax.jit(functools.partial(hash_map.insert.__wrapped__, mcfg))
    trim_fn = jax.jit(functools.partial(hash_map.trim.__wrapped__, mcfg))

    parts = {}
    parts["preprocess"] = timed(prep_fn, p_in, t_in, v_in, state.delta)
    parts["downsample_frame"] = timed(ds_frame_fn, prep.points, prep.valid)
    parts["downsample_source"] = timed(
        ds_source_fn, frame_ds.points, frame_ds.valid)
    parts["nn_query"] = timed(nn_fn, state.map, src_world, source.valid)
    parts["gn_iteration"] = timed(
        gn_iter_fn, state.map, src_world, source.valid, sigma, center)
    parts["insert"] = timed(
        insert_fn, state.map, world_points, frame_ds.valid)
    parts["trim"] = timed(trim_fn, state.map, state.pose[:3, 3])
    for k, v in parts.items():
        log(f"  {k:18s} {v * 1e6:9.1f} us")

    # ---- diagnostics reads (after ALL timing) -----------------------------
    iters = np.concatenate([np.asarray(s.num_iterations) for s in summaries])
    steady_iters = iters[len(iters) // 2:]
    mean_iters = float(np.mean(steady_iters))
    fill = int(np.asarray(state.map.total_points))

    model_s = (parts["preprocess"] + parts["downsample_frame"]
               + parts["downsample_source"]
               + mean_iters * parts["gn_iteration"]
               + parts["insert"] + parts["trim"])
    out = {
        "config": config_kind,
        "device": str(jax.devices()[0].device_kind),
        "n_frames": int(n_frames),
        "map_points": fill,
        "mean_gn_iters_steady": round(mean_iters, 2),
        "frame_fused_ms": round(frame_fused_s * 1e3, 4),
        "parts_us": {k: round(v * 1e6, 1) for k, v in parts.items()},
        "gn_total_us": round(mean_iters * parts["gn_iteration"] * 1e6, 1),
        "model_frame_ms": round(model_s * 1e3, 4),
        "model_vs_fused_pct": round(100.0 * model_s / frame_fused_s, 1),
        "shares_pct": {
            "gn_loop": round(100.0 * mean_iters * parts["gn_iteration"]
                             / model_s, 1),
            "preprocess": round(100.0 * parts["preprocess"] / model_s, 1),
            "downsample": round(100.0 * (parts["downsample_frame"]
                                         + parts["downsample_source"])
                                / model_s, 1),
            "insert_trim": round(100.0 * (parts["insert"] + parts["trim"])
                                 / model_s, 1),
        },
    }
    return out


def render_table(res: dict) -> str:
    lines = [
        f"| op | us/frame | share of model |",
        "|---|---|---|",
    ]
    parts = res["parts_us"]
    model_us = res["model_frame_ms"] * 1e3
    rows = [
        ("preprocess", parts["preprocess"]),
        ("downsample 0.5v", parts["downsample_frame"]),
        ("downsample 1.5v", parts["downsample_source"]),
        (f"GN loop ({res['mean_gn_iters_steady']:.1f} it x "
         f"{parts['gn_iteration']:.0f} us; NN gather alone "
         f"{parts['nn_query']:.0f} us)", res["gn_total_us"]),
        ("insert", parts["insert"]),
        ("trim", parts["trim"]),
    ]
    for name, us in rows:
        lines.append(f"| {name} | {us:.0f} | {100.0 * us / model_us:.1f}% |")
    lines.append(f"| **parts model** | {model_us:.0f} | "
                 f"{res['model_vs_fused_pct']:.1f}% of fused |")
    lines.append(f"| **fused chunked frame** | "
                 f"{res['frame_fused_ms'] * 1e3:.0f} | 100% |")
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", default="soak", choices=["soak", "headline"])
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--rounds", type=int, default=30)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--out", default=None,
                    help="append the markdown table to this file")
    args = ap.parse_args(argv)

    import jax
    log(f"devices: {jax.devices()}")
    res = run_breakdown(args.config, args.frames, args.rounds, args.chunk)
    table = render_table(res)
    print(table)
    print(json.dumps(res))
    if args.json_out:
        with open(args.json_out, "a") as f:
            f.write(json.dumps(res) + "\n")
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n" + table + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
