"""Accuracy error budget for the bench soak drive (VERDICT r3 next #2).

Decomposes the headline long-drive accuracy number (BENCH soak
`kitti_seg_pct`, 0.530 % in round 3) into attributable sources by ablating
one knob at a time on the SAME 240-frame synthetic drive the bench soak
child measures:

  config ablations (same world, one pipeline knob changed)
    shipped      — the bench soak config: f32 map, deskew on, gather27.
    deskew_off   — data.deskew = False: what constant-velocity deskew buys.
    u16          — voxel-relative 16-bit map storage (~15 um quantization).
    iters_30     — max_num_iterations 30 (vs the reference's 500,
                   Registration.cpp:151): does the convergence tail matter?
    conv_3e-5    — tighter convergence criterion (reference default 1e-4).
    ppv_40       — max_points_per_voxel 40 (denser map slabs; the reference
                   default 20 comes from VoxelHashMap.cpp via KissICP.hpp:44).
    voxel_0.75   — voxel_size 0.75 m (reference derives max_range/100 = 1.0,
                   parser.py:78-79; smaller voxels = finer map + source).

  world ablations (shipped config, one sensor/world property removed)
    noise_free   — range noise sigma 0 (isolates the sensor-noise floor).
    no_dropout   — no return dropout (denser scans, same noise).
    no_distort   — scans rendered wholly at the end-of-scan pose with no
                   per-point stamps: removes motion distortion AND deskew,
                   isolating the distortion-residual contribution.

Each cell reports the KITTI segment metric (Metrics.cpp:141-156 protocol),
Umeyama ATE, and the iteration tail, so the table answers "where does the
0.53 % come from and which knob buys margin". Run:

    python -m kiss_icp_tpu.tools.error_budget [--out docs/ACCURACY.md]

Accuracy is deterministic per (world, config); the backend only changes wall
time, so this runs wherever JAX lands (the real TPU through the dev tunnel,
or CPU). Slow-execution-mode draws of the tunnel are re-rolled in-process by
re-jitting an epsilon-perturbed program, same trick as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

N_FRAMES = 240
CHUNK = 24
# A first chunk slower than this fps is treated as a tunnel slow-mode draw
# and the program re-rolled (module constant so tests on CPU — where every
# draw is "slow" — can disable the re-roll instead of paying 4 recompiles).
SLOW_DRAW_FPS = 40.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _world_scans(cap: int, **world_kw):
    """Padded scan buffers for a (possibly ablated) synthetic drive, cached
    on disk: world synthesis is pure numpy at seconds per frame, and every
    ablation config reuses its world's cache."""
    from kiss_icp_tpu.datasets.synthetic import SyntheticDataset

    base = dict(sequence=0, n_scans=N_FRAMES, speed=1.0, accel_frames=30)
    base.update(world_kw)
    if not world_kw:
        # The un-ablated world IS the bench drive: delegate to bench._scans
        # (single source of the cache name and pack loop) when the harness
        # is importable.
        bench = _bench_module()
        if bench is not None:
            cfg = bench._config()
            cfg.engine.max_points_per_frame = cap
            ds, pts, ts, valid = bench._scans(cfg, N_FRAMES)
            return np.asarray(ds.gt_poses, np.float64), pts, ts, valid
    tag = "_".join(f"{k}{v}" for k, v in sorted(world_kw.items())) or "default"
    cache = f"/tmp/kiss_errbudget_v2_{tag}_{N_FRAMES}f_{cap}cap.npz"
    if os.path.exists(cache):
        try:
            with np.load(cache) as d:
                return d["gt"], d["pts"], d["ts"], d["valid"]
        except Exception as e:
            log(f"cache {cache} unreadable ({e}), regenerating")
    ds = SyntheticDataset(**base)
    pts = np.zeros((N_FRAMES, cap, 3), np.float32)
    ts = np.zeros((N_FRAMES, cap), np.float32)
    valid = np.zeros((N_FRAMES, cap), bool)
    t0 = time.perf_counter()
    for i in range(N_FRAMES):
        p, t = ds[i]
        n = min(len(p), cap)
        pts[i, :n] = p[:n]
        if len(t):
            ts[i, :n] = t[:n]
        valid[i, :n] = True
        if (i + 1) % 60 == 0:
            log(f"  world[{tag}] frame {i + 1}/{N_FRAMES} "
                f"({time.perf_counter() - t0:.0f}s)")
    gt = np.asarray(ds.gt_poses[:N_FRAMES], np.float64)
    tmp = cache + f".{os.getpid()}.tmp.npz"
    try:
        np.savez(tmp, pts=pts, ts=ts, valid=valid, gt=gt)
        os.replace(tmp, cache)
    except OSError:
        pass
    return gt, pts, ts, valid


def _bench_module():
    """Import the repo-root bench harness so the cells ablate EXACTLY the
    config the soak child measures (code-review r4: a hand-copied config
    here had already drifted from bench._config's env knobs). Returns None
    when bench.py is absent (installed wheel without the repo checkout)."""
    import importlib

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    try:
        mod = importlib.import_module("bench")
    except ImportError:
        return None
    # "bench" is a generic name: an unrelated module from cwd/site-packages
    # can shadow the harness. Only trust a module with the expected surface.
    if not (hasattr(mod, "_config") and hasattr(mod, "_scans")):
        return None
    return mod


def _bench_config(subsalt: int = 0, **overrides):
    """The bench soak child's config (bench.py _config — single source)
    with ablation overrides applied as dotted keys, e.g.
    {'data.deskew': False}. Falls back to a frozen copy of the round-4
    values when the bench harness is not importable."""
    bench = _bench_module()
    if bench is not None:
        cfg = bench._config()
    else:
        from kiss_icp_tpu.config.parser import load_config

        cfg = load_config(None)
        cfg.data.min_range = 1.0
        cfg.engine.map_storage = "f32"
        cfg.engine.probe_length = 16
        cfg.engine.nn_mode = "gather27"
        cfg.engine.nn_live_capacity_log2 = 14
        cfg.engine.max_points_per_frame = 65536
        cfg.engine.frame_capacity = 16384
        cfg.engine.source_capacity = 8192
        cfg.engine.map_capacity_log2 = 19
        cfg.engine.donate_state = True
        cfg.engine.use_pallas = "auto"
    for key, val in overrides.items():
        section, name = key.split(".")
        setattr(getattr(cfg, section), name, val)
    # In-process slow-mode re-roll (same trick as bench._config): an inert
    # perturbation yields a distinct executable = a fresh draw. Applied
    # AFTER the overrides so cells that pin convergence_criterion (e.g.
    # conv_3e-5) still get distinct programs per subsalt (code-review r4b:
    # override-after-perturb made every re-roll identical for those cells).
    cfg.registration.convergence_criterion *= 1.0 + subsalt * 1e-9
    return cfg


def run_cell(name: str, scans, overrides: dict) -> dict:
    """One ablation cell: full 240-frame drive -> accuracy + iteration tail."""
    import jax

    from kiss_icp_tpu import metrics
    from kiss_icp_tpu.odometry import init_state, make_chunked_step

    gt, pts, ts, valid = scans
    for subsalt in range(4):
        cfg = _bench_config(subsalt=subsalt, **overrides)
        chunk = make_chunked_step(cfg)
        state = init_state(cfg)
        t0 = time.perf_counter()
        state, summary = chunk(state, pts[:CHUNK], ts[:CHUNK], valid[:CHUNK])
        jax.block_until_ready(summary.poses)
        log(f"[{name}] compile+first: {time.perf_counter() - t0:.1f}s")

        state = init_state(cfg)
        summaries = []
        aborted = False
        t_run = time.perf_counter()
        for c in range(N_FRAMES // CHUNK):
            sl = slice(c * CHUNK, (c + 1) * CHUNK)
            t0 = time.perf_counter()
            state, summary = chunk(state, pts[sl], ts[sl], valid[sl])
            jax.block_until_ready(summary.poses)
            summaries.append(summary)
            if c == 0 and (time.perf_counter() - t0) > CHUNK / SLOW_DRAW_FPS:
                log(f"[{name}] slow-mode draw "
                    f"({CHUNK / (time.perf_counter() - t0):.0f} fps), "
                    "re-rolling program")
                aborted = True
                break
        if not aborted:
            break
    else:
        log(f"[{name}] all draws slow; running the last anyway (accuracy is "
            "draw-independent, only wall time suffers)")
        state = init_state(cfg)
        summaries = []
        t_run = time.perf_counter()
        for c in range(N_FRAMES // CHUNK):
            sl = slice(c * CHUNK, (c + 1) * CHUNK)
            state, summary = chunk(state, pts[sl], ts[sl], valid[sl])
            jax.block_until_ready(summary.poses)
            summaries.append(summary)
    wall = time.perf_counter() - t_run

    est = np.concatenate([np.asarray(s.poses) for s in summaries], axis=0)
    iters = np.concatenate(
        [np.asarray(s.num_iterations) for s in summaries])
    drops = int(sum(int(np.sum(np.asarray(s.num_dropped_downsample)))
                    + int(np.sum(np.asarray(s.num_dropped_map_voxels)))
                    for s in summaries))
    ate_rot, ate_trans = metrics.absolute_trajectory_error(gt, est)
    seg_t, seg_r, n_seg = metrics.seq_error_stats(gt, est)
    out = {
        "name": name,
        "kitti_seg_pct": round(float(seg_t), 4),
        "kitti_seg_deg_per_m": round(float(seg_r), 5),
        "n_segments": int(n_seg),
        "ate_trans_m": round(float(ate_trans), 4),
        "ate_rot_rad": round(float(ate_rot), 5),
        "iters_p50": float(np.percentile(iters, 50)),
        "iters_p95": float(np.percentile(iters, 95)),
        "drops": drops,
        "finite": bool(np.all(np.isfinite(est))),
        "wall_s": round(wall, 1),
    }
    log(f"[{name}] seg={out['kitti_seg_pct']}% ate={out['ate_trans_m']} m "
        f"iters p50/p95={out['iters_p50']:.0f}/{out['iters_p95']:.0f} "
        f"drops={drops} ({wall:.0f}s)")
    return out


# (cell name, world kwargs, config overrides)
CELLS = [
    ("shipped", {}, {}),
    ("deskew_off", {}, {"data.deskew": False}),
    ("u16", {}, {"engine.map_storage": "u16"}),
    ("iters_30", {}, {"registration.max_num_iterations": 30}),
    ("conv_3e-5", {}, {"registration.convergence_criterion": 3e-5}),
    ("ppv_40", {}, {"mapping.max_points_per_voxel": 40,
                    "engine.group_capacity": 32}),
    ("voxel_0.75", {}, {"mapping.voxel_size": 0.75}),
    ("noise_free", {"noise": 0.0}, {}),
    ("no_dropout", {"dropout": 0.0}, {}),
    ("no_distort", {"distort": False}, {}),
    # Candidate fixes (combinations of the winning knobs + the second-pass
    # deskew, engine.deskew_refine).
    ("refine_1", {}, {"engine.deskew_refine": 1}),
    ("u16_refine", {}, {"engine.deskew_refine": 1,
                        "engine.map_storage": "u16"}),
    # Damped refinement: estimated-delta deskew feeds ONLY the map update.
    ("map_refine", {}, {"engine.deskew_refine_map": True}),
    ("u16_map_refine", {}, {"engine.deskew_refine_map": True,
                            "engine.map_storage": "u16"}),
    # Grazing-incidence range noise grows ~linearly with ground-ring radius
    # (synthetic.py noise model, mirroring real roads): cropping the far
    # noisy rings trades coverage for cleaner correspondences.
    ("range_70", {}, {"data.max_range": 70.0}),
    ("u16_range70", {}, {"engine.map_storage": "u16",
                         "data.max_range": 70.0}),
    ("u16_v075", {}, {"engine.map_storage": "u16",
                      "mapping.voxel_size": 0.75}),
    # Range sweep around the chosen crop (is 70 m a sweet spot or a cliff?).
    ("u16_range60", {}, {"engine.map_storage": "u16",
                         "data.max_range": 60.0}),
    ("u16_range80", {}, {"engine.map_storage": "u16",
                         "data.max_range": 80.0}),
    # Round-5 soak configuration: ground-plane attitude stabilization on
    # top of the round-4 pick (the long-horizon lambda sweep lives in
    # BASELINE.md round 5; at the 240-frame horizon the stabilizer is
    # seg-neutral and ATE-positive).
    ("u16_range70_ground01", {}, {"engine.map_storage": "u16",
                                  "data.max_range": 70.0,
                                  "engine.ground_align": 0.1}),
    ("ground_0.1", {}, {"engine.ground_align": 0.1}),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default=None,
                    help="append the markdown table to this file")
    ap.add_argument("--json-out", default=None,
                    help="write raw cell dicts as JSON lines")
    ap.add_argument("--cells", default=None,
                    help="comma-separated subset of cell names")
    ap.add_argument("--frames", type=int, default=None,
                    help="drive length (default 240). NOTE: through the "
                         "axon dev tunnel a process that feeds >~300 "
                         "frames of unique input can no longer READ any "
                         "device buffer (verify SKILL.md addendum 6) — "
                         "run long-horizon cells on CPU (JAX_PLATFORMS="
                         "cpu), where accuracy is identical and reads are "
                         "safe.")
    args = ap.parse_args(argv)
    if args.frames:
        global N_FRAMES
        N_FRAMES = int(args.frames)

    import jax
    log(f"devices: {jax.devices()}")

    want = set(args.cells.split(",")) if args.cells else None
    cells = [c for c in CELLS if want is None or c[0] in want]

    cap = 65536
    results = []
    for name, world_kw, overrides in cells:
        scans = _world_scans(cap, **world_kw)
        res = run_cell(name, scans, overrides)
        results.append(res)
        if args.json_out:
            with open(args.json_out, "a") as f:
                f.write(json.dumps(res) + "\n")

    hdr = ("| cell | seg trans %% | seg rot deg/m | ATE m | iters p50/p95 "
           "| drops |")
    lines = [hdr.replace("%%", "%"),
             "|---|---|---|---|---|---|"]
    for r in results:
        lines.append(
            f"| {r['name']} | {r['kitti_seg_pct']:.3f} "
            f"| {r['kitti_seg_deg_per_m']:.5f} | {r['ate_trans_m']:.3f} "
            f"| {r['iters_p50']:.0f}/{r['iters_p95']:.0f} | {r['drops']} |")
    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n" + table + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
