"""CPU-mesh scaling curve for the batched multi-sequence program.

No multi-chip TPU hardware is reachable from this environment (one chip via a
tunnel), so the BASELINE "≥80% scaling efficiency at N hosts" claim cannot be
measured directly. This tool produces the committed stand-in: B sequences
data-parallel over a virtual N-device CPU mesh for N in {1, 2, 4, 8}
(`--xla_force_host_platform_device_count`, the standard way to exercise
pjit/shard_map programs without a pod).

READ THE NUMBER CORRECTLY: all virtual devices share this host's physical
cores, so wall-clock cannot improve with N — a FLAT curve is the success
criterion (the partitioned program adds no SPMD overhead: no gratuitous
collectives, resharding, or host sync on the seq axis, which is what actually
determines scaling on real ICI/DCN where sequences exchange nothing). The
curve is overhead evidence, not a hardware-scaling measurement.

Each mesh size runs in a fresh subprocess (device count is fixed at JAX
init). Output: one JSON line per run plus a summary JSON written to
``--out`` (committed under bench_logs/ so the claim is auditable).

Usage:  python -m kiss_icp_tpu.tools.scaling_bench [--out FILE]
        [--batch 8] [--frames 12] [--devices 1,2,4,8] [--pod]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_CHILD_ENV = "KISS_SCALING_CHILD"


def _child_config():
    from kiss_icp_tpu.config.schema import KISSConfig

    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 4096
    cfg.engine.frame_capacity = 4096
    cfg.engine.source_capacity = 1024
    cfg.engine.map_capacity_log2 = 15
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 20
    return cfg


def _frames(b, k, n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    pts = np.zeros((k, b, n, 3), np.float32)
    for i in range(b):
        vel = np.array([0.25 + 0.05 * i, 0.02 * i, 0], np.float32)
        for j in range(k):
            pts[j, i] = base + vel * j
    return pts, np.zeros((k, b, n), np.float32), np.ones((k, b, n), bool)


def _drive_frames(b, k, n):
    """Windows of the CACHED bench soak drive (real rendered scans), one
    60-frame offset per sequence, stride-subsampled to the n-point cap —
    so the composed pod program is re-measured on the same drive the TPU
    soak child runs (VERDICT r4 next #7), not on a synthetic point cloud.
    Returns None when no bench cache is present (tests, cold machines)."""
    import importlib

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    try:
        bench = importlib.import_module("bench")
    except ImportError:
        return None
    if not (hasattr(bench, "_scans") and hasattr(bench, "_scan_cache_ready")):
        return None
    if not bench._scan_cache_ready(bench._config(), 240):
        return None
    from kiss_icp_tpu.odometry import subsample_to_capacity

    _, cpts, cts, cvalid = bench._scans(bench._config(), 240)
    pts = np.zeros((k, b, n, 3), np.float32)
    ts = np.zeros((k, b, n), np.float32)
    valid = np.zeros((k, b, n), bool)
    for i in range(b):
        o = (60 * i) % (cpts.shape[0] - k)
        for j in range(k):
            full = cpts[o + j][cvalid[o + j]]
            stamps = cts[o + j][cvalid[o + j]]
            f, t, _ = subsample_to_capacity(full, stamps, n)
            m = len(f)
            pts[j, i, :m] = f
            if t is not None and len(t) == m:
                ts[j, i, :m] = t
            valid[j, i, :m] = True
    return pts, ts, valid


def child(n_devices: int, batch: int, k: int, use_pod: bool,
          use_drive: bool = False) -> dict:
    import jax

    assert len(jax.devices()) == n_devices, (len(jax.devices()), n_devices)
    cfg = _child_config()
    n = cfg.engine.max_points_per_frame
    data3 = _drive_frames(batch, k, n) if use_drive else None
    drive_used = data3 is not None
    pts, ts, valid = data3 if drive_used else _frames(batch, k, n)

    if use_pod:
        # Composed ("seq", "map") program: map axis 2, rest sequences.
        from kiss_icp_tpu.parallel import pod

        n_map = 2 if n_devices >= 2 else 1
        mesh = pod.make_pod_mesh(max(1, n_devices // n_map), n_map)
        step = pod.make_pod_chunked_step(cfg, mesh)
        state = pod.init_pod_state(cfg, mesh, batch)
        data = (np.swapaxes(pts, 0, 1), np.swapaxes(ts, 0, 1),
                np.swapaxes(valid, 0, 1))

        def run(st):
            st, res = step(st, *data)
            jax.block_until_ready(res.pose)
            return st

        fresh = lambda: pod.init_pod_state(cfg, mesh, batch)  # noqa: E731
    else:
        from kiss_icp_tpu.parallel import batch as pbatch

        mesh = pbatch.make_mesh(n_devices) if n_devices > 1 else None
        step = pbatch.make_batched_chunked_step(cfg, mesh)
        data = (pts, ts, valid)

        def run(st):
            st, poses = step(st, *data)
            jax.block_until_ready(poses)
            return st

        def fresh():
            st = pbatch.init_batched_state(cfg, batch)
            if mesh is not None:
                st = jax.device_put(st, pbatch.batched_state_sharding(mesh))
            return st

    t0 = time.perf_counter()
    run(fresh())
    compile_s = time.perf_counter() - t0

    best = 0.0
    st = None
    for _ in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st = run(st)
        dt = time.perf_counter() - t0
        best = max(best, batch * k / dt)
    # Final per-sequence poses, for the parent's cross-mesh parity check
    # (CPU mesh — no tunnel read poisoning to worry about).
    poses = np.asarray(st.pose, np.float64).reshape(batch, 4, 4)
    return {
        "devices": n_devices,
        "batch": batch,
        "frames": k,
        "seq_frames_per_s": round(best, 2),
        "compile_s": round(compile_s, 1),
        "program": "pod(seq,map)" if use_pod else "batched(seq)",
        "drive": drive_used,
        "final_translations": np.round(poses[:, :3, 3], 6).tolist(),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=None, help="write summary JSON here")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--pod", action="store_true",
                    help="measure the composed (seq, map) pod program")
    ap.add_argument("--drive", action="store_true",
                    help="use windows of the cached bench soak drive (real "
                         "scans) instead of the synthetic cloud, and check "
                         "cross-mesh pose parity")
    args = ap.parse_args(argv)

    if _CHILD_ENV in os.environ:
        # This environment pre-registers a TPU PJRT plugin via sitecustomize
        # and pins jax_platforms before we run, so the JAX_PLATFORMS env var
        # is too late — override the config directly before any backend
        # initialization (same trick as tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")
        n = int(os.environ[_CHILD_ENV])
        out = child(n, args.batch, args.frames, args.pod, args.drive)
        print(json.dumps(out), flush=True)
        return 0

    sizes = [int(s) for s in args.devices.split(",")]
    if args.pod:
        # The pod program needs a map axis of 2: a 1-device "pod" would
        # silently measure the batched program and corrupt the baseline of
        # the normalized curve.
        dropped = [s for s in sizes if s < 2]
        if dropped:
            print(f"--pod: dropping device counts {dropped} (needs >= 2)",
                  file=sys.stderr)
        sizes = [s for s in sizes if s >= 2]
    rows = []
    for n in sizes:
        env = dict(os.environ)
        env[_CHILD_ENV] = str(n)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        cmd = [sys.executable, "-m", "kiss_icp_tpu.tools.scaling_bench",
               "--batch", str(args.batch), "--frames", str(args.frames)]
        if args.pod:
            cmd.append("--pod")
        if args.drive:
            cmd.append("--drive")
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                              timeout=1800)
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"devices={n}: FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            rows.append({"devices": n, "error": proc.returncode})
            continue
        row = json.loads(line[-1])
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in rows if "seq_frames_per_s" in r]
    summary = {
        "note": (
            "virtual CPU devices share this host's physical cores "
            f"(os.cpu_count()={os.cpu_count()}); a FLAT curve means the "
            "SPMD program adds no partitioning overhead — it is NOT a "
            "hardware scaling measurement (no multi-chip TPU reachable)."
        ),
        "physical_cores": os.cpu_count(),
        "rows": rows,
    }
    if ok:
        # Normalize against the SMALLEST measured mesh of the SAME program
        # (for --pod that is 2 devices, not 1 — name the key accordingly).
        # ok[0] is only the smallest for an ascending --devices list; pick
        # the actual min so a descending list can't invert the ratios
        # (code-review r4d).
        smallest = min(ok, key=lambda r: r["devices"])
        base = smallest["seq_frames_per_s"]
        key = f"vs_{smallest['devices']}dev"
        for r in ok:
            r[key] = round(r["seq_frames_per_s"] / base, 3)
    # Cross-mesh pose parity: every mesh size ran the SAME sequences, so the
    # final per-sequence translations must agree within the documented f32
    # re-association band regardless of how the map was sharded (the pod's
    # sharded insert/query are bit-different programs, not bit-different
    # answers). Surfaces silent distributed-correctness drift each round
    # (VERDICT r4 next #7).
    # Band: 1 cm. Different partitionings change f32 reduction order at the
    # ulp level, and GM-weighted re-association amplifies that chaotically
    # (the same mechanism bounded against the f64 oracle in
    # tests/test_long_horizon.py) — measured 5.8 mm across 1-vs-8-device
    # layouts on a 12-frame window; a distributed-correctness BUG shows up
    # as meters, not millimeters.
    withposes = [r for r in ok if r.get("final_translations")]
    if len(withposes) >= 2:
        ref = np.asarray(withposes[0]["final_translations"])
        parity = max(
            float(np.max(np.abs(np.asarray(r["final_translations"]) - ref)))
            for r in withposes[1:]
        )
        summary["parity_max_m"] = round(parity, 6)
        summary["parity_band_m"] = 0.01
        summary["parity_ok"] = bool(parity <= 0.01)
        print(f"cross-mesh pose parity: max |dt| = {parity:.2e} m "
              f"(band 1e-2) -> {'OK' if summary['parity_ok'] else 'FAIL'}",
              file=sys.stderr)
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
