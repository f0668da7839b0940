"""REAL multi-process pod-program test: two OS processes x 4 virtual CPU
devices joined by jax.distributed into one 8-device runtime, running the
composed ("seq", "map") pod program with "seq" spanning the processes (the
DCN axis) and "map" process-local (the ICI axis) — the exact layout a
multi-host TPU pod launch uses (parallel/pod.py module docstring). The
single-process 8-device tests (tests/test_pod.py) cannot reach the
process-local data assembly or the cross-process psum that keeps the GN
loop's trip count uniform across rows.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "pod_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pod_matches_single_process(tmp_path):
    out = tmp_path / "pod_poses.npy"
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            KISS_COORDINATOR=f"127.0.0.1:{port}",
            KISS_NUM_PROCESSES="2",
            KISS_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in outs:
        assert rc == 0, f"pod worker failed (rc={rc}):\n{stdout}\n{stderr}"
    assert out.exists(), "process 0 wrote no poses"
    poses_2proc = np.load(out)

    # Single-process golden: same scans, same ("seq","map") extents, all 8
    # devices local to this (pytest) process.
    import pod_worker as w
    from kiss_icp_tpu.parallel import pod

    cfg = w.worker_config()
    mesh = pod.make_pod_mesh(w.N_SEQ, w.N_MAP)
    step = pod.make_pod_chunked_step(cfg, mesh)
    state = pod.init_pod_state(cfg, mesh, w.GLOBAL_BATCH)
    pts, ts, valid = w.global_scans()
    state, results = step(state, pts, ts, valid)
    poses_1proc = np.asarray(results.pose)

    assert poses_2proc.shape == poses_1proc.shape
    np.testing.assert_allclose(poses_2proc, poses_1proc, atol=1e-5)
