"""REAL multi-process DCN test: two OS processes, each with 4 virtual CPU
devices, joined by `jax.distributed.initialize` into one 8-device runtime
(localhost coordinator + gloo collectives). This exercises the exact code
path a multi-host TPU pod launch takes — process-local data assembly via
`jax.make_array_from_process_local_data`, SPMD execution over a mesh whose
"seq" axis spans processes, and cross-process pose gather — which the
single-process degradation tests (test_multihost.py) cannot reach.

The reference has no distributed execution of any kind (SURVEY.md
section 2.2); this validates the TPU-native scale-out mandate end-to-end.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    out = tmp_path / "poses.npy"
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
        assert rc == 0, f"worker failed (rc={rc}):\n{stdout}\n{stderr}"
    assert out.exists(), "process 0 wrote no poses"
    poses_2proc = np.load(out)

    # Single-process golden: same scans, same config, all 8 sequences local.
    import multihost_worker as w
    from kiss_icp_tpu.parallel import multihost

    mh = multihost.MultihostBatchedOdometry(w.worker_config(),
                                            global_batch=w.GLOBAL_BATCH)
    poses_1proc = None
    for frames in w.global_frames():
        poses_1proc = mh.register_frames(frames)

    assert poses_2proc.shape == (w.GLOBAL_BATCH, 4, 4)
    assert np.all(np.isfinite(poses_2proc))
    np.testing.assert_allclose(poses_2proc, poses_1proc, atol=1e-5)
