"""Worker process for the real 2-process jax.distributed test.

Launched by tests/test_multihost_2proc.py with KISS_COORDINATOR /
KISS_NUM_PROCESSES / KISS_PROCESS_ID set. Each process owns 4 virtual CPU
devices; together they form one 8-device JAX runtime spanning "DCN" (here:
localhost gRPC + gloo collectives — the same code path a TPU pod slice takes
across hosts, SURVEY.md section 2.2).

Every process regenerates the same deterministic global scan set and feeds
only its local slice; process 0 writes the resulting global poses to argv[1].
"""

import os
import sys

_AS_WORKER = os.environ.get("KISS_NUM_PROCESSES", "1") != "1"
if _AS_WORKER:
    # Only when launched as a distributed worker: the test process imports
    # this module for its constants/golden, and rewriting XLA_FLAGS there
    # before the backend initializes would shrink ITS device count.
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

if _AS_WORKER:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kiss_icp_tpu.parallel import multihost  # noqa: E402

# Before any other JAX call: wires this process into the global runtime.
spec = multihost.initialize_from_env()

import numpy as np  # noqa: E402

from kiss_icp_tpu.config.schema import KISSConfig  # noqa: E402

GLOBAL_BATCH = 8
N_POINTS = 512
N_FRAMES = 3


def worker_config() -> KISSConfig:
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = N_POINTS
    cfg.engine.frame_capacity = N_POINTS
    cfg.engine.source_capacity = 256
    cfg.engine.map_capacity_log2 = 12
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 8
    return cfg


def global_frames():
    """[(frame_idx, [GLOBAL_BATCH scans])] — deterministic across processes."""
    rng = np.random.default_rng(7)
    base = [
        rng.uniform(-30, 30, (N_POINTS, 3)).astype(np.float32)
        for _ in range(GLOBAL_BATCH)
    ]
    shifts = [0.0, 0.25, 0.55]
    return [
        [s + np.array([shifts[f], 0, 0], np.float32) for s in base]
        for f in range(N_FRAMES)
    ]


def main() -> int:
    out_path = sys.argv[1]
    assert jax.process_count() == spec.num_processes, (
        jax.process_count(), spec.num_processes)
    assert jax.device_count() == 8, jax.device_count()

    mh = multihost.MultihostBatchedOdometry(worker_config(),
                                            global_batch=GLOBAL_BATCH)
    lb = mh.local_batch
    assert lb == GLOBAL_BATCH // spec.num_processes, lb
    lo = spec.process_id * lb

    poses = None
    for frames in global_frames():
        poses = mh.register_frames(frames[lo:lo + lb])
    assert poses.shape == (GLOBAL_BATCH, 4, 4), poses.shape

    if spec.process_id == 0:
        np.save(out_path, poses)
    print(f"worker {spec.process_id}: ok ({multihost.launch_info()})",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
