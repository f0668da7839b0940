"""Worker process for the real 2-process pod-program test.

Launched by tests/test_pod_2proc.py with KISS_COORDINATOR /
KISS_NUM_PROCESSES / KISS_PROCESS_ID set. Each process owns 4 virtual CPU
devices; `jax.distributed.initialize` joins them into one 8-device runtime
and the composed ("seq", "map") pod mesh lays "seq" ACROSS the processes
(the DCN axis — sequences exchange nothing) and "map" WITHIN each process
(the ICI axis — the ring NN combine and psum'd normal equations stay
process-local), exactly the deployment layout documented in
parallel/pod.py's module docstring.

Every process regenerates the same deterministic global scans and feeds only
its local sequences; process 0 writes the global (B, K, 4, 4) poses to
argv[1].
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

spec = multihost.initialize_from_env()  # before any other JAX call

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from kiss_icp_tpu.config.schema import KISSConfig  # noqa: E402
from kiss_icp_tpu.parallel import pod  # noqa: E402

GLOBAL_BATCH = 4
N_POINTS = 512
N_FRAMES = 3
N_SEQ, N_MAP = 2, 4  # seq across processes, map within


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


def global_scans():
    """(B, K, N, 3) deterministic across processes; per-sequence velocities
    differ so ICP iteration counts diverge across mesh rows (exercising the
    cross-row uniform-trip-count machinery)."""
    rng = np.random.default_rng(13)
    base = rng.uniform(-30, 30, (N_POINTS, 3)).astype(np.float32)
    pts = np.zeros((GLOBAL_BATCH, N_FRAMES, N_POINTS, 3), np.float32)
    for i in range(GLOBAL_BATCH):
        vel = np.array([0.2 + 0.08 * i, 0.02 * i, 0], np.float32)
        for j in range(N_FRAMES):
            pts[i, j] = base + vel * j
    ts = np.zeros(pts.shape[:3], np.float32)
    valid = np.ones(pts.shape[:3], bool)
    return pts, ts, valid


def main() -> int:
    out_path = sys.argv[1]
    assert jax.device_count() == 8, jax.device_count()

    cfg = worker_config()
    mesh = pod.make_pod_mesh(N_SEQ, N_MAP)
    step = pod.make_pod_chunked_step(cfg, mesh)
    state = pod.init_pod_state(cfg, mesh, GLOBAL_BATCH)

    pts, ts, valid = global_scans()
    lb = GLOBAL_BATCH // spec.num_processes
    lo = spec.process_id * lb
    data_sh = NamedSharding(mesh, P(pod.SEQ_AXIS))

    def feed(x):
        return jax.make_array_from_process_local_data(
            data_sh, x[lo:lo + lb], x.shape)

    state, results = step(state, feed(pts), feed(ts), feed(valid))
    replicate = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
    poses = np.asarray(replicate(results.pose).addressable_data(0))
    assert poses.shape == (GLOBAL_BATCH, N_FRAMES, 4, 4), poses.shape
    assert np.all(np.isfinite(poses))

    if spec.process_id == 0:
        np.save(out_path, poses)
    print(f"pod worker {spec.process_id}: ok ({multihost.launch_info()})",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
