"""Multi-host (DCN) entry: env parsing + single-process degradation on the
8-device CPU mesh (multi-process cannot run in one test process; the code
path through jax.make_array_from_process_local_data is identical)."""

import numpy as np
import pytest

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu.parallel import multihost
from kiss_icp_tpu.parallel.batch import BatchedOdometry


def _config():
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 1024
    cfg.engine.frame_capacity = 1024
    cfg.engine.source_capacity = 256
    cfg.engine.map_capacity_log2 = 13
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 10
    return cfg


def test_spec_from_env_defaults():
    spec = multihost.spec_from_env({})
    assert spec.num_processes == 1
    assert spec.process_id == 0
    assert not spec.is_multiprocess


def test_spec_from_env_multiprocess():
    spec = multihost.spec_from_env(
        {"KISS_COORDINATOR": "10.0.0.1:8476", "KISS_NUM_PROCESSES": "4",
         "KISS_PROCESS_ID": "2"}
    )
    assert spec.is_multiprocess
    assert spec.coordinator == "10.0.0.1:8476"
    assert spec.process_id == 2


def test_initialize_requires_coordinator():
    with pytest.raises(ValueError, match="KISS_COORDINATOR"):
        multihost.initialize_from_env({"KISS_NUM_PROCESSES": "2"})


def test_initialize_single_process_is_noop():
    spec = multihost.initialize_from_env({})
    assert not spec.is_multiprocess  # and no jax.distributed side effects


def test_singleprocess_batched_matches_plain_batched():
    """The multihost runner on one process must equal the plain batched path."""
    cfg = _config()
    b = 8
    rng = np.random.default_rng(3)
    scans = [rng.uniform(-30, 30, (1024, 3)).astype(np.float32) for _ in range(b)]

    mh = multihost.MultihostBatchedOdometry(cfg, global_batch=b)
    assert mh.local_batch == b  # one process owns everything
    plain = BatchedOdometry(cfg, batch=b)

    for shift in (0.0, 0.3):
        frames = [s + np.array([shift, 0, 0], np.float32) for s in scans]
        poses_mh = mh.register_frames(frames)
        poses_plain = plain.register_frames(frames)
    np.testing.assert_allclose(poses_mh, poses_plain, atol=1e-5)
    assert poses_mh.shape == (b, 4, 4)
    assert np.all(np.isfinite(poses_mh))


def test_launch_info_runs():
    info = multihost.launch_info()
    assert "process 0/1" in info
