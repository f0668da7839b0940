"""Executable checks for the five BASELINE.json benchmark scenarios.

Each scenario runs end-to-end — on-disk dataset fixture -> real dataset
loader -> OdometryPipeline with the shipped YAML config — and its trajectory
is compared against the float64 oracle implementation of the reference
algorithm on the identical loader output (the committed golden is the oracle
itself, deterministic by construction). No real KITTI/MulRan data exists in
this environment; the fixtures are deterministic synthetic drives written in
each dataset's native on-disk format.
"""

from pathlib import Path

import numpy as np

import scenario_helpers as sh
from kiss_icp_tpu.config.parser import load_config
from kiss_icp_tpu.pipeline import OdometryPipeline

CONFIG_DIR = Path(__file__).resolve().parent.parent / "config"
N_FRAMES = 5


def _small_engine(cfg):
    """Shrink the TPU capacity plan to CPU-test scale (engine settings are
    capacity planning, not algorithm parameters)."""
    cfg.engine.max_points_per_frame = 65536
    cfg.engine.frame_capacity = 8192
    cfg.engine.source_capacity = 2048
    cfg.engine.map_capacity_log2 = 15
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 100
    return cfg


def _run_pipeline(dataset, cfg, tmp_path):
    cfg.out_dir = str(tmp_path / "results")
    pipe = OdometryPipeline(dataset, config=cfg)
    pipe.run()
    return pipe


def _loader_frames(dataset):
    out = []
    for i in range(len(dataset)):
        item = dataset[i]
        pts, ts = item if isinstance(item, tuple) else (item, np.array([]))
        out.append((np.asarray(pts, np.float64), np.asarray(ts)))
    return out


def _assert_matches_oracle(pipe, golden, atol_t=0.08, atol_r=1e-2):
    np.testing.assert_allclose(
        pipe.poses[:, :3, 3], golden[:, :3, 3], atol=atol_t,
        err_msg="trajectory diverged from the reference oracle",
    )
    np.testing.assert_allclose(
        pipe.poses[:, :3, :3], golden[:, :3, :3], atol=atol_r,
        err_msg="rotations diverged from the reference oracle",
    )


def test_scenario_kitti_basic(tmp_path):
    """BASELINE scenario 1: KITTI seq 00 odometry with basic.yaml (no per-point
    stamps -> deskew inactive, adaptive threshold, derived voxel size)."""
    from kiss_icp_tpu.datasets.kitti import KITTIOdometryDataset

    drive = sh.make_drive(N_FRAMES, seq=0)
    sh.write_kitti_tree(tmp_path, drive)
    ds = KITTIOdometryDataset(tmp_path, sequence=0)

    cfg = _small_engine(load_config(CONFIG_DIR / "basic.yaml"))
    cfg.data.min_range = 1.0
    pipe = _run_pipeline(ds, cfg, tmp_path)

    golden = sh.run_oracle_pipeline(_loader_frames(ds), cfg)
    _assert_matches_oracle(pipe, golden)
    # GT wiring sanity: the pipeline evaluated KITTI metrics against the
    # fixture's ground truth and stayed within a loose envelope.
    ate = next(m.value for m in pipe.results.metrics if "ATE" in m.desc)
    assert ate < 0.5


def test_scenario_kitti_raw_advanced(tmp_path):
    """BASELINE scenario 2: KITTI raw with motion deskew + advanced.yaml
    (azimuth pseudo-stamps activate the deskew path; fixed threshold)."""
    from kiss_icp_tpu.datasets.kitti_raw import KITTIRawDataset

    drive = sh.make_drive(N_FRAMES, seq=1, distort=True)
    sh.write_kitti_raw_tree(tmp_path, drive)
    ds = KITTIRawDataset(tmp_path, sequence=0)
    assert len(ds) == N_FRAMES

    cfg = _small_engine(load_config(CONFIG_DIR / "advanced.yaml"))
    cfg.data.min_range = 1.0
    assert cfg.adaptive_threshold.fixed_threshold is not None  # advanced.yaml
    pipe = _run_pipeline(ds, cfg, tmp_path)

    frames = _loader_frames(ds)
    assert all(len(ts) == len(pts) for pts, ts in frames)  # stamps present
    golden = sh.run_oracle_pipeline(frames, cfg)
    _assert_matches_oracle(pipe, golden)


def test_scenario_mulran(tmp_path):
    """BASELINE scenario 3: MulRan Ouster-64 with 120 m max range."""
    from kiss_icp_tpu.datasets.mulran import MulranDataset

    drive = sh.make_drive(N_FRAMES, seq=2)
    seq_dir = sh.write_mulran_tree(tmp_path, drive)
    ds = MulranDataset(seq_dir)
    assert len(ds) == N_FRAMES

    cfg = _small_engine(load_config(None))
    cfg.data.max_range = 120.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 1.0
    pipe = _run_pipeline(ds, cfg, tmp_path)

    golden = sh.run_oracle_pipeline(_loader_frames(ds), cfg)
    _assert_matches_oracle(pipe, golden)


def test_scenario_newer_college(tmp_path):
    """BASELINE scenario 4: Newer College handheld (small voxel size)."""
    from kiss_icp_tpu.datasets.ncd import NewerCollegeDataset

    drive = sh.make_drive(N_FRAMES, seq=3)
    seq_dir = sh.write_ncd_tree(tmp_path, drive)
    ds = NewerCollegeDataset(seq_dir)
    assert len(ds) == N_FRAMES
    assert ds.gt_poses.shape[0] == N_FRAMES

    cfg = _small_engine(load_config(None))
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5  # handheld: small voxels
    pipe = _run_pipeline(ds, cfg, tmp_path)

    golden = sh.run_oracle_pipeline(_loader_frames(ds), cfg)
    _assert_matches_oracle(pipe, golden)


def test_scenario_batched_multisequence(tmp_path):
    """BASELINE scenario 5: many sequences in parallel on the device mesh.

    B *different* synthetic drives advance in lockstep through the batched
    chunked step; each sequence's trajectory must match its own
    single-sequence run (the batched program is the pod-throughput shape)."""
    import jax
    from kiss_icp_tpu import odometry
    from kiss_icp_tpu.parallel.batch import (
        init_batched_state, make_batched_chunked_step, make_mesh,
    )

    b, k = 4, 3
    cfg = _small_engine(load_config(None))
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.engine.max_points_per_frame = 16384
    cap = cfg.engine.max_points_per_frame

    drives = [sh.make_drive(k, seq=s) for s in range(b)]
    pts = np.zeros((k, b, cap, 3), np.float32)
    ts = np.zeros((k, b, cap), np.float32)
    valid = np.zeros((k, b, cap), bool)
    for s, drive in enumerate(drives):
        for i in range(k):
            p, t = drive[i]
            n = min(len(p), cap)
            pts[i, s, :n] = p[:n]
            if len(t) >= n:
                ts[i, s, :n] = t[:n]
            valid[i, s, :n] = True

    mesh = make_mesh(4, pts_shards=1)
    bstate = jax.device_put(
        init_batched_state(cfg, b),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("seq")),
    )
    bchunk = make_batched_chunked_step(cfg, mesh)
    _, bposes = bchunk(bstate, pts, ts, valid)
    bposes = np.asarray(bposes)  # (k, b, 4, 4)

    for s in range(b):
        state = odometry.init_state(cfg)
        for i in range(k):
            state, res = odometry.register_frame(
                cfg, state, pts[i, s], ts[i, s], valid[i, s]
            )
            np.testing.assert_allclose(
                bposes[i, s], np.asarray(res.pose), atol=1e-4,
                err_msg=f"sequence {s} frame {i} diverged in batched mode",
            )
