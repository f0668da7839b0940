"""Capacity-overflow surfacing: fixed-shape buffers must never drop silently.

The reference's std::vector-backed structures are unbounded
(cpp/kiss_icp/core/VoxelHashMap.cpp:97-119); our fixed-capacity equivalents
drop on overflow, so FrameResult/ChunkSummary carry drop counters and the
pipeline driver warns on the first nonzero count.
"""

import warnings

import numpy as np

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry


def _config(frame_capacity=64, source_capacity=64, map_capacity_log2=13):
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 2048
    cfg.engine.frame_capacity = frame_capacity
    cfg.engine.source_capacity = source_capacity
    cfg.engine.map_capacity_log2 = map_capacity_log2
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 5
    return cfg


def _scan(n=2048, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    return pts, np.zeros((n,), np.float32), np.ones((n,), bool)


def test_frame_result_reports_downsample_drops():
    # 2048 spread points at a 0.25 m grid occupy far more than 64 voxels.
    cfg = _config(frame_capacity=64, source_capacity=64)
    pts, ts, valid = _scan()
    state = odometry.init_state(cfg)
    _, res = odometry.register_frame(cfg, state, pts, ts, valid)
    assert int(res.num_dropped_downsample) > 0


def test_no_drops_with_ample_capacity():
    cfg = _config(frame_capacity=4096, source_capacity=2048, map_capacity_log2=15)
    pts, ts, valid = _scan()
    state = odometry.init_state(cfg)
    _, res = odometry.register_frame(cfg, state, pts, ts, valid)
    assert int(res.num_dropped_downsample) == 0
    assert int(res.num_dropped_map_voxels) == 0


def test_chunk_summary_carries_drop_counters():
    cfg = _config(frame_capacity=64, source_capacity=64)
    k = 2
    pts, ts, valid = _scan()
    chunk = odometry.make_chunked_step(cfg)
    state = odometry.init_state(cfg)
    _, summary = chunk(
        state,
        np.broadcast_to(pts, (k,) + pts.shape).copy(),
        np.broadcast_to(ts, (k,) + ts.shape).copy(),
        np.broadcast_to(valid, (k,) + valid.shape).copy(),
    )
    assert summary.num_dropped_downsample.shape == (k,)
    assert int(np.sum(np.asarray(summary.num_dropped_downsample))) > 0


class _ListDataset:
    def __init__(self, scans):
        self._scans = scans

    def __len__(self):
        return len(self._scans)

    def __getitem__(self, idx):
        return self._scans[idx]


def test_pipeline_warns_on_overflow(tmp_path):
    from kiss_icp_tpu.pipeline import OdometryPipeline

    cfg = _config(frame_capacity=64, source_capacity=64)
    cfg.out_dir = str(tmp_path / "results")
    pts, _, _ = _scan()
    pipeline = OdometryPipeline(_ListDataset([pts, pts]), config=cfg)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pipeline.run()
    messages = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("frame_capacity" in m for m in messages), messages
    assert pipeline.total_dropped_downsample > 0


def test_pipeline_warns_on_input_truncation(tmp_path):
    """A scan above engine.max_points_per_frame is stride-subsampled by
    KissICP._pad — the FIRST capacity gate must be as loud as the others
    (a 150k-point HDL-64 scan vs the default 65536 cap would otherwise
    silently lose half its points)."""
    from kiss_icp_tpu.pipeline import OdometryPipeline

    cfg = _config(frame_capacity=4096, source_capacity=2048, map_capacity_log2=15)
    cfg.engine.max_points_per_frame = 1024  # scans below are 2048 points
    cfg.out_dir = str(tmp_path / "results")
    pts, _, _ = _scan()
    pipeline = OdometryPipeline(_ListDataset([pts, pts]), config=cfg)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pipeline.run()
    messages = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("max_points_per_frame" in m for m in messages), messages
    assert pipeline.total_dropped_input == 2 * 1024
    assert pipeline.odometry.total_input_dropped == 2 * 1024
    descs = [r.desc for r in pipeline.results.metrics]
    assert any("Dropped input points" in d for d in descs), descs


def test_chunked_pipeline_counts_input_truncation(tmp_path):
    from kiss_icp_tpu.pipeline import OdometryPipeline

    cfg = _config(frame_capacity=4096, source_capacity=2048, map_capacity_log2=15)
    cfg.engine.max_points_per_frame = 1024
    cfg.engine.pipeline_chunk = 2
    cfg.out_dir = str(tmp_path / "results")
    pts, _, _ = _scan()
    pipeline = OdometryPipeline(_ListDataset([pts, pts]), config=cfg)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pipeline.run()
    messages = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("max_points_per_frame" in m for m in messages), messages
    assert pipeline.total_dropped_input == 2 * 1024


def test_pipeline_silent_without_overflow(tmp_path):
    from kiss_icp_tpu.pipeline import OdometryPipeline

    cfg = _config(frame_capacity=4096, source_capacity=2048, map_capacity_log2=15)
    cfg.out_dir = str(tmp_path / "results")
    pts, _, _ = _scan()
    pipeline = OdometryPipeline(_ListDataset([pts, pts]), config=cfg)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pipeline.run()
    assert not [w for w in caught if w.category is RuntimeWarning]
    assert pipeline.total_dropped_downsample == 0
    assert pipeline.total_dropped_map_voxels == 0


def test_pad_oversized_scan_with_mismatched_timestamps():
    """Timestamps whose length differs from the scan are tolerated (ignored)
    everywhere; the oversized-scan subsample path used to IndexError on them
    instead (round-3 review finding)."""
    from kiss_icp_tpu.odometry import subsample_to_capacity

    frame = np.random.default_rng(0).uniform(-10, 10, (500, 3)).astype(np.float32)
    bad_ts = np.zeros(7, np.float32)  # wrong length
    f, t, dropped = subsample_to_capacity(frame, bad_ts, 128)
    assert f.shape == (128, 3) and dropped == 372
    assert t is bad_ts  # passed through untouched, caller ignores it
    f2, t2, d2 = subsample_to_capacity(frame, np.arange(500, dtype=np.float32), 128)
    assert t2.shape == (128,) and d2 == 372


def test_batched_wrapper_counts_input_drops():
    """BatchedOdometry stride-subsamples oversized scans with drop
    accounting, same policy as KissICP._pad (round-3 review finding:
    it used to head-truncate silently)."""
    from kiss_icp_tpu.parallel.batch import BatchedOdometry, make_mesh

    cfg = _config(frame_capacity=2048, source_capacity=512,
                  map_capacity_log2=14)
    cap = cfg.engine.max_points_per_frame
    rng = np.random.default_rng(1)
    big = rng.uniform(-30, 30, (cap * 2, 3)).astype(np.float32)
    small = big[:64]
    bo = BatchedOdometry(cfg, batch=2, mesh=make_mesh(2))
    poses = bo.register_frames([big, small])
    assert poses.shape == (2, 4, 4)
    assert bo.last_input_dropped == cap
    assert bo.total_input_dropped == cap
