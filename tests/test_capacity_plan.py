"""Capacity planner: occupancy measurement + recommendation contract."""

import json

import numpy as np
import pytest

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu.datasets.synthetic import SyntheticDataset
from kiss_icp_tpu.tools import capacity_plan as cp


def test_measure_frames_crop_and_downsample_semantics():
    pts = np.array([
        [10.0, 0.0, 0.0],       # kept
        [10.1, 0.0, 0.0],       # same 0.5-voxel as above -> frame_ds merges
        [0.2, 0.0, 0.0],        # inside min_range -> cropped
        [500.0, 0.0, 0.0],      # beyond max_range -> cropped
        [np.nan, 1.0, 1.0],     # non-finite -> cropped
        [0.0, 30.0, 0.0],       # kept, distinct voxel
    ])
    (s,) = cp.measure_frames([pts], voxel_size=1.0, min_range=1.0,
                             max_range=100.0)
    assert s.raw == 6
    assert s.cropped == 3
    assert s.frame_ds == 2  # the two 10m points share a 0.5m voxel
    assert s.source_ds == 2  # 10m and 30m points are in distinct 1.5m voxels


def test_plan_covers_max_with_headroom_and_is_pow2():
    stats = [cp.FrameStats(raw=50000, cropped=40000, frame_ds=5000,
                           source_ds=1300),
             cp.FrameStats(raw=48000, cropped=39000, frame_ds=4800,
                           source_ds=1100)]
    p = cp.plan(stats, headroom=1.5, map_voxels=60000, map_storage="u16")
    for cap in (p.max_points_per_frame, p.frame_capacity, p.source_capacity):
        assert cap & (cap - 1) == 0  # power of two
    assert p.source_capacity >= 1300 * 1.5
    assert p.source_capacity == 2048  # the motivating case: NOT 8192
    assert p.frame_capacity == 8192
    # map: >= 4x voxel estimate (<= 0.25 load factor), as log2
    assert 1 << p.map_capacity_log2 >= 60000 * 4
    # bytes model matches bench.assoc_bytes_per_iteration's formula at u16
    expected = 2048 * 27 * (20 * 6 + 16 * 4 + 4)
    assert p.stats["assoc_bytes_per_iteration"] == expected


def test_plan_empty_raises():
    with pytest.raises(ValueError):
        cp.plan([])


def test_plan_for_dataset_synthetic_with_gt():
    ds = SyntheticDataset(sequence=1, n_scans=6, n_beams=32, n_azimuth=256,
                          max_range=50.0)
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    p = cp.plan_for_dataset(ds, cfg, samples=4)
    assert p.map_capacity_log2 is not None  # GT poses available
    assert p.source_capacity >= p.stats["source_ds_max"]
    assert p.frame_capacity >= p.stats["frame_ds_max"]
    assert p.stats["frames_sampled"] == 4
    # The recommended source capacity must be dramatically below the
    # schema's sensor-scale default for this tiny scene (the tool's reason
    # to exist: padded rows pay full gather traffic in the hot loop).
    assert p.source_capacity < KISSConfig().engine.source_capacity


def test_cli_on_generic_dir(tmp_path, capsys):
    rng = np.random.default_rng(0)
    for i in range(3):
        pts = rng.uniform(-40, 40, size=(2000, 3)).astype(np.float32)
        with open(tmp_path / f"{i:06d}.bin", "wb") as f:
            np.hstack([pts, np.zeros((2000, 1), np.float32)]).tofile(f)
    rc = cp.main([str(tmp_path), "--dataloader", "generic", "--samples", "3",
                  "--headroom", "2.0"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["source_capacity"] & (out["source_capacity"] - 1) == 0
    assert out["stats"]["frames_sampled"] == 3
    assert out["headroom"] == 2.0
