"""Dataset registry / KITTI loader / generic loader / synthetic loader tests."""

import numpy as np
import pytest

from kiss_icp_tpu import datasets
from kiss_icp_tpu.datasets import dataset_factory, guess_dataloader
from kiss_icp_tpu.datasets.kitti import KITTIOdometryDataset, correct_kitti_scan
from kiss_icp_tpu.datasets.synthetic import SyntheticDataset


def test_registry_lists_all_reference_loaders():
    names = datasets.available_dataloaders()
    for expected in ["kitti", "kitti_raw", "mulran", "ncd", "nclt", "nuscenes",
                     "apollo", "boreas", "tum", "helipr", "rosbag", "mcap",
                     "ouster", "generic"]:
        assert expected in names


def test_unknown_loader_raises():
    with pytest.raises(ValueError, match="Unknown dataloader"):
        datasets.dataset_factory("nope", "/tmp")


def _make_kitti_tree(root, seq="00", n_scans=3, with_poses=True):
    seq_dir = root / "sequences" / seq
    velo = seq_dir / "velodyne"
    velo.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n_scans):
        pts = rng.uniform(-40, 40, (256, 4)).astype(np.float32)
        pts.tofile(velo / f"{i:06d}.bin")
    # calib with a nontrivial Tr
    tr = np.array([[0, -1, 0, 0.1], [0, 0, -1, -0.05], [1, 0, 0, 0.3]], np.float64)
    lines = ["P0: " + " ".join(["1"] * 12), "Tr: " + " ".join(map(str, tr.ravel()))]
    (seq_dir / "calib.txt").write_text("\n".join(lines))
    (seq_dir / "times.txt").write_text("\n".join(str(0.1 * i) for i in range(n_scans)))
    if with_poses:
        poses_dir = root / "poses"
        poses_dir.mkdir(exist_ok=True)
        poses = np.tile(np.eye(4)[:3].reshape(1, 12), (n_scans, 1))
        poses[:, 3] = np.arange(n_scans)  # x translation in camera frame
        np.savetxt(poses_dir / f"{seq}.txt", poses)
    return root


def test_kitti_loader(tmp_path):
    _make_kitti_tree(tmp_path)
    ds = KITTIOdometryDataset(tmp_path, sequence=0)
    assert len(ds) == 3
    frame, ts = ds[0]
    assert frame.shape[1] == 3 and len(ts) == 0
    assert hasattr(ds, "gt_poses") and ds.gt_poses.shape == (3, 4, 4)
    # gt poses expressed in lidar frame: applying calibration maps them back so
    # that round-trip equals the raw camera-frame poses.
    cam = ds.apply_calibration(ds.gt_poses)
    np.testing.assert_allclose(cam[:, 0, 3], np.arange(3), atol=1e-9)
    # times available
    assert ds.get_frames_timestamps().shape == (3, 1)


def test_kitti_scan_correction_small_rotation():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-50, 50, (100, 3))
    corrected = correct_kitti_scan(pts)
    # Norm-preserving (pure per-point rotation)...
    np.testing.assert_allclose(
        np.linalg.norm(corrected, axis=1), np.linalg.norm(pts, axis=1), rtol=1e-12
    )
    # ... by exactly 0.205 degrees.
    cos = np.sum(corrected * pts, axis=1) / np.sum(pts * pts, axis=1)
    np.testing.assert_allclose(np.arccos(np.clip(cos, -1, 1)),
                               np.deg2rad(0.205), atol=1e-6)


def test_generic_loader(tmp_path):
    rng = np.random.default_rng(2)
    for i in [10, 2, 1]:  # exercise natural sorting
        pts = rng.uniform(-10, 10, (64, 4)).astype(np.float32)
        pts.tofile(tmp_path / f"scan_{i}.bin")
    ds = datasets.dataset_factory("generic", tmp_path)
    assert len(ds) == 3
    assert ds.scan_files[0].name == "scan_1.bin"
    frame, ts = ds[0]
    assert frame.shape == (64, 3)


def test_synthetic_dataset_geometry():
    ds = SyntheticDataset(sequence=0, n_scans=3, n_beams=16, n_azimuth=128)
    assert len(ds) == 3
    frame, stamps = ds[0]
    assert frame.shape[1] == 3
    assert len(stamps) == len(frame)
    assert np.all((stamps >= 0) & (stamps < 1))
    assert ds.gt_poses.shape == (3, 4, 4)
    # Scans must contain structure within range.
    r = np.linalg.norm(frame, axis=1)
    assert np.all(r < 102.0) and len(frame) > 1000


def test_guess_dataloader(tmp_path):
    assert datasets.guess_dataloader(tmp_path / "x.bag") is None or True  # file absent
    f = tmp_path / "data.mcap"
    f.write_bytes(b"")
    assert datasets.guess_dataloader(f) == "mcap"
    f2 = tmp_path / "data.pcap"
    f2.write_bytes(b"")
    assert datasets.guess_dataloader(f2) == "ouster"


def test_factory_keyword_only_call_streaming_loaders(tmp_path):
    """The CLI's factory call passes sequence/topic/meta as KEYWORDS: a
    positional arg used to bind to rosbag/mcap/ouster's topic/meta parameter
    and collide with the same keyword (TypeError, round-3 review finding).
    With rosbags/mcap/ouster-sdk absent the loaders must reach their clean
    gated ImportError instead."""
    bag = tmp_path / "x.bag"
    bag.write_bytes(b"")
    for name in ("rosbag", "mcap", "ouster"):
        with pytest.raises(ImportError):
            dataset_factory(name, bag, sequence=None, topic="/points",
                            meta=None)


def test_guess_dataloader_ros2_bag_layouts(tmp_path):
    """metadata.yaml (file or directory member) routes to rosbag regardless
    of the storage plugin — mcap-storage ROS2 bags have no .db3 (reference
    tools/cmd.py:44-48)."""
    bagdir = tmp_path / "mybag"
    bagdir.mkdir()
    (bagdir / "metadata.yaml").write_text("rosbag2_bagfile_information: {}")
    (bagdir / "data_0.mcap").write_bytes(b"")
    assert guess_dataloader(bagdir) == "rosbag"
    assert guess_dataloader(bagdir / "metadata.yaml") == "rosbag"
