"""Tests for the remaining dataset loaders, on synthetic on-disk fixtures."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from kiss_icp_tpu.datasets.apollo import ApolloDataset
from kiss_icp_tpu.datasets.boreas import BoreasDataset, azimuth_timestamps
from kiss_icp_tpu.datasets.helipr import HeLiPRDataset
from kiss_icp_tpu.datasets.kitti_raw import KITTIRawDataset, pose_from_oxts
from kiss_icp_tpu.datasets.mulran import MulranDataset
from kiss_icp_tpu.datasets.ncd import NewerCollegeDataset
from kiss_icp_tpu.datasets.nclt import NCLTDataset, read_nclt_scan
from kiss_icp_tpu.tools.point_cloud2 import read_point_cloud as decode_pc2


def _write_pcd(path, pts):
    header = (
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {len(pts)}\nHEIGHT 1\nPOINTS {len(pts)}\nDATA binary\n"
    )
    rec = np.rec.fromarrays(
        [pts[:, 0], pts[:, 1], pts[:, 2]], formats="<f4,<f4,<f4", names="x,y,z"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(rec.tobytes())


def test_mulran(tmp_path):
    seq = tmp_path / "KAIST01"
    (seq / "Ouster").mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 64 * 1024
    stamps = [100000000, 200000000]
    for t in stamps:
        pts = rng.uniform(-50, 50, (n, 4)).astype(np.float32)
        pts.tofile(seq / "Ouster" / f"{t}.bin")
    # global poses: more rows than scans
    rows = []
    for i, t in enumerate(np.linspace(50000000, 250000000, 7)):
        pose34 = np.eye(4)[:3]
        pose34 = pose34.copy()
        pose34[0, 3] = i * 1.0
        rows.append([t] + list(pose34.ravel()))
    np.savetxt(seq / "global_pose.csv", np.array(rows), delimiter=",")
    ds = MulranDataset(seq)
    assert len(ds) == 2
    pts, ts = ds[0]
    assert pts.shape == (n, 3) and ts.shape == (n,)
    assert np.all((ts >= 0) & (ts < 1))
    assert ds.gt_poses.shape == (2, 4, 4)
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-9)

    # broken cloud (wrong size) -> empty stamps
    pts_small = rng.uniform(-50, 50, (100, 4)).astype(np.float32)
    pts_small.tofile(seq / "Ouster" / "300000000.bin")
    ds2 = MulranDataset(seq)
    _, ts2 = ds2[2]
    assert len(ts2) == 0


def test_ncd(tmp_path):
    seq = tmp_path / "quad"
    scans = seq / "raw_format" / "ouster_scan"
    gt_dir = seq / "ground_truth"
    scans.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    n = 64 * 1024
    for name in ["cloud_1583836591_182590976.pcd", "cloud_1583836592_182590976.pcd"]:
        _write_pcd(scans / name, rng.uniform(-20, 20, (n, 3)).astype(np.float32))
    gt_rows = []
    for i in range(2):
        q = Rotation.from_euler("z", 0.1 * i).as_quat()
        gt_rows.append([1583836591 + i, 0, i * 0.5, 0.0, 0.0, q[0], q[1], q[2], q[3]])
    np.savetxt(gt_dir / "registered_poses.csv", np.array(gt_rows), delimiter=",")
    ds = NewerCollegeDataset(seq)
    assert len(ds) == 2
    pts, ts = ds[0]
    assert pts.shape == (n, 3) and len(ts) == n
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-6)


def test_apollo(tmp_path):
    seq = tmp_path / "session1"
    (seq / "pcds").mkdir(parents=True)
    (seq / "poses").mkdir(parents=True)
    rng = np.random.default_rng(2)
    for i in [1, 2, 10]:
        _write_pcd(seq / "pcds" / f"{i}.pcd", rng.uniform(-30, 30, (128, 3)).astype(np.float32))
    rows = []
    for i in range(3):
        q = Rotation.from_euler("z", 0.05 * i).as_quat()
        rows.append([i, 1000.0 + i, i * 2.0, 0, 0, q[0], q[1], q[2], q[3]])
    np.savetxt(seq / "poses" / "gt_poses.txt", np.array(rows))
    ds = ApolloDataset(seq)
    assert len(ds) == 3
    assert ds.scan_files[2].endswith("10.pcd")  # natural sort
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-9)


def test_boreas(tmp_path):
    seq = tmp_path / "boreas-2021"
    (seq / "lidar").mkdir(parents=True)
    (seq / "applanix").mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(2):
        pts = rng.uniform(-40, 40, (256, 6)).astype(np.float32)
        pts.tofile(seq / "lidar" / f"{i}.bin")
    hdr = "t,x,y,z,vx,vy,vz,r,p,y,wz,wy,wx"
    rows = [[i, i * 1.0, 0, 0, 0, 0, 0, 0.0, 0.0, 0.1 * i, 0, 0, 0] for i in range(2)]
    np.savetxt(seq / "applanix" / "lidar_poses.csv", np.array(rows),
               delimiter=",", header=hdr, comments="")
    ds = BoreasDataset(seq)
    assert len(ds) == 2
    pts, ts = ds[0]
    assert pts.shape == (256, 3)
    assert np.all((ts >= 0) & (ts <= 1))
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-7)


def test_azimuth_timestamps_monotone_in_angle():
    # points sweeping counterclockwise from -pi..pi get stamps 1..0? Check range.
    ang = np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 100)
    pts = np.stack([np.cos(ang), np.sin(ang), np.zeros_like(ang)], axis=1)
    ts = azimuth_timestamps(pts)
    assert np.all((ts >= 0) & (ts <= 1))


def test_nclt_scan_decode(tmp_path):
    # round-trip the documented scaling
    pts_true = np.array([[1.0, 2.0, -0.5], [10.0, -3.0, 1.0]])
    x_s = np.round((pts_true[:, 0] + 100.0) / 0.005).astype(np.int16)
    y_s = np.round((-pts_true[:, 1] + 100.0) / 0.005).astype(np.int16)
    z_s = np.round((-pts_true[:, 2] + 100.0) / 0.005).astype(np.int16)
    l = np.zeros_like(x_s)
    inter = np.stack([x_s, y_s, z_s, l], axis=1).ravel()
    f = tmp_path / "scan.bin"
    inter.tofile(f)
    decoded = read_nclt_scan(str(f))
    np.testing.assert_allclose(decoded, pts_true, atol=0.005)


def test_helipr_ouster_layout(tmp_path):
    root = tmp_path
    scan_dir = root / "LiDAR" / "Ouster"
    gt_dir = root / "LiDAR_GT"
    scan_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(4)
    n = 500
    rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                             ("intensity", "<f4"), ("t", "<u4"),
                             ("reflectivity", "<u2"), ("ring", "<u2"),
                             ("ambient", "<u2")])
    rec["x"] = rng.uniform(-50, 50, n)
    rec["y"] = rng.uniform(-50, 50, n)
    rec["z"] = rng.uniform(-5, 5, n)
    rec["t"] = np.arange(n, dtype=np.uint32) * 1000
    rec.tofile(scan_dir / "1000000000.bin")
    q = Rotation.identity().as_quat()
    np.savetxt(gt_dir / "global_Ouster_gt.txt",
               np.array([[1000000000, 0, 0, 0, q[0], q[1], q[2], q[3]]]))
    ds = HeLiPRDataset(root, "Ouster")
    pts, ts = ds[0]
    assert pts.shape == (n, 3)
    np.testing.assert_allclose(ts.min(), 0.0)
    np.testing.assert_allclose(ts.max(), 1.0)
    np.testing.assert_allclose(pts[:, 0], rec["x"], atol=1e-6)


def test_helipr_unknown_type(tmp_path):
    with pytest.raises(ValueError, match="Unsupported HeLiPR"):
        HeLiPRDataset(tmp_path, "Livox2")


def test_pose_from_oxts_identity_at_origin():
    pose = pose_from_oxts(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 1.0)
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(pose[:3, 3], [0, 0, 10.0], atol=1e-9)


class _FakeField:
    def __init__(self, name, offset, datatype, count=1):
        self.name = name
        self.offset = offset
        self.datatype = datatype
        self.count = count


class _FakeMsg:
    def __init__(self, pts, stamps=None):
        n = len(pts)
        fields = [
            _FakeField("x", 0, 7),
            _FakeField("y", 4, 7),
            _FakeField("z", 8, 7),
        ]
        cols = [pts[:, 0], pts[:, 1], pts[:, 2]]
        fmt = "<f4,<f4,<f4"
        names = "x,y,z"
        if stamps is not None:
            fields.append(_FakeField("t", 12, 6))
            cols.append(stamps)
            fmt += ",<u4"
            names += ",t"
        rec = np.rec.fromarrays(cols, formats=fmt, names=names)
        self.fields = fields
        self.point_step = rec.itemsize
        self.width = n
        self.height = 1
        self.is_bigendian = False
        self.data = rec.tobytes()


def test_point_cloud2_decode():
    rng = np.random.default_rng(5)
    pts = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
    stamps = np.arange(64, dtype=np.uint32)
    msg = _FakeMsg(pts, stamps)
    out_pts, out_ts = decode_pc2(msg)
    np.testing.assert_allclose(out_pts, pts, atol=1e-6)
    np.testing.assert_allclose(out_ts.min(), 0.0)
    np.testing.assert_allclose(out_ts.max(), 1.0)


def test_point_cloud2_nan_and_no_stamps():
    pts = np.array([[1, 2, 3], [np.nan, 0, 0], [4, 5, 6]], dtype=np.float32)
    msg = _FakeMsg(pts)
    out_pts, out_ts = decode_pc2(msg)
    assert out_pts.shape == (2, 3)
    assert len(out_ts) == 0


def test_gated_loaders_raise_importerror(tmp_path):
    from kiss_icp_tpu.datasets import dataset_factory

    for name in ["rosbag", "nuscenes"]:
        with pytest.raises(ImportError):
            dataset_factory(name, tmp_path / "x", "0")


def test_helipr_avia_aeva_record_sizes(tmp_path):
    """The reference struct formats are '='-prefixed (standard sizes): Avia
    '=fffBBBL' is 19 bytes and Aeva '=ffffflBf' is 29 — 8-byte time fields
    would misalign every record after the first (round-3 review finding)."""
    import struct

    from kiss_icp_tpu.datasets import helipr as hp

    assert np.dtype(hp._LAYOUTS["Avia"]["dtype"]).itemsize == \
        struct.calcsize("=fffBBBL") == 19
    assert np.dtype(hp._LAYOUTS["Aeva"]["dtype"]).itemsize == \
        struct.calcsize("=ffffflBf") == 29
    assert np.dtype(hp._LAYOUTS["Aeva"]["dtype_no_intensity"]).itemsize == \
        struct.calcsize("=ffffflB") == 25
    assert np.dtype(hp._LAYOUTS["Ouster"]["dtype"]).itemsize == \
        struct.calcsize("=ffffIHHH") == 26
    assert np.dtype(hp._LAYOUTS["Velodyne"]["dtype"]).itemsize == \
        struct.calcsize("=ffffHf") == 22

    # End-to-end decode of an Avia scan written record-by-record with the
    # reference's struct format.
    root = tmp_path
    scan_dir = root / "LiDAR" / "Avia"
    gt_dir = root / "LiDAR_GT"
    scan_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(8)
    n = 300
    xyz = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    stamps = (np.arange(n) * 100).astype(np.uint32)
    with open(scan_dir / "2000000000.bin", "wb") as f:
        for i in range(n):
            f.write(struct.pack("=fffBBBL", *xyz[i], 1, 2, 3, int(stamps[i])))
    from scipy.spatial.transform import Rotation as _R
    q = _R.identity().as_quat()
    np.savetxt(gt_dir / "global_Avia_gt.txt",
               np.array([[2000000000, 0, 0, 0, q[0], q[1], q[2], q[3]]]))
    ds = HeLiPRDataset(root, "Avia")
    pts, ts = ds[0]
    assert pts.shape == (n, 3)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(ts.max(), 1.0)
