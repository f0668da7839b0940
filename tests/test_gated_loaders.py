"""Decode-path tests for the optional-dependency loaders (VERDICT r3 next #3).

The gated loaders (nuScenes / rosbag / MCAP / Ouster pcap) were previously
tested only as ImportError gates; here each one's __getitem__ actually runs —
against a faithful in-memory fake of its library (installed into sys.modules
per-test) — and must return the documented (points, stamps) contract. TUM and
the full KITTI-raw path run against REAL on-disk fixtures (PIL is available;
kitti_raw needs only numpy): reference decode behaviors being pinned are
datasets/tum.py:84-96, nuscenes.py:32-138, rosbag.py:85-89, mcap.py:29-116,
ouster.py:100-112, kitti_raw.py:44-392 in /root/reference/python/kiss_icp.
"""

import json
import sys
import types

import numpy as np
import pytest
from scipy.spatial.transform import Rotation


# ---------------------------------------------------------------------------
# TUM: real depth-PNG fixture through the numpy back-projection.
# ---------------------------------------------------------------------------

def test_tum_depth_backprojection(tmp_path):
    from PIL import Image

    from kiss_icp_tpu.datasets.tum import _CX, _CY, _FX, _FY, TUMDataset

    seq = tmp_path / "rgbd_dataset_freiburg1_xyz"
    (seq / "depth").mkdir(parents=True)
    # Depth PNG: uint16, meters * 5000. Two known pixels + one truncated
    # (>= 4 m) + zeros elsewhere.
    depth = np.zeros((480, 640), np.uint16)
    depth[240, 320] = 2 * 5000          # 2.0 m near principal point
    depth[100, 50] = 10000              # 2.0 m off-axis
    depth[5, 5] = 5 * 5000              # 5.0 m -> beyond _DEPTH_TRUNC, dropped
    for i, t in enumerate(["1305031102.160407", "1305031102.194330"]):
        Image.fromarray(depth).save(seq / "depth" / f"{t}.png")
        (seq / "depth.txt").open("a").write(f"{t} depth/{t}.png\n")
    # Ground truth at nearby stamps (nearest-timestamp matching).
    q = Rotation.from_euler("z", 0.1).as_quat()
    with (seq / "groundtruth.txt").open("w") as f:
        f.write(f"1305031102.1600 1.0 2.0 3.0 {q[0]} {q[1]} {q[2]} {q[3]}\n")
        f.write(f"1305031102.1950 1.5 2.0 3.0 {q[0]} {q[1]} {q[2]} {q[3]}\n")

    ds = TUMDataset(seq)
    assert len(ds) == 2
    pts, ts = ds[0]
    assert pts.shape == (2, 3) and len(ts) == 0  # truncated pixel dropped
    # Row-major scan order: (5,5) dropped, then (100,50), then (240,320).
    z = 2.0
    np.testing.assert_allclose(
        pts[0], [(50 - _CX) * z / _FX, (100 - _CY) * z / _FY, z], atol=1e-9)
    np.testing.assert_allclose(
        pts[1], [(320 - _CX) * z / _FX, (240 - _CY) * z / _FY, z], atol=1e-9)
    assert ds.gt_poses.shape == (2, 4, 4)
    np.testing.assert_allclose(ds.gt_poses[0][:3, 3], [1.0, 2.0, 3.0])
    stamps = ds.get_frames_timestamps()
    assert stamps.shape == (2,) and stamps[1] > stamps[0]


# ---------------------------------------------------------------------------
# KITTI raw: full __getitem__ + OXTS GT path on an on-disk fixture.
# ---------------------------------------------------------------------------

def test_kitti_raw_full_path(tmp_path):
    from kiss_icp_tpu.datasets.kitti_raw import (
        RAW_TO_ODOMETRY_MAPPING, KITTIRawDataset)

    drive = tmp_path / RAW_TO_ODOMETRY_MAPPING["00"]
    velo = drive / "velodyne_points" / "data"
    oxts = drive / "oxts" / "data"
    velo.mkdir(parents=True)
    oxts.mkdir(parents=True)
    rng = np.random.default_rng(7)
    n = 2048
    for i in range(3):
        scan = np.zeros((n, 4), np.float32)
        scan[:, :3] = rng.uniform(-40, 40, (n, 3))
        scan.tofile(velo / f"{i:010d}.bin")
        # OXTS packet: lat lon alt roll pitch yaw + 24 ignored channels.
        vals = np.zeros(30)
        vals[0] = 49.0 + i * 1e-5   # ~1.1 m north per frame
        vals[1] = 8.43
        vals[2] = 110.0
        vals[5] = 0.02 * i          # slight yaw
        np.savetxt(oxts / f"{i:010d}.txt", vals[None])
    calib_dir = tmp_path / "2011_10_03"
    rot = Rotation.from_euler("zyx", [0.01, -0.02, 0.005]).as_matrix()
    with (calib_dir / "calib_imu_to_velo.txt").open("w") as f:
        f.write("calib_time: 15-Mar-2012 11:37:16\n")
        f.write("R: " + " ".join(str(v) for v in rot.ravel()) + "\n")
        f.write("T: " + "-0.8086759 0.3195559 -0.7997231\n")

    ds = KITTIRawDataset(tmp_path, "00")
    assert len(ds) == 3
    pts, stamps = ds[1]
    # Contract: (N, 3) float64 corrected points + azimuth pseudo-stamps in
    # [0, 1) ordered by scan angle.
    assert pts.shape == (n, 3) and pts.dtype == np.float64
    assert stamps.shape == (n,)
    assert np.all((stamps >= 0.0) & (stamps < 1.0 + 1e-9))
    # The 0.205 deg vertical correction preserves range.
    raw = np.fromfile(ds.scan_files[1], np.float32).reshape(-1, 4)[:, :3]
    np.testing.assert_allclose(
        np.linalg.norm(pts, axis=1), np.linalg.norm(raw, axis=1), rtol=1e-6)
    # GT: velodyne-frame, re-based to the first pose.
    assert ds.gt_poses.shape == (3, 4, 4)
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-9)
    # ~1.11 m of northward motion per 1e-5 deg latitude step.
    d01 = np.linalg.norm(ds.gt_poses[1][:3, 3])
    assert 0.8 < d01 < 1.5


# ---------------------------------------------------------------------------
# Shared fake-PointCloud2 payload for the bag-style loaders.
# ---------------------------------------------------------------------------

class _Field:
    def __init__(self, name, offset, datatype, count=1):
        self.name, self.offset, self.datatype, self.count = (
            name, offset, datatype, count)


class _PC2Msg:
    def __init__(self, pts):
        rec = np.rec.fromarrays(
            [pts[:, 0], pts[:, 1], pts[:, 2]], formats="<f4,<f4,<f4",
            names="x,y,z")
        self.fields = [_Field("x", 0, 7), _Field("y", 4, 7), _Field("z", 8, 7)]
        self.point_step = rec.itemsize
        self.width = len(pts)
        self.height = 1
        self.is_bigendian = False
        self.data = rec.tobytes()


def _install(monkeypatch, name, module):
    monkeypatch.setitem(sys.modules, name, module)


# ---------------------------------------------------------------------------
# rosbag (fake `rosbags.highlevel.AnyReader`).
# ---------------------------------------------------------------------------

def test_rosbag_decode(monkeypatch, tmp_path):
    rng = np.random.default_rng(11)
    clouds = [rng.uniform(-20, 20, (256, 3)).astype(np.float32)
              for _ in range(3)]

    class _Conn:
        def __init__(self, topic, msgtype):
            self.topic, self.msgtype = topic, msgtype

    class _TopicInfo:
        def __init__(self, n):
            self.msgcount = n

    class AnyReader:
        def __init__(self, paths):
            assert len(paths) == 1
            self.connections = [
                _Conn("/tf", "tf2_msgs/msg/TFMessage"),
                _Conn("/points", "sensor_msgs/msg/PointCloud2"),
            ]
            self.topics = {"/points": _TopicInfo(len(clouds)),
                           "/tf": _TopicInfo(99)}
            self.closed = False

        def open(self):
            pass

        def close(self):
            self.closed = True

        def messages(self, connections):
            assert [c.topic for c in connections] == ["/points"]
            for i, pts in enumerate(clouds):
                yield connections[0], 1_000_000 * i, _PC2Msg(pts)

        def deserialize(self, rawdata, msgtype):
            assert msgtype == "sensor_msgs/msg/PointCloud2"
            return rawdata

    highlevel = types.ModuleType("rosbags.highlevel")
    highlevel.AnyReader = AnyReader
    rosbags = types.ModuleType("rosbags")
    rosbags.highlevel = highlevel
    _install(monkeypatch, "rosbags", rosbags)
    _install(monkeypatch, "rosbags.highlevel", highlevel)

    from kiss_icp_tpu.datasets.rosbag import RosbagDataset

    ds = RosbagDataset(tmp_path / "drive.bag")  # auto-selects the PC2 topic
    assert len(ds) == 3
    assert ds.topic == "/points"
    for i in range(3):
        pts, ts = ds[i]  # sequential by design (reference rosbag.py:85-89)
        np.testing.assert_allclose(pts, clouds[i], atol=1e-6)
        assert len(ts) == 0  # no per-point time field in this bag


def test_rosbag_topic_validation(monkeypatch, tmp_path):
    class _Conn:
        def __init__(self, topic, msgtype):
            self.topic, self.msgtype = topic, msgtype

    class AnyReader:
        def __init__(self, paths):
            self.connections = [
                _Conn("/a", "sensor_msgs/msg/PointCloud2"),
                _Conn("/b", "sensor_msgs/msg/PointCloud2"),
            ]
            self.topics = {"/a": types.SimpleNamespace(msgcount=1),
                           "/b": types.SimpleNamespace(msgcount=1)}

        def open(self):
            pass

        def close(self):
            pass

        def messages(self, connections):
            return iter(())

    highlevel = types.ModuleType("rosbags.highlevel")
    highlevel.AnyReader = AnyReader
    rosbags = types.ModuleType("rosbags")
    rosbags.highlevel = highlevel
    _install(monkeypatch, "rosbags", rosbags)
    _install(monkeypatch, "rosbags.highlevel", highlevel)

    from kiss_icp_tpu.datasets.rosbag import RosbagDataset

    with pytest.raises(ValueError, match="ambiguous"):
        RosbagDataset(tmp_path / "two_topics.bag")
    ds = RosbagDataset(tmp_path / "two_topics.bag", topic="/b")
    assert ds.topic == "/b"


# ---------------------------------------------------------------------------
# MCAP (fake `mcap.reader` + `mcap_ros2.decoder`).
# ---------------------------------------------------------------------------

def test_mcap_decode(monkeypatch, tmp_path):
    rng = np.random.default_rng(13)
    clouds = [rng.uniform(-15, 15, (128, 3)).astype(np.float32)
              for _ in range(2)]

    class _Schema:
        name = "sensor_msgs/msg/PointCloud2"

    class _Channel:
        def __init__(self, topic):
            self.topic = topic
            self.schema_id = 1

    class _Stats:
        channel_message_counts = {10: len(clouds)}

    class _Summary:
        channels = {10: _Channel("/lidar")}
        schemas = {1: _Schema()}
        statistics = _Stats()

    class _Reader:
        def get_summary(self):
            return _Summary()

        def iter_decoded_messages(self, topics):
            assert topics == ["/lidar"]
            for i, pts in enumerate(clouds):
                yield (_Schema(), _Summary.channels[10],
                       types.SimpleNamespace(log_time=i), _PC2Msg(pts))

        def iter_messages(self, topics):
            return iter([(None, None, None)] * len(clouds))

    def make_reader(f, decoder_factories):
        assert decoder_factories and hasattr(f, "read")
        return _Reader()

    mcap_mod = types.ModuleType("mcap")
    reader_mod = types.ModuleType("mcap.reader")
    reader_mod.make_reader = make_reader
    mcap_mod.reader = reader_mod
    ros2_mod = types.ModuleType("mcap_ros2")
    dec_mod = types.ModuleType("mcap_ros2.decoder")
    dec_mod.DecoderFactory = type("DecoderFactory", (), {})
    ros2_mod.decoder = dec_mod
    for name, mod in [("mcap", mcap_mod), ("mcap.reader", reader_mod),
                      ("mcap_ros2", ros2_mod), ("mcap_ros2.decoder", dec_mod)]:
        _install(monkeypatch, name, mod)

    from kiss_icp_tpu.datasets.mcap import McapDataset

    path = tmp_path / "drive.mcap"
    path.write_bytes(b"\x89MCAP0\r\n")  # loader opens the real file handle
    ds = McapDataset(path)
    assert len(ds) == 2
    assert ds.topic == "/lidar"
    for i in range(2):
        pts, ts = ds[i]
        np.testing.assert_allclose(pts, clouds[i], atol=1e-6)
        assert len(ts) == 0


# ---------------------------------------------------------------------------
# Ouster pcap (fake `ouster.sdk` client/pcap modules).
# ---------------------------------------------------------------------------

def test_ouster_decode(monkeypatch, tmp_path):
    h, w = 4, 16
    rng = np.random.default_rng(17)
    # Two frames of range images (mm); a few zero-range (no-return) pixels.
    ranges = rng.integers(1000, 60000, size=(2, h, w)).astype(np.uint32)
    ranges[0, 0, 0] = 0
    ranges[1, 2, 5] = 0
    # Unit direction per pixel, fixed seed: xyz = dirs * range_m.
    dirs = rng.normal(size=(h * w, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    class _ChanField:
        RANGE = "RANGE"

    class _Scan:
        def __init__(self, rng_img):
            self._rng_img = rng_img

        def field(self, chan):
            assert chan == "RANGE"
            return self._rng_img

    class SensorInfo:
        def __init__(self, meta_json):
            meta = json.loads(meta_json)
            fmt = types.SimpleNamespace(
                pixels_per_column=meta["pixels_per_column"],
                columns_per_frame=meta["columns_per_frame"])
            self.format = fmt

    class Pcap:
        def __init__(self, path, info):
            self.frames = np.load(str(path) + ".npy")

    class Scans:
        def __init__(self, source):
            self._scans = [_Scan(f) for f in source.frames]

        def __iter__(self):
            return iter(self._scans)

    def XYZLut(info):
        def lut(rng_img):
            r_m = rng_img.reshape(-1, 1).astype(np.float64) / 1000.0
            return (dirs * r_m).reshape(rng_img.shape + (3,))
        return lut

    client = types.ModuleType("ouster.sdk.client")
    client.SensorInfo = SensorInfo
    client.Scans = Scans
    client.XYZLut = XYZLut
    client.ChanField = _ChanField
    pcap = types.ModuleType("ouster.sdk.pcap")
    pcap.Pcap = Pcap
    sdk = types.ModuleType("ouster.sdk")
    sdk.client = client
    sdk.pcap = pcap
    ouster = types.ModuleType("ouster")
    ouster.sdk = sdk
    for name, mod in [("ouster", ouster), ("ouster.sdk", sdk),
                      ("ouster.sdk.client", client),
                      ("ouster.sdk.pcap", pcap)]:
        _install(monkeypatch, name, mod)

    path = tmp_path / "drive.pcap"
    path.write_bytes(b"pcap")
    np.save(str(path) + ".npy", ranges)
    (tmp_path / "drive.json").write_text(
        json.dumps({"pixels_per_column": h, "columns_per_frame": w}))

    from kiss_icp_tpu.datasets.ouster import OusterDataset

    ds = OusterDataset(path)  # meta defaults to the sibling json
    assert len(ds) == 2
    pts, ts = ds[0]
    # Zero-range returns filtered; remaining points on the LUT directions.
    assert pts.shape == (h * w - 1, 3) and ts.shape == (h * w - 1,)
    keep = ranges[0].reshape(-1) > 0
    expected = dirs[keep] * (ranges[0].reshape(-1, 1)[keep] / 1000.0)
    np.testing.assert_allclose(pts, expected, atol=1e-9)
    # Column stamps: linspace over the rotation, tiled over rows.
    full_ts = np.tile(np.linspace(0.0, 1.0, w, endpoint=False), (h, 1)).ravel()
    np.testing.assert_allclose(ts, full_ts[keep], atol=1e-12)


# ---------------------------------------------------------------------------
# nuScenes (fake devkit).
# ---------------------------------------------------------------------------

def test_nuscenes_decode(monkeypatch, tmp_path):
    rng = np.random.default_rng(19)
    n = 300
    (tmp_path / "v1.0-mini").mkdir()
    (tmp_path / "sweeps").mkdir()
    clouds = []
    for i in range(3):
        pc = np.zeros((n, 5), np.float32)
        pc[:, :3] = rng.uniform(-30, 30, (n, 3))
        pc.tofile(tmp_path / "sweeps" / f"lidar_{i}.pcd.bin")
        clouds.append(pc[:, :3].astype(np.float64))

    ego_q = Rotation.from_euler("z", 0.05)
    tables = {
        "sample": {"s0": {"data": {"LIDAR_TOP": "sd0"}}},
        "sample_data": {
            f"sd{i}": {
                "token": f"sd{i}",
                "next": f"sd{i+1}" if i < 2 else "",
                "filename": f"sweeps/lidar_{i}.pcd.bin",
                "ego_pose_token": f"ep{i}",
                "calibrated_sensor_token": "cs0",
            } for i in range(3)
        },
        "ego_pose": {
            f"ep{i}": {"rotation": np.roll(ego_q.as_quat(), 1).tolist(),
                       "translation": [2.0 * i, 0.0, 0.0]}
            for i in range(3)
        },
        "calibrated_sensor": {
            "cs0": {"rotation": [1.0, 0.0, 0.0, 0.0],
                    "translation": [0.9, 0.0, 1.8]},
        },
    }

    class NuScenes:
        def __init__(self, dataroot, version):
            assert version == "v1.0-mini"
            self.dataroot = dataroot
            self.scene = [
                {"name": "scene-0001", "first_sample_token": "s0"},
                {"name": "scene-0999", "first_sample_token": "s0"},
            ]

        def get(self, table, token):
            return tables[table][token]

    nusc_mod = types.ModuleType("nuscenes")
    sub = types.ModuleType("nuscenes.nuscenes")
    sub.NuScenes = NuScenes
    nusc_mod.nuscenes = sub
    _install(monkeypatch, "nuscenes", nusc_mod)
    _install(monkeypatch, "nuscenes.nuscenes", sub)

    from kiss_icp_tpu.datasets.nuscenes import NuScenesDataset

    ds = NuScenesDataset(tmp_path, 1)
    assert len(ds) == 3
    pts, ts = ds[1]
    np.testing.assert_allclose(pts, clouds[1], atol=1e-6)
    assert len(ts) == 0
    # GT re-based to the first pose; ego steps 2 m in x between frames
    # (identical ego rotation, so velodyne-frame deltas equal world deltas
    # rotated into frame 0).
    assert ds.gt_poses.shape == (3, 4, 4)
    np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-12)
    np.testing.assert_allclose(
        np.linalg.norm(ds.gt_poses[1][:3, 3]), 2.0, atol=1e-9)

    with pytest.raises(ValueError, match="not found"):
        NuScenesDataset(tmp_path, 777)
