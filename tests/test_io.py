"""Cloud IO reader tests (round-trip via synthetic files)."""

import numpy as np

from kiss_icp_tpu.io import cloud_io


def _points(n=100, seed=0):
    return np.random.default_rng(seed).uniform(-50, 50, (n, 3))


def test_kitti_bin_roundtrip(tmp_path):
    pts = _points().astype(np.float32)
    raw = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
    f = tmp_path / "000000.bin"
    raw.tofile(f)
    loaded, ts = cloud_io.read_kitti_bin(f)
    np.testing.assert_allclose(loaded, pts, atol=1e-6)
    assert ts is None


def test_ply_binary_roundtrip(tmp_path):
    pts = _points(seed=1).astype(np.float32)
    stamps = np.linspace(0, 1, len(pts)).astype(np.float32)
    f = tmp_path / "cloud.ply"
    with open(f, "wb") as fh:
        fh.write(
            b"ply\nformat binary_little_endian 1.0\n"
            + f"element vertex {len(pts)}\n".encode()
            + b"property float x\nproperty float y\nproperty float z\n"
            + b"property float time\nend_header\n"
        )
        rec = np.rec.fromarrays(
            [pts[:, 0], pts[:, 1], pts[:, 2], stamps], names="x,y,z,time"
        )
        fh.write(rec.tobytes())
    loaded, ts = cloud_io.read_ply(f)
    np.testing.assert_allclose(loaded, pts, atol=1e-6)
    np.testing.assert_allclose(ts, stamps, atol=1e-6)


def test_ply_ascii(tmp_path):
    pts = _points(10, seed=2)
    f = tmp_path / "cloud.ply"
    lines = ["ply", "format ascii 1.0", f"element vertex {len(pts)}",
             "property double x", "property double y", "property double z",
             "end_header"]
    lines += [" ".join(map(str, p)) for p in pts]
    f.write_text("\n".join(lines) + "\n")
    loaded, ts = cloud_io.read_ply(f)
    np.testing.assert_allclose(loaded, pts, atol=1e-9)
    assert ts is None


def test_pcd_binary_roundtrip(tmp_path):
    pts = _points(seed=3).astype(np.float32)
    ts_field = np.arange(len(pts), dtype=np.uint32)
    f = tmp_path / "cloud.pcd"
    header = (
        "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z t\nSIZE 4 4 4 4\nTYPE F F F U\n"
        f"COUNT 1 1 1 1\nWIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {len(pts)}\nDATA binary\n"
    )
    rec = np.rec.fromarrays(
        [pts[:, 0], pts[:, 1], pts[:, 2], ts_field], names="x,y,z,t",
        formats="<f4,<f4,<f4,<u4",
    )
    with open(f, "wb") as fh:
        fh.write(header.encode())
        fh.write(rec.tobytes())
    loaded, ts = cloud_io.read_pcd(f)
    np.testing.assert_allclose(loaded, pts, atol=1e-6)
    np.testing.assert_allclose(ts, ts_field)


def test_pcd_ascii(tmp_path):
    pts = _points(8, seed=4)
    f = tmp_path / "cloud.pcd"
    header = (
        "VERSION 0.7\nFIELDS x y z\nSIZE 8 8 8\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {len(pts)}\nHEIGHT 1\nPOINTS {len(pts)}\nDATA ascii\n"
    )
    body = "\n".join(" ".join(map(str, p)) for p in pts)
    f.write_text(header + body + "\n")
    loaded, _ = cloud_io.read_pcd(f)
    np.testing.assert_allclose(loaded, pts, atol=1e-9)


def test_nan_points_removed(tmp_path):
    pts = _points(10, seed=5)
    pts[3] = np.nan
    f = tmp_path / "cloud.xyz"
    np.savetxt(f, pts)
    loaded, _ = cloud_io.read_point_cloud(f)
    assert len(loaded) == 9
    assert np.all(np.isfinite(loaded))


def test_natural_sort():
    names = ["scan_10.bin", "scan_2.bin", "scan_1.bin"]
    assert cloud_io.natural_sort(names) == ["scan_1.bin", "scan_2.bin", "scan_10.bin"]
