"""Native C++ scan IO / prefetcher tests (vs numpy oracle decoding).

Skipped when the library has not been built (`make native`).
"""

import numpy as np
import pytest

from kiss_icp_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (run `make native`)"
)


def _write_kitti_bin(path, pts):
    arr = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
    arr.astype(np.float32).tofile(path)


def test_read_scan_kitti(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
    f = tmp_path / "scan.bin"
    _write_kitti_bin(f, pts)
    out = native.read_scan(f, native.FORMAT_F32X4)
    np.testing.assert_allclose(out, pts, atol=1e-6)


def test_read_scan_drops_nan(tmp_path):
    pts = np.array([[1, 2, 3], [np.nan, 0, 0], [4, 5, 6]], np.float32)
    f = tmp_path / "scan.bin"
    _write_kitti_bin(f, pts)
    out = native.read_scan(f, native.FORMAT_F32X4)
    assert out.shape == (2, 3)


def test_read_scan_boreas_stride(tmp_path):
    rng = np.random.default_rng(1)
    rec = rng.uniform(-10, 10, (64, 6)).astype(np.float32)
    f = tmp_path / "scan.bin"
    rec.tofile(f)
    out = native.read_scan(f, native.FORMAT_F32X6)
    np.testing.assert_allclose(out, rec[:, :3], atol=1e-6)


def test_read_scan_nclt(tmp_path):
    pts_true = np.array([[1.0, 2.0, -0.5], [10.0, -3.0, 1.0]])
    x = np.round((pts_true[:, 0] + 100.0) / 0.005).astype(np.int16)
    y = np.round((-pts_true[:, 1] + 100.0) / 0.005).astype(np.int16)
    z = np.round((-pts_true[:, 2] + 100.0) / 0.005).astype(np.int16)
    rec = np.stack([x, y, z, np.zeros_like(x)], axis=1).ravel()
    f = tmp_path / "scan.bin"
    rec.tofile(f)
    out = native.read_scan(f, native.FORMAT_NCLT)
    np.testing.assert_allclose(out, pts_true, atol=0.005)


def test_capacity_cap(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
    f = tmp_path / "scan.bin"
    _write_kitti_bin(f, pts)
    out = native.read_scan(f, native.FORMAT_F32X4, capacity=100)
    assert out.shape == (100, 3)


def test_prefetcher_order_and_content(tmp_path):
    rng = np.random.default_rng(3)
    files = []
    truths = []
    for i in range(12):
        pts = rng.uniform(-50, 50, (200 + i, 3)).astype(np.float32)
        f = tmp_path / f"{i:04d}.bin"
        _write_kitti_bin(f, pts)
        files.append(str(f))
        truths.append(pts)
    pre = native.ScanPrefetcher(files, native.FORMAT_F32X4, depth=3, threads=3)
    got = list(pre)
    assert len(got) == 12
    for g, t in zip(got, truths):
        np.testing.assert_allclose(g, t, atol=1e-6)
    pre.close()


def test_prefetcher_empty():
    pre = native.ScanPrefetcher([], native.FORMAT_F32X4)
    assert list(pre) == []
