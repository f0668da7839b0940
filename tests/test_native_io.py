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


def test_prefetcher_surfaces_unreadable_file(tmp_path):
    """A failed/missing file mid-sequence raises IOError naming the path
    instead of silently yielding an empty scan (round-3 review finding —
    an empty frame would register against the map with no error)."""
    good = tmp_path / "a.bin"
    _write_kitti_bin(good, np.random.rand(50, 3).astype(np.float32))
    missing = tmp_path / "missing.bin"  # never created
    good2 = tmp_path / "c.bin"
    _write_kitti_bin(good2, np.random.rand(30, 3).astype(np.float32))

    pre = native.ScanPrefetcher([str(good), str(missing), str(good2)],
                                native.FORMAT_F32X4, capacity=1024)
    assert next(pre).shape == (50, 3)
    with pytest.raises(IOError, match="missing.bin"):
        next(pre)
    assert next(pre).shape == (30, 3)  # sequence continues past the bad file
    pre.close()


def test_prefetcher_close_exhausts_iterator(tmp_path):
    """Iterating after close() must StopIteration, not restart the sequence
    through the numpy fallback (round-3 review finding)."""
    f = tmp_path / "a.bin"
    _write_kitti_bin(f, np.random.rand(20, 3).astype(np.float32))
    pre = native.ScanPrefetcher([str(f), str(f)], native.FORMAT_F32X4,
                                capacity=256)
    next(pre)
    pre.close()
    with pytest.raises(StopIteration):
        next(pre)


def test_truncated_file_native_numpy_parity(tmp_path):
    """A truncated .bin (partial trailing record) decodes to the same floored
    point set via the native decoder and the numpy fallback (the fallback
    used to raise on reshape; round-3 review finding)."""
    pts = np.random.rand(40, 3).astype(np.float32)
    f = tmp_path / "t.bin"
    _write_kitti_bin(f, pts)
    raw = f.read_bytes()
    f.write_bytes(raw[:-7])  # chop mid-record

    nat = native.read_scan(str(f), native.FORMAT_F32X4, capacity=1024)
    fall = native._numpy_decode(str(f), native.FORMAT_F32X4, 1024)
    assert nat.shape == fall.shape == (39, 3)
    np.testing.assert_array_equal(nat, fall)


def test_destroy_while_blocked_does_not_hang(tmp_path):
    """close() with workers parked on a full ring must not deadlock on the
    lost-wakeup race (stop now flips under the mutex)."""
    files = []
    for i in range(32):
        f = tmp_path / f"{i}.bin"
        _write_kitti_bin(f, np.random.rand(10, 3).astype(np.float32))
        files.append(str(f))
    for _ in range(50):  # hammer create/park/destroy
        pre = native.ScanPrefetcher(files, native.FORMAT_F32X4,
                                    capacity=256, depth=2, threads=4)
        next(pre)  # ensure the pipeline is flowing before teardown
        pre.close()
