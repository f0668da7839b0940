"""Cloud IO reader tests (round-trip via synthetic files)."""

import numpy as np
import pytest

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


def test_pcd_truncated_header_raises(tmp_path):
    """EOF before the DATA line must raise, not loop forever (round-3
    review finding)."""
    p = tmp_path / "bad.pcd"
    p.write_bytes(b"# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\n")
    with pytest.raises(ValueError, match="unterminated"):
        cloud_io.read_pcd(p)
    q = tmp_path / "not_a.pcd"
    q.write_bytes(b"\x00\x01\x02garbage")
    with pytest.raises(ValueError):
        cloud_io.read_pcd(q)


def test_ply_non_vertex_first_raises(tmp_path):
    """Vertex data is parsed from body offset 0; a preceding element would
    silently decode garbage — must fail loudly instead."""
    p = tmp_path / "edgefirst.ply"
    p.write_bytes(
        b"ply\nformat binary_little_endian 1.0\n"
        b"element edge 2\nproperty int v1\nproperty int v2\n"
        b"element vertex 1\nproperty float x\nproperty float y\n"
        b"property float z\nend_header\n" + b"\x00" * 28
    )
    with pytest.raises(ValueError, match="precedes"):
        cloud_io.read_ply(p)


def test_mesh_extensions_are_gated(tmp_path):
    """obj/off/stl/ctm are advertised in SUPPORTED_FILE_EXTENSIONS; without
    trimesh installed they must raise a clean gated ImportError from
    read_point_cloud, not an 'unsupported extension' crash mid-run."""
    p = tmp_path / "mesh.stl"
    p.write_bytes(b"solid x\nendsolid x\n")
    try:
        import trimesh  # noqa: F401
        has_trimesh = True
    except ImportError:
        has_trimesh = False
    if has_trimesh:
        pts, ts = cloud_io.read_point_cloud(p)
        assert pts.shape[1] == 3
    else:
        with pytest.raises(ImportError, match="trimesh"):
            cloud_io.read_point_cloud(p)


def test_save_state_exact_path(tmp_path):
    """save_state must write EXACTLY the requested path even without a
    .npz suffix (numpy's auto-append broke the save/load round trip)."""
    from kiss_icp_tpu.config.schema import KISSConfig
    from kiss_icp_tpu.io import checkpoint
    from kiss_icp_tpu import odometry

    cfg = KISSConfig()
    cfg.mapping.voxel_size = 1.0
    cfg.engine.max_points_per_frame = 256
    cfg.engine.frame_capacity = 256
    cfg.engine.source_capacity = 128
    cfg.engine.map_capacity_log2 = 10
    state = odometry.init_state(cfg)
    p = tmp_path / "run.state"
    checkpoint.save_state(p, state)
    assert p.exists() and not (tmp_path / "run.state.npz").exists()
    loaded = checkpoint.load_checkpoint(p, cfg)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
