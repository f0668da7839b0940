"""AOT export/deserialize of the odometry step (io/aot.py): the frozen
StableHLO artifact round-trips through disk and reproduces the live jitted
pipeline bit-for-bit, composes with checkpoints, and rejects mismatched
format versions."""

import numpy as np
import pytest

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry
from kiss_icp_tpu.io import aot


def _config():
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 1024
    cfg.engine.frame_capacity = 1024
    cfg.engine.source_capacity = 256
    cfg.engine.map_capacity_log2 = 13
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 10
    return cfg


def _scans(k=4, n=1024, seed=2):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    return [base + np.array([0.3, 0.04, 0], np.float32) * i for i in range(k)]


def _pad(cfg, f):
    n = cfg.engine.max_points_per_frame
    pts = np.zeros((n, 3), np.float32)
    pts[: len(f)] = f
    valid = np.zeros((n,), bool)
    valid[: len(f)] = True
    return pts, np.zeros((n,), np.float32), valid


def test_aot_roundtrip_matches_live_step(tmp_path):
    cfg = _config()
    art = tmp_path / "step.kiss_aot.npz"
    aot.save_step(art, cfg)
    step, meta = aot.load_step(art)
    assert meta["max_points_per_frame"] == cfg.engine.max_points_per_frame

    live = odometry.KissICP(cfg)
    state = odometry.init_state(cfg)
    for f in _scans():
        pts, ts, valid = _pad(cfg, f)
        state, res = step(state, pts, ts, valid)
        live.register_frame_lazy(f)
        np.testing.assert_array_equal(np.asarray(res.pose), live.last_pose)


def test_aot_composes_with_checkpoint(tmp_path):
    """Serving warm-start: frozen program + checkpointed state resume."""
    cfg = _config()
    scans = _scans(k=5, seed=9)
    live = odometry.KissICP(cfg)
    for f in scans[:3]:
        live.register_frame_lazy(f)
    live.save_checkpoint(tmp_path / "state.npz")

    aot.save_step(tmp_path / "step.npz", cfg)
    step, _ = aot.load_step(tmp_path / "step.npz")
    from kiss_icp_tpu.io import checkpoint

    state = checkpoint.load_checkpoint(tmp_path / "state.npz", cfg)
    for f in scans[3:]:
        pts, ts, valid = _pad(cfg, f)
        state, res = step(state, pts, ts, valid)
        live.register_frame_lazy(f)
        np.testing.assert_array_equal(np.asarray(res.pose), live.last_pose)


def test_aot_version_check(tmp_path):
    cfg = _config()
    art = tmp_path / "step.npz"
    aot.save_step(art, cfg)
    import json

    import numpy as _np

    with _np.load(art) as d:
        blob, meta = d["exported"], json.loads(bytes(d["metadata_json"]))
    meta["aot_format_version"] = 999
    _np.savez(art, exported=blob,
              metadata_json=_np.frombuffer(json.dumps(meta).encode(),
                                           dtype=_np.uint8))
    with pytest.raises(ValueError, match="format"):
        aot.load_step(art)


def test_aot_chunked_roundtrip_matches_live_chunked(tmp_path):
    """The K-frame chunked export (the production execution shape,
    VERDICT r4 next #6) reproduces the live chunked step bit-for-bit
    through disk."""
    cfg = _config()
    k = 4
    art = tmp_path / "chunked.kiss_aot.npz"
    aot.save_step(art, cfg, chunk=k)
    step, meta = aot.load_step(art)
    assert meta["aot_chunk"] == k

    frames = _scans(k)
    n = cfg.engine.max_points_per_frame
    pts = np.zeros((k, n, 3), np.float32)
    ts = np.zeros((k, n), np.float32)
    valid = np.zeros((k, n), bool)
    for i, f in enumerate(frames):
        pts[i], ts[i], valid[i] = _pad(cfg, f)

    state, summary = step(odometry.init_state(cfg), pts, ts, valid)
    live = odometry.make_chunked_step(cfg)
    lstate, lsummary = live(odometry.init_state(cfg), pts, ts, valid)
    np.testing.assert_array_equal(np.asarray(summary.poses),
                                  np.asarray(lsummary.poses))
    np.testing.assert_array_equal(np.asarray(state.pose),
                                  np.asarray(lstate.pose))
    np.testing.assert_array_equal(np.asarray(state.map.points),
                                  np.asarray(lstate.map.points))
