"""Checkpoint/resume of the odometry state (io/checkpoint.py).

The reference has no persistence story (SURVEY.md section 5); these tests
pin ours: exact resume (bitwise-identical continuation), config-mismatch
rejection, and the KissICP convenience wrappers.
"""

import numpy as np
import pytest

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu.datasets.synthetic import SyntheticDataset
from kiss_icp_tpu.io import checkpoint
from kiss_icp_tpu.odometry import KissICP, init_state


def _cfg(**engine_overrides):
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 8192
    cfg.engine.frame_capacity = 8192
    cfg.engine.source_capacity = 2048
    cfg.engine.map_capacity_log2 = 16
    cfg.registration.max_num_iterations = 30
    for k, v in engine_overrides.items():
        setattr(cfg.engine, k, v)
    return cfg


def _scans(n):
    ds = SyntheticDataset(sequence=1, n_scans=n, n_beams=32, n_azimuth=256,
                          max_range=50.0)
    return [ds[i] for i in range(n)]


def test_roundtrip_resume_is_exact(tmp_path):
    scans = _scans(6)
    path = tmp_path / "state.npz"

    icp = KissICP(_cfg())
    for pts, ts in scans[:3]:
        icp.register_frame_lazy(pts, ts)
    icp.save_checkpoint(path)
    # Continue the original instance to the end.
    for pts, ts in scans[3:]:
        icp.register_frame_lazy(pts, ts)
    expected = icp.last_pose

    # Fresh instance resumes from the checkpoint and must reproduce the
    # continuation bit-for-bit (same XLA program, same state).
    icp2 = KissICP(_cfg())
    icp2.load_checkpoint(path)
    for pts, ts in scans[3:]:
        icp2.register_frame_lazy(pts, ts)
    np.testing.assert_array_equal(icp2.last_pose, expected)


def test_mismatched_capacity_rejected(tmp_path):
    path = tmp_path / "state.npz"
    icp = KissICP(_cfg())
    pts, ts = _scans(1)[0]
    icp.register_frame_lazy(pts, ts)
    icp.save_checkpoint(path)

    with pytest.raises(ValueError, match="map_capacity_log2"):
        KissICP(_cfg(map_capacity_log2=17)).load_checkpoint(path)
    with pytest.raises(ValueError, match="map_storage"):
        KissICP(_cfg(map_storage="u16")).load_checkpoint(path)


def test_save_state_without_metadata_shape_checked(tmp_path):
    cfg = _cfg()
    path = tmp_path / "bare.npz"
    checkpoint.save_state(path, init_state(cfg))
    restored = checkpoint.load_checkpoint(path, cfg)
    tmpl = init_state(cfg)
    assert np.asarray(restored.map.counts).shape == tmpl.map.counts.shape

    # Same save loaded under a bigger map capacity: caught by shape check
    # even without the metadata record.
    with pytest.raises(ValueError, match="shape/dtype"):
        checkpoint.load_checkpoint(path, _cfg(map_capacity_log2=17))


def test_checkpoint_preserves_threshold_and_motion(tmp_path):
    scans = _scans(4)
    icp = KissICP(_cfg())
    for pts, ts in scans:
        icp.register_frame_lazy(pts, ts)
    path = tmp_path / "state.npz"
    icp.save_checkpoint(path)

    icp2 = KissICP(_cfg())
    icp2.load_checkpoint(path)
    np.testing.assert_array_equal(icp2.last_pose, icp.last_pose)
    np.testing.assert_array_equal(icp2.last_delta, icp.last_delta)
    np.testing.assert_array_equal(
        np.asarray(icp2.state.threshold.model_sse),
        np.asarray(icp.state.threshold.model_sse),
    )
    np.testing.assert_array_equal(
        np.asarray(icp2.state.map.total_points),
        np.asarray(icp.state.map.total_points),
    )


def test_pipeline_resume_matches_full_run(tmp_path):
    """Pipeline-level resume: save at frame 3, resume with --jump 3; the
    resumed tail reproduces the full run's poses bit-for-bit."""
    from kiss_icp_tpu.pipeline import OdometryPipeline
    from kiss_icp_tpu.datasets.synthetic import SyntheticDataset

    def cfg():
        c = _cfg()
        c.out_dir = str(tmp_path / "results")
        return c

    ds = SyntheticDataset(sequence=1, n_scans=6, n_beams=32, n_azimuth=256,
                          max_range=50.0)
    full = OdometryPipeline(ds, config=cfg())
    full.run()

    head = OdometryPipeline(ds, config=cfg(), n_scans=3, save_checkpoint=True)
    head.run()
    ckpt = head.results_dir / "checkpoint.npz"
    assert ckpt.exists()

    tail = OdometryPipeline(ds, config=cfg(), jump=3, resume_from=ckpt)
    tail.run()
    np.testing.assert_array_equal(tail.poses, full.poses[3:])


def test_pipeline_periodic_checkpoint(tmp_path):
    """--checkpoint-every writes a loadable mid-run checkpoint; resuming from
    it with --jump reproduces the full run's tail bit-for-bit."""
    from kiss_icp_tpu.pipeline import OdometryPipeline
    from kiss_icp_tpu.datasets.synthetic import SyntheticDataset

    def cfg():
        c = _cfg()
        c.out_dir = str(tmp_path / "results")
        return c

    ds = SyntheticDataset(sequence=1, n_scans=5, n_beams=32, n_azimuth=256,
                          max_range=50.0)
    full = OdometryPipeline(ds, config=cfg())
    full.run()

    # Stop after 4 frames, checkpointing every 2: checkpoint.npz holds the
    # state after frame 4 (the last threshold crossed).
    head = OdometryPipeline(ds, config=cfg(), n_scans=4, checkpoint_every=2)
    head.run()
    ckpt = head.results_dir / "checkpoint.npz"
    assert ckpt.exists()
    leftovers = list(head.results_dir.glob("*.tmp*"))
    assert not leftovers, f"non-atomic checkpoint left {leftovers}"

    tail = OdometryPipeline(ds, config=cfg(), jump=4, resume_from=ckpt)
    tail.run()
    np.testing.assert_array_equal(tail.poses, full.poses[4:])


def test_pipeline_periodic_checkpoint_chunked(tmp_path):
    """Chunked mode checkpoints at the first chunk boundary past each
    multiple of N."""
    from kiss_icp_tpu.pipeline import OdometryPipeline
    from kiss_icp_tpu.datasets.synthetic import SyntheticDataset

    c = _cfg()
    c.out_dir = str(tmp_path / "results")
    c.engine.pipeline_chunk = 3
    ds = SyntheticDataset(sequence=1, n_scans=6, n_beams=16, n_azimuth=128,
                          max_range=50.0)
    pipe = OdometryPipeline(ds, config=c, checkpoint_every=4)
    pipe.run()
    assert (pipe.results_dir / "checkpoint.npz").exists()


def test_checkpoint_without_map_shards_key_loads(tmp_path):
    """Back-compat: checkpoints written before the map_shards metadata key
    existed must load into a default (single-device) engine — a new metadata
    key defaults to the writer's implicit schema value instead of
    invalidating every old checkpoint (round-3 review finding)."""
    import json

    cfg = _cfg()
    icp = KissICP(cfg)
    pts, ts = _scans(1)[0]
    icp.register_frame_lazy(pts, ts)
    p = tmp_path / "old.npz"
    icp.save_checkpoint(p)

    # Rewrite the metadata record as an old writer would have produced it.
    with np.load(p) as d:
        arrays = {k: d[k] for k in d.files}
    meta = json.loads(bytes(arrays["metadata_json"]).decode())
    del meta["map_shards"]
    arrays["metadata_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(p, **arrays)

    fresh = KissICP(cfg)
    fresh.load_checkpoint(p)
    np.testing.assert_array_equal(fresh.last_pose, icp.last_pose)


def test_pre_round5_checkpoint_leaf_migration(tmp_path):
    """Round 5 added the num_oob_points leaf to VoxelMap. A checkpoint
    written BEFORE that (one fewer leaf — simulated by stripping the leaf
    from a fresh file) must still load, with the counter synthesized as
    zeros and every other leaf intact (code-review r5: the compat claim
    was previously untested against a genuinely old file)."""
    import jax
    import numpy as np

    from kiss_icp_tpu.io import checkpoint
    from kiss_icp_tpu.odometry import KissICP, init_state

    cfg = _cfg()
    icp = KissICP(cfg)
    for f, t in _scans(3):
        icp.register_frame(f, t)
    path = tmp_path / "new.npz"
    icp.save_checkpoint(path)

    # Rewrite as an OLD-format file: drop the num_oob_points leaf and
    # renumber the rest.
    flat_paths = jax.tree_util.tree_flatten_with_path(init_state(cfg))[0]
    oob_idx = [i for i, (p, _) in enumerate(flat_paths)
               if "num_oob_points" in str(p[-1])]
    assert len(oob_idx) == 1
    with np.load(path) as d:
        arrays = {k: d[k] for k in d.files}
    n = sum(1 for k in arrays if k.startswith("leaf_"))
    old = {k: v for k, v in arrays.items() if not k.startswith("leaf_")}
    j = 0
    for i in range(n):
        if i == oob_idx[0]:
            continue
        old[f"leaf_{j}"] = arrays[f"leaf_{i}"]
        j += 1
    old_path = tmp_path / "old.npz"
    np.savez(old_path, **old)

    state = checkpoint.load_checkpoint(old_path, cfg)
    assert int(np.asarray(state.map.num_oob_points)) == 0
    np.testing.assert_array_equal(np.asarray(state.pose),
                                  np.asarray(icp.state.pose))
    np.testing.assert_array_equal(np.asarray(state.map.counts),
                                  np.asarray(icp.state.map.counts))
