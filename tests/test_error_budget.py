"""Direct tests of tools/error_budget.py (VERDICT r4 next #8).

The error-budget tool drives soak-configuration decisions (the round-4
u16+70 m pick that set the headline accuracy), so its config-override
plumbing, cell arithmetic, and emitted schema are pinned here on a tiny
CPU drive instead of being exercised only by grep in notebook assertions.
"""

import json

import numpy as np
import pytest

from kiss_icp_tpu.config.parser import load_config
from kiss_icp_tpu.datasets.synthetic import SyntheticDataset
from kiss_icp_tpu.tools import error_budget as eb

N_TINY = 10
CHUNK_TINY = 5
CAP = 4096


def _tiny_config(subsalt: int = 0, **overrides):
    """Small-capacity stand-in for eb._bench_config with identical override
    semantics (dotted keys, perturb-after-override)."""
    cfg = load_config(None)
    cfg.data.max_range = 30.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 1.0
    cfg.engine.max_points_per_frame = CAP
    cfg.engine.frame_capacity = 2048
    cfg.engine.source_capacity = 512
    cfg.engine.map_capacity_log2 = 14
    cfg.engine.use_pallas = False
    for key, val in overrides.items():
        section, name = key.split(".")
        setattr(getattr(cfg, section), name, val)
    cfg.registration.convergence_criterion *= 1.0 + subsalt * 1e-9
    return cfg


@pytest.fixture(scope="module")
def tiny_scans():
    """(gt, pts, ts, valid) of a short distorted drive, padded like
    eb._world_scans output."""
    ds = SyntheticDataset(
        sequence=0, n_scans=N_TINY, n_beams=16, n_azimuth=256,
        max_range=30.0, speed=0.6, accel_frames=4, distort=True,
    )
    pts = np.zeros((N_TINY, CAP, 3), np.float32)
    ts = np.zeros((N_TINY, CAP), np.float32)
    valid = np.zeros((N_TINY, CAP), bool)
    for i in range(N_TINY):
        p, t = ds[i]
        n = min(len(p), CAP)
        pts[i, :n] = p[:n]
        if len(t):
            ts[i, :n] = t[:n]
        valid[i, :n] = True
    gt = np.asarray(ds.gt_poses[:N_TINY], np.float64)
    return gt, pts, ts, valid


@pytest.fixture
def tiny_tool(monkeypatch):
    """error_budget rewired to the tiny drive scale: no slow-draw re-rolls
    (every CPU draw is 'slow'), tiny chunking, tiny configs."""
    monkeypatch.setattr(eb, "N_FRAMES", N_TINY)
    monkeypatch.setattr(eb, "CHUNK", CHUNK_TINY)
    monkeypatch.setattr(eb, "SLOW_DRAW_FPS", 1e-6)
    monkeypatch.setattr(eb, "_bench_config", _tiny_config)
    return eb


# ---------------------------------------------------------------------------
# Config-override plumbing (_bench_config)
# ---------------------------------------------------------------------------

def test_bench_config_applies_dotted_overrides():
    cfg = eb._bench_config(**{
        "data.deskew": False,
        "data.max_range": 70.0,
        "engine.map_storage": "u16",
        "mapping.max_points_per_voxel": 40,
    })
    assert cfg.data.deskew is False
    assert cfg.data.max_range == 70.0
    assert cfg.engine.map_storage == "u16"
    assert cfg.mapping.max_points_per_voxel == 40


def test_bench_config_salts_after_overrides():
    """The subsalt perturbation must land ON TOP of a pinned convergence
    criterion (code-review r4b: perturb-before-override made every re-roll
    of the conv cells an identical executable)."""
    c0 = eb._bench_config(subsalt=0, **{
        "registration.convergence_criterion": 3e-5})
    c1 = eb._bench_config(subsalt=1, **{
        "registration.convergence_criterion": 3e-5})
    assert c0.registration.convergence_criterion == 3e-5
    assert c1.registration.convergence_criterion != 3e-5
    assert abs(c1.registration.convergence_criterion / 3e-5 - 1.0) < 1e-8


def test_every_cell_override_is_applicable():
    """Each CELLS row must (a) apply cleanly to the real bench config and
    set exactly the fields it names, (b) use only world knobs the synthetic
    dataset accepts — a typo in either silently measures the wrong thing."""
    import inspect

    ds_params = set(
        inspect.signature(SyntheticDataset.__init__).parameters)
    for name, world_kw, overrides in eb.CELLS:
        cfg = eb._bench_config(**overrides)
        for key, val in overrides.items():
            section, field = key.split(".")
            assert getattr(getattr(cfg, section), field) == val, (name, key)
        for k in world_kw:
            assert k in ds_params, (name, k)


# ---------------------------------------------------------------------------
# Cell execution arithmetic + schema (run_cell)
# ---------------------------------------------------------------------------

SCHEMA_KEYS = {
    "name", "kitti_seg_pct", "kitti_seg_deg_per_m", "n_segments",
    "ate_trans_m", "ate_rot_rad", "iters_p50", "iters_p95", "drops",
    "finite", "wall_s",
}


def test_run_cell_schema_and_values(tiny_tool, tiny_scans):
    res = tiny_tool.run_cell("shipped", tiny_scans, {})
    assert set(res) == SCHEMA_KEYS
    assert res["name"] == "shipped"
    assert res["finite"] is True
    assert res["drops"] == 0
    assert res["iters_p50"] <= res["iters_p95"]
    assert res["ate_trans_m"] >= 0.0
    # The tiny ~6 m drive yields no valid 100 m KITTI segments; the schema
    # must still carry the segment fields with the explicit zero count.
    assert res["n_segments"] == 0
    assert np.isfinite(res["ate_rot_rad"])


def test_run_cell_matches_direct_metrics(tiny_tool, tiny_scans):
    """The cell's accuracy numbers must equal the metrics module applied to
    the same trajectory — i.e. the attribution arithmetic is the pipeline's,
    not a reimplementation. Verified by re-running the identical
    deterministic drive directly."""
    import jax

    from kiss_icp_tpu import metrics
    from kiss_icp_tpu.odometry import init_state, make_chunked_step

    res = tiny_tool.run_cell("shipped", tiny_scans, {})

    gt, pts, ts, valid = tiny_scans
    cfg = _tiny_config()
    chunk = make_chunked_step(cfg)
    state = init_state(cfg)
    est = []
    for c in range(N_TINY // CHUNK_TINY):
        sl = slice(c * CHUNK_TINY, (c + 1) * CHUNK_TINY)
        state, summary = chunk(state, pts[sl], ts[sl], valid[sl])
        est.append(np.asarray(summary.poses))
    est = np.concatenate(est, axis=0)
    jax.block_until_ready(state.pose)
    ate_rot, ate_trans = metrics.absolute_trajectory_error(gt, est)
    assert res["ate_trans_m"] == round(float(ate_trans), 4)
    assert res["ate_rot_rad"] == round(float(ate_rot), 5)


def test_run_cell_ablation_changes_result(tiny_tool, tiny_scans):
    """deskew_off on a distorted drive must produce a DIFFERENT trajectory
    than shipped (the attribution table is meaningless if overrides don't
    reach the pipeline)."""
    base = tiny_tool.run_cell("shipped", tiny_scans, {})
    off = tiny_tool.run_cell("deskew_off", tiny_scans, {"data.deskew": False})
    assert off["ate_trans_m"] != base["ate_trans_m"]


def test_run_cell_deterministic(tiny_tool, tiny_scans):
    a = tiny_tool.run_cell("shipped", tiny_scans, {})
    b = tiny_tool.run_cell("shipped", tiny_scans, {})
    for k in SCHEMA_KEYS - {"wall_s"}:
        assert a[k] == b[k], k


# ---------------------------------------------------------------------------
# Table + JSON emitters (main)
# ---------------------------------------------------------------------------

def test_main_table_and_json(tiny_tool, tiny_scans, tmp_path, capsys,
                             monkeypatch):
    monkeypatch.setattr(eb, "_world_scans", lambda cap, **kw: tiny_scans)
    json_out = tmp_path / "cells.jsonl"
    md_out = tmp_path / "table.md"
    rc = tiny_tool.main([
        "--cells", "shipped,u16",
        "--json-out", str(json_out),
        "--out", str(md_out),
    ])
    assert rc == 0

    rows = [json.loads(line) for line in json_out.read_text().splitlines()]
    assert [r["name"] for r in rows] == ["shipped", "u16"]
    for r in rows:
        assert set(r) == SCHEMA_KEYS

    table = capsys.readouterr().out
    assert md_out.read_text().strip() in table.strip()
    for r in rows:
        # Every table row must carry the JSON cell's own numbers (the
        # markdown emitter's formatting arithmetic).
        line = next(ln for ln in table.splitlines()
                    if ln.startswith(f"| {r['name']} "))
        assert f"{r['kitti_seg_pct']:.3f}" in line
        assert f"{r['ate_trans_m']:.3f}" in line
        assert f"{r['iters_p50']:.0f}/{r['iters_p95']:.0f}" in line
