"""Smoke test of tools/op_breakdown.py (VERDICT r4 next #2): the per-op
attribution tool must run end-to-end and emit a schema-complete,
arithmetically consistent breakdown. Timing VALUES are only meaningful on
the real TPU; here (CPU, tiny drive) only structure and arithmetic are
pinned."""

import json

import numpy as np
import pytest

from kiss_icp_tpu.tools import op_breakdown as ob
from tests.test_error_budget import _tiny_config


@pytest.fixture
def tiny_tool(monkeypatch):
    from kiss_icp_tpu.tools import error_budget as eb

    monkeypatch.setattr(eb, "_bench_config", _tiny_config)
    # op_breakdown imports _bench_config from error_budget at call time.
    return ob


def test_breakdown_schema_and_arithmetic(tiny_tool, capsys):
    res = tiny_tool.run_breakdown("soak", n_frames=8, rounds=2, chunk=4)

    for key in ("config", "device", "map_points", "mean_gn_iters_steady",
                "frame_fused_ms", "parts_us", "gn_total_us",
                "model_frame_ms", "model_vs_fused_pct", "shares_pct"):
        assert key in res, key
    parts = res["parts_us"]
    assert set(parts) == {"preprocess", "downsample_frame",
                          "downsample_source", "nn_query", "gn_iteration",
                          "insert", "trim"}
    assert all(v > 0 for v in parts.values())
    assert res["map_points"] > 0
    assert res["mean_gn_iters_steady"] > 0

    # Model arithmetic: parts + iters * gn == model (to rounding).
    model_us = (parts["preprocess"] + parts["downsample_frame"]
                + parts["downsample_source"] + res["gn_total_us"]
                + parts["insert"] + parts["trim"])
    assert abs(model_us - res["model_frame_ms"] * 1e3) < 2.0
    # Shares sum to ~100% of the model.
    assert abs(sum(res["shares_pct"].values()) - 100.0) < 1.0
    # The GN iteration contains the NN query.
    assert parts["gn_iteration"] >= 0.5 * parts["nn_query"]

    table = tiny_tool.render_table(res)
    assert "fused chunked frame" in table
    assert json.dumps(res)  # JSON-serializable


def test_breakdown_soak_overrides():
    assert ob._soak_overrides("soak") == {"engine.map_storage": "u16",
                                          "data.max_range": 70.0}
    assert ob._soak_overrides("headline") == {}
