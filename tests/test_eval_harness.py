"""Eval harness tests (run_sequence aggregation, markdown table, CLI)."""

import numpy as np

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu.datasets.synthetic import SyntheticDataset
from kiss_icp_tpu.tools.eval import print_metrics_table, run_sequence


def _cfg(tmp_path):
    cfg = KISSConfig()
    cfg.out_dir = str(tmp_path / "results")
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 4096
    cfg.engine.frame_capacity = 4096
    cfg.engine.source_capacity = 1024
    cfg.engine.map_capacity_log2 = 14
    cfg.registration.max_num_iterations = 15
    return cfg


def test_run_sequence_and_table(tmp_path):
    results = {}
    for seq in (0, 1):
        run_sequence(
            results,
            lambda s: SyntheticDataset(sequence=s, n_scans=4, n_beams=16,
                                       n_azimuth=128, max_range=50.0),
            seq,
            config=_cfg(tmp_path),
        )
    assert set(results) == {"0", "1"}
    for r in results.values():
        assert r["poses"].shape == (4, 4, 4)
        assert "Average Frequency [Hz]" in r["metrics"]

    table = print_metrics_table(results)
    assert table.startswith("| Sequence |")
    assert "| **avg** |" in table
    assert "| 0 |" in table and "| 1 |" in table


def test_empty_results_table():
    assert print_metrics_table({}) == "(no results)"


def test_dump_config(tmp_path, monkeypatch):
    from kiss_icp_tpu.tools.cmd import dump_config

    monkeypatch.chdir(tmp_path)
    assert dump_config() == 0
    import yaml

    cfg = yaml.safe_load((tmp_path / "kiss_icp_tpu.yml").read_text())
    assert cfg["data"]["max_range"] == 100.0
    assert cfg["mapping"]["voxel_size"] == 1.0  # derived default


def test_eval_notebooks_valid_and_syntactic():
    """The eval notebooks (the four reference eval/*.ipynb analogs plus the
    TPU-specific error-budget/capacity notebook) are valid nbformat-4
    documents whose code cells compile."""
    import json
    from pathlib import Path

    nb_dir = Path(__file__).resolve().parent.parent / "eval"
    names = ["kitti", "kitti_raw", "mulran", "newer_college",
             "accuracy_error_budget"]
    for name in names:
        with open(nb_dir / f"{name}.ipynb") as f:
            nb = json.load(f)
        assert nb["nbformat"] == 4
        code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
        assert code_cells, name
        for i, cell in enumerate(code_cells):
            src = "".join(cell["source"])
            compile(src, f"{name}.ipynb cell {i}", "exec")
            assert not cell["outputs"], "notebooks are stored without outputs"
