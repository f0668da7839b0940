"""Config schema + loader tests (reference parser.py:41-90 semantics)."""

import numpy as np
import pytest
import yaml

from kiss_icp_tpu.config.parser import load_config, write_config
from kiss_icp_tpu.config.schema import KISSConfig, config_from_dict, config_to_dict


def test_defaults_match_reference():
    cfg = load_config(None)
    # Reference defaults (KissICP.hpp:36-54, config/config.py:28-48).
    assert cfg.data.max_range == 100.0
    assert cfg.data.min_range == 0.0
    assert cfg.data.deskew is True
    assert cfg.mapping.voxel_size == 1.0  # derived: max_range / 100
    assert cfg.mapping.max_points_per_voxel == 20
    assert cfg.adaptive_threshold.fixed_threshold is None
    assert cfg.adaptive_threshold.initial_threshold == 2.0
    assert cfg.adaptive_threshold.min_motion_th == 0.1
    assert cfg.registration.max_num_iterations == 500
    assert cfg.registration.convergence_criterion == 1e-4


def test_derived_voxel_size_follows_max_range():
    cfg = load_config(None, max_range=50.0)
    assert cfg.mapping.voxel_size == 0.5


def test_yaml_override(tmp_path):
    f = tmp_path / "cfg.yml"
    f.write_text(yaml.safe_dump({
        "data": {"max_range": 60.0, "min_range": 2.0},
        "mapping": {"voxel_size": 0.4},
        "adaptive_threshold": {"fixed_threshold": 0.3},
    }))
    cfg = load_config(f)
    assert cfg.data.max_range == 60.0
    assert cfg.data.min_range == 2.0
    assert cfg.mapping.voxel_size == 0.4  # explicit wins over derived
    assert cfg.adaptive_threshold.fixed_threshold == 0.3


def test_yaml_inverted_ranges_clamped(tmp_path):
    f = tmp_path / "cfg.yml"
    f.write_text(yaml.safe_dump({"data": {"max_range": 10.0, "min_range": 50.0}}))
    cfg = load_config(f)
    assert cfg.data.min_range == 0.0


def test_env_override_with_json(tmp_path, monkeypatch):
    """Env vars with the kiss_icp_tpu_ prefix hold JSON (reference parser.py:42)."""
    monkeypatch.setenv("kiss_icp_tpu_data", '{"max_range": 75.0}')
    cfg = load_config(None)
    assert cfg.data.max_range == 75.0
    assert cfg.mapping.voxel_size == 0.75  # derived from env-set range


def test_yaml_wins_over_env(tmp_path, monkeypatch):
    monkeypatch.setenv("kiss_icp_tpu_data", '{"max_range": 75.0}')
    f = tmp_path / "cfg.yml"
    f.write_text(yaml.safe_dump({"data": {"max_range": 42.0}}))
    cfg = load_config(f)
    assert cfg.data.max_range == 42.0


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="Unknown config key"):
        config_from_dict({"data": {"max_rangee": 1.0}})


def test_write_config_roundtrip(tmp_path):
    cfg = load_config(None, max_range=80.0)
    out = tmp_path / "dump.yml"
    write_config(cfg, out)
    cfg2 = load_config(out)
    assert config_to_dict(cfg2) == config_to_dict(cfg)


def test_unknown_env_var_is_ignored_with_warning(monkeypatch):
    """A stray kiss_icp_tpu_* env var (e.g. a shell exporting the console
    script name) must not crash every load_config() call (round-3 review
    finding); the reference's pydantic-settings ignores undeclared keys."""
    import warnings

    from kiss_icp_tpu.config.parser import load_config

    monkeypatch.setenv("kiss_icp_tpu_pipeline", "/usr/bin/thing")
    monkeypatch.setenv("kiss_icp_tpu_data", '{"max_range": 42.0}')
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_config(None)
    assert cfg.data.max_range == 42.0  # the valid one applied
    assert any("kiss_icp_tpu_pipeline" in str(x.message) for x in w)


def test_config_type_coercion_and_section_guard(tmp_path):
    """YAML string numbers coerce to the schema's types; a scalar where a
    section is expected and read-only properties fail with clear messages
    (round-3 review finding: '100' max_range crashed far away in jit,
    engine.map_capacity died with \"can't set attribute\")."""
    import pytest as _pytest

    from kiss_icp_tpu.config.parser import load_config
    from kiss_icp_tpu.config.schema import config_from_dict

    y = tmp_path / "c.yaml"
    y.write_text('data:\n  max_range: "75"\n  deskew: "false"\n')
    cfg = load_config(y)
    assert cfg.data.max_range == 75.0 and isinstance(cfg.data.max_range, float)
    assert cfg.data.deskew is False

    with _pytest.raises(ValueError, match="must be a mapping"):
        config_from_dict({"data": 75})
    with _pytest.raises(ValueError, match="Unknown config key"):
        config_from_dict({"engine": {"map_capacity": 1024}})
    with _pytest.raises(ValueError, match="expects"):
        config_from_dict({"data": {"max_range": "not-a-number"}})
