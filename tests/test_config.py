"""Config schema validation + loud sampling knobs.

The reference accepts any YAML silently (utils/parse_config.py); the rebuild
warns on unknown keys and refuses knobs that a code path would silently
ignore (VERDICT r2: a silently-inert fine_budget already produced one bogus
measurement)."""

import glob
import os.path as osp

import pytest
import yaml

from moco_flow_tpu.train.factory import render_config
from moco_flow_tpu.utils.config import validate_config

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_unknown_model_key_warns():
    msgs = validate_config({"model": {"N_importence": 128}})
    assert any("N_importence" in m for m in msgs)


def test_unknown_nested_key_warns():
    msgs = validate_config(
        {"model": {"coarse_NeRF": {"D": 8, "Width": 256}}})
    assert any("model.coarse_NeRF.Width" in m for m in msgs)


def test_cache_key_warns_as_known_ignored():
    msgs = validate_config({"dataloader": {"cache": True}})
    assert any("cache" in m and "HBM" in m for m in msgs)


def test_shipped_configs_clean():
    """Every shipped YAML validates with no unknown-key warnings (the only
    message allowed is the informational cache note)."""
    for path in glob.glob(osp.join(REPO, "configs", "**", "*.yaml"),
                          recursive=True):
        with open(path) as f:
            cfg = yaml.safe_load(f)
        msgs = [m for m in validate_config(cfg) if "cache" not in m]
        assert msgs == [], (path, msgs)


def test_sampling_knobs_raise_off_fused_path():
    cfg = {"N_samples": 32, "N_importance": 32, "fine_budget": 16,
           "mlp_impl": "xla"}
    with pytest.raises(ValueError, match="fused"):
        render_config(cfg, test_time=True)
    with pytest.raises(ValueError, match="fused"):
        render_config({**cfg, "fine_budget": 0, "coarse_probe": 8},
                      test_time=True)


def test_sampling_knobs_zeroed_off_test_time():
    cfg = {"N_samples": 32, "N_importance": 32, "fine_budget": 16,
           "coarse_probe": 8, "mlp_impl": "xla"}
    rcfg = render_config(cfg, test_time=False)
    assert rcfg.fine_budget == 0 and rcfg.coarse_probe == 0


def test_sampling_knobs_live_on_fused_test_path():
    cfg = {"N_samples": 32, "N_importance": 32, "fine_budget": 16,
           "coarse_probe": 8, "mlp_impl": "fused"}
    rcfg = render_config(cfg, test_time=True)
    assert rcfg.fine_budget == 16 and rcfg.coarse_probe == 8
