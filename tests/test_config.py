"""Live config system: load, override, drift-corrected defaults."""

import dataclasses

import pytest

from openglottal_tpu.config import Config, load_config, save_default_yaml


def test_defaults_are_code_effective_values():
    cfg = Config()
    # reference yaml drift corrected (SURVEY.md §2.3): these are the values
    # the reference CODE actually uses (features.py:14-32)
    assert cfg.vft.init_frames == 2
    assert cfg.guided_vft.init_frames == 2
    assert cfg.guided_vft.glottal_percentile == 30.0
    assert cfg.detector.conf == 0.25
    assert cfg.unet.features == (32, 64, 128, 256)


def test_yaml_roundtrip(tmp_path):
    path = tmp_path / "cfg.yaml"
    save_default_yaml(path)
    cfg = load_config(path)
    assert cfg == Config()


def test_overrides(tmp_path):
    cfg = load_config(None, overrides={"detector.conf": 0.1,
                                       "training.unet.epochs": 5})
    assert cfg.detector.conf == 0.1
    assert cfg.training.unet.epochs == 5


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        load_config(None, overrides={"detector.bogus": 1})


def test_param_factories():
    cfg = Config()
    assert cfg.gate_params().max_hold_frames == 3
    assert cfg.vft_params().alpha == 0.98
    assert cfg.ygvft_params().glottal_percentile == 30.0


def test_partial_yaml(tmp_path):
    path = tmp_path / "p.yaml"
    path.write_text("detector:\n  conf: 0.02\nvft:\n  alpha: 0.9\n")
    cfg = load_config(path)
    assert cfg.detector.conf == 0.02
    assert cfg.vft.alpha == 0.9
    assert cfg.vft.beta == 0.7  # untouched default
