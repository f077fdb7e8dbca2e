"""Live typed configuration.

The reference ships ``configs/default.yaml`` but never loads it, and its
values drift from the code (vft init_frames 10 vs effective 2, guided
percentile 5 vs effective 30 — SURVEY.md §2.3).  Here the config IS the
source of truth: a dataclass tree with the code's *effective* defaults
(detector.py:23-30, tracker.py:37-52,140-152, features.py:14-32), loadable
from YAML/JSON with dotted-path overrides, consumed by the CLI and trainers.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Tuple


@dataclass
class DetectorConfig:
    conf: float = 0.25
    max_shift_px: float = 30.0
    padding: int = 8
    max_hold_frames: int = 3


@dataclass
class VFTConfig:
    alpha: float = 0.98
    beta: float = 0.7
    roi_threshold_ratio: float = 0.07
    gaussian_ksize: int = 13
    glottal_percentile: float = 5.0
    max_glottal_components: int = 2
    init_frames: int = 2  # effective value (features.py:31); yaml said 10


@dataclass
class GuidedVFTConfig:
    alpha: float = 0.98
    beta: float = 0.7
    glottal_percentile: float = 30.0  # effective value (features.py:26); yaml said 5
    gaussian_ksize: int = 13
    max_glottal_components: int = 2
    init_frames: int = 2  # effective value (features.py:32); yaml said 3


@dataclass
class UNetConfig:
    features: Tuple[int, ...] = (32, 64, 128, 256)
    threshold: float = 0.5


@dataclass
class YoloTrainConfig:
    epochs: int = 100  # train_yolo.py default; the paper used 2 (main.tex:319)
    imgsz: int = 256
    batch: int = 16
    lr: float = 1e-3


@dataclass
class UNetTrainConfig:
    epochs: int = 50
    batch: int = 16
    lr: float = 1e-3
    weight_decay: float = 0.01
    patience: int | None = None


@dataclass
class TrainingConfig:
    yolo: YoloTrainConfig = field(default_factory=YoloTrainConfig)
    unet: UNetTrainConfig = field(default_factory=UNetTrainConfig)


@dataclass
class DatasetConfig:
    img_size: int = 256
    dilate: int = 10


@dataclass
class MeshConfig:
    data: int = 0   # 0 = all available devices
    model: int = 1


@dataclass
class Config:
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    vft: VFTConfig = field(default_factory=VFTConfig)
    guided_vft: GuidedVFTConfig = field(default_factory=GuidedVFTConfig)
    unet: UNetConfig = field(default_factory=UNetConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # ── factory helpers consumed across the framework ─────────────────────

    def gate_params(self):
        from openglottal_tpu.models.gate import GateParams

        d = self.detector
        return GateParams(d.max_shift_px, d.padding, d.max_hold_frames)

    def vft_params(self):
        from openglottal_tpu.models.tracker import VFTParams

        v = self.vft
        return VFTParams(v.alpha, v.beta, v.roi_threshold_ratio,
                         v.gaussian_ksize, v.glottal_percentile,
                         v.max_glottal_components)

    def ygvft_params(self):
        from openglottal_tpu.models.tracker import YGVFTParams

        g = self.guided_vft
        return YGVFTParams(g.alpha, g.beta, g.glottal_percentile,
                           g.gaussian_ksize, g.max_glottal_components)


def _update(obj, data: dict, path=""):
    for k, v in data.items():
        if not hasattr(obj, k):
            raise KeyError(f"unknown config key: {path}{k}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _update(cur, v, f"{path}{k}.")
        else:
            if isinstance(cur, tuple) and isinstance(v, list):
                v = tuple(v)
            setattr(obj, k, v)


def load_config(path=None, overrides: dict | None = None) -> Config:
    """Load Config from a YAML/JSON file (optional) + dotted overrides
    (e.g. {"detector.conf": 0.1})."""
    cfg = Config()
    if path is not None:
        text = Path(path).read_text()
        if str(path).endswith(".json"):
            data = json.loads(text)
        else:
            import yaml

            data = yaml.safe_load(text)
        _update(cfg, data or {})
    for dotted, v in (overrides or {}).items():
        obj = cfg
        *parents, leaf = dotted.split(".")
        for p in parents:
            obj = getattr(obj, p)
        if not hasattr(obj, leaf):
            raise KeyError(f"unknown config key: {dotted}")
        cur = getattr(obj, leaf)
        if isinstance(cur, tuple) and isinstance(v, list):
            v = tuple(v)
        setattr(obj, leaf, v)
    return cfg


def save_default_yaml(path) -> None:
    """Write the live defaults as YAML (replaces the reference's dead file)."""
    import yaml

    cfg = dataclasses.asdict(Config())
    Path(path).write_text(yaml.safe_dump(cfg, sort_keys=False))
