"""Kaggle dataset path resolution.

The reference imports ``openglottal.kaggle_paths.get_kaggle_bagls_path`` but
never ships the module — ``import openglottal.data`` crashes as released
(reference data.py:16; SURVEY.md §2.3 "known bugs").  This is the working
implementation of that intended feature: locate the BAGLS dataset when
running inside a Kaggle kernel (mounted under /kaggle/input)."""

from __future__ import annotations

import os
from pathlib import Path

_BAGLS_HINTS = ("bagls", "benchmark-for-automatic-glottis-segmentation")


def is_kaggle() -> bool:
    return os.environ.get("KAGGLE_KERNEL_RUN_TYPE") is not None or \
        Path("/kaggle/input").is_dir()


def get_kaggle_bagls_path(split: str) -> Path | None:
    """Return the directory holding BAGLS ``split`` ('training' | 'test')
    PNG pairs on Kaggle, or None when unavailable."""
    root = Path("/kaggle/input")
    if not root.is_dir():
        return None
    for ds in sorted(root.iterdir()):
        if not any(h in ds.name.lower() for h in _BAGLS_HINTS):
            continue
        for cand in (ds / split, ds / split.capitalize(), ds):
            if cand.is_dir() and any(cand.glob("*_seg.png")):
                return cand
    return None


def resolve_kaggle_data_paths(dataset: str, split: str):
    """(images_dir, labels_dir) for a Kaggle dataset, else None
    (reference data.py:171-195; BAGLS keeps images and masks together)."""
    if dataset.lower() != "bagls":
        return None
    path = get_kaggle_bagls_path(split)
    if path is None:
        return None
    return path, path
