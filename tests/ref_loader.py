"""Import modules from the read-only reference tree to serve as test oracles.

The reference package root (openglottal/__init__.py) imports ultralytics,
which is not installed here — so submodules that only need cv2/numpy/torch
(models/tracker.py, utils.py) are loaded piecemeal under an alias package
whose __init__ never executes.  Using the REAL reference code as the oracle
(instead of a transcription) means a misreading of the semantics cannot be
shared between oracle and implementation.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference/openglottal"


def load_reference_module(dotted: str):
    """Import ``openglottal.<dotted>`` from the reference tree as
    ``refog.<dotted>`` (e.g. ``load_reference_module("models.tracker")``)."""
    if "refog" not in sys.modules:
        pkg = types.ModuleType("refog")
        pkg.__path__ = [REF_ROOT]
        sys.modules["refog"] = pkg
        models = types.ModuleType("refog.models")
        models.__path__ = [REF_ROOT + "/models"]
        sys.modules["refog.models"] = models
    return importlib.import_module("refog." + dotted)
