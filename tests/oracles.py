"""Torch-based oracles for numerics-parity tests.

Where possible we import the reference implementation directly (read-only
mount at /root/reference) and compare our JAX ops against it with random
weights. Reference modules that import unavailable heavy deps (whisperx,
mediapipe, HF weight downloads) are NOT imported; for those paths the tests
build small torch oracles from the behavioral spec instead.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def load_reference_module(relpath: str, name: str):
    """Import a reference .py file by path (no package side effects)."""
    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    # reference files do `from models.modules import *`; expose an alias.
    if name == "ref_modules":
        sys.modules.setdefault("models", type(sys)("models"))
        sys.modules["models.modules"] = mod
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_cache = {}


def ref_modules():
    """reference models/modules.py (torch-only imports — safe)."""
    if "modules" not in _cache:
        _cache["modules"] = load_reference_module("models/modules.py", "ref_modules")
    return _cache["modules"]


def ref_gestsync():
    """reference models/gestsync.py (torch-only imports — safe)."""
    if "gestsync" not in _cache:
        ref_modules()
        _cache["gestsync"] = load_reference_module("models/gestsync.py", "ref_gestsync")
    return _cache["gestsync"]


def to_numpy(t) -> np.ndarray:
    return t.detach().cpu().numpy()
