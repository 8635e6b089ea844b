"""Misc utilities."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 0) -> None:
    """Seed host-side RNGs (reference `model/utils.py:18-25`). JAX randomness is
    explicit via keys, so this covers python/numpy (and torch if present)."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass


def exists(v) -> bool:
    return v is not None


def default(v, d):
    return v if v is not None else d
