"""Generic helpers used throughout the framework.

Behavioral counterparts of the reference's utility layer
(scoreperformer/utils/functions.py:12-88), re-implemented for a
numpy/JAX-first codebase.
"""
from __future__ import annotations

import random
import sys
from enum import Enum
from inspect import isfunction

import numpy as np


def exists(val) -> bool:
    return val is not None


def default(val, d):
    if exists(val):
        return val
    return d() if isfunction(d) else d


def or_reduce(masks):
    head, *body = masks
    for rest in body:
        head = head | rest
    return head


def prob2bool(prob: float) -> bool:
    return random.choices([True, False], weights=[prob, 1 - prob])[0]


def find_closest(array: np.ndarray, values) -> np.ndarray:
    """Indices of the nearest bins in a sorted ``array`` for each of ``values``.

    Ties resolve to the *right* bin (the larger value), matching the reference
    semantics (scoreperformer/utils/functions.py:41-57). Works on scalars and
    arrays.

    Implemented as a two-candidate comparison: for each value take the first
    bin >= value (clamped in range) and its left neighbour, then keep
    whichever is strictly nearer — the right candidate on ties.
    """
    bins = np.asarray(array)
    vals = np.asarray(values, dtype=np.float64)
    last = bins.shape[0] - 1

    right = np.clip(np.searchsorted(bins, values, side="left"), 0, last)
    left = np.clip(right - 1, 0, last)
    nearer_left = np.abs(vals - bins[left]) < np.abs(vals - bins[right])
    out = np.where(nearer_left, left, right)

    if out.ndim == 0 and np.ndim(values) == 0:
        return out[()]
    return out


def apply(seqs, func, desc=None, progress: bool = False):
    """Apply ``func`` over ``seqs`` (optionally with a progress meter)."""
    if progress:
        try:
            from tqdm import tqdm

            seqs = tqdm(seqs, desc=desc, file=sys.stdout, leave=False)
        except ImportError:
            pass
    return [func(seq) for seq in seqs]


class ExplicitEnum(str, Enum):
    """Enum with a more explicit error message for missing values."""

    @classmethod
    def _missing_(cls, value):
        raise ValueError(
            f"{value} is not a valid {cls.__name__}, "
            f"please select one of {list(cls._value2member_map_.keys())}"
        )

    @classmethod
    def has_value(cls, value) -> bool:
        return value in cls._value2member_map_

    @classmethod
    def list(cls):
        return list(map(lambda c: c.value, cls))
