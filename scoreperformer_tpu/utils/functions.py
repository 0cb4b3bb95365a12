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

    Ties resolve to the *right* bin (``side="left"`` searchsorted with a strict
    ``<`` comparison on the left neighbour), matching the reference semantics
    (scoreperformer/utils/functions.py:41-57). Works on scalars and arrays.
    """
    array = np.asarray(array)
    ids = np.searchsorted(array, values, side="left")

    arr_values = array[np.minimum(ids, len(array) - 1)]
    prev_values = array[np.maximum(ids - 1, 0)]
    prev_idx_is_less = (ids == len(array)) | (
        np.fabs(values - prev_values) < np.fabs(values - arr_values)
    )

    if isinstance(ids, np.ndarray):
        ids[prev_idx_is_less] -= 1
    elif prev_idx_is_less:
        ids -= 1

    return np.maximum(0, ids)


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
