"""Scalar distance functions (API parity with reference
annchor/distances.py:8-20)."""

from __future__ import annotations

import numpy as np

from annchor_tpu.ops.levenshtein import levenshtein_scalar as _lev


def euclidean(x, y):
    """Euclidean distance."""
    return float(np.linalg.norm(np.asarray(x) - np.asarray(y)))


def levenshtein(x, y):
    """Levenshtein distance."""
    return int(_lev(x, y))


def cosine(x, y):
    """Cosine distance."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    nx = np.linalg.norm(x)
    ny = np.linalg.norm(y)
    if nx == 0 or ny == 0:
        return 0.0
    return float(1.0 - np.dot(x, y) / (nx * ny))
