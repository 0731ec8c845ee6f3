"""CUSUM transforms and single-change-point (AMOC) optimizers.

Pure NumPy, vectorized over candidate change points via one cumulative sum —
this is the exact-match oracle for the Spark kernels. Formula parity with
/root/reference/streamchange/amoc/estimators.py:10-78 (the reference JITs the
same NumPy with numba; here plain NumPy is the hot path since the heavy
lifting at scale is Arrow-batched inside Spark pandas UDFs).

Convention: ``x`` is a window of observations ordered *newest first* and a
candidate change point ``t`` counts observations back from the newest one.
"""

from __future__ import annotations

import numpy as np


def cusum_transform_1d(x: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Two-sided CUSUM statistic for every candidate t in one pass:
    ``sqrt(n / (t*(n-t))) * (t/n * S_n - S_t)`` with S the cumulative sum."""
    n = x.size
    sums = x.cumsum()
    return np.sqrt(n / (t * (n - t))) * (t / n * sums[-1] - sums[t - 1])


def cusum_transform(x: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Column-wise two-sided CUSUM for a (n, p) window."""
    out = np.zeros((t.size, x.shape[1]))
    for j in range(x.shape[1]):
        out[:, j] = cusum_transform_1d(x[:, j], t)
    return out


def cusum0_transform_1d(x: np.ndarray, t: np.ndarray) -> np.ndarray:
    """One-sided (known zero pre-change mean) CUSUM: ``S_t / sqrt(t)``."""
    return np.cumsum(x)[t - 1] / np.sqrt(t)


def cusum0_transform(x: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Column-wise zero-pre-change CUSUM for a (n, p) window."""
    out = np.zeros((t.size, x.shape[1]))
    for j in range(x.shape[1]):
        out[:, j] = cusum0_transform_1d(x[:, j], t)
    return out


def _argmax_score(scores: np.ndarray, t: np.ndarray) -> tuple[float, int]:
    """(best score, best candidate); first index wins ties like np.argmax."""
    i = scores.argmax()
    return scores[i], t[i]


def optim_cusum_1d(x: np.ndarray, t: np.ndarray) -> tuple[float, int]:
    return _argmax_score(cusum_transform_1d(x, t) ** 2, t)


def optim_cusum0_1d(x: np.ndarray, t: np.ndarray) -> tuple[float, int]:
    return _argmax_score(cusum0_transform_1d(x, t) ** 2, t)


def optim_sum_cusum0(x: np.ndarray, t: np.ndarray) -> tuple[float, int]:
    c = cusum0_transform(x, t)
    return _argmax_score((c**2).sum(axis=1), t)


def optim_sum_cusum(x: np.ndarray, t: np.ndarray) -> tuple[float, int]:
    c = cusum_transform(x, t)
    return _argmax_score((c**2).sum(axis=1), t)


def optim_max_cusum(x: np.ndarray, t: np.ndarray) -> tuple[float, int]:
    c = cusum_transform(x, t)
    return _argmax_score((c**2).max(axis=1), t)
