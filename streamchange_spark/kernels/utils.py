"""Small numeric helpers shared by the kernels."""

from __future__ import annotations

import numpy as np


def geomspace_int(start: int, stop: int, step: float = 2.0) -> np.ndarray:
    """Integer geometric grid from start towards stop (inclusive endpoint),
    each value ceil(step * previous). Parity: /root/reference/streamchange/
    utils.py:6-20."""
    if step <= 1.0:
        raise ValueError(f"Step must be > 1.0, but step={step}.")
    if stop < start:
        raise ValueError(f"Stop is smaller than start: stop={stop}, start={start}.")
    values = [start]
    while values[-1] * step < stop:
        values.append(int(np.ceil(values[-1] * step)))
    if values[-1] < stop:
        values.append(stop)
    return np.array(values)


def dropna_series(values: np.ndarray, times=None):
    """Drop rows containing NaN; return (values, times) with times defaulting
    to positional indices (parity: the reference's dropna-before-loop)."""
    values = np.asarray(values, dtype=np.float64)
    mask = ~(
        np.isnan(values).any(axis=1) if values.ndim == 2 else np.isnan(values)
    )
    if times is None:
        times = np.arange(values.shape[0])
    return values[mask], np.asarray(times)[mask]
