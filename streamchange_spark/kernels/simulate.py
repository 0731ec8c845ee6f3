"""Deterministic segmented-Gaussian series generator.

RNG-recipe parity with /root/reference/streamchange/data/simulate.py:5-18:
one global ``np.random.seed(seed)`` then one ``multivariate_normal`` draw per
segment, concatenated, with optional outliers added at evenly spaced
positions. Keeping the exact call sequence makes every fixture bit-identical
to the reference's test inputs.
"""

from __future__ import annotations

import numpy as np


def simulate(
    means=(0,),
    seg_lens=(100,),
    p: int = 1,
    n_outliers: int = 0,
    outlier_size: float = 0,
    seed: int = 10,
) -> np.ndarray:
    """Return an (n, p) float64 array of per-segment Gaussian draws."""
    means = list(means)
    seg_lens = list(seg_lens)
    np.random.seed(seed)
    cov = np.identity(p)
    if len(seg_lens) == 1:
        seg_lens = list(np.repeat(seg_lens[0], len(means)))
    segments = [
        np.random.multivariate_normal(np.repeat(mean, p), cov, seg_len)
        for mean, seg_len in zip(means, seg_lens)
    ]
    x = np.concatenate(tuple(segments))
    # Quirk preserved: outlier positions are spaced over x.size (= n*p), and
    # integer row indexing offsets whole rows — matches the reference exactly
    # for p=1, which is the only case its tests exercise.
    outlier_positions = np.linspace(0, x.size - 1, n_outliers, dtype=int)
    x[outlier_positions] = x[outlier_positions] + outlier_size
    return x
