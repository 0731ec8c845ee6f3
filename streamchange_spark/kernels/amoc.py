"""AMOC ("at most one change") estimators.

Semantics parity with /root/reference/streamchange/amoc/estimators.py:81-207:
an estimator fits a window (newest first), maximizes a penalized CUSUM-family
statistic over candidate change points, and reports detection iff the
penalized score is positive. Change points are stored as the index *back from
the newest observation* so callers can translate them into their own frame.
"""

from __future__ import annotations

import numpy as np

from .cusum import (
    optim_cusum0_1d,
    optim_cusum_1d,
    optim_max_cusum,
    optim_sum_cusum,
    optim_sum_cusum0,
)
from .penalties import BIC, BasePenalty, as_penalty


class AMOCEstimator:
    """Base AMOC estimator: fit(x, candidates) -> penalized score + cpt."""

    # Minimum observations required on each side of a candidate change point.
    minsl_before = 1
    minsl_after = 1

    def __init__(self, penalty: BasePenalty | float = None):
        self.penalty = as_penalty(BIC() if penalty is None else penalty)
        self.reset()

    def reset(self) -> "AMOCEstimator":
        self._score = -np.inf
        self._raw_score = 0.0
        self._changepoint = None
        return self

    @property
    def change_detected(self) -> bool:
        return self._score > 0

    @property
    def score(self) -> float:
        return self._score

    @property
    def raw_score(self) -> float:
        return self._raw_score

    @property
    def changepoint(self):
        """Most likely change point as a count back from the newest point."""
        return self._changepoint

    @staticmethod
    def _optimize(x: np.ndarray, candidates: np.ndarray):
        raise NotImplementedError

    def default_candidates(self, n: int) -> np.ndarray:
        return np.arange(self.minsl_after, n - self.minsl_before + 1)

    def fit(self, x: np.ndarray, candidates: np.ndarray = None) -> "AMOCEstimator":
        """Score a window; empty candidate sets leave the estimator reset
        (no detection), mirroring amoc/estimators.py:147-150."""
        self.reset()
        if candidates is None:
            candidates = self.default_candidates(x.shape[0])
        if candidates.size > 0:
            self._raw_score, cpt = self._optimize(x, candidates)
            self._score = self._raw_score - self.penalty()
            self._changepoint = cpt
        return self


def _as_1d(x: np.ndarray) -> np.ndarray:
    return x[:, 0] if x.ndim == 2 else x


class CUSUM(AMOCEstimator):
    """Two-sided univariate CUSUM mean-change test."""

    @staticmethod
    def _optimize(x, candidates):
        return optim_cusum_1d(_as_1d(x), candidates)


class CUSUM0(AMOCEstimator):
    """One-sided univariate CUSUM with known zero pre-change mean."""

    minsl_before = 0

    @staticmethod
    def _optimize(x, candidates):
        return optim_cusum0_1d(_as_1d(x), candidates)


class SumCUSUM0(AMOCEstimator):
    """Multivariate: sum of squared per-dimension zero-mean CUSUMs."""

    minsl_before = 0

    @staticmethod
    def _optimize(x, candidates):
        return optim_sum_cusum0(np.atleast_2d(x.T).T, candidates)


class SumCUSUM(AMOCEstimator):
    """Multivariate: sum of squared per-dimension CUSUMs."""

    @staticmethod
    def _optimize(x, candidates):
        return optim_sum_cusum(np.atleast_2d(x.T).T, candidates)


class MaxCUSUM(AMOCEstimator):
    """Multivariate: max over dimensions of the squared CUSUM."""

    @staticmethod
    def _optimize(x, candidates):
        return optim_max_cusum(np.atleast_2d(x.T).T, candidates)
