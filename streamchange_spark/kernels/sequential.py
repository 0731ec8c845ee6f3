"""Sequential (online) change scores and the penalized-score detector.

Semantics parity with /root/reference/streamchange/sequential/scores.py and
detector.py: a score is a per-observation recursion; the detector raises an
alarm whenever the penalized score is positive, optionally resetting and
suppressing updates for ``restart_delay`` steps after each alarm.
"""

from __future__ import annotations

import copy
from numbers import Number

import numpy as np

from .penalties import BasePenalty, as_penalty
from .stats import MovingSum
from .utils import dropna_series


class BaseScore:
    """Streaming score protocol: reset / update / value."""

    def reset(self) -> "BaseScore":
        return self

    @property
    def value(self) -> float:
        raise NotImplementedError

    def update(self, x) -> "BaseScore":
        raise NotImplementedError

    def fit(self, values: np.ndarray, times=None) -> "BaseScore":
        """Replay a whole series (NaNs dropped), recording the score path in
        ``values_`` / ``times_``."""
        self.reset()
        values, times = dropna_series(values, times)
        out = np.empty(values.shape[0])
        for t in range(values.shape[0]):
            self.update(values[t])
            out[t] = self.value
        self.values_ = out
        self.times_ = times
        return self

    @property
    def changepoint(self):
        """Optional most-recent-change estimate; None when not provided."""
        return None


class BaseRawScore(BaseScore):
    """A raw (always >= 0) change score."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._score = 0.0
        return self

    @property
    def value(self) -> float:
        return float(self._score)

    def penalise(self, penalty: BasePenalty | Number) -> "PenalisedScore":
        return PenalisedScore(self, penalty)


class PenalisedScore(BaseScore):
    """raw score minus a penalty; positive value means change detected.

    Initial value is ``-penalty()`` (parity: sequential/scores.py:80-82).
    """

    def __init__(self, score: BaseRawScore, penalty: BasePenalty | Number):
        self.score = score
        self.penalty = as_penalty(penalty)
        self.reset()

    def reset(self):
        self.score.reset()
        self._value = -self.penalty()
        return self

    @property
    def value(self) -> float:
        return float(self._value)

    def update(self, x):
        self.score.update(x)
        self._value = self.score.value - self.penalty()
        return self

    @property
    def changepoint(self):
        return self.score.changepoint


class AggregatedScore(BaseRawScore):
    """Multivariate score: one clone of ``base_score`` per dimension, the
    per-dimension values combined by ``aggregator`` (default sum)."""

    def __init__(self, base_score: BaseRawScore, aggregator=sum):
        self.base_score = base_score
        self.aggregator = aggregator
        self.reset()

    def reset(self):
        self.scores = None
        super().reset()
        return self

    def update(self, x):
        if self.scores is None:
            self.scores = [copy.deepcopy(self.base_score) for _ in x]
        for score, x_i in zip(self.scores, x):
            score.update(x_i)
        self._score = self.aggregator([s.value for s in self.scores])
        return self


class LordenPollakScore(BaseRawScore):
    """Lorden-Pollak CUSUM for an unknown positive mean shift.

    Recursion (parity: sequential/scores.py:150-174):
    ``score <- max(0, score + mu*x - mu^2/2)`` with ``mu = max(mean-since-
    restart, rho)``; a hard reset whenever the score falls below 1e-8.
    """

    def __init__(self, rho: float = 1.0):
        self.rho = rho
        self.reset()

    def reset(self):
        self.n = 0
        self.sum = 0.0
        super().reset()
        return self

    def update(self, x):
        mean = self.sum / self.n if self.n > 0 else 0
        mu = max(mean, self.rho)
        self._score = max(0, self._score + mu * x - mu**2 / 2)
        if self._score < 1e-8:
            self.reset()
        else:
            self.n += 1
            self.sum += x
        return self

    @property
    def changepoint(self):
        return self.n + 1


class CUSUM0Score(BaseRawScore):
    """Multi-window MOSUM-style score: max over window sizes w of
    ``(1/w) * MovingSum_w(x)^2`` (parity: sequential/scores.py:177-198)."""

    def __init__(self, window_sizes: list | None = None):
        self.window_sizes = window_sizes if window_sizes is not None else [2, 5, 10, 50, 100]
        self.weights = [1 / w for w in self.window_sizes]
        self.reset()

    def reset(self):
        self.sums = [MovingSum(w) for w in self.window_sizes]
        super().reset()
        return self

    def update(self, x):
        for s in self.sums:
            s.update(x)
        self.cusum = [w * s.value**2 for s, w in zip(self.sums, self.weights)]
        self._score = max(self.cusum)
        return self

    @property
    def changepoint(self):
        """Window size achieving the max score. NOTE: the reference exposes
        this as a *method* (scores.py:197-198) so its detector records the
        bound method object; we expose the useful value instead."""
        return self.window_sizes[int(np.argmax(self.cusum))] if hasattr(self, "cusum") else None


class SequentialChangeDetector:
    """Alarm whenever the penalized score is positive.

    Parity: sequential/detector.py:10-79 — ``reset_on_change`` resets the
    score after an alarm; ``restart_delay`` swallows that many updates after
    each reset before scoring resumes.
    """

    def __init__(
        self,
        penalised_score: PenalisedScore,
        reset_on_change: bool = True,
        restart_delay: int = 0,
    ):
        self.penalised_score = penalised_score
        self.reset_on_change = reset_on_change
        self.restart_delay = restart_delay if reset_on_change else 0
        self.reset()

    def reset(self):
        self.penalised_score.reset()
        self.restart_counter = 0
        return self

    @property
    def change_detected(self) -> bool:
        return self.penalised_score.value > 0

    @property
    def changepoint(self):
        return self.penalised_score.changepoint

    def get_penalty(self):
        return self.penalised_score.penalty

    def update(self, x):
        if self.reset_on_change and self.change_detected:
            self.restart_counter = 0
            self.reset()
        if self.restart_counter < self.restart_delay:
            self.restart_counter += 1
            return self
        self.penalised_score.update(x)
        return self

    def fit(self, values: np.ndarray, times=None) -> "SequentialChangeDetector":
        self.reset()
        values, times = dropna_series(values, times)
        scores = np.empty(values.shape[0])
        self.alarms_ = []
        self.changepoints_ = []
        for t in range(values.shape[0]):
            self.update(values[t])
            scores[t] = self.penalised_score.value
            if self.change_detected:
                self.alarms_.append(times[t])
                if self.changepoint:
                    self.changepoints_.append(self.changepoint)
        self.penalised_scores_ = scores
        self.times_ = times
        return self

    def predict(self) -> list:
        return list(self.alarms_)

    def fit_predict(self, values, times=None) -> list:
        return self.fit(values, times).predict()

    def transform(self, values, times=None) -> np.ndarray:
        return self.fit(values, times).penalised_scores_
