"""Penalty tuners: choose a penalty scale hitting a target detection count.

Parity notes:
- GridPenaltyTuner mirrors /root/reference/streamchange/tuners.py:59-186 but
  evaluates the (deterministic) grid directly instead of through optuna's
  GridSampler + thread pool; on Spark the same grid fans out as one job (see
  operators/tuning.py).
- AMOCPenaltyTuner mirrors /root/reference/streamchange/amoc/
  penalty_tuners.py:10-217 (interval generators, greedy top-score peeling).
- SequentialScorePenaltyTuner mirrors /root/reference/streamchange/sequential/
  penalty_tuners.py:12-109 (zero-penalty no-reset scan, margin suppression).
"""

from __future__ import annotations

import copy
import math

import numpy as np

from .penalties import ConstantPenalty


# ---------------------------------------------------------------------------
# Grid tuner
# ---------------------------------------------------------------------------
class GridPenaltyTuner:
    """Evaluate detection counts over a grid of penalty scales and pick the
    scale whose count is closest to ``target_detections`` (optionally refined
    by monotone interpolation of the count-vs-scale curve)."""

    def __init__(
        self,
        detector,
        target_detections: int,
        penalty_scales=None,
        score: str = "abs_error",
        interpolate: bool = True,
        refit: bool = True,
    ):
        self.detector = detector
        self.target_detections = target_detections
        self.penalty_scales = penalty_scales
        self.score = score
        self.interpolate = interpolate
        self.refit = refit

    def _error(self, count: int) -> float:
        err = abs(count - self.target_detections)
        return err if self.score == "abs_error" else err**2

    def evaluate_scale(self, values, scale: float) -> int:
        detector = copy.deepcopy(self.detector)
        detector.get_penalty().scale = scale
        return len(detector.fit_predict(values))

    def summarise(self):
        """Diagnostic count-vs-scale table (parity: reference tuners.py:41-44
        + _summarise at tuners.py:118-130): one row per evaluated scale with
        the implied penalty value and the trial score."""
        import pandas as pd

        if not hasattr(self, "counts_"):
            raise RuntimeError(f"This {type(self).__name__} is not fitted yet.")
        scales = sorted(self.counts_)
        default = self.detector.get_penalty().default_penalty()
        return (
            pd.DataFrame(
                {
                    "penalty": [s * default for s in scales],
                    "penalty_scale": scales,
                    "detection_count": [self.counts_[s] for s in scales],
                    self.score: [self._error(self.counts_[s]) for s in scales],
                }
            )
            .sort_values("penalty_scale")
            .reset_index(drop=True)
        )

    def fit(self, values: np.ndarray, counts: dict[float, int] | None = None):
        """``counts`` may be precomputed (scale -> detection count), e.g. by a
        Spark fan-out; otherwise the grid is evaluated serially here."""
        values = np.asarray(values, dtype=np.float64)
        if values.shape[0] < self.target_detections:
            raise ValueError("x must contain more rows than target_detections.")
        if self.penalty_scales is None:
            data_scale = float(
                np.mean(np.std(values.reshape(values.shape[0], -1), axis=0, ddof=1))
            )
            self.penalty_scales = data_scale * np.geomspace(1e-3, 1e3, 100)

        if counts is None:
            counts = {
                float(s): self.evaluate_scale(values, float(s))
                for s in self.penalty_scales
            }
        self.counts_ = counts

        scales = np.array(sorted(counts))
        ncpts = np.array([counts[s] for s in scales], dtype=float)
        errors = np.array([self._error(int(c)) for c in ncpts])

        if not self.interpolate:
            best = int(np.argmin(errors))
            penalty_scale_ = float(scales[best])
        else:
            penalty_scale_ = self._interpolated_best(scales, ncpts, errors)
        self.penalty_scale_ = penalty_scale_

        self.detector_ = copy.deepcopy(self.detector)
        self.detector_.get_penalty().scale = penalty_scale_
        if self.refit:
            self.detector_.fit(values)
        return self

    def _interpolated_best(self, scales, ncpts, errors) -> float:
        """For each distinct detection count keep the smallest scale, linearly
        interpolate scale over the integer count range, and take the count
        with the smallest error (parity: tuners.py:132-148,171-178)."""
        by_count: dict[int, float] = {}
        for s, c in zip(scales, ncpts):
            c = int(c)
            if c not in by_count or s < by_count[c]:
                by_count[c] = float(s)
        counts_sorted = np.array(sorted(by_count))
        grid = np.arange(counts_sorted.min(), counts_sorted.max() + 1)
        known_scales = np.array([by_count[c] for c in counts_sorted], dtype=float)
        interp_scales = np.interp(grid, counts_sorted, known_scales)
        errs = np.array([self._error(int(c)) for c in grid])
        return float(interp_scales[int(np.argmin(errs))])

    def predict(self):
        if not hasattr(self, "detector_"):
            raise RuntimeError("GridPenaltyTuner is not fitted yet.")
        return self.detector_.predict()


# ---------------------------------------------------------------------------
# Interval generators for the AMOC tuner
# ---------------------------------------------------------------------------
def make_stepwise_intervals(n, min_window, max_window, step=1):
    starts, ends = [], []
    for end in range(0, n - min_window):
        for start in range(min_window, max_window + 1, step):
            ends.append(end)
            starts.append(end + start)
    starts = np.array(starts)
    ends = np.array(ends)
    keep = starts <= n
    return starts[keep], ends[keep]


def make_random_intervals(n, min_window, max_window, prob=1.0):
    starts, ends = [], []
    for end in range(0, n - min_window):
        for start in range(min_window, max_window + 1):
            if np.random.uniform(0.0, 1.0) <= prob:
                ends.append(end)
                starts.append(end + start)
    starts = np.array(starts)
    ends = np.array(ends)
    keep = starts <= n
    return starts[keep], ends[keep]


def make_dyadic_intervals(n, min_window, max_window, alpha=1.5, step_proportion=0.25):
    starts, ends = [], []
    interval_length = min_window
    while interval_length <= max_window:
        step = max(1, math.floor(step_proportion * interval_length))
        i = 0
        while i * step + interval_length <= n:
            ends.append(int(i * step))
            starts.append(int(i * step + interval_length))
            i += 1
        interval_length = max(interval_length + 1, math.floor(alpha * interval_length))
    return np.array(starts), np.array(ends)


def targetscaler(alpha: float = 1.0):
    def selector(penalties):
        return max(alpha * penalties[-1], 1e-8)

    return selector


class AMOCPenaltyTuner:
    """Tune a WindowSegmentor's penalty: score zero-penalty AMOC fits on a set
    of generated intervals, greedily peel the top-score intervals covering
    distinct change points, and take the k-th score as the penalty giving k
    detections."""

    def __init__(
        self,
        detector,
        target_detections: int = 1,
        interval_generator: str = "dyadic",
        prob: float = 0.1,
        step: int = 5,
        alpha: float = 1.5,
        step_proportion: float = 0.25,
        selector=None,
    ):
        self.detector = detector
        self.target_detections = target_detections
        self.interval_generator = interval_generator
        self.prob = prob
        self.step = step
        self.alpha = alpha
        self.step_proportion = step_proportion
        self.selector = selector if selector is not None else targetscaler(1.0)

    def _make_intervals(self, n, min_window, max_window):
        if self.interval_generator == "random":
            return make_random_intervals(n, min_window, max_window, self.prob)
        if self.interval_generator == "stepwise":
            return make_stepwise_intervals(n, min_window, max_window, self.step)
        if self.interval_generator == "dyadic":
            return make_dyadic_intervals(
                n, min_window, max_window, self.alpha, self.step_proportion
            )
        raise ValueError("interval_generator must be one of random, stepwise, dyadic")

    def _detect_in(self, x_rev: np.ndarray, starts, ends):
        scores = np.empty(len(starts))
        cpts = np.empty(len(starts), dtype=np.int64)
        estimator = self.detector.estimator
        all_candidates = self.detector.candidate_cpts
        for i, (start, end) in enumerate(zip(starts, ends)):
            candidates = all_candidates[all_candidates < start - end]
            estimator.fit(x_rev[end:start], candidates)
            scores[i] = estimator.score
            cpts[i] = end + (estimator.changepoint or 0)
        return scores, cpts

    def _find_penalties(self, x_rev: np.ndarray) -> np.ndarray:
        starts, ends = self._make_intervals(
            x_rev.shape[0], self.detector.min_window, self.detector.max_window
        )
        scores, cpts = self._detect_in(x_rev, starts, ends)
        self.scores = scores
        self.cpts = cpts
        penalties = np.zeros(self.target_detections)
        i = 0
        while (i < self.target_detections) and np.any(scores > 0.0):
            argmax = int(scores.argmax())
            penalties[i] = scores[argmax]
            max_cpt = cpts[argmax]
            in_interval = (max_cpt >= ends) & (max_cpt < starts)
            scores[in_interval] = 0.0
            i += 1
        return penalties

    def fit(self, values: np.ndarray) -> "AMOCPenaltyTuner":
        values = np.asarray(values, dtype=np.float64)
        if values.shape[0] < self.target_detections:
            raise ValueError("x must contain more rows than target_detections.")
        # Zero-penalty raw scores drive the tuning.
        self.detector.estimator.penalty.scale = 0
        # Newest-first frame of reference, like the detector's window.
        x_rev = values[::-1]
        self.penalties = self._find_penalties(x_rev)
        penalty = self.selector(self.penalties)
        self.penalty_scale_ = penalty / self.detector.estimator.penalty.value
        self.detector.estimator.penalty.scale = self.penalty_scale_
        return self

    def summarise(self):
        """Penalty-per-detection-count table (parity: reference
        amoc/penalty_tuners.py:211-217)."""
        import pandas as pd

        if not hasattr(self, "penalties"):
            raise RuntimeError(f"This {type(self).__name__} is not fitted yet.")
        penalties = np.asarray(self.penalties, dtype=float)
        return (
            pd.DataFrame(
                {
                    "detection_count": np.arange(self.target_detections) + 1,
                    "penalty": penalties,
                    "penalty_scale": penalties
                    / self.detector.estimator.penalty.value,
                }
            )
            .sort_values("penalty_scale")
            .reset_index(drop=True)
        )


class SequentialScorePenaltyTuner:
    """Tune a SequentialChangeDetector's penalty from its raw score maxima:
    run with zero penalty and no reset, then repeatedly take the max score and
    suppress a margin-defined neighbourhood around it; the k-th max is the
    penalty yielding k detections."""

    def __init__(
        self,
        detector,
        target_detections: int = 0,
        refit: bool = True,
        index_margin=None,
        score_value_margin=None,
        score_quantile_margin=None,
    ):
        self.detector = detector
        self.target_detections = target_detections
        self.refit = refit
        specified = sum(
            m is not None
            for m in (index_margin, score_value_margin, score_quantile_margin)
        )
        if specified > 1:
            raise ValueError(
                "Only one of index_margin, score_value_margin, "
                "score_quantile_margin can be specified."
            )
        if specified == 0:
            raise ValueError(
                "One of index_margin, score_value_margin, "
                "score_quantile_margin must be specified."
            )
        self.index_margin = index_margin
        self.score_value_margin = score_value_margin
        self.score_quantile_margin = score_quantile_margin

    def _event_bounds(self, scores: np.ndarray, times: np.ndarray, argmax: int):
        if self.index_margin is not None:
            lower = times[argmax] - self.index_margin
            upper = times[argmax] + self.index_margin
            return lower, upper
        if self.score_quantile_margin is not None and self.score_value_margin is None:
            self.score_value_margin = float(
                np.quantile(scores, self.score_quantile_margin)
            )
        left = np.nonzero(scores[:argmax] <= self.score_value_margin)[0]
        lower = times[0] if left.size == 0 else times[left[-1]]
        right = np.nonzero(scores[argmax + 1 :] <= self.score_value_margin)[0]
        upper = times[-1] if right.size == 0 else times[argmax + 1 + right[0]]
        return lower, upper

    def fit(self, values: np.ndarray, times=None) -> "SequentialScorePenaltyTuner":
        detector = copy.deepcopy(self.detector)
        detector.reset_on_change = False
        detector.penalised_score.penalty = ConstantPenalty(0.0)
        detector.fit(values, times)
        self.scores_ = detector.penalised_scores_.copy()
        times = detector.times_
        scores = self.scores_.copy()

        self.penalties = []
        for _ in range(self.target_detections + 1):
            argmax = int(scores.argmax())
            self.penalties.append(float(scores[argmax]))
            lower, upper = self._event_bounds(scores, times, argmax)
            scores[(times >= lower) & (times <= upper)] = 0.0

        default_penalty = self.detector.get_penalty().default_penalty()
        self.penalty_ = self.penalties[-1]
        self.penalty_scale_ = self.penalty_ / default_penalty
        self.detector_ = copy.deepcopy(self.detector)
        self.detector_.get_penalty().scale = self.penalty_scale_
        if self.refit:
            self.detector_.fit(values, times)
        return self

    def summarise(self):
        """Penalty-per-detection-count table (parity: reference
        sequential/penalty_tuners.py:102-109)."""
        import pandas as pd

        if not hasattr(self, "penalties"):
            raise RuntimeError(f"This {type(self).__name__} is not fitted yet.")
        default_penalty = self.detector.get_penalty().default_penalty()
        penalties = np.asarray(self.penalties, dtype=float)
        return (
            pd.DataFrame(
                {
                    "detection_count": np.arange(self.target_detections + 1),
                    "penalty": penalties,
                    "penalty_scale": penalties / default_penalty,
                }
            )
            .sort_values("penalty_scale")
            .reset_index(drop=True)
        )
