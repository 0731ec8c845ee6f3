"""Offline PELT with admissible-set pruning over precomputed prefix sums.

Semantics parity with /root/reference/streamchange/offline/pelt.py and
costs.py: costs for any (start, end) interval come from zero-padded prefix
sums; the forward DP prunes candidates whose cost already exceeds the current
optimum (expected O(n) overall).
"""

from __future__ import annotations

import numpy as np

from .penalties import BIC, BasePenalty


class OfflineL2Cost:
    """Interval L2 cost from prefix sums:
    ``sum_j (S2[e+1]-S2[s]) - (S[e+1]-S[s])^2 / len`` (parity:
    offline/costs.py:20-62)."""

    def __init__(self):
        self.sums = None
        self.sums2 = None

    def fit(self, x: np.ndarray) -> "OfflineL2Cost":
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 1:
            x = x.reshape(-1, 1)
        self.n, self.p = x.shape
        # Zero first row so start = 0 works without special-casing.
        self.sums = np.zeros((self.n + 1, self.p))
        self.sums[1:] = np.cumsum(x, axis=0)
        self.sums2 = np.zeros((self.n + 1, self.p))
        self.sums2[1:] = np.cumsum(x**2, axis=0)
        self.weights = np.tile(np.arange(0, self.n + 1).reshape(-1, 1), (1, self.p))
        return self

    def __call__(self, starts: np.ndarray, ends) -> np.ndarray:
        if self.sums is None:
            raise RuntimeError("OfflineL2Cost must be fit before calling.")
        ends = np.atleast_1d(np.asarray(ends))
        if ends.size == 1:
            ends = np.repeat(ends, len(starts))
        partial_sums = self.sums[ends + 1] - self.sums[starts]
        partial_sums2 = self.sums2[ends + 1] - self.sums2[starts]
        weights = self.weights[ends - starts + 1]
        return np.sum(partial_sums2 - partial_sums**2 / weights, axis=1)


class OfflinePelt:
    """Exact optimal partitioning with pruning; ``segments_`` is a list of
    {start, end, size} dicts in ascending start order and ``changepoints_``
    their ends (parity: offline/pelt.py:13-68)."""

    def __init__(
        self,
        cost: OfflineL2Cost = None,
        penalty: BasePenalty = None,
        minsl: int = 2,
    ):
        assert minsl >= 1
        self.minsl = minsl
        self.cost = cost if cost is not None else OfflineL2Cost()
        self.penalty = penalty if penalty is not None else BIC()

    def fit(self, x: np.ndarray) -> "OfflinePelt":
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 1:
            x = x.reshape(-1, 1)
        n = x.shape[0]
        if n == 0:
            self.segments_ = []
            self.changepoints_ = []
            return self
        self.cost.fit(x)
        pen = self.penalty()

        admissible = np.array([0])
        opt_cost = np.zeros(n + 1)
        opt_cost[: self.minsl - 1] = -pen
        prev_cpts = [-1] * (self.minsl - 1)

        for t in range(self.minsl - 1, n):
            admissible = np.concatenate((admissible, [t - self.minsl + 1]))
            admissible_opt_costs = opt_cost[admissible] + self.cost(admissible, t) + pen
            best = int(np.argmin(admissible_opt_costs))
            opt_cost[t] = admissible_opt_costs[best]
            prev_cpts.append(int(admissible[best]) - 1)
            # Prune: drop candidates that can never beat the current optimum.
            admissible = admissible[admissible_opt_costs - pen <= opt_cost[t]]

        self.segments_ = self.get_segments(prev_cpts)
        self.changepoints_ = [s["end"] for s in self.segments_]
        return self

    @staticmethod
    def get_segments(prev_cpts: list) -> list:
        segments = []
        i = len(prev_cpts) - 1
        while i >= 0:
            cpt_i = prev_cpts[i]
            segments.append({"start": cpt_i + 1, "end": i, "size": i - cpt_i})
            i = cpt_i
        segments.sort(key=lambda s: s["start"])
        return segments
