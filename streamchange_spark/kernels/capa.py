"""Online CAPA: collective and point anomaly detection.

Semantics parity with /root/reference/streamchange/capa/capa.py and
savings.py: a dynamic program over a bounded window chooses, per update, the
best of {no anomaly, point anomaly, collective anomaly} by accumulated
"saving"; anomaly intervals are extracted backwards from the per-update
``anomaly_start`` trail.
"""

from __future__ import annotations

import numpy as np

from .penalties import BasePenalty, ChiSquarePenalty, as_penalty
from .utils import dropna_series
from .window_segmentor import RingBuffer


class ConstMeanL2:
    """Mean-anomaly saving under unit-variance Gaussian noise.

    ``opt``: point saving ``x^2 - pen`` (or ``sum(x)^2/n - pen`` for vectors);
    ``cumopt``: ``S_k^2 / k - pen`` cumulatively from the newest observation
    (parity: capa/savings.py:25-43).
    """

    def __init__(self, penalty: BasePenalty | float = None):
        self.penalty = as_penalty(ChiSquarePenalty() if penalty is None else penalty)

    def opt(self, x) -> float:
        if np.ndim(x) == 0:
            return x**2 - self.penalty()
        x = np.asarray(x)
        return np.sum(x) ** 2 / x.size - self.penalty()

    def cumopt(self, x: np.ndarray) -> np.ndarray:
        sums = np.cumsum(x)
        k = np.arange(1, x.shape[0] + 1)
        return sums**2 / k - self.penalty()


class Capa:
    """Streaming CAPA detector over a bounded window (series assumed
    standardized by the caller)."""

    def __init__(
        self,
        csaving: ConstMeanL2 = None,
        psaving: ConstMeanL2 = None,
        minsl: int = 2,
        maxsl: int = 1000,
        predict_point_anomalies: bool = False,
    ):
        assert minsl >= 2
        assert maxsl > minsl
        self.minsl = minsl
        self.maxsl = maxsl
        self.csaving = csaving if csaving is not None else ConstMeanL2()
        self.psaving = psaving if psaving is not None else self.csaving
        self.predict_point_anomalies = predict_point_anomalies
        self.reset()

    def reset(self) -> "Capa":
        self.window = RingBuffer(self.maxsl)
        self.opt_saving = RingBuffer(self.maxsl)
        self.opt_saving.push(0)
        self.anomaly_start = 0
        return self

    def get_penalty(self):
        return self.csaving.penalty

    @property
    def point_anomaly_detected(self) -> bool:
        return self.anomaly_start == 0

    @property
    def collective_anomaly_detected(self) -> bool:
        return self.anomaly_start > 0

    def update(self, x) -> "Capa":
        """One DP step (parity: capa/capa.py:52-76). ``anomaly_start`` encodes
        the state: -1 = no anomaly, 0 = point anomaly at the current time,
        k>0 = collective anomaly starting k observations back."""
        self.window.push(x)
        base_saving = self.opt_saving.newest_first[0]
        collective_saving = 0
        point_saving = 0
        n = len(self.window)
        cpt = 0
        if n >= self.minsl:
            opt_savings = self.opt_saving.newest_first[self.minsl - 1 :]
            csavings = self.csaving.cumopt(self.window.newest_first)[self.minsl - 1 :]
            candidate_savings = opt_savings + csavings
            best = int(np.argmax(candidate_savings))
            cpt = self.minsl + best
            collective_saving = candidate_savings[best]
            point_saving = base_saving + self.psaving.opt(x)

        savings = [base_saving, point_saving, collective_saving]
        best_kind = int(np.argmax(savings))
        self.opt_saving.push(savings[best_kind])
        if best_kind == 2:
            self.anomaly_start = cpt - 1
        elif best_kind == 1:
            self.anomaly_start = 0
        else:
            self.anomaly_start = -1
        return self

    def fit(self, values: np.ndarray, times=None) -> "Capa":
        self.reset()
        values, times = dropna_series(values, times)
        if values.ndim == 2:
            values = values[:, 0]
        n = values.shape[0]
        starts = np.empty(n, dtype=np.int64)
        if type(self.csaving) is ConstMeanL2 and type(self.psaving) is ConstMeanL2:
            # Batch replay of update(): identical arithmetic (same reversed
            # slices, same cumsums, same argmax tie-breaks) with array views
            # instead of per-update RingBuffer reversal copies.
            cpen = self.csaving.penalty()
            maxsl, minsl = self.maxsl, self.minsl
            ks = np.arange(1, maxsl + 1, dtype=float)
            os = np.empty(n + 1)  # os[j] = opt saving after j points
            os[0] = 0
            steady0 = maxsl - 1  # first t with a full window (m == maxsl)
            for t in range(min(n, minsl - 1)):
                # sub-minsl warm-up: base saving only
                savings = [os[t], 0, 0]
                best_kind = int(np.argmax(savings))
                os[t + 1] = savings[best_kind]
                starts[t] = 0 if best_kind == 1 else -1
            if n > minsl - 1:
                # Growth phase batched like pelt.py (clipped gather +
                # axis-1 cumsum, bit-identical; DP feedback per-row).
                ppen = self.psaving.penalty()
                grow_end = min(n, steady0)
                bs = minsl - 1
                while bs < grow_end:
                    # bound blk * mmax = blk * (bs + blk) ~ 1M doubles
                    blk = max(64, int((-bs + (bs * bs + (1 << 22)) ** 0.5) // 2))
                    be = min(bs + blk, grow_end)
                    mmax = be
                    idx = np.arange(bs, be)[:, None] - np.arange(mmax)[None, :]
                    w_rev = values[np.maximum(idx, 0)]
                    cs = np.cumsum(w_rev, axis=1)
                    csav_blk = cs**2 / ks[None, :mmax] - cpen
                    popt_blk = values[bs:be] ** 2 - ppen
                    for t in range(bs, be):
                        m = t + 1
                        base_saving = os[t]
                        opt_savings = os[t + 1 - m : t - minsl + 2][::-1]
                        candidate_savings = (
                            opt_savings + csav_blk[t - bs, minsl - 1 : m]
                        )
                        best = int(np.argmax(candidate_savings))
                        cpt = minsl + best
                        collective_saving = candidate_savings[best]
                        point_saving = base_saving + popt_blk[t - bs]
                        savings = [base_saving, point_saving, collective_saving]
                        best_kind = int(np.argmax(savings))
                        os[t + 1] = savings[best_kind]
                        starts[t] = (
                            (cpt - 1) if best_kind == 2 else (0 if best_kind == 1 else -1)
                        )
                    bs = be
            if n > steady0:
                # Steady state (full window): per-block 2-D cumsum over the
                # strided reversed-window view — row t is the exact v_rev of
                # the per-t path, axis-1 cumsum is the same sequential
                # accumulation, saving algebra elementwise -> bit-identical.
                # See pelt.py for the same structure.
                from numpy.lib.stride_tricks import sliding_window_view

                ppen = self.psaving.penalty()
                wins = sliding_window_view(values, maxsl)
                blk = max(1, (1 << 20) // maxsl)
                for bs in range(steady0, n, blk):
                    be = min(bs + blk, n)
                    w_rev = wins[bs - maxsl + 1 : be - maxsl + 1][:, ::-1]
                    cs = np.cumsum(w_rev, axis=1)
                    csav_blk = (cs**2 / ks[None, :maxsl] - cpen)[:, minsl - 1 :]
                    popt_blk = values[bs:be] ** 2 - ppen
                    for j in range(be - bs):
                        t = bs + j
                        base_saving = os[t]
                        opt_savings = os[t + 1 - maxsl : t - minsl + 2][::-1]
                        candidate_savings = opt_savings + csav_blk[j]
                        best = int(np.argmax(candidate_savings))
                        cpt = minsl + best
                        collective_saving = candidate_savings[best]
                        point_saving = base_saving + popt_blk[j]
                        savings = [base_saving, point_saving, collective_saving]
                        best_kind = int(np.argmax(savings))
                        os[t + 1] = savings[best_kind]
                        starts[t] = (
                            (cpt - 1) if best_kind == 2 else (0 if best_kind == 1 else -1)
                        )
            if n:
                self.anomaly_start = int(starts[-1])
            self.window.load(values[max(0, n - maxsl) :])
            self.opt_saving.load(os[max(0, n + 1 - maxsl) :])
        else:
            for t in range(n):
                self.update(values[t])
                starts[t] = self.anomaly_start
        self.collective_anomalies_ = self.extract_collective_anomalies(starts, times)
        self.point_anomalies_ = self.extract_point_anomalies(starts, times)
        return self

    def predict(self) -> list:
        if not hasattr(self, "collective_anomalies_"):
            raise RuntimeError(f"This {type(self).__name__} is not fitted yet.")
        anomalies = [dict(a) for a in self.collective_anomalies_]
        if self.predict_point_anomalies:
            anomalies += [dict(a) for a in self.point_anomalies_]
        return anomalies

    def fit_predict(self, values, times=None) -> list:
        return self.fit(values, times).predict()

    @staticmethod
    def extract_collective_anomalies(starts: np.ndarray, times) -> list:
        """Backward walk emitting {start, end, size} per collective anomaly
        (parity: capa/capa.py:111-129)."""
        i = -1
        size = len(starts)
        anoms = []
        while i >= -size:
            start_i = int(starts[i])
            if start_i > 0:
                anoms.append(
                    {
                        "start": times[i - start_i],
                        "end": times[i],
                        "size": abs(start_i + 1),
                    }
                )
                i -= start_i
            i -= 1
        return anoms

    @staticmethod
    def extract_point_anomalies(starts: np.ndarray, times) -> list:
        """Backward walk emitting single-point anomalies
        (parity: capa/capa.py:131-145)."""
        i = -1
        size = len(starts)
        anoms = []
        while i >= -size:
            start_i = int(starts[i])
            if start_i > 0:
                i -= start_i
            elif start_i == 0:
                anoms.append({"start": times[i], "end": times[i], "size": 1})
            i -= 1
        return anoms
