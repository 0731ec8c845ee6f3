"""Windowed AMOC segmentation (streaming change-point detector).

Semantics parity with /root/reference/streamchange/amoc/window_segmentor.py:
a bounded buffer of recent observations is re-tested on every update with an
AMOC estimator; on detection the buffer is truncated at the change point and
(optionally) re-scanned over growing windows ("jumpback") to catch multiple
change points revealed by the truncation.

Implementation is original: instead of the reference's O(n) concatenate-per-
append deque, the buffer is an amortized O(1) grow-right array stored oldest
first; newest-first *views* (negative-stride slices) are handed to the
estimator, so NumPy walks elements in exactly the reference's order and all
floating-point results are bit-identical.
"""

from __future__ import annotations

import numpy as np

from .amoc import AMOCEstimator
from .utils import geomspace_int

_LAST_CPT_CAP = int(1e8)


class RingBuffer:
    """Bounded grow-right buffer exposing a newest-first view, O(1) amortized."""

    def __init__(self, max_length: int, p: int | None = None):
        self.max_length = int(max_length)
        self._p = p
        self.reset()

    def reset(self) -> "RingBuffer":
        self._buf = None
        self._lo = 0
        self._hi = 0
        self._dict_keys = None
        return self

    def _ensure(self, row: np.ndarray):
        if self._buf is None:
            cap = max(64, min(self.max_length, 4096))
            self._buf = np.empty((cap,) + row.shape, dtype=np.float64)
        elif self._hi == self._buf.shape[0]:
            n = self._hi - self._lo
            cap = self._buf.shape[0]
            if n <= cap // 2:
                self._buf[:n] = self._buf[self._lo : self._hi]
            else:
                new = np.empty((min(max(cap * 2, 64), max(self.max_length, n * 2)),) + self._buf.shape[1:])
                new[:n] = self._buf[self._lo : self._hi]
                self._buf = new
            self._lo, self._hi = 0, n

    def push(self, x) -> None:
        """Append the newest observation; evict the oldest beyond max_length.
        Dict inputs are flattened to a float row-vector with the column
        order fixed by the FIRST observation's keys (reference quirk,
        base.py:100-109)."""
        if isinstance(x, dict):
            if self._dict_keys is None:
                self._dict_keys = list(x)
            x = [x[k] for k in self._dict_keys]
        row = np.asarray(x, dtype=np.float64)
        self._ensure(row)
        self._buf[self._hi] = row
        self._hi += 1
        if len(self) > self.max_length:
            self._lo += 1

    def drop_oldest(self, n: int) -> None:
        self._lo += int(n)

    def keep_newest(self, n: int) -> None:
        self._lo = self._hi - int(n)

    @property
    def newest_first(self) -> np.ndarray:
        """View with index 0 = most recent observation (no copy)."""
        return self._buf[self._lo : self._hi][::-1]

    def load(self, oldest_first: np.ndarray) -> "RingBuffer":
        """Replace contents with the given oldest-first rows (fast-path state
        reconstruction)."""
        arr = np.ascontiguousarray(oldest_first, dtype=np.float64)
        self._buf = arr.copy()
        self._lo, self._hi = 0, arr.shape[0]
        return self

    def __len__(self) -> int:
        return self._hi - self._lo


class WindowSegmentor:
    """Streaming segmentation by repeated AMOC testing over a bounded window.

    Parameters mirror amoc/window_segmentor.py:35-55; per-update flow mirrors
    :116-138 (buffer truncation on detection, single full-window test per
    update, growing-window rescan after a jumpback).
    """

    def __init__(
        self,
        estimator: AMOCEstimator,
        min_window: int = 2,
        max_window: int = int(1e5),
        minsl: int = 1,
        candidate_type: str = "linear",
        candidate_step: float = 1,
        with_jumpback: bool = True,
    ):
        self.estimator = estimator
        self._validate(min_window, max_window, minsl)
        self.min_window = min_window
        self.max_window = int(max_window)
        self.minsl = minsl
        self.candidate_type = candidate_type
        self.candidate_step = candidate_step
        self.with_jumpback = with_jumpback
        self.candidate_cpts = self._make_candidates()
        self.window = RingBuffer(self.max_window)
        self.reset()

    # -- lifecycle ---------------------------------------------------------
    def reset(self) -> "WindowSegmentor":
        self._changepoints: list[int] = []
        self.last_changepoint = 0
        self.estimator.reset()
        self.window.reset()
        return self

    def get_penalty(self):
        return self.estimator.penalty

    @property
    def change_detected(self) -> bool:
        return len(self._changepoints) > 0

    @property
    def changepoints(self) -> list[int]:
        """Change points found by the latest update, counted back from the
        current observation (external index = t - cpt)."""
        return self._changepoints

    # -- configuration -----------------------------------------------------
    def _validate(self, min_window, max_window, minsl):
        if min_window < 2:
            raise ValueError("min_window cannot be smaller than 2.")
        if min_window > max_window:
            raise ValueError("min_window cannot be greater than max_window.")
        est = self.estimator
        if minsl < max(est.minsl_before, est.minsl_after):
            raise ValueError(
                "minsl cannot be smaller than the strictest minsl restriction "
                "in the AMOC estimator."
            )
        one_sided = est.minsl_after == 0 or est.minsl_before == 0
        if one_sided and minsl > max_window:
            raise ValueError(
                "minsl cannot be greater than max_window for one-sided AMOC estimators."
            )
        if not one_sided and minsl > max_window / 2:
            raise ValueError(
                "minsl cannot be greater than max_window/2 for two-sided AMOC estimators."
            )

    def _make_candidates(self) -> np.ndarray:
        # Candidates stop one short of the window end so the same change point
        # is never tested twice (would loop forever with jumpback).
        min_cpt = self.minsl if self.estimator.minsl_after > 0 else 0
        max_cpt = (
            self.max_window - self.minsl
            if self.estimator.minsl_before > 0
            else self.max_window
        )
        if max_cpt < min_cpt:
            raise ValueError(
                "minsl cannot be greater than max_window/2 when the AMOC "
                "estimator requires estimation both before and after a "
                "candidate changepoint."
            )
        if self.candidate_type == "linear":
            return np.arange(min_cpt, max_cpt + 1, self.candidate_step)
        if self.candidate_type == "geom":
            if self.candidate_step <= 1.0:
                raise ValueError("When candidate_type='geom', candidate_step must be > 1.")
            return geomspace_int(min_cpt, max_cpt + 1, self.candidate_step)
        raise ValueError("candidate_type must be either 'linear' or 'geom'.")

    def _valid_candidates(self, window_length: int) -> np.ndarray:
        minsl_boundary = self.last_changepoint - self.minsl + 1
        return self.candidate_cpts[
            self.candidate_cpts < min(minsl_boundary, window_length)
        ]

    # -- streaming ---------------------------------------------------------
    def update(self, x) -> "WindowSegmentor":
        if self.change_detected:
            self.window.keep_newest(self._changepoints[-1])
        self._changepoints = []
        self.window.push(x)
        self.last_changepoint = min(self.last_changepoint + 1, _LAST_CPT_CAP)

        values = self.window.newest_first
        start = len(self.window)
        end = min(0, start - self.min_window)
        while end >= 0:
            candidates = self._valid_candidates(start - end)
            self.estimator.fit(values[end:start], candidates)
            if self.estimator.change_detected:
                cpt = self.estimator.changepoint
                self._changepoints.append(cpt)
                self.last_changepoint = cpt
                if self.with_jumpback:
                    start = cpt
                    end = start - self.min_window + 1
            end -= 1
        return self

    # -- batch -------------------------------------------------------------
    def fit(self, values: np.ndarray, times=None) -> "WindowSegmentor":
        """Run the stream over a whole series; NaN rows are dropped first
        (parity: window_segmentor.py:140-151).

        Steady-state fast path: once the window is full and no change has
        been seen for a full window, each update is exactly one full-window
        test with a fixed candidate set — those steps are scored in one
        vectorized pass over a sliding-window matrix (bit-identical
        arithmetic: row-wise cumsums match the per-step cumsums), and the
        exact per-step loop resumes at the first flagged detection.
        """
        self.reset()
        values = np.asarray(values, dtype=np.float64)
        two_d = values.ndim == 2
        mask = ~(np.isnan(values).any(axis=1) if two_d else np.isnan(values))
        if times is None:
            times = np.arange(values.shape[0])
        times = np.asarray(times)[mask]
        values = values[mask]

        flat = values[:, 0] if (two_d and values.shape[1] == 1) else values
        batch_scorer = (
            self._batch_scorer() if flat.ndim == 1 and values.shape[0] > 0 else None
        )

        cpts = []
        detections = []
        n = values.shape[0]
        W = self.max_window
        t = 0
        if batch_scorer is not None and n > 0:
            # Growth-phase fast path: from a fresh state every update is one
            # fit on the whole (growing) window with a candidate bound that
            # is a pure function of t — score all growth steps in one
            # vectorized pass and fast-forward to the first detection.
            t_first = self._growth_scan(flat)
            if t_first > 0:
                self.window.load(values[:t_first])
                self.last_changepoint = min(t_first, _LAST_CPT_CAP)
                t = t_first
        while t < n:
            if (
                batch_scorer is not None
                and not self.change_detected
                and len(self.window) == W
                and self.last_changepoint >= W + self.minsl - 2
                and t + 1 < n
            ):
                t_det = self._fast_scan(flat, t, batch_scorer)
                if t_det > t:
                    # no detections in [t, t_det): jump state forward
                    self.window.load(
                        values[t_det - W : t_det]
                        if not two_d
                        else values[t_det - W : t_det]
                    )
                    self.last_changepoint = min(
                        self.last_changepoint + (t_det - t), _LAST_CPT_CAP
                    )
                    t = t_det
                    if t >= n:
                        break
            self.update(values[t])
            if self.change_detected:
                cpts += [t - cpt for cpt in self._changepoints]
                detections += [t] * len(self._changepoints)
            t += 1
        self.changepoints_ = [times[c] for c in cpts]
        # (detection time, changepoint time) pairs — when each change was seen.
        self.detections_ = [(times[d], times[c]) for d, c in zip(detections, cpts)]
        return self

    # -- vectorized steady-state scan ---------------------------------------
    def _batch_scorer(self):
        """Row-batched (detected?) scorer for the estimator, or None if the
        estimator has no exact batch formulation."""
        from .amoc import CUSUM, CUSUM0

        W = self.max_window
        tt = self.candidate_cpts[self.candidate_cpts < W].astype(np.int64)
        if tt.size == 0:
            return None
        pen = self.estimator.penalty()
        if type(self.estimator) is CUSUM:
            coef = np.sqrt(W / (tt * (W - tt)))
            frac = tt / W

            def score(S: np.ndarray) -> np.ndarray:
                trans = coef * (frac * S[:, -1:] - S[:, tt - 1])
                return (trans**2).max(axis=1) - pen > 0

            return score
        if type(self.estimator) is CUSUM0:
            sq = np.sqrt(tt)

            def score(S: np.ndarray) -> np.ndarray:
                trans = S[:, tt - 1] / sq
                return (trans**2).max(axis=1) - pen > 0

            return score
        return None

    def _growth_scan(self, flat: np.ndarray) -> int:
        """First update index t in the growth phase (window not yet full)
        whose single full-window test detects a change — or the first
        steady-state index if none does. Bit-identical to the per-update
        loop: same row-wise newest-first cumsums, same integer-typed
        transform arithmetic, same candidate bound
        ``tt < min(last_changepoint - minsl + 1, window_length)`` with
        ``last_changepoint == t + 1`` (incremented, never reset: no
        detections happened before the first hit by construction)."""
        from .amoc import CUSUM, CUSUM0

        W = self.max_window
        n = flat.shape[0]
        t_stop = min(n, W)
        t0 = self.min_window - 1  # first update that actually fits
        if t0 >= t_stop:
            return t_stop
        kind = type(self.estimator)
        if kind is not CUSUM and kind is not CUSUM0:
            return 0
        tt = self.candidate_cpts.astype(np.int64)
        if tt.size == 0:
            return t_stop
        pen = self.estimator.penalty()
        # chunk rows so the (rows x t_stop) window matrix stays ~<=32 MB
        block = max(1, (1 << 22) // max(t_stop, 1))
        for lo in range(t0, t_stop, block):
            hi = min(lo + block, t_stop)
            rows = np.arange(lo, hi, dtype=np.int64)
            width = int(rows[-1]) + 1
            k = np.arange(width, dtype=np.int64)
            live = k[None, :] <= rows[:, None]
            M = np.where(live, flat[(rows[:, None] - k[None, :]).clip(min=0)], 0.0)
            S = np.cumsum(M, axis=1)
            L = rows + 1  # window length at step t
            bound = np.minimum(rows + 2 - self.minsl, L)
            mask = tt[None, :] < bound[:, None]
            if not mask.any():
                continue
            ttc = np.minimum(tt, width)  # clip gathers; out-of-row is masked
            S_tt = S[:, ttc - 1]
            with np.errstate(divide="ignore", invalid="ignore"):
                if kind is CUSUM:
                    S_n = S[np.arange(len(rows)), rows]  # full-window sum
                    trans = np.sqrt(L[:, None] / (tt[None, :] * (L[:, None] - tt[None, :]))) * (
                        tt[None, :] / L[:, None] * S_n[:, None] - S_tt
                    )
                else:  # CUSUM0
                    trans = S_tt / np.sqrt(tt[None, :].astype(np.float64))
            raw = np.where(mask, trans**2, -np.inf).max(axis=1)
            detect = raw - pen > 0
            if detect.any():
                return int(rows[int(np.argmax(detect))])
        return t_stop

    def _fast_scan(self, flat: np.ndarray, t: int, batch_scorer, chunk: int = 4096) -> int:
        """Return the first step >= t whose full-window test detects a change
        (or len(flat) if none). Windows are full and the candidate set fixed
        throughout — guaranteed by the caller."""
        W = self.max_window
        n = flat.shape[0]
        sw = np.lib.stride_tricks.sliding_window_view(flat, W)
        while t < n:
            hi = min(t + chunk, n)
            # rows t..hi-1: window after pushing flat[k] = flat[k-W+1..k],
            # newest first
            M = sw[t - W + 1 : hi - W + 1][:, ::-1]
            S = np.cumsum(M, axis=1)
            hits = batch_scorer(S)
            idx = np.nonzero(hits)[0]
            if idx.size:
                return t + int(idx[0])
            t = hi
        return n

    def predict(self) -> list:
        if not hasattr(self, "changepoints_"):
            raise RuntimeError(f"This {type(self).__name__} is not fitted yet.")
        return list(self.changepoints_)

    def fit_predict(self, values, times=None) -> list:
        return self.fit(values, times).predict()
