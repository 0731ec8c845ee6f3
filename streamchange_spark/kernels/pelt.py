"""Online bounded-window optimal partitioning (PELT-style, no pruning).

Semantics parity with /root/reference/streamchange/pelt/pelt.py and costs.py:
per update the optimal segmentation cost is recomputed over a bounded window
via a right-cumulative L2 cost; the per-update ``last_cpt`` trail is walked
backwards at the end to extract segments. The reference deliberately omits
pruning in the online variant (pelt/pelt.py:54 ``TODO: Add pruning.``) —
preserved as the default for parity; ``Pelt(prune=True)`` opts in to the
OfflinePelt admissible-set rule (equivalent outputs, O(admissible) instead
of O(maxsl) per update — the right setting for 100x larger maxsl). The
pruned offline variant lives in offline_pelt.py.
"""

from __future__ import annotations

import numpy as np

from .penalties import BIC, BasePenalty, as_penalty
from .utils import dropna_series
from .window_segmentor import RingBuffer


class L2Cost:
    """Gaussian fixed-variance mean-change cost.

    ``opt(x)`` = n * var(x) + penalty; ``cumopt(x)`` = cumulative-from-the-
    newest costs via one cumsum (parity: pelt/costs.py:25-54).
    """

    def __init__(self, penalty: BasePenalty | float = None):
        self.penalty = as_penalty(BIC() if penalty is None else penalty)

    def opt(self, x: np.ndarray) -> float:
        if x.ndim == 1:
            x = x.reshape(-1, 1)
        return x.shape[0] * x.var(axis=0).sum() + self.penalty()

    def cumopt(self, x: np.ndarray) -> np.ndarray:
        if x.ndim == 1:
            x = x.reshape(-1, 1)
        x = x[:, 0]
        sums = np.cumsum(x)
        sums2 = np.cumsum(x**2)
        k = np.arange(1, x.shape[0] + 1)
        return (sums2 - sums**2 / k) + self.penalty()


class Pelt:
    """Streaming optimal partitioning over a bounded window.

    Assumes the series is standardized by the caller. ``changepoints_`` after
    ``fit`` lists segment ends of segments_[1:], which come out in
    *descending* time order (parity quirk: pelt/pelt.py:83, asserted by the
    reference's tests/test_pelt.py:12-13).
    """

    def __init__(
        self,
        cost: L2Cost = None,
        minsl: int = 1,
        maxsl: int = 1000,
        prune: bool = False,
    ):
        assert minsl >= 1
        assert maxsl > minsl
        self.minsl = minsl
        self.maxsl = maxsl
        self.prune = prune
        self.cost = cost if cost is not None else L2Cost()
        self.reset()

    def reset(self) -> "Pelt":
        self.window = RingBuffer(self.maxsl)
        self.opt_cost = RingBuffer(self.maxsl)
        self.opt_cost.push(-self.cost.penalty())
        self.last_cpt = 0
        # prune=True state: admissible candidates as absolute start indices
        # (descending == ascending segment length), deferred removals, and
        # the monotone update counter they are keyed by
        self._adm = np.empty(0, dtype=np.int64)
        self._pending_kills: dict[int, np.ndarray] = {}
        self._t = 0
        return self

    def get_penalty(self):
        return self.cost.penalty

    @property
    def change_detected(self) -> bool:
        return self.last_cpt > 0

    def update(self, x) -> "Pelt":
        self.window.push(x)
        self._t += 1
        n = len(self.window)
        if n >= self.minsl:
            if self.prune:
                return self._update_pruned(n)
            opt_costs = self.opt_cost.newest_first[self.minsl - 1 :]
            costs = self.cost.cumopt(self.window.newest_first)[self.minsl - 1 :]
            candidate_costs = opt_costs + costs
            best = int(np.argmin(candidate_costs))
            self.last_cpt = self.minsl + best
            self.opt_cost.push(candidate_costs[best])
        else:
            self.opt_cost.push(
                self.opt_cost.newest_first[0] + self.cost.opt(self.window.newest_first)
            )
        return self

    def _update_pruned(self, n: int) -> "Pelt":
        """DP step over the ADMISSIBLE candidate set only (the OfflinePelt
        pruning rule applied to the online bounded window): a candidate
        whose total cost exceeded the step optimum can never become optimal
        again (L2's SSE is superadditive under concatenation, so it stays
        strictly dominated by the segment starting right after the failing
        step). With minsl > 1 that dominating candidate only ENTERS the DP
        minsl steps later, so removal is deferred until then — pruning at
        the failing step itself would be unsafe (and measurably diverges).
        The reversed cumulative cost is computed only up to the oldest
        admissible candidate — identical prefix arithmetic to the unpruned
        ``cumopt`` (same reversed order, same cumsums), so surviving
        candidates' costs are bit-identical and the argmin picks the same
        k. Per-update cost drops from O(maxsl) to O(oldest admissible
        age), the classic PELT expected-O(1) amortized candidate set."""
        pen = self.cost.penalty()
        T = self._t  # monotone update counter
        adm = self._adm  # np.int64 array of start indices, DESCENDING
        dead = self._pending_kills.pop(T, None)
        if dead is not None and len(adm):
            adm = adm[np.isin(adm, dead, invert=True)]
        # candidates as absolute start indices: new k=minsl candidate is
        # s = T - minsl (largest s -> shortest segment, listed first to
        # mirror the unpruned ascending-k order); window bound k <= n means
        # s >= T - n, a suffix cut on the descending-sorted array
        if len(adm):
            cut = int(np.searchsorted(-adm, -(T - n), side="right"))
            adm = adm[:cut]
        adm = np.concatenate((np.asarray([T - self.minsl], dtype=np.int64), adm))
        ks = T - adm
        kmax = int(ks[-1])
        # cumopt over only the newest kmax points: cumsum prefixes are
        # position-local, so entries < kmax match the full-window cumopt
        # bit for bit
        costs = self.cost.cumopt(self.window.newest_first[:kmax])
        oc_nf = self.opt_cost.newest_first
        cand = oc_nf[ks - 1] + costs[ks - 1]
        best = int(np.argmin(cand))
        self.last_cpt = int(ks[best])
        opt = cand[best]
        self.opt_cost.push(opt)
        bad = (cand - pen) > opt
        if bad.any():
            # apply once the dominating candidate (start index T) is in the
            # set, i.e. at update T + minsl
            fails = adm[bad]
            prev = self._pending_kills.get(T + self.minsl)
            self._pending_kills[T + self.minsl] = (
                fails if prev is None else np.concatenate((prev, fails))
            )
        self._adm = adm
        return self

    @staticmethod
    def extract_segments(last_cpts: np.ndarray, times) -> list:
        """Walk the last-change trail backwards into segment dicts
        (parity: pelt/pelt.py:57-72)."""
        segments = []
        i = -1
        size = len(last_cpts)
        while i >= -size:
            cpt_i = int(last_cpts[i])
            # cpt_i == 0 happens only for t < minsl (the DP never ran there);
            # the reference walk would stall forever on such a point — emit a
            # single-point segment and keep moving instead.
            step = max(cpt_i, 1)
            segments.append(
                {
                    "start": times[i - step + 1],
                    "end": times[i],
                    "size": step,
                }
            )
            i -= step
        return segments

    def fit(self, values: np.ndarray, times=None) -> "Pelt":
        self.reset()
        values, times = dropna_series(values, times)
        if values.ndim == 2:
            values = values[:, 0]
        n = values.shape[0]
        if n < self.minsl:
            # Too short to ever set last_cpt > 0; the reference's backward
            # extraction would loop forever here (pelt/pelt.py:57-72 with
            # last_cpt == 0). Treat the whole series as one segment.
            self.segments_ = (
                [{"start": times[0], "end": times[-1], "size": n}] if n else []
            )
            self.changepoints_ = []
            return self
        last_cpts = np.empty(n, dtype=np.int64)
        if type(self.cost) is L2Cost and not self.prune:
            # Batch replay of update(): identical arithmetic (same reversed
            # slices, same cumsums, same argmin tie-breaks) but with array
            # VIEWS instead of per-update RingBuffer reversal copies and a
            # precomputed k-vector — ~5x faster, bit-identical.
            pen = self.cost.penalty()
            maxsl, minsl = self.maxsl, self.minsl
            ks = np.arange(1, maxsl + 1, dtype=float)
            # oc[j] = optimal cost after consuming j points; oc[0] = -penalty
            oc = np.empty(n + 1)
            oc[0] = -pen

            steady0 = maxsl - 1  # first t with a full window (m == maxsl)
            for t in range(min(n, minsl - 1)):
                # sub-minsl warm-up: no candidates yet
                v_rev = values[: t + 1][::-1]
                oc[t + 1] = oc[t] + self.cost.opt(v_rev)
                self.last_cpt = 0
                last_cpts[t] = 0
            if n > minsl - 1:
                # Growth phase (m = t+1 < maxsl): every window ends at t and
                # reaches back to 0, so a block of rows shares one clipped
                # gather values[t-k] (garbage where k > t is never read —
                # cumsum at position k depends only on columns <= k, and row
                # t consumes exactly its first m entries). Same sequential
                # axis-1 cumsum + elementwise cost algebra as the per-t
                # path -> bit-identical; the DP feedback stays per-row.
                grow_end = min(n, steady0)
                bs = minsl - 1
                while bs < grow_end:
                    # bound blk * mmax = blk * (bs + blk) ~ 1M doubles
                    blk = max(64, int((-bs + (bs * bs + (1 << 22)) ** 0.5) // 2))
                    be = min(bs + blk, grow_end)
                    mmax = be  # longest window in the block (row be-1)
                    idx = np.arange(bs, be)[:, None] - np.arange(mmax)[None, :]
                    w_rev = values[np.maximum(idx, 0)]
                    cs = np.cumsum(w_rev, axis=1)
                    cs2 = np.cumsum(w_rev**2, axis=1)
                    costs_blk = (cs2 - cs**2 / ks[None, :mmax]) + pen
                    for t in range(bs, be):
                        m = t + 1
                        # opt costs newest-first, skipping the minsl-1 newest:
                        # oc[t-minsl+1], oc[t-minsl], ..., oc[t+1-m]
                        cand = (
                            oc[t + 1 - m : t - minsl + 2][::-1]
                            + costs_blk[t - bs, minsl - 1 : m]
                        )
                        best = int(np.argmin(cand))
                        last_cpts[t] = minsl + best
                        oc[t + 1] = cand[best]
                    bs = be
                self.last_cpt = int(last_cpts[min(n, steady0) - 1])
            if n > steady0:
                # Steady state: every window has length maxsl, so the
                # per-t reversed-window cumsums become one 2-D cumsum over a
                # strided view per BLOCK of t's (row t == the exact v_rev of
                # the per-t path; axis-1 cumsum is the same sequential
                # accumulation, elementwise cost algebra unchanged ->
                # bit-identical). Only the DP feedback (oc slice + argmin)
                # stays per-row: 2 small NumPy calls instead of ~8.
                from numpy.lib.stride_tricks import sliding_window_view

                wins = sliding_window_view(values, maxsl)
                blk = max(1, (1 << 20) // maxsl)
                for bs in range(steady0, n, blk):
                    be = min(bs + blk, n)
                    w_rev = wins[bs - maxsl + 1 : be - maxsl + 1][:, ::-1]
                    cs = np.cumsum(w_rev, axis=1)
                    cs2 = np.cumsum(w_rev**2, axis=1)
                    costs_blk = (cs2 - cs**2 / ks[None, :maxsl]) + pen
                    costs_tail = costs_blk[:, minsl - 1 :]
                    for j in range(be - bs):
                        t = bs + j
                        cand = oc[t + 1 - maxsl : t - minsl + 2][::-1] + costs_tail[j]
                        best = int(np.argmin(cand))
                        last_cpts[t] = minsl + best
                        oc[t + 1] = cand[best]
                self.last_cpt = int(last_cpts[n - 1])
            # leave streaming state consistent with a loop replay
            self.window.load(values[max(0, n - maxsl) :])
            self.opt_cost.load(oc[max(0, n + 1 - maxsl) :])
        else:
            for t in range(n):
                self.update(values[t])
                last_cpts[t] = self.last_cpt
        self.segments_ = self.extract_segments(last_cpts, times)
        self.changepoints_ = [s["end"] for s in self.segments_[1:]]
        return self

    def predict(self) -> list:
        if not hasattr(self, "segments_"):
            raise RuntimeError(f"This {type(self).__name__} is not fitted yet.")
        return [dict(s) for s in self.segments_]

    def fit_predict(self, values, times=None) -> list:
        return self.fit(values, times).predict()
