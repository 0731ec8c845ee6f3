"""Running segment statistics with bounded history.

Parity with /root/reference/streamchange/segment_stats/ (MovingSum, StatBuffer,
StatUnion). The reference delegates the actual statistics to ``river``; that
dependency is replaced by self-contained running aggregates (Mean via the
standard incremental update, Var via Welford, Quantile exact over a buffer).
"""

from __future__ import annotations

from collections import deque
from numbers import Number

import numpy as np


class MovingSum:
    """O(1) moving sum of the last ``window_size`` values (parity:
    segment_stats/sums.py:5-33 — subtract the evicted value, add the new)."""

    def __init__(self, window_size: int):
        self.window_size = window_size
        self.window = deque(maxlen=window_size)
        self.reset()

    def reset(self) -> "MovingSum":
        self.window.clear()
        self._sum = 0.0
        return self

    @property
    def value(self) -> float:
        return self._sum

    def update(self, x: Number) -> "MovingSum":
        if len(self.window) == self.window_size:
            self._sum -= self.window.popleft()
        self._sum += x
        self.window.append(x)
        return self


class Mean:
    """Incremental mean: mean += (x - mean) / n."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.n = 0
        self._mean = 0.0
        return self

    def get(self) -> float:
        return self._mean

    def update(self, x) -> "Mean":
        self.n += 1
        self._mean += (x - self._mean) / self.n
        return self


class Var:
    """Welford running variance (sample variance, ddof=1)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.n = 0
        self._mean = 0.0
        self._m2 = 0.0
        return self

    def get(self) -> float:
        return self._m2 / (self.n - 1) if self.n > 1 else 0.0

    def update(self, x) -> "Var":
        self.n += 1
        d = x - self._mean
        self._mean += d / self.n
        self._m2 += d * (x - self._mean)
        return self


class Quantile:
    """Exact running quantile over all seen values (the reference uses river's
    approximate P² algorithm; exactness is preferred here and documented)."""

    def __init__(self, q: float = 0.5):
        self.q = q
        self.reset()

    def reset(self):
        self._values = []
        return self

    def get(self) -> float:
        if not self._values:
            return 0.0
        return float(np.quantile(np.array(self._values), self.q))

    def update(self, x) -> "Quantile":
        self._values.append(float(x))
        return self


class BaseSegmentStat:
    """Running statistic that can be read ``i`` steps back in time."""

    def __init__(self, max_history=np.inf):
        assert max_history >= 1
        self.max_history = max_history

    def check_get(self, i: int):
        if i < 0:
            raise IndexError(f"i must be positive (i={i}).")
        if i >= self.max_history:
            raise IndexError(
                f"Cannot get value of segment stat beyond {self.max_history - 1} "
                f"steps back (i={i})."
            )

    def update_many(self, x: np.ndarray) -> "BaseSegmentStat":
        for value in np.asarray(x).ravel():
            self.update(value)
        return self


class StatBuffer(BaseSegmentStat):
    """A running statistic plus a ring of its historical values; ``get(i)``
    returns the value as of ``i`` updates ago (parity: stat_buffer.py:9-36)."""

    def __init__(self, stat, max_history=np.inf):
        super().__init__(max_history)
        self._proto = stat
        self.stat = stat
        self.reset()

    def reset(self) -> "StatBuffer":
        import copy

        self.stat = copy.deepcopy(self._proto)
        self.stat.reset()
        self._buffer = deque() if np.isinf(self.max_history) else deque(maxlen=int(self.max_history))
        return self

    def get(self, i: int = 0):
        self.check_get(i)
        if i == 0:
            return self.stat.get()
        return list(self._buffer)[i]

    def update(self, x) -> "StatBuffer":
        self.stat.update(x)
        self._buffer.appendleft(self.stat.get())
        return self

    def __len__(self):
        return len(self._buffer)


class StatUnion(BaseSegmentStat):
    """Named union of segment stats updated together (parity:
    stat_union.py:10-45); ``get(i)`` returns a dict of values i steps back."""

    def __init__(self, stats: dict, max_history=np.inf):
        super().__init__(max_history)
        for stat in stats.values():
            stat.max_history = max_history
        self.stats = stats

    def __getitem__(self, key):
        return self.stats[key]

    def __len__(self):
        return len(self.stats)

    def items(self):
        return self.stats.items()

    def values(self):
        return self.stats.values()

    def keys(self):
        return self.stats.keys()

    def reset(self) -> "StatUnion":
        for stat in self.stats.values():
            stat.reset()
        return self

    def get(self, i: int = 0) -> dict:
        self.check_get(i)
        return {name: stat.get(i) for name, stat in self.items()}

    def update(self, x) -> "StatUnion":
        for stat in self.stats.values():
            stat.update(x)
        return self
