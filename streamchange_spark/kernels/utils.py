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


def has_method(obj, method_name) -> bool:
    """True iff ``obj.method_name`` exists and is callable (parity:
    /root/reference/streamchange/utils.py:23-25)."""
    return callable(getattr(obj, method_name, None))


class Profiler:
    """Tiny cProfile start/stop wrapper (parity: /root/reference/
    streamchange/utils.py:28-43) — used to profile kernel hot paths the
    same way the reference's interactive examples do."""

    def __init__(self):
        import cProfile

        self.pr = cProfile.Profile()

    def start(self):
        self.pr.enable()

    def stop(self):
        import io
        import pstats

        self.pr.disable()
        s = io.StringIO()
        pstats.Stats(self.pr, stream=s).sort_stats(
            pstats.SortKey.CUMULATIVE
        ).print_stats()
        print(s.getvalue())


def iter_pandas(X, y=None):
    """river.stream.iter_pandas-compatible row iterator (the reference
    README's stream driver: ``for t, (x, _) in enumerate(iter_pandas(df)):
    detector.update(x)``) — yields (row_dict, y_i) so the quickstart loop
    ports verbatim without the river dependency."""
    cols = list(X.columns)
    for i, row in enumerate(X.itertuples(index=False)):
        yield dict(zip(cols, row)), (y.iloc[i] if y is not None else None)
