"""Joint online change-point detection + per-segment running statistics.

Semantics parity with /root/reference/streamchange/conveniences/
fit_segmentation.py:8-38: stream the series through a detector and a StatUnion
together; on each detected change point read the stats as they were at the
change, stitch a segment record, then reset the stats and replay the
post-change values.
"""

from __future__ import annotations

import numpy as np

from .stats import StatUnion


def fit_segmentation(detector, stat: StatUnion, values: np.ndarray) -> list[dict]:
    """Return a list of {**stat values, start, end} segment dicts.

    On each detected change point the stats are read as they stood ``cpt``
    observations back (the segment's true end), the segment record is
    closed at ``prev_end + 1 .. i - cpt``, and the stats restart with the
    post-change observations replayed so the running state matches a fresh
    segment."""
    detector.reset()
    stat.reset()
    values = np.asarray(values, dtype=np.float64)

    segments: list[dict] = []
    prev_end = -1
    for i in range(values.shape[0]):
        detector.update(values[i])
        stat.update(values[i])
        if not detector.change_detected:
            continue
        for cpt in detector.changepoints:
            record = stat.get(cpt)
            record["start"] = prev_end + 1
            record["end"] = i - cpt
            prev_end = record["end"]
            segments.append(record)
            stat.reset().update_many(values[i - cpt + 1 : i + 1])

    tail = stat.get()
    tail["start"] = prev_end + 1
    tail["end"] = values.shape[0] - 1
    segments.append(tail)
    return segments
