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
    """Return a list of {**stat values, start, end} segment dicts."""
    detector.reset()
    stat.reset()
    values = np.asarray(values, dtype=np.float64)

    # Dummy first segment so the loop can read segmentation[-1]["end"].
    init_stat = stat.get()
    init_stat.update({"start": -1, "end": -1})
    segmentation = [init_stat]
    for i in range(values.shape[0]):
        x = values[i]
        detector.update(x)
        stat.update(x)
        if detector.change_detected:
            for cpt in detector.changepoints:
                segment_stat = stat.get(cpt)
                segment_stat["start"] = segmentation[-1]["end"] + 1
                segment_stat["end"] = i - cpt
                segmentation.append(segment_stat)
                post_cpt_values = values[i - cpt + 1 : i + 1]
                segment_stat = stat.reset().update_many(post_cpt_values).get()

    last_stat = stat.get()
    last_stat["start"] = segmentation[-1]["end"] + 1
    last_stat["end"] = values.shape[0] - 1
    segmentation.append(last_stat)
    segmentation.pop(0)
    return segmentation
