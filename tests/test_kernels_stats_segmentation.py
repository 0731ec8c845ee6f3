"""Ported from /root/reference/tests/test_segment_stats.py and
test_fit_segmentation.py."""

import numpy as np
import pytest

from streamchange_spark.kernels import (
    CUSUM,
    Mean,
    MovingSum,
    StatBuffer,
    StatUnion,
    WindowSegmentor,
    fit_segmentation,
    simulate,
)


def test_moving_sum():
    ms = MovingSum(3)
    values = [1.0, 2.0, 3.0, 4.0, 5.0]
    expected = [1.0, 3.0, 6.0, 9.0, 12.0]
    for v, e in zip(values, expected):
        ms.update(v)
        assert ms.value == e
    ms.reset()
    assert ms.value == 0.0


def test_statbuffer_mean():
    series = simulate(seg_lens=[100], seed=34)[:, 0]
    stat = StatBuffer(Mean(), 20)
    for x in series:
        stat.update(x)

    assert stat.get() == stat.get(0)
    assert -1 <= stat.get() <= 1
    with pytest.raises(IndexError):
        stat.get(stat.max_history)

    stat.reset()
    assert abs(stat.get()) < 1e-8
    stat.update(1.0)
    with pytest.raises(IndexError):
        stat.get(1)


def test_stat_union():
    series = simulate(seg_lens=[100], seed=34)[:, 0]
    stat = StatUnion({"mean": StatBuffer(Mean())}, 20)
    for x in series:
        stat.update(x)

    with pytest.raises(IndexError):
        stat.get(stat.max_history)

    stat.reset()
    stat.update(1.0)
    with pytest.raises(IndexError):
        stat.get(1)


def test_fit_segmentation():
    seg_len = 50
    series = simulate([0, 10, 0], [seg_len], p=1)[:, 0]

    detector = WindowSegmentor(CUSUM(0), 2, 100)
    stat = StatUnion({"mean": StatBuffer(Mean())}, detector.max_window)
    segmentation = fit_segmentation(detector, stat, series)
    assert len(segmentation) == series.shape[0]

    detector = WindowSegmentor(CUSUM(20), 5, 100)
    segmentation = fit_segmentation(detector, stat.reset(), series)
    assert len(segmentation) == 3
    # Segments tile the series.
    assert segmentation[0]["start"] == 0
    assert segmentation[-1]["end"] == series.shape[0] - 1
    for prev, cur in zip(segmentation, segmentation[1:]):
        assert cur["start"] == prev["end"] + 1
