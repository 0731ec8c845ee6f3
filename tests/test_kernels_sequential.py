"""Ported from /root/reference/tests/test_sequential_detector.py."""

import numpy as np
import pytest

from streamchange_spark.kernels import (
    AggregatedScore,
    CUSUM0Score,
    LordenPollakScore,
    PenalisedScore,
    SequentialChangeDetector,
    simulate,
)

SCORE_CLASSES = [LordenPollakScore, CUSUM0Score]


@pytest.mark.parametrize("score_class", SCORE_CLASSES)
def test_nochange(score_class):
    x = simulate(seed=145)[:, 0]
    x_multivar = simulate(seed=145, p=5)

    score = score_class()
    score.fit(x)
    assert np.all(score.values_ >= 0.0)

    penalty = 100000
    penalised = score_class().penalise(penalty)
    penalised.fit(x)
    assert np.all(penalised.values_ < 0.0)

    agg = AggregatedScore(score_class(), aggregator=np.sum).penalise(penalty)
    detector = SequentialChangeDetector(agg, reset_on_change=True, restart_delay=50)
    detector.fit(x_multivar)
    assert len(detector.alarms_) == 0
    assert np.all(detector.penalised_scores_ < 0.0)


@pytest.mark.parametrize("score_class", SCORE_CLASSES)
def test_change(score_class):
    seg_len = 50
    x = simulate(means=[0, 30], seg_lens=[seg_len], seed=145)[:, 0]
    x_multivar = simulate(means=[0, 30], seg_lens=[seg_len], seed=145, p=5)

    score = score_class()
    score.fit(x)
    assert np.all(score.values_ >= 0.0)

    penalty = 1.0
    penalised = score_class().penalise(penalty)
    penalised.fit(x)
    assert np.any(penalised.values_ >= 0.0)

    agg = AggregatedScore(score_class(), aggregator=np.sum).penalise(penalty)
    detector = SequentialChangeDetector(agg, reset_on_change=True, restart_delay=50)
    detector.fit(x_multivar)
    assert len(detector.alarms_) > 0
    assert np.any(detector.penalised_scores_ >= 0.0)


def test_penalised_score_initial_value():
    s = PenalisedScore(LordenPollakScore(), 7.0)
    assert s.value == -7.0


def test_restart_delay_suppresses_updates():
    x = simulate(means=[0, 30], seg_lens=[50], seed=145)[:, 0]
    det = SequentialChangeDetector(
        LordenPollakScore().penalise(1.0), reset_on_change=True, restart_delay=10
    )
    det.fit(x)
    # After each alarm, at least restart_delay points pass before the next.
    alarms = np.array(det.alarms_)
    if alarms.size > 1:
        assert np.all(np.diff(alarms) > 10)
