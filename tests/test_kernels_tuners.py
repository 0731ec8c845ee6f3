"""Penalty tuner behaviour on the tuning fixture from FIXTURES.md §5
(means [0, 10, 0], seg_lens [1000, 100, 1000])."""

import numpy as np
import pytest

from streamchange_spark.kernels import (
    CUSUM,
    AMOCPenaltyTuner,
    GridPenaltyTuner,
    LordenPollakScore,
    SequentialChangeDetector,
    SequentialScorePenaltyTuner,
    WindowSegmentor,
    simulate,
)


@pytest.fixture(scope="module")
def tuning_series():
    return simulate([0, 10, 0], [1000, 100, 1000], p=1)[:, 0]


def test_grid_penalty_tuner(tuning_series):
    detector = WindowSegmentor(CUSUM(), 4, 100)
    tuner = GridPenaltyTuner(
        detector,
        target_detections=2,
        penalty_scales=np.geomspace(0.01, 100, 20),
        interpolate=False,
    )
    tuner.fit(tuning_series)
    tuned_count = len(tuner.detector_.changepoints_)
    assert abs(tuned_count - 2) <= 1
    # The chosen scale must come from the grid and minimize the error.
    errors = {s: abs(c - 2) for s, c in tuner.counts_.items()}
    assert errors[tuner.penalty_scale_] == min(errors.values())


def test_grid_penalty_tuner_interpolated(tuning_series):
    detector = WindowSegmentor(CUSUM(), 4, 100)
    tuner = GridPenaltyTuner(
        detector,
        target_detections=2,
        penalty_scales=np.geomspace(0.01, 100, 20),
        interpolate=True,
    )
    tuner.fit(tuning_series)
    assert tuner.penalty_scale_ > 0


def test_amoc_penalty_tuner(tuning_series):
    detector = WindowSegmentor(CUSUM(), 4, 100)
    tuner = AMOCPenaltyTuner(detector, target_detections=1)
    tuner.fit(tuning_series)
    assert tuner.penalty_scale_ > 0
    # With the tuned penalty the detector finds close to 1 change point.
    detector.reset()
    detector.fit(tuning_series)
    assert 1 <= len(detector.changepoints_) <= 3


def test_sequential_score_penalty_tuner(tuning_series):
    detector = SequentialChangeDetector(
        LordenPollakScore(rho=1.0).penalise(100.0),
        reset_on_change=True,
        restart_delay=0,
    )
    tuner = SequentialScorePenaltyTuner(
        detector, target_detections=5, score_value_margin=0.0
    )
    tuner.fit(tuning_series)
    assert tuner.penalty_ >= 0
    assert len(tuner.penalties) == 6
    # Penalties peel off in non-increasing order.
    assert all(a >= b for a, b in zip(tuner.penalties, tuner.penalties[1:]))


def test_sequential_tuner_margin_validation():
    detector = SequentialChangeDetector(LordenPollakScore().penalise(1.0))
    with pytest.raises(ValueError):
        SequentialScorePenaltyTuner(detector)
    with pytest.raises(ValueError):
        SequentialScorePenaltyTuner(detector, index_margin=1, score_value_margin=0.0)
