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


def test_tuner_summarise_tables(tuning_series):
    """summarise() diagnostic tables (reference tuners.py:41-44,
    amoc/penalty_tuners.py:211-217, sequential/penalty_tuners.py:102-109):
    sorted by penalty_scale, counts/penalties consistent with fit state."""
    scales = np.geomspace(0.01, 100, 10)
    g = GridPenaltyTuner(
        WindowSegmentor(CUSUM(), 4, 100), target_detections=2,
        penalty_scales=scales, interpolate=False, refit=False,
    ).fit(tuning_series)
    gs = g.summarise()
    assert list(gs.columns) == ["penalty", "penalty_scale", "detection_count", "abs_error"]
    assert len(gs) == len(scales)
    assert (gs["penalty_scale"].diff().dropna() > 0).all()  # sorted
    default = g.detector.get_penalty().default_penalty()
    assert np.allclose(gs["penalty"], gs["penalty_scale"] * default)
    assert (gs["abs_error"] == (gs["detection_count"] - 2).abs()).all()
    # higher scale => no more detections (monotone non-increasing counts)
    assert (gs["detection_count"].diff().dropna() <= 0).all()

    a = AMOCPenaltyTuner(
        WindowSegmentor(CUSUM(), 4, 100), target_detections=3,
    ).fit(tuning_series)
    asm = a.summarise()
    assert list(asm.columns) == ["detection_count", "penalty", "penalty_scale"]
    assert len(asm) == 3
    assert set(asm["detection_count"]) == {1, 2, 3}
    assert np.allclose(
        asm["penalty"], asm["penalty_scale"] * a.detector.estimator.penalty.value
    )

    s = SequentialScorePenaltyTuner(
        SequentialChangeDetector(LordenPollakScore(rho=1.0).penalise(1.0)),
        target_detections=2, refit=False, index_margin=50,
    ).fit(tuning_series)
    ss = s.summarise()
    assert list(ss.columns) == ["detection_count", "penalty", "penalty_scale"]
    assert len(ss) == 3  # 0..target detections
    # penalties are peeled in descending order; the tuned scale is the
    # k-th max == the smallest after the ascending summarise sort
    assert ss["penalty_scale"].min() == s.penalty_scale_

    # unfitted -> RuntimeError (reference _check_is_fitted contract)
    for tuner in (
        GridPenaltyTuner(WindowSegmentor(CUSUM(), 4, 100), 1),
        AMOCPenaltyTuner(WindowSegmentor(CUSUM(), 4, 100)),
    ):
        with pytest.raises(RuntimeError):
            tuner.summarise()
