"""Ported from /root/reference/tests/test_amoc_tests.py against our kernels."""

import numpy as np
import pytest

from streamchange_spark.kernels import CUSUM, CUSUM0, MaxCUSUM, SumCUSUM, simulate

ESTIMATOR_CLASSES = [CUSUM, CUSUM0, MaxCUSUM, SumCUSUM]


@pytest.mark.parametrize("estimator_class", ESTIMATOR_CLASSES)
def test_cusum_nochange(estimator_class):
    x = simulate(seed=145)
    n = x.shape[0]
    estimator = estimator_class(0.0)
    estimator.fit(x)
    assert estimator.score > 0.0
    assert estimator.change_detected
    assert 1 <= estimator.changepoint <= n - 1


@pytest.mark.parametrize("estimator_class", ESTIMATOR_CLASSES)
def test_cusum_bigchange(estimator_class):
    seg_len = 50
    x = simulate(means=[30, 0], seg_lens=[seg_len], seed=145)
    estimator = estimator_class()
    estimator.fit(x)
    assert estimator.score > 0.0
    assert estimator.change_detected
    assert estimator.changepoint == seg_len


@pytest.mark.parametrize("estimator_class", ESTIMATOR_CLASSES)
def test_cusum_candidates(estimator_class):
    x = simulate(seg_lens=[50], seed=145)
    n = x.shape[0]
    estimator = estimator_class(0.0)
    for minsl in [1, 2, 5]:
        candidates = np.arange(minsl, n - minsl + 1)
        estimator.fit(x, candidates)
        assert minsl <= estimator.changepoint <= n - minsl

    x = simulate(means=[0, 30], seg_lens=[5])
    minsl = 6
    candidates = np.arange(minsl, x.shape[0] - minsl + 1)
    estimator = estimator_class(0.0)
    estimator.fit(x, candidates)
    assert estimator.changepoint is None
    assert not estimator.change_detected
    assert estimator.score < 0.0


@pytest.mark.parametrize("estimator_class", ESTIMATOR_CLASSES)
def test_cusum_nan(estimator_class):
    estimator = estimator_class(0.0)
    x = np.array([1, 1, 1, np.nan, 40, 40]).reshape(-1, 1)
    estimator.fit(x)
    assert not estimator.change_detected
    assert np.isnan(estimator.score)
