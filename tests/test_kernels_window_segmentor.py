"""Ported from /root/reference/tests/test_window_segmentor.py."""

import numpy as np
import pytest

from streamchange_spark.kernels import BIC, CUSUM, CUSUM0, WindowSegmentor, simulate


def test_sane_accuracy():
    seg_len = 100
    x = simulate([0, 30], [seg_len], p=1, seed=2)
    detector = WindowSegmentor(CUSUM(penalty=BIC(scale=10)), 4, 100)
    cpts = []
    for t in range(x.shape[0]):
        detector.update(x[t])
        if detector.change_detected:
            cpts.append((t, list(detector.changepoints)))
    assert len(cpts) == 1
    assert cpts[0][0] == seg_len
    assert cpts[0][1][0] == 1
    # Fixture pin (FIXTURES.md): absolute changepoint index is 99.
    assert WindowSegmentor(CUSUM(penalty=BIC(scale=10)), 4, 100).fit_predict(x) == [99]


def test_varying_threshold():
    x = simulate([0, 10, 0], [100], p=1, seed=5)
    for penalty in [0.001, 0.1, 1, 2, 3, 4, 5, 10, 10000]:
        WindowSegmentor(CUSUM(penalty=penalty), 2, 100).fit(x)


def test_window_sizes():
    x = simulate([0, 10, 0, 10, 0], [30], p=1, seed=5)
    for min_window, max_window in zip([2, 10, 100], [2, 50, 500]):
        WindowSegmentor(CUSUM(), min_window, max_window).fit(x)

    with pytest.raises(Exception):
        WindowSegmentor(CUSUM(), 10, 9)
    with pytest.raises(Exception):
        WindowSegmentor(CUSUM(), 1, 10)

    x = simulate([0, 10, 0, 20, 0, 1, 0, 3, 5, 0, 4], [20], p=1, seed=34)
    detector = WindowSegmentor(CUSUM(penalty=10), 4, 100)
    most_recent_cpt = 0
    for t in range(x.shape[0]):
        detector.update(x[t])
        assert len(detector.window) <= detector.max_window
        assert len(detector.window) <= most_recent_cpt + 1
        if detector.change_detected:
            most_recent_cpt = detector.changepoints[-1]
        else:
            most_recent_cpt += 1


def test_minsl():
    x = simulate([0, 10, 0], [50], p=1, seed=5)
    for minsl in [1, 2, 10]:
        detector = WindowSegmentor(CUSUM(), minsl=minsl)
        detector.fit(x)
        cpts = np.array(detector.changepoints_)
        assert np.all(np.diff(cpts) >= minsl)

    with pytest.raises(Exception):
        WindowSegmentor(CUSUM(), 2, 10, 6)
    with pytest.raises(Exception):
        WindowSegmentor(CUSUM0(), 2, 10, 11)


def test_candidates():
    x = simulate([0, 10, 0], [50], p=1, seed=5)
    WindowSegmentor(CUSUM(), candidate_type="linear", candidate_step=2).fit(x)
    WindowSegmentor(CUSUM(), candidate_type="linear", candidate_step=5).fit(x)
    WindowSegmentor(CUSUM(), candidate_type="geom", candidate_step=1.1).fit(x)
    WindowSegmentor(CUSUM(), candidate_type="geom", candidate_step=2.0).fit(x)
    with pytest.raises(ValueError):
        WindowSegmentor(CUSUM(), candidate_type="geom", candidate_step=1.0)
    with pytest.raises(ValueError):
        WindowSegmentor(CUSUM(), candidate_type="nope")
