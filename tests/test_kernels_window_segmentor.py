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


def test_fast_paths_bit_identical_to_pure_loop():
    """The vectorized growth-phase and steady-state scans must reproduce the
    per-update loop exactly (same changepoints_ AND detections_) across
    estimators, candidate types, minsl values, and NaN-laced series."""
    import streamchange_spark.kernels.window_segmentor as ws_mod
    from streamchange_spark.kernels import BIC, CUSUM
    from streamchange_spark.kernels.amoc import CUSUM0

    cases = []
    for seed in range(8):
        r = np.random.default_rng(seed)
        n = int(r.integers(1, 300))
        x = r.normal(0, 1, n) + np.where(
            np.arange(n) > n // 2, r.choice([0, 4, 12]), 0
        )
        if seed % 3 == 0 and n > 5:
            x[r.integers(0, n, 2)] = np.nan
        cases.append(x)

    cfgs = [
        dict(est=lambda: CUSUM(penalty=BIC(scale=1.0)), kw=dict(min_window=4, max_window=100, minsl=1)),
        dict(est=lambda: CUSUM(penalty=BIC(scale=0.2)), kw=dict(min_window=2, max_window=50, minsl=5)),
        dict(est=lambda: CUSUM0(penalty=BIC(scale=1.0)), kw=dict(min_window=4, max_window=64, minsl=2)),
        dict(est=lambda: CUSUM(penalty=BIC(scale=1.0)),
             kw=dict(min_window=4, max_window=100, minsl=1,
                     candidate_type="geom", candidate_step=1.5)),
    ]
    orig = ws_mod.WindowSegmentor._batch_scorer
    try:
        for cfg in cfgs:
            for x in cases:
                det = ws_mod.WindowSegmentor(cfg["est"](), **cfg["kw"])
                det.fit(x)
                fast = (det.changepoints_, det.detections_)
                ws_mod.WindowSegmentor._batch_scorer = lambda self: None
                det = ws_mod.WindowSegmentor(cfg["est"](), **cfg["kw"])
                det.fit(x)
                slow = (det.changepoints_, det.detections_)
                ws_mod.WindowSegmentor._batch_scorer = orig
                assert fast == slow
    finally:
        ws_mod.WindowSegmentor._batch_scorer = orig


def test_readme_quickstart_ports_verbatim():
    """The reference README's stream-driver loop (iter_pandas + dict
    updates) must run unchanged and find the same change points as the
    batch fit (dict column order fixed by the first row — base.py:100-109
    quirk preserved)."""
    import pandas as pd

    from streamchange_spark.kernels import (
        BIC,
        CUSUM,
        WindowSegmentor,
        iter_pandas,
        simulate,
    )

    x = simulate([0, 20], [100], p=1, seed=2)
    df = pd.DataFrame(x, columns=["x"])
    detector = WindowSegmentor(CUSUM(penalty=BIC(scale=5.0)), 4, 100)
    stream_cpts = []
    for t, (xi, _) in enumerate(iter_pandas(df)):
        detector.update(xi)
        if detector.change_detected:
            stream_cpts += [t - cpt for cpt in detector.changepoints]

    batch = WindowSegmentor(CUSUM(penalty=BIC(scale=5.0)), 4, 100)
    batch.fit(x[:, 0])
    assert stream_cpts == [int(c) for _, c in batch.detections_]
    assert len(stream_cpts) >= 1
