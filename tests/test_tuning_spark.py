"""Spark grid-tuner fan-out == serial kernel tuner, per key."""

import numpy as np
import pandas as pd

from streamchange_spark.kernels import CUSUM, GridPenaltyTuner, WindowSegmentor, simulate
from streamchange_spark.operators.tuning import (
    grid_detection_counts,
    tune_penalty_scales,
)

SCALES = list(np.geomspace(0.05, 50, 12))
FIXTURES = {
    "two-changes": dict(means=[0, 10, 0], seg_lens=[200, 50, 200], p=1, seed=10),
    "one-change": dict(means=[0, 8], seg_lens=[150], p=1, seed=3),
}


def _factory():
    return WindowSegmentor(CUSUM(), 4, 100)


def test_grid_counts_match_serial(spark):
    frames = [
        pd.DataFrame({"key": k, "t": np.arange(simulate(**kw).shape[0]),
                      "value": simulate(**kw)[:, 0]})
        for k, kw in FIXTURES.items()
    ]
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    got = grid_detection_counts(
        df, _factory, SCALES, key_cols=["key"], ts_col="t", value_cols=["value"]
    ).toPandas()
    assert len(got) == len(SCALES) * len(FIXTURES)
    for key, kw in FIXTURES.items():
        x = simulate(**kw)[:, 0]
        for s in SCALES:
            det = _factory()
            det.get_penalty().scale = s
            expected = len(det.fit_predict(x))
            actual = got[(got.key == key) & (np.isclose(got.penalty_scale, s))][
                "detection_count"
            ].iloc[0]
            assert actual == expected, (key, s)


def test_tune_penalty_scales(spark):
    frames = [
        pd.DataFrame({"key": k, "t": np.arange(simulate(**kw).shape[0]),
                      "value": simulate(**kw)[:, 0]})
        for k, kw in FIXTURES.items()
    ]
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    tuned = tune_penalty_scales(
        df, _factory, target_detections=1, penalty_scales=SCALES,
        key_cols=["key"], ts_col="t", value_cols=["value"], interpolate=False,
    ).set_index("key")
    # Serial reference: kernel tuner on each key directly.
    for key, kw in FIXTURES.items():
        x = simulate(**kw)[:, 0]
        serial = GridPenaltyTuner(
            _factory(), target_detections=1,
            penalty_scales=np.asarray(SCALES), interpolate=False, refit=False,
        ).fit(x)
        assert tuned.loc[key, "penalty_scale_"] == serial.penalty_scale_
