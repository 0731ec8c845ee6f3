"""Structured Streaming detector: micro-batched stream == batch == oracle."""

import numpy as np
import pandas as pd
import pytest

from streamchange_spark.kernels import BIC, CUSUM, WindowSegmentor, simulate


def test_streaming_window_segmentor_matches_batch(spark, tmp_path):
    from streamchange_spark.streaming.detectors import streaming_window_segmentor

    x = simulate([0, 30], [100], p=1, seed=2)[:, 0]
    ts = pd.to_datetime(1_704_067_200 + 3600 * np.arange(x.size), unit="s")
    pdf = pd.DataFrame({"key": "k1", "ts": ts, "value": x})

    # Feed the series as several parquet files so the stream sees multiple
    # micro-batches (state must carry across batches).
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, chunk in enumerate(np.array_split(np.arange(len(pdf)), 4)):
        spark.createDataFrame(pdf.iloc[chunk]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"batch_{i}"))

    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch_*"))
    )
    cpts = streaming_window_segmentor(
        stream,
        lambda: WindowSegmentor(CUSUM(penalty=BIC(scale=10)), 4, 100),
        key_col="key",
        ts_col="ts",
        value_col="value",
    )
    query = (
        cpts.writeStream.format("memory")
        .queryName("cpts_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    got = spark.sql("select * from cpts_out").toPandas()

    oracle = WindowSegmentor(CUSUM(penalty=BIC(scale=10)), 4, 100)
    oracle.fit(x, times=ts.to_numpy())
    expected = sorted(pd.Timestamp(c) for _, c in oracle.detections_)
    assert sorted(got["changepoint_ts"]) == expected
    assert len(got) == 1  # pinned fixture: exactly one change at t=100
