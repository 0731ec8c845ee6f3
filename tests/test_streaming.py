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


def test_streaming_rollup_matches_batch(spark, tmp_path):
    """Watermarked streaming 1h tier == batch rollup_raw on the same rows
    (closed buckets only; in-order files, availableNow)."""
    from streamchange_spark.operators import rollup_raw
    from streamchange_spark.streaming import streaming_rollup_raw

    rng = np.random.default_rng(9)
    n = 500
    ts = pd.to_datetime(
        1_704_067_200 + np.sort(rng.integers(0, 48 * 3600, n)), unit="s"
    )
    pdf = pd.DataFrame(
        {
            "key": rng.choice(["a", "b", "c"], n),
            "ts": ts,
            "value": rng.normal(10, 3, n),
        }
    )
    src = tmp_path / "roll_src"
    src.mkdir()
    for i, chunk in enumerate(np.array_split(np.arange(n), 5)):
        spark.createDataFrame(pdf.iloc[chunk]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"batch_{i}"))

    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch_*"))
    )
    tier = streaming_rollup_raw(stream, ["key"], "ts", "value", "1 hour", "1 hour")
    q = (
        tier.writeStream.format("memory")
        .queryName("tier_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from tier_out").toPandas()

    batch = (
        rollup_raw(spark.createDataFrame(pdf), ["key"], "ts", "value", "1h")
        .toPandas()
        .sort_values(["key", "bucket_start"])
        .reset_index(drop=True)
    )
    # Streaming append emits only watermark-closed buckets; every emitted
    # bucket must equal its batch twin exactly.
    assert len(got) > 0
    merged = got.merge(
        batch, on=["key", "bucket_start"], suffixes=("_s", "_b"), how="left"
    )
    assert merged["n_points_b"].notna().all()
    for c in ("n_points", "min_v", "max_v", "first_v", "last_v"):
        assert np.allclose(merged[f"{c}_s"], merged[f"{c}_b"], rtol=0, atol=0), c
    # sums accumulate incrementally across micro-batches: same values, ULP
    # -level reassociation noise
    assert np.allclose(merged["sum_v_s"], merged["sum_v_b"], rtol=1e-12, atol=0)
