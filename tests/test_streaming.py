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


def _run_stream(spark, tmp_path, pdf, op, name, n_batches=4):
    """Write pdf as several parquet files, run `op(stream)` with
    availableNow, return the collected output."""
    src = tmp_path / f"{name}_src"
    src.mkdir()
    for i, chunk in enumerate(np.array_split(np.arange(len(pdf)), n_batches)):
        spark.createDataFrame(pdf.iloc[chunk]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"batch_{i}"))
    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch_*"))
    )
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(f"{name}_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"select * from {name}_out").toPandas()


def test_streaming_sequential_detector_matches_kernel_replay(spark, tmp_path):
    """Micro-batched streaming alarms == ordered kernel update() replay."""
    from streamchange_spark.kernels import (
        ConstantPenalty,
        LordenPollakScore,
        PenalisedScore,
        SequentialChangeDetector,
        simulate,
    )
    from streamchange_spark.streaming import streaming_sequential_detector

    x = simulate([0, 8], [60], p=1, seed=5)[:, 0]
    ts = pd.to_datetime(1_704_067_200 + 3600 * np.arange(x.size), unit="s")
    pdf = pd.DataFrame({"key": "k1", "ts": ts, "value": x})
    factory = lambda: SequentialChangeDetector(
        PenalisedScore(LordenPollakScore(rho=1.0), ConstantPenalty(8.0)),
        reset_on_change=True,
        restart_delay=3,
    )
    got = _run_stream(
        spark, tmp_path, pdf,
        lambda s: streaming_sequential_detector(s, factory), "seqdet",
    ).sort_values("detection_ts")

    oracle = factory()
    exp_ts, exp_score = [], []
    for v, t in zip(x, ts):
        oracle.update(v)
        if oracle.change_detected:
            exp_ts.append(t)
            exp_score.append(oracle.penalised_score.value)
    assert list(got["detection_ts"]) == exp_ts
    assert np.allclose(got["penalised_score"].to_numpy(), exp_score, rtol=0, atol=0)


def test_streaming_pelt_and_capa_match_kernel_replay(spark, tmp_path):
    """Per-update streaming state (Pelt last_cpt / Capa anomaly kind) ==
    ordered kernel update() replay across micro-batch boundaries."""
    from streamchange_spark.kernels import Capa, ConstMeanL2, ConstantPenalty, L2Cost, Pelt, simulate
    from streamchange_spark.streaming import streaming_capa, streaming_pelt

    x = simulate([0, 5, 0], [40], p=1, seed=6)[:, 0]
    x[25] += 12.0  # a point anomaly for capa
    ts = pd.to_datetime(1_704_067_200 + 3600 * np.arange(x.size), unit="s")
    pdf = pd.DataFrame({"key": "k1", "ts": ts, "value": x})

    pelt_factory = lambda: Pelt(L2Cost(ConstantPenalty(20.0)), minsl=2, maxsl=50)
    got_p = _run_stream(
        spark, tmp_path, pdf, lambda s: streaming_pelt(s, pelt_factory), "peltstream"
    ).sort_values("ts")
    oracle = pelt_factory()
    exp_lc = []
    for v in x:
        oracle.update(v)
        exp_lc.append(oracle.last_cpt)
    assert list(got_p["last_cpt"]) == exp_lc
    # absolute changepoint time for EVERY update, independently indexed into
    # the original ts array — covers the lc == len(times) boundary (the
    # changepoint at the first buffered observation)
    for i, (lc, got_ct) in enumerate(zip(exp_lc, got_p["changepoint_ts"])):
        exp_ct = ts[i + 1 - lc] if 0 < lc <= i + 1 else None
        if exp_ct is None:
            assert pd.isna(got_ct)
        else:
            assert got_ct == exp_ct

    capa_factory = lambda: Capa(
        ConstMeanL2(ConstantPenalty(15.0)), minsl=2, maxsl=50,
        predict_point_anomalies=True,
    )
    got_c = _run_stream(
        spark, tmp_path, pdf, lambda s: streaming_capa(s, capa_factory), "capastream"
    ).sort_values("ts")
    oracle = capa_factory()
    exp = []
    for v, t in zip(x, ts):
        oracle.update(v)
        if oracle.anomaly_start == 0:
            exp.append((t, "point"))
        elif oracle.anomaly_start > 0:
            exp.append((t, "collective"))
    assert list(zip(got_c["ts"], got_c["kind"])) == exp


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

    # Re-aggregability contract (module docstring): the streaming 1h tuples
    # feed the batch coarser tiers unchanged — rolling the streamed buckets
    # up to 1d equals rolling the batch 1h tier's matching buckets up to 1d.
    from streamchange_spark.operators import rollup_tier

    streamed_1h = spark.createDataFrame(got)
    batch_1h_closed = spark.createDataFrame(
        batch.merge(got[["key", "bucket_start"]], on=["key", "bucket_start"])
    )
    d_s = (
        rollup_tier(streamed_1h, ["key"], "1d")
        .toPandas()
        .sort_values(["key", "bucket_start"])
        .reset_index(drop=True)
    )
    d_b = (
        rollup_tier(batch_1h_closed, ["key"], "1d")
        .toPandas()
        .sort_values(["key", "bucket_start"])
        .reset_index(drop=True)
    )
    assert len(d_s) == len(d_b) > 0
    for c in ("n_points", "min_v", "max_v", "first_v", "last_v"):
        assert np.allclose(d_s[c], d_b[c], rtol=0, atol=0), c
    assert np.allclose(d_s["sum_v"], d_b["sum_v"], rtol=1e-12, atol=0)


def test_streaming_multivariate_sequential_matches_kernel(spark, tmp_path):
    """Multivariate streaming monitor (AggregatedScore p=2): the stream's
    per-update vectors reproduce the ordered kernel replay."""
    from streamchange_spark.kernels import (
        AggregatedScore,
        ConstantPenalty,
        LordenPollakScore,
        PenalisedScore,
        SequentialChangeDetector,
        simulate,
    )
    from streamchange_spark.streaming import streaming_sequential_detector

    x = simulate([0, 6], [50], p=2, seed=9)
    ts = pd.to_datetime(1_704_067_200 + 3600 * np.arange(x.shape[0]), unit="s")
    pdf = pd.DataFrame({"key": "k1", "ts": ts, "v1": x[:, 0], "v2": x[:, 1]})

    src = tmp_path / "mv_src"
    src.mkdir()
    for i, chunk in enumerate(np.array_split(np.arange(len(pdf)), 3)):
        spark.createDataFrame(pdf.iloc[chunk]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"batch_{i}"))
    stream = (
        spark.readStream.schema("key string, ts timestamp, v1 double, v2 double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch_*"))
    )
    factory = lambda: SequentialChangeDetector(
        PenalisedScore(AggregatedScore(LordenPollakScore(rho=1.0)), ConstantPenalty(20.0)),
        reset_on_change=True,
    )
    q = (
        streaming_sequential_detector(stream, factory, value_col=["v1", "v2"])
        .writeStream.format("memory")
        .queryName("mv_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from mv_out").toPandas().sort_values("detection_ts")

    oracle = factory()
    exp = []
    for row, t in zip(x, ts):
        oracle.update(row)
        if oracle.change_detected:
            exp.append((t, oracle.penalised_score.value))
    assert list(got["detection_ts"]) == [t for t, _ in exp]
    assert np.allclose(got["penalised_score"], [s for _, s in exp], rtol=0, atol=0)


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Watermarked session_window stream == batch session_stats on the same
    rows (closed sessions only; gaps never hit the threshold exactly, where
    the two boundary conventions coincide)."""
    from streamchange_spark.operators import session_stats
    from streamchange_spark.streaming import streaming_sessions

    rng = np.random.default_rng(11)
    rows = []
    for key in ("a", "b", "c", "d"):
        t = 1_704_067_200
        for _ in range(120):
            t += int(rng.choice([40, 300, 900, 1700, 1900, 7200]))
            rows.append((key, t, float(rng.normal(5, 2))))
    pdf = pd.DataFrame(rows, columns=["key", "epoch", "value"])
    pdf["ts"] = pd.to_datetime(pdf.pop("epoch"), unit="s")
    pdf = pdf.sort_values("ts").reset_index(drop=True)

    src = tmp_path / "sess_src"
    src.mkdir()
    for i, chunk in enumerate(np.array_split(np.arange(len(pdf)), 4)):
        spark.createDataFrame(pdf.iloc[chunk]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"batch_{i}"))

    stream = (
        spark.readStream.schema("key string, value double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch_*"))
    )
    sess = streaming_sessions(
        stream, ["key"], "ts", gap="30 minutes",
        watermark_delay="30 minutes", value_col="value",
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from sess_out").toPandas()

    batch = session_stats(
        spark.createDataFrame(pdf), ["key"], "ts", 1800.0, value_col="value"
    ).toPandas()
    assert len(got) > 0
    merged = got.merge(
        batch, on=["key", "session_start"], suffixes=("_s", "_b"), how="left"
    )
    # every emitted (closed) session exists in batch with identical stats
    assert merged["n_events_b"].notna().all()
    for c in ("session_end", "n_events", "duration_sec"):
        assert (merged[f"{c}_s"] == merged[f"{c}_b"]).all(), c
    assert np.allclose(merged["sum_value_s"], merged["sum_value_b"], rtol=1e-12)


def test_streaming_hopping_rollup_matches_batch(spark, tmp_path):
    """slide < width: the streaming tier's closed hopping windows equal the
    batch rollup_hopping on the same rows."""
    from streamchange_spark.operators import rollup_hopping
    from streamchange_spark.streaming import streaming_rollup_raw

    rng = np.random.default_rng(21)
    n = 300
    ts = pd.to_datetime(
        1_704_067_200 + np.sort(rng.integers(0, 12 * 3600, n)), unit="s"
    )
    pdf = pd.DataFrame(
        {"key": rng.choice(["a", "b"], n), "ts": ts, "value": rng.normal(0, 1, n)}
    )
    src = tmp_path / "hop_src"
    src.mkdir()
    for i, chunk in enumerate(np.array_split(np.arange(n), 3)):
        spark.createDataFrame(pdf.iloc[chunk]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    hop = streaming_rollup_raw(
        stream, ["key"], "ts", "value", width="1 hour",
        watermark_delay="30 minutes", slide="15 minutes",
    ).select("key", "bucket_start", "n_points", "sum_v", "min_v", "max_v")
    q = (
        hop.writeStream.format("memory").queryName("hop_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from hop_out").toPandas()

    batch = rollup_hopping(
        spark.createDataFrame(pdf), ["key"], "ts", "value",
        width="1 hour", slide="15 minutes",
    ).withColumnRenamed("window_start", "bucket_start").toPandas()
    assert len(got) > 0
    merged = got.merge(batch, on=["key", "bucket_start"],
                       suffixes=("_s", "_b"), how="left")
    assert merged["n_points_b"].notna().all()
    for c in ("n_points", "min_v", "max_v"):
        assert (merged[f"{c}_s"] == merged[f"{c}_b"]).all(), c
    assert np.allclose(merged["sum_v_s"], merged["sum_v_b"], rtol=1e-12)
