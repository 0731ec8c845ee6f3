"""Bucketed tables: co-located joins and groupBy without an Exchange."""

import pytest
from pyspark.sql import functions as F

from streamchange_spark.sources import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    left = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("user_id"), F.col("id").alias("event_id"),
        (F.col("id") * 1.5).alias("value"),
    )
    right = spark.range(0, 97).select(
        F.col("id").alias("user_id"), F.concat(F.lit("u"), F.col("id")).alias("name")
    )
    write_bucketed(left, "ev_b", ["user_id"], n_buckets=8,
                   sort_cols=["user_id", "event_id"], path=str(base / "ev"))
    write_bucketed(right, "us_b", ["user_id"], n_buckets=8,
                   sort_cols=["user_id"], path=str(base / "us"))
    return read_bucketed(spark, "ev_b"), read_bucketed(spark, "us_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = left.groupBy("user_id").agg(F.sum("value").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 97


def test_path_read_loses_bucketing_documented(spark, bucketed_pair, tmp_path):
    """The docstring's warning is real: reading the same files by path (not
    catalog) reintroduces the exchange."""
    left, _ = bucketed_pair
    loc = (
        spark.sql("DESCRIBE FORMATTED ev_b")
        .where(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    by_path = spark.read.parquet(loc)
    plan = (
        by_path.groupBy("user_id").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan


def test_clustered_read_required_for_assume_partitioned(spark, tmp_path_factory):
    """Auto-bucketed-scan silently drops bucket-per-partition reads for
    plans with no distribution requirement (mapInPandas has none) and then
    splits bucket files by size. read_bucketed(clustered=True) pins the
    guarantee grouped_apply(assume_partitioned=True) depends on."""
    base = tmp_path_factory.mktemp("bucketed_clustered")
    df = spark.range(0, 400_000, 1, 16).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, "probe_clustered", ["k"], n_buckets=8, path=str(base / "t"))
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_auto = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    try:
        # tiny scan partitions make the file-split behavior visible
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")

        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
        pdf = (
            spark.table("probe_clustered")
            .select("k", F.spark_partition_id().alias("pid"))
            .toPandas()
        )
        split_default = int((pdf.groupby("k")["pid"].nunique() > 1).sum())

        clustered = read_bucketed(spark, "probe_clustered", clustered=True)
        pdf2 = clustered.select("k", F.spark_partition_id().alias("pid")).toPandas()
        split_clustered = int((pdf2.groupby("k")["pid"].nunique() > 1).sum())

        # the hazard is real on this table AND the clustered read fixes it
        assert split_default > 0
        assert split_clustered == 0
        assert pdf2.pid.nunique() == 8  # one partition per bucket
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", "4194304")
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old_auto
        )


def test_sorted_bucketed_sessionize_no_exchange_no_sort(spark, tmp_path_factory):
    """One-file-per-bucket sorted layout + enable_sorted_bucketed_scan:
    the sessionize window pipeline plans ZERO Exchange and ZERO Sort, and
    the results equal the plain (shuffle+sort) path. This is the layout
    that moves session_stats' sort to write time at 100 TB."""
    from streamchange_spark.operators import session_stats
    from streamchange_spark.sources import enable_sorted_bucketed_scan

    base = tmp_path_factory.mktemp("srtbkt")
    df = spark.range(0, 5000).select(
        F.concat(F.lit("u"), (F.col("id") % 73)).alias("url"),
        F.timestamp_seconds(
            F.lit(1700000000)
            + (F.col("id") % 73) * 17
            + (F.col("id") / 73).cast("long") * 40000
        ).alias("warc_ts"),
    )
    # repartition on the bucket column with n_buckets partitions -> each
    # write task holds exactly one bucket -> one file per bucket
    write_bucketed(df.repartition(8, "url"), "pages_srt_t", ["url"],
                   n_buckets=8, sort_cols=["url", "warc_ts"],
                   path=str(base / "pages"))
    prev = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    try:
        enable_sorted_bucketed_scan(spark)
        out = session_stats(read_bucketed(spark, "pages_srt_t"),
                            ["url"], "warc_ts", 86400.0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Sort" not in plan, plan
        got = out.toPandas().sort_values(["url", "session_id"], ignore_index=True)
    finally:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", prev)
    plain = (
        session_stats(df, ["url"], "warc_ts", 86400.0)
        .toPandas()
        .sort_values(["url", "session_id"], ignore_index=True)
    )
    assert got.equals(plain)


def test_suggest_n_buckets(spark):
    """Power of two, never below cluster slots (one-file-per-bucket reads
    cap parallelism at n_buckets and AQE can't split a bucket file), grows
    with table size."""
    from streamchange_spark.sources import suggest_n_buckets

    slots = spark.sparkContext.defaultParallelism
    n_small = suggest_n_buckets(spark, target_rows=1000)
    assert n_small >= slots
    assert n_small & (n_small - 1) == 0  # power of two
    # 1 TB at 256 MB targets -> 4096 buckets, dwarfing the slots floor
    n_big = suggest_n_buckets(spark, table_bytes=1 << 40)
    assert n_big == 4096
    # size estimate from rows: 10M rows * 200 B = 2 GB -> 8 partitions,
    # still subject to the slots floor and power-of-two rounding
    n_rows = suggest_n_buckets(spark, target_rows=10_000_000)
    assert n_rows >= max(slots, 8)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        suggest_n_buckets(spark)


def test_sorted_bucketed_plan_holds_at_suggested_bucket_count(
    spark, tmp_path_factory
):
    """The zero-Exchange/zero-Sort sorted layout is not an artifact of the
    8-bucket fixture: rebuild at a DIFFERENT count (via suggest_n_buckets)
    and the sessionize plan still runs straight off the scan."""
    from streamchange_spark.operators import session_stats
    from streamchange_spark.sources import (
        enable_sorted_bucketed_scan,
        suggest_n_buckets,
    )

    base = tmp_path_factory.mktemp("srtbkt_n")
    df = spark.range(0, 4000).select(
        F.concat(F.lit("u"), (F.col("id") % 61)).alias("url"),
        F.timestamp_seconds(
            F.lit(1700000000)
            + (F.col("id") % 61) * 13
            + (F.col("id") / 61).cast("long") * 50000
        ).alias("warc_ts"),
    )
    n = suggest_n_buckets(spark, target_rows=4000)
    assert n != 8  # actually a different count than the sibling test
    write_bucketed(df.repartition(n, "url"), "pages_srt_n_t", ["url"],
                   n_buckets=n, sort_cols=["url", "warc_ts"],
                   path=str(base / "pages"))
    prev = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    try:
        enable_sorted_bucketed_scan(spark)
        out = session_stats(read_bucketed(spark, "pages_srt_n_t"),
                            ["url"], "warc_ts", 86400.0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Sort" not in plan, plan
        got = out.toPandas().sort_values(["url", "session_id"], ignore_index=True)
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", prev
        )
    plain = (
        session_stats(df, ["url"], "warc_ts", 86400.0)
        .toPandas()
        .sort_values(["url", "session_id"], ignore_index=True)
    )
    assert got.equals(plain)


def test_sorted_bucketed_state_tier_no_exchange_no_sort(
    spark, tmp_path_factory
):
    """The time-in-state tier over the sorted one-file-per-bucket layout:
    the lead window needs no sort (scan reports the (url, warc_ts) order)
    and the (url, bucket, state) groupBy needs no exchange
    (HashPartitioning(url) clusters every group) — ZERO Exchange, ZERO
    Sort end to end, results equal the plain path. This is the 2.1-2.2x
    layout win BASELINE.md measures for the state stage."""
    from streamchange_spark.operators import state_tier
    from streamchange_spark.sources import enable_sorted_bucketed_scan

    base = tmp_path_factory.mktemp("srtstate")
    df = spark.range(0, 5000).select(
        F.concat(F.lit("u"), (F.col("id") % 73)).alias("url"),
        F.timestamp_seconds(
            F.lit(1700000000)
            + (F.col("id") % 73) * 17
            + (F.col("id") / 73).cast("long") * 2000
        ).alias("warc_ts"),
        F.concat(F.lit("s"), (F.col("id") % 3)).alias("lang"),
    )
    write_bucketed(df.repartition(8, "url"), "pages_srt_state", ["url"],
                   n_buckets=8, sort_cols=["url", "warc_ts"],
                   path=str(base / "pages"))
    prev = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    try:
        enable_sorted_bucketed_scan(spark)
        out = state_tier(read_bucketed(spark, "pages_srt_state"),
                         ["url"], "warc_ts", "lang", "1h")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Sort" not in plan, plan
        got = sorted(tuple(r) for r in out.collect())
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", prev
        )
    plain = sorted(
        tuple(r) for r in state_tier(df, ["url"], "warc_ts", "lang", "1h").collect()
    )
    assert got == plain
