"""Bottom-k (KMV) distinct-count sketch tier (operators/kmv.py).

Contract under test — the properties that justify the sketch over Spark's
native DataSketches HLL (whose HLL_4 compaction is merge-order sensitive):

1. merged tiers are BIT-IDENTICAL to direct builds (bottom-k is closed
   under union), at every tier depth;
2. output is invariant to input partitioning;
3. an under-full sketch is the exact distinct count; a full sketch's
   (k-1)/x_k estimate lands within the analytic RSE band;
4. the 60-bit hash matches DuckDB's ``('0x' || substr(md5(x),1,15))``
   reading exactly — the property that makes the driver oracle hash-exact.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from streamchange_spark.operators import (
    kmv_distinct,
    kmv_hash_col,
    kmv_hopping,
    kmv_rollup,
    kmv_tier,
)

K = 32


def _events(spark, n_rows=6000, n_users=500, seed_mod=7919):
    """Deterministic synthetic events: ~25 hourly buckets over 2 dense keys
    (>= K distinct users per hour — estimator branch) plus one sparse key
    with 5 users (< K — exact branch)."""
    dense = spark.range(n_rows).select(
        (F.col("id") % 2).cast("string").alias("site"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") % 90000)).alias("ts"),
        ((F.col("id") * seed_mod) % n_users).alias("uid"),
    )
    sparse = spark.range(40).select(
        F.lit("9").alias("site"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
        (F.col("id") % 5).alias("uid"),
    )
    return dense.unionByName(sparse)


def _snap(df):
    return sorted(
        tuple(r) for r in df.select("site", "bucket_start", "n_points", "kmv").collect()
    )


def test_merged_equals_direct_and_partition_invariant(spark):
    ev = _events(spark)
    t1h = kmv_tier(ev, ["site"], "ts", "uid", tier="1h", k=K)
    t1d_merged = kmv_rollup(t1h, ["site"], "1d", k=K)
    t1d_direct = kmv_tier(ev, ["site"], "ts", "uid", tier="1d", k=K)
    assert _snap(t1d_merged) == _snap(t1d_direct)

    t30_merged = kmv_rollup(t1d_merged, ["site"], "30d", k=K)
    t30_direct = kmv_tier(ev, ["site"], "ts", "uid", tier="30d", k=K)
    assert _snap(t30_merged) == _snap(t30_direct)

    t1h_b = kmv_tier(ev.repartition(13), ["site"], "ts", "uid", tier="1h", k=K)
    assert _snap(kmv_rollup(t1h_b, ["site"], "1d", k=K)) == _snap(t1d_merged)


def test_underfull_sketch_is_exact_and_full_sketch_within_rse(spark):
    ev = _events(spark)
    t1h = kmv_tier(ev, ["site"], "ts", "uid", tier="1h", k=K)
    est = {
        (r.site, r.bucket_start): (r.n_distinct_approx, r.n_points)
        for r in kmv_distinct(t1h, k=K).collect()
    }
    exact = {
        (r.site, r.b): r.x
        for r in ev.groupBy("site", F.date_trunc("hour", "ts").alias("b"))
        .agg(F.countDistinct("uid").alias("x"))
        .collect()
    }
    assert set(est) == set(exact)
    rse = 1.0 / math.sqrt(K - 2)
    saw_exact = saw_estimated = False
    for key, (approx, _n) in est.items():
        x = exact[key]
        if x < K:
            saw_exact = True
            assert approx == float(x), key
        else:
            saw_estimated = True
            assert abs(approx - x) / x < 4 * rse, (key, approx, x)
    assert saw_exact and saw_estimated, "fixture must exercise both branches"

    # totals ride along: n_points sums raw rows, not distincts
    n_rows = ev.count()
    assert sum(n for _, n in est.values()) == n_rows


def test_hash_matches_duckdb(spark):
    import duckdb

    vals = ["", "hello", "u4999", "https://example.com/a?b=c", "ü日本語", "123"]
    got = {
        r.s: r.h
        for r in spark.createDataFrame([(v,) for v in vals], "s string")
        .select("s", kmv_hash_col("s").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for v in vals:
        want = con.sql(
            "SELECT ('0x' || substr(md5(?),1,15))::BIGINT", params=[v]
        ).fetchone()[0]
        assert got[v] == want, v
    assert all(0 <= h < (1 << 60) for h in got.values())


def test_validation(spark):
    ev = _events(spark, n_rows=10)
    with pytest.raises(ValueError, match="unknown tier"):
        kmv_tier(ev, ["site"], "ts", "uid", tier="5m")
    with pytest.raises(ValueError, match="k must be"):
        kmv_tier(ev, ["site"], "ts", "uid", k=1)
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(ev, k=0)


def test_nulls_excluded(spark):
    ev = _events(spark, n_rows=100).withColumn(
        "uid", F.when(F.col("uid") % 5 == 0, None).otherwise(F.col("uid"))
    )
    t = kmv_tier(ev, ["site"], "ts", "uid", tier="30d", k=K)
    n_points = sum(r.n_points for r in t.collect())
    assert n_points == ev.where(F.col("uid").isNotNull()).count()


def test_plan_shape(spark):
    """The tier plan the docstring promises: column-pruned scan, map-side
    partial dedupe, a WindowGroupLimit cap on the rank window, and NO
    exchange between the window and the final per-bucket groupBy (they
    share the (keys, bucket) partitioning); the 1h->1d merge adds exactly
    one more exchange of array rows."""
    ev = _events(spark, n_rows=500)
    out = kmv_rollup(kmv_tier(ev, ["site"], "ts", "uid", tier="1h", k=K), ["site"], "1d", k=K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 3  # dedupe, rank, merge — nothing else


def test_hopping_equals_direct_window_build(spark):
    """Sliding-window sketches merged from the 1h tier equal a bottom-k
    computed directly from each window's raw rows (the property that lets
    DAU-style trailing windows run off the tier without re-scanning raw),
    and n_points sums the window's raw rows."""
    ev = _events(spark)
    width_s, slide_s = 6 * 3600, 2 * 3600
    t1h = kmv_tier(ev, ["site"], "ts", "uid", tier="1h", k=K)
    got = {
        (r.site, r.window_start): (r.n_points, tuple(r.kmv))
        for r in kmv_hopping(
            t1h, ["site"], width="6 hours", slide="2 hours", k=K
        ).collect()
    }

    # expected: per (site, aligned window start), bottom-K of the distinct
    # hashes of raw rows with ws <= ts < ws + width
    raw = ev.select(
        "site", F.unix_timestamp("ts").alias("es"), kmv_hash_col("uid").alias("h")
    ).collect()
    exp: dict = {}
    for r in raw:
        first = ((r.es - width_s) // slide_s + 1) * slide_s
        last = (r.es // slide_s) * slide_s
        for ws in range(first, last + 1, slide_s):
            n, hs = exp.setdefault((r.site, ws), [0, set()])
            exp[(r.site, ws)][0] += 1
            hs.add(r.h)
    import datetime as dt

    expected = {
        (site, dt.datetime.utcfromtimestamp(ws)): (n, tuple(sorted(hs)[:K]))
        for (site, ws), (n, hs) in exp.items()
    }
    got_naive = {
        (site, t.replace(tzinfo=None)): v for (site, t), v in got.items()
    }
    assert got_naive == expected

    with pytest.raises(ValueError, match="not a multiple"):
        kmv_hopping(t1h, ["site"], width="90 minutes", slide="1 hour", k=K)
