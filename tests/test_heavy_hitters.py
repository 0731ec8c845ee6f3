"""Mergeable heavy-hitters tier (operators/heavy_hitters.py).

Contract: for every item, est <= true <= est + err (absent => true <= err,
so true > err guarantees presence); exact with err=0 when m covers the
bucket's distinct items (then merged == direct bit-for-bit); deterministic
and partition-invariant at every tier depth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamchange_spark.operators import hh_hopping, hh_rollup, hh_tier, hh_topk

M = 8


def _events(spark, n_rows=5000):
    """Deterministic zipf-ish items: item j appears ~ proportionally more
    for small j, across ~25 hourly buckets and 2 keys."""
    return spark.range(n_rows).select(
        (F.col("id") % 2).cast("string").alias("site"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") % 90000)).alias("ts"),
        (F.floor(F.sqrt((F.col("id") * 37) % 900)) % 30).alias("item"),
    )


def _snap(df):
    return sorted(
        (
            r.site,
            r.bucket_start,
            r.n_points,
            tuple((kv.item, kv.cnt) for kv in r.items),
            r.err,
        )
        for r in df.collect()
    )


def _true_counts(ev, trunc):
    return {
        (r.site, r.b, r.item): r.c
        for r in ev.groupBy(
            "site",
            F.date_trunc(trunc, "ts").alias("b"),
            F.col("item").cast("string").alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }


def test_exact_regime_merged_equals_direct(spark):
    ev = _events(spark)
    big = 1024  # > distinct items everywhere -> no truncation anywhere
    t1h = hh_tier(ev, ["site"], "ts", "item", tier="1h", m=big)
    merged = hh_rollup(t1h, ["site"], "1d", m=big)
    direct = hh_tier(ev, ["site"], "ts", "item", tier="1d", m=big)
    a, b = _snap(merged), _snap(direct)
    assert a == b
    assert all(row[-1] == 0 for row in a), "err must be 0 when nothing dropped"
    # and the stored counts are the exact counts
    true = _true_counts(ev, "day")
    for site, bucket, _n, items, _e in a:
        for item, cnt in items:
            assert cnt == true[(site, bucket, item)]


def test_carried_error_bound_and_presence_guarantee(spark):
    ev = _events(spark)
    t1h = hh_tier(ev, ["site"], "ts", "item", tier="1h", m=M)
    d1 = hh_rollup(t1h, ["site"], "1d", m=M)
    d30 = hh_rollup(d1, ["site"], "30d", m=M)
    for tier_df, trunc in ((d1, "day"), (d30, "month")):
        true = _true_counts(ev, trunc) if trunc == "day" else None
        if true is None:  # 30d buckets aren't calendar months; recompute
            true = {
                (r.site, r.b, r.item): r.c
                for r in ev.groupBy(
                    "site",
                    F.timestamp_seconds(
                        (F.unix_timestamp("ts") / 2592000).cast("long") * 2592000
                    ).alias("b"),
                    F.col("item").cast("string").alias("item"),
                )
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            }
        summaries = {
            (r.site, r.bucket_start): ({kv.item: kv.cnt for kv in r.items}, r.err)
            for r in tier_df.collect()
        }
        assert summaries
        saw_err = False
        for (site, bucket), (est_map, err) in summaries.items():
            saw_err = saw_err or err > 0
            for item, est in est_map.items():
                t = true[(site, bucket, item)]
                assert est <= t <= est + err, (site, bucket, item)
            for (s2, b2, item), t in true.items():
                if s2 == site and b2 == bucket and t > err:
                    assert item in est_map, (site, bucket, item, t, err)
        assert saw_err, "fixture must actually truncate at m=8"


def test_partition_invariant_and_topk_ranks(spark):
    ev = _events(spark)
    a = hh_rollup(hh_tier(ev, ["site"], "ts", "item", tier="1h", m=M), ["site"], "1d", m=M)
    b = hh_rollup(
        hh_tier(ev.repartition(13), ["site"], "ts", "item", tier="1h", m=M),
        ["site"], "1d", m=M,
    )
    assert _snap(a) == _snap(b)

    top = hh_topk(a, ["site"], k=3).collect()
    by_bucket = {}
    for r in top:
        by_bucket.setdefault((r.site, r.bucket_start), []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cnts = [r.est_count for r in rows]
        assert cnts == sorted(cnts, reverse=True)


def test_validation(spark):
    ev = _events(spark, n_rows=10)
    with pytest.raises(ValueError, match="unknown tier"):
        hh_tier(ev, ["site"], "ts", "item", tier="7m")
    with pytest.raises(ValueError, match="m must be"):
        hh_tier(ev, ["site"], "ts", "item", m=0)
    with pytest.raises(ValueError, match="k must be"):
        hh_topk(hh_tier(ev, ["site"], "ts", "item"), ["site"], k=0)


def test_plan_shape(spark):
    """Same plan contract as the kmv tier: WindowGroupLimit caps the rank
    window at m+1, the final per-bucket groupBy reuses the window's
    partitioning, and the merge level costs exactly one exchange of
    summary rows (plus one bucket-level join branch for the carried err)."""
    ev = _events(spark, n_rows=500)
    out = hh_rollup(hh_tier(ev, ["site"], "ts", "item", tier="1h", m=M), ["site"], "1d", m=M)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_hopping_invariant_vs_raw_windows(spark):
    """Sliding-window summaries merged from the 1h tier satisfy
    est <= true <= est + err and the presence guarantee against each
    window's RAW counts (windows replicated per the aligned
    window(bucket_start, width, slide) semantics)."""
    ev = _events(spark)
    width_s, slide_s = 6 * 3600, 2 * 3600
    t1h = hh_tier(ev, ["site"], "ts", "item", tier="1h", m=M)
    hop = hh_hopping(t1h, ["site"], width="6 hours", slide="2 hours", m=M)

    true: dict = {}
    for r in ev.select(
        "site", F.unix_timestamp("ts").alias("es"),
        F.col("item").cast("string").alias("item"),
    ).collect():
        first = ((r.es - width_s) // slide_s + 1) * slide_s
        last = (r.es // slide_s) * slide_s
        for ws in range(first, last + 1, slide_s):
            true[(r.site, ws, r.item)] = true.get((r.site, ws, r.item), 0) + 1

    rows = hop.collect()
    assert rows and any(r.err > 0 for r in rows)
    for r in rows:
        ws = int(r.window_start.timestamp())
        est = {kv.item: kv.cnt for kv in r.items}
        for item, e in est.items():
            t = true[(r.site, ws, item)]
            assert e <= t <= e + r.err, (r.site, ws, item)
        for (s2, w2, item), t in true.items():
            if s2 == r.site and w2 == ws and t > r.err and item not in est:
                raise AssertionError((r.site, ws, item, t, r.err))
        # n_points sums the window's raw rows
        assert r.n_points == sum(
            t for (s2, w2, _), t in true.items() if s2 == r.site and w2 == ws
        )

    with pytest.raises(ValueError, match="not a multiple"):
        hh_hopping(t1h, ["site"], width="90 minutes", slide="1 hour", m=M)
