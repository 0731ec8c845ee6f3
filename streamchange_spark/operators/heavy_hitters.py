"""Mergeable heavy-hitters: frequent-item tiers that re-aggregate.

Third member of the sketch-tier family (quantiles: qsketch.py, cardinality:
kmv.py, frequency: this): "top URLs / top users per day" where the daily
and 30-day tiers derive from persisted hourly summaries instead of
re-scanning raw — with a carried, per-bucket count-error bound so consumers
read the guarantee off the data.

The summary is the deterministic truncate-exact-counts form of the
mergeable Misra-Gries/SpaceSaving family (Agarwal et al., "Mergeable
Summaries"): per (key, bucket) keep the ``m`` most frequent items with
their counts, plus ``err`` = the (m+1)-th count (0 when nothing was
dropped). Merging sums kept counts item-wise, adds the children's errors,
and truncates again. Invariant carried by every tier (asserted in
tests/test_heavy_hitters.py):

    for EVERY item:  est <= true <= est + err
    (absent items read est = 0, so any item with true count > err is
    guaranteed PRESENT in the summary — the classic heavy-hitter promise)

where ``est`` is the stored count and ``true`` the item's exact count in
the bucket. Estimates never overcount (unlike SpaceSaving), buckets whose
distinct-item count fits in ``m`` are exact with err = 0, and the whole
computation is deterministic and partition-invariant: counts are exact
per level (groupBy, not a streaming pass) and ranking ties break on the
item value. Determinism is also what makes the driver oracle HASH-EXACT —
every stage is plain relational algebra reproduced in DuckDB.

Scale shape: ``hh_tier`` is the one raw scan — shuffle 1 counts
(keys, bucket, item) with map-side partials (one row per distinct item
per task on the wire), shuffle 2 ranks items per bucket with a
WindowGroupLimit cap at m+1; every coarser tier (``hh_rollup``) shuffles
m (item, count) pairs per child bucket, never raw rows. All JVM.

The reference engine has no frequency layer (its per-series state is
StatBuffer, /root/reference/streamchange/sequential/stats.py); this module
belongs to the north-rule rollup/retention tier design (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIER_SECONDS, bucket_col, check_hop, interval_seconds

__all__ = ["hh_tier", "hh_rollup", "hh_hopping", "hh_topk"]


def _check(tier: str, m: int) -> None:
    if tier not in TIER_SECONDS:
        raise ValueError(f"unknown tier {tier!r}: {sorted(TIER_SECONDS)}")
    if m < 1:
        raise ValueError(f"m must be >= 1: {m}")


def _summarize(counts: DataFrame, group: list[str], m: int) -> DataFrame:
    """(group..., item, c) -> one row per group: n_points (sum of counts),
    sorted (item, cnt) struct array of the top m, err contribution = the
    (m+1)-th count. Rank order (c DESC, item ASC) makes truncation
    deterministic; the stored array is item-sorted (canonical form)."""
    w_part = Window.partitionBy(*group)
    ranked = (
        counts.withColumn("_n", F.sum("c").over(w_part))
        .withColumn(
            "_rn",
            F.row_number().over(w_part.orderBy(F.col("c").desc(), F.col("item"))),
        )
        .where(F.col("_rn") <= m + 1)
    )
    kept = F.when(
        F.col("_rn") <= m, F.struct(F.col("item"), F.col("c").alias("cnt"))
    )
    return ranked.groupBy(*group).agg(
        F.max("_n").alias("n_points"),
        F.sort_array(F.collect_list(kept)).alias("items"),
        F.coalesce(
            F.max(F.when(F.col("_rn") == m + 1, F.col("c"))), F.lit(0)
        ).alias("_trunc"),
    )


def _merge_level(base: DataFrame, group: list[str], m: int) -> DataFrame:
    """Merge child summaries (group..., n_points, items, err) into one
    summary per group with err = sum(children errs) + merged (m+1)-th
    count — in ONE grouping chain, no separate metadata branch or join:
    ``posexplode`` pins each child's n_points/err onto its FIRST item row
    (children always hold >= 1 item — a bucket exists only if something
    was counted), so the child-level sums ride the same (group, item)
    aggregation and (group) window the item counts already need."""
    rows = base.select(
        *group, F.posexplode("items").alias("_pos", "kv"), "n_points", "err"
    ).select(
        *group,
        F.col("kv.item").alias("item"),
        F.col("kv.cnt").alias("c"),
        F.when(F.col("_pos") == 0, F.col("n_points")).otherwise(F.lit(0)).alias("_np"),
        F.when(F.col("_pos") == 0, F.col("err")).otherwise(F.lit(0)).alias("_ec"),
    )
    counts = rows.groupBy(*group, "item").agg(
        F.sum("c").alias("c"), F.sum("_np").alias("_np"), F.sum("_ec").alias("_ec")
    )
    w_part = Window.partitionBy(*group)
    ranked = (
        counts.withColumn("_n", F.sum("_np").over(w_part))
        .withColumn("_e", F.sum("_ec").over(w_part))
        .withColumn(
            "_rn",
            F.row_number().over(w_part.orderBy(F.col("c").desc(), F.col("item"))),
        )
        .where(F.col("_rn") <= m + 1)
    )
    kept = F.when(
        F.col("_rn") <= m, F.struct(F.col("item"), F.col("c").alias("cnt"))
    )
    return ranked.groupBy(*group).agg(
        F.max("_n").alias("n_points"),
        F.sort_array(F.collect_list(kept)).alias("items"),
        (
            F.max("_e")
            + F.coalesce(F.max(F.when(F.col("_rn") == m + 1, F.col("c"))), F.lit(0))
        ).alias("err"),
    ).select(*group, "n_points", "items", "err")


def hh_tier(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    item_col: str,
    tier: str = "1h",
    m: int = 64,
) -> DataFrame:
    """The raw-scan tier: (keys..., bucket_start, n_points, items, err).

    ``items`` is an item-sorted ``array<struct<item:string, cnt:long>>``
    of the bucket's top ``m`` items by exact count (ties broken on the
    item's string value — note items are CAST TO STRING, so rank ties
    order lexicographically); ``err`` is the (m+1)-th count: every absent
    item's true count is <= err, every kept count is exact at this level.
    NULL items are excluded (the ``count(col)`` convention)."""
    _check(tier, m)
    key_cols = list(key_cols)
    slim = df.where(F.col(item_col).isNotNull()).select(
        *key_cols,
        bucket_col(ts_col, TIER_SECONDS[tier]).alias("bucket_start"),
        F.col(item_col).cast("string").alias("item"),
    )
    group = [*key_cols, "bucket_start"]
    counts = slim.groupBy(*group, "item").agg(F.count(F.lit(1)).alias("c"))
    return _summarize(counts, group, m).withColumnRenamed("_trunc", "err")


def hh_rollup(
    tier_df: DataFrame,
    key_cols: Sequence[str],
    to_tier: str,
    m: int = 64,
) -> DataFrame:
    """Tier-from-tier: merge a finer tier's summaries into ``to_tier``
    buckets — shuffles m (item, cnt) pairs per child bucket, never raw
    rows. Kept counts sum item-wise (an item absent from a child may have
    had up to that child's err occurrences there, hence errors add);
    truncating the merged ranking to m adds the merged (m+1)-th count:

        err_out = sum(children err) + c_(m+1)(merged)

    preserving est <= true <= est + err at every depth. One grouping chain
    (see :func:`_merge_level`) — no metadata side-branch or join. Input:
    output of :func:`hh_tier` (or a prior :func:`hh_rollup`) with the same
    ``m``."""
    _check(to_tier, m)
    key_cols = list(key_cols)
    base = tier_df.select(
        *key_cols,
        bucket_col("bucket_start", TIER_SECONDS[to_tier]).alias("bucket_start"),
        "n_points",
        "items",
        "err",
    )
    return _merge_level(base, [*key_cols, "bucket_start"], m)


def hh_hopping(
    tier_df: DataFrame,
    key_cols: Sequence[str],
    width: str = "24 hours",
    slide: str = "1 hour",
    m: int = 64,
    tier: str = "1h",
) -> DataFrame:
    """Sliding-window frequent items from a fixed tier — "top URLs over
    the trailing 24 h, every hour" (the trending query). Each bucket row
    is replicated to its aligned covering windows via the native
    ``window(bucket_start, width, slide)`` group key and the summaries
    merge per window with the same error accounting as :func:`hh_rollup`
    (children's errs add + the merged (m+1)-th count), so
    est <= true <= est + err holds per window against the window's raw
    counts (asserted in tests/test_heavy_hitters.py). The exchange carries
    m (item, cnt) pairs per (bucket, window) replica — never raw rows,
    which is what lets a trailing-24h trending feed run off the 1h tier.
    ``width``/``slide`` must be multiples of the input tier (buckets must
    not straddle window edges). Same output shape as :func:`hh_rollup`
    with ``window_start`` in place of ``bucket_start``."""
    _check(tier, m)
    check_hop(width, slide)
    step = TIER_SECONDS[tier]
    for name, iv in (("width", width), ("slide", slide)):
        sec = interval_seconds(iv)
        if sec % step:
            raise ValueError(
                f"{name} ({iv!r} = {sec:g}s) is not a multiple of the input "
                f"tier {tier!r} ({step}s): buckets would straddle window "
                "edges; rebuild the tier at a finer granularity instead"
            )
    key_cols = list(key_cols)
    win = F.window("bucket_start", width, slide)
    base = tier_df.select(
        *key_cols, win.start.alias("window_start"), "n_points", "items", "err"
    )
    return _merge_level(base, [*key_cols, "window_start"], m)


def hh_topk(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int | None = None,
    bucket: str = "bucket_start",
) -> DataFrame:
    """Project ranked rows out of a summary tier: (keys..., bucket_start,
    n_points, item, est_count, err, rank) — rank by (est_count DESC, item),
    optionally cut to the top ``k``. The bucket's err column rides along so
    consumers can read the per-item guarantee [est, est + err] directly.
    Pass ``bucket="window_start"`` for :func:`hh_hopping` output."""
    key_cols = list(key_cols)
    group = [*key_cols, bucket]
    rows = df.select(
        *group, "n_points", "err", F.explode("items").alias("kv")
    ).select(
        *group,
        "n_points",
        F.col("kv.item").alias("item"),
        F.col("kv.cnt").alias("est_count"),
        "err",
    )
    w = Window.partitionBy(*group).orderBy(F.col("est_count").desc(), F.col("item"))
    out = rows.withColumn("rank", F.row_number().over(w))
    if k is not None:
        if k < 1:
            raise ValueError(f"k must be >= 1: {k}")
        out = out.where(F.col("rank") <= k)
    return out.select(*group, "n_points", "item", "est_count", "err", "rank")
