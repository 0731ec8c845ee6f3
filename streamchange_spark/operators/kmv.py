"""Mergeable distinct-count sketches: cardinality tiers that re-aggregate.

``rollup_distinct`` (rollup.py) gives exact or HLL++ cardinality in ONE
shot, but neither form yields a *persisted, re-aggregable* tier: exact
distinct counts don't merge at all, and Spark's native DataSketches HLL
blobs (``hll_sketch_agg``/``hll_union_agg``) are not deterministic — the
HLL_4 compact form is merge-order sensitive, so estimates drift by a few
counts under repartitioning (measured here: same data, local[8] at 7 vs 31
input partitions → day estimates differ by ±1–6), which breaks this repo's
byte-stable tier contract (qsketch.py, gorilla.py are both re-run /
repartition invariant). This module closes the gap with the classic
**bottom-k (KMV / K-Minimum-Values) sketch** — the deterministic core of
the Theta-sketch family (Bar-Yossef et al. distinct elements; Cohen's
bottom-k sketches; Apache DataSketches' theta sketch is KMV + sampling
threshold):

- state: the ``k`` smallest **distinct** 60-bit hash values of the bucket's
  id set, stored sorted in an ``array<long>`` column (k longs ≈ 2 KB —
  constant per (key, bucket) regardless of raw cardinality).
- merge: bottom-k of a union == bottom-k of the union of the children's
  bottom-k sets. Pure set algebra — EXACT, associative, commutative, so
  tier-from-tier merges are bit-identical to a direct build from raw
  (tests/test_kmv.py asserts full equality, not a tolerance band), unlike
  the HLL path above.
- estimate: with ``x_k`` = the k-th smallest hash normalized to (0, 1],
  ``n̂ = (k-1)/x_k`` (the unbiased KMV estimator; RSE ≈ 1/sqrt(k-2), so
  k=256 → ~6.3%, k=1024 → ~3.1%). A sketch holding FEWER than k hashes is
  the bucket's ENTIRE distinct hash set, so its size is the exact count
  (modulo 60-bit birthday collisions: at n distinct ids the expected
  collision undercount is n²/2^61 — ~0.05 at n=10M, irrelevant below
  billions per bucket).

The hash is ``conv(substr(md5(id), 1, 15), 16, 10)`` — 60 uniform bits,
computed JVM-side, and reproducible in DuckDB as
``('0x' || substr(md5(id), 1, 15))::BIGINT`` (verified identical across
engines incl. empty / unicode strings), which is what makes the driver
oracle for this operator HASH-EXACT end-to-end — build, merge, and
estimate — not a rows-only check.

Scale shape (the reason this exists at 100 TB): ``kmv_tier`` is the one
raw scan — shuffle 1 dedupes (keys, bucket, hash) with map-side partial
aggregation (each task emits its LOCAL distinct hashes once, the same
wire bound as exact distinct's partial), shuffle 2 carries only the
deduped hash rows to rank them; after that every coarser tier shuffles
k longs per (key, bucket) (``kmv_rollup``), never touching raw again —
the continuous-aggregate contract sums/mins already enjoy, extended to
cardinality. All stages are JVM expressions (window rank + higher-order
array functions); no Python crossing anywhere.

The reference engine has no cardinality layer (its per-series state is
StatBuffer, /root/reference/streamchange/sequential/stats.py); this module
belongs to the north-rule rollup/retention tier design (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIER_SECONDS, bucket_col, check_hop, interval_seconds

__all__ = [
    "kmv_hash_col",
    "kmv_tier",
    "kmv_rollup",
    "kmv_hopping",
    "kmv_distinct",
    "KMV_HASH_SPACE",
]

#: Hash domain: 15 hex chars of md5 = 60 bits. 2^60 is a power of two, so
#: the normalizing division below is EXACT in IEEE double arithmetic and
#: bit-identical across engines.
KMV_HASH_SPACE = float(1 << 60)


def kmv_hash_col(col) -> Column:
    """60-bit uniform hash of ``col`` as a long — ``conv(substr(md5, 1,
    15), 16, 10)``. DuckDB twin: ``('0x' || substr(md5(x),1,15))::BIGINT``
    (both engines md5 the same UTF-8 bytes; non-strings are cast to their
    canonical decimal string first)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def _check(tier: str, k: int) -> None:
    if tier not in TIER_SECONDS:
        raise ValueError(f"unknown tier {tier!r}: {sorted(TIER_SECONDS)}")
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")


def kmv_tier(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    distinct_col: str,
    tier: str = "1h",
    k: int = 256,
) -> DataFrame:
    """The raw-scan tier: (keys..., bucket_start, n_points, kmv).

    Plan: project → hash (one md5 per row, JVM codegen) → dedupe
    (keys, bucket, h) via groupBy with a row count (map-side partial agg:
    each task ships its local distinct hashes once) → rank hashes per
    (keys, bucket) and keep the k smallest — the rank filter runs on the
    dedupe output's exchange; the per-bucket n_points rides along as an
    unordered window sum over the same exchange — → collect the survivors
    into one sorted array per bucket (no further shuffle: grouping keys ==
    window partition keys). NULL ids are excluded (the ``count(col)``
    convention shared with rollup_distinct).
    """
    _check(tier, k)
    key_cols = list(key_cols)
    slim = df.where(F.col(distinct_col).isNotNull()).select(
        *key_cols,
        bucket_col(ts_col, TIER_SECONDS[tier]).alias("bucket_start"),
        kmv_hash_col(distinct_col).alias("_h"),
    )
    group = [*key_cols, "bucket_start"]
    pre = slim.groupBy(*group, "_h").agg(F.count(F.lit(1)).alias("_c"))
    w_part = Window.partitionBy(*group)
    ranked = (
        pre.withColumn("_n", F.sum("_c").over(w_part))
        .withColumn("_rn", F.row_number().over(w_part.orderBy("_h")))
        .where(F.col("_rn") <= k)
    )
    return ranked.groupBy(*group).agg(
        F.max("_n").alias("n_points"),
        F.sort_array(F.collect_list("_h")).alias("kmv"),
    )


def kmv_rollup(
    tier_df: DataFrame,
    key_cols: Sequence[str],
    to_tier: str,
    k: int = 256,
) -> DataFrame:
    """Tier-from-tier: merge a finer tier's sketches into ``to_tier``
    buckets — shuffles one (keys, bucket, ≤k longs) row per input bucket,
    never the raw ids. Because bottom-k is closed under union, the output
    is BIT-IDENTICAL to ``kmv_tier`` run directly on raw at ``to_tier``
    (asserted in tests/test_kmv.py). Input: output of :func:`kmv_tier`
    (or a prior :func:`kmv_rollup`) built with the same ``k``."""
    _check(to_tier, k)
    key_cols = list(key_cols)
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))), 1, k
    )
    return (
        tier_df.select(
            *key_cols,
            bucket_col("bucket_start", TIER_SECONDS[to_tier]).alias("bucket_start"),
            "n_points",
            "kmv",
        )
        .groupBy(*key_cols, "bucket_start")
        .agg(F.sum("n_points").alias("n_points"), merged.alias("kmv"))
    )


def kmv_hopping(
    tier_df: DataFrame,
    key_cols: Sequence[str],
    width: str = "24 hours",
    slide: str = "1 hour",
    k: int = 256,
    tier: str = "1h",
) -> DataFrame:
    """Sliding-window cardinality from a fixed tier — "distinct users over
    the trailing 24 h, every hour" (the DAU-style query). THIS is the
    capability that justifies persisting sketches over counts: exact
    distinct counts cannot slide from a tier at all (overlapping windows
    share raw ids, and counts don't union), so the exact path must re-scan
    raw width/slide times over; bottom-k sets union exactly, so each
    window's sketch is just the merge of the ≤ width/tier bucket sketches
    it covers — the identical (k-1)/x_k estimate a direct build over the
    window's raw rows would give (asserted in tests/test_kmv.py).

    Implemented as the native ``window(bucket_start, width, slide)`` group
    key (the rollup_hopping shape): Catalyst expands each bucket row into
    its width/slide covering-window replicas as a PROJECTION and partially
    merges map-side, so the exchange carries k-long arrays per (key,
    window) per task — never raw ids. ``width`` and ``slide`` must be
    multiples of the input tier or buckets would straddle window edges
    (validated loudly). Input: output of :func:`kmv_tier` (or
    :func:`kmv_rollup`) at ``tier`` with the same ``k``."""
    _check(tier, k)
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
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))), 1, k
    )
    return (
        tier_df.groupBy(*key_cols, F.window("bucket_start", width, slide).alias("_w"))
        .agg(F.sum("n_points").alias("n_points"), merged.alias("kmv"))
        .select(
            *key_cols, F.col("_w.start").alias("window_start"), "n_points", "kmv"
        )
    )


def kmv_distinct(df: DataFrame, k: int = 256) -> DataFrame:
    """Project the cardinality estimate out of a sketch tier: (keys...,
    bucket_start, n_points, n_distinct_approx). A sketch with fewer than
    k hashes IS the bucket's whole distinct hash set → exact count; a full
    sketch uses the unbiased KMV estimator (k-1)/x_k. Both branches are
    plain IEEE-double expressions reproduced verbatim in the DuckDB oracle,
    so estimates hash-match bit-for-bit."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    est = F.when(
        F.size("kmv") < k, F.size("kmv").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / (F.element_at("kmv", k).cast("double") / F.lit(KMV_HASH_SPACE))
    )
    return df.withColumn("n_distinct_approx", est).drop("kmv")
