"""Mergeable linear-regression statistics tiers (the TimescaleDB-toolkit
``stats_agg`` / ``regr_*`` analogue): per-bucket partial sums that
re-aggregate across retention tiers, evaluated to slope / intercept / R²
only at query time.

Engine-only operator extending the retention-tier surface (SURVEY.md §2.8;
no reference counterpart — the reference is detector kernels only). The
trend of a per-URL metric (is this page's text length drifting?) is the
natural companion query to the change-point detectors: detectors find the
break, the regression tier quantifies the drift between breaks.

Shape: a stats tier row carries the six moments
``(n, sum_x, sum_y, sum_xx, sum_xy, sum_yy)`` per (key, bucket) — closed
under addition, so the 1d tier is a GROUP-BY SUM over the persisted 1h
partials (the continuous-aggregate contract: coarser trends never re-scan
raw). All-JVM: one groupBy per tier, map-side partial aggregation,
shuffle carries one 6-double row per (key, bucket).

Numerics: x is seconds since the row's OWN bucket start, and the tier
merge SHIFTS finer partials to the coarser bucket's origin
(``Σx' = Σx + n·c``, ``Σxx' = Σxx + 2cΣx + n·c²``, ``Σxy' = Σxy + c·Σy``
with ``c`` = fine-minus-coarse bucket offset) before summing — plain SQL,
still associative. This keeps every moment at the bucket's own scale
(|x| ≤ the bucket span) instead of epoch scale: with epoch-origin x the
``n·Σxx − (Σx)²`` evaluation cancels ~8 digits and two-point buckets
disagreed with DuckDB's numerically stable ``regr_slope`` in the 4th
decimal (measured); bucket-origin x pushes the error below rounding.
Slope and R² are shift-invariant, so the DuckDB oracle can use any
origin; ``intercept`` is the fitted y AT the bucket start (more useful
than y at an arbitrary epoch). Slope is reported per HOUR (per-second
slopes of web metrics round to zero at any sane precision).
Single-point and constant-x buckets evaluate to NULL slope/intercept/R²
— the SQL ``regr_*`` convention, which makes the whole surface
DuckDB-oracle checkable.

Scale notes (100 TB): same story as the additive rollup tiers — the only
shuffle is on (key, bucket); hot keys ride salting/AQE; tier merges read
the persisted partials, ~48 bytes per (key, bucket), never raw.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import TIER_SECONDS, bucket_col

SUM_COLS = ("n", "sum_x", "sum_y", "sum_xx", "sum_xy", "sum_yy")


def stats_tier(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tier: str = "1h",
) -> DataFrame:
    """Per-(key, bucket) regression partial sums over raw observations.
    NULL values are dropped (SQL aggregate convention)."""
    seconds = TIER_SECONDS[tier]
    # x = seconds into the row's own bucket: integer-microsecond
    # subtraction FIRST, one division after, so any engine computing it
    # this way gets the bit-identical double. cast("timestamp") because
    # unix_micros rejects TIMESTAMP_NTZ (the session is pinned UTC, so
    # the NTZ reading is unchanged).
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket_us = (ts_us / F.lit(seconds * 1_000_000)).cast("long") * F.lit(
        seconds * 1_000_000
    )
    x = (ts_us - bucket_us).cast("double") / F.lit(1e6)
    y = F.col(value_col).cast("double")
    return (
        df.where(y.isNotNull())
        .select(
            *key_cols,
            bucket_col(ts_col, seconds).alias("bucket_start"),
            x.alias("__x"),
            y.alias("__y"),
        )
        .groupBy(*key_cols, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").alias("sum_x"),
            F.sum("__y").alias("sum_y"),
            F.sum(F.col("__x") * F.col("__x")).alias("sum_xx"),
            F.sum(F.col("__x") * F.col("__y")).alias("sum_xy"),
            F.sum(F.col("__y") * F.col("__y")).alias("sum_yy"),
        )
    )


def stats_rollup(
    tier_df: DataFrame, key_cols: Sequence[str], tier: str
) -> DataFrame:
    """Merge finer-tier partial sums into a coarser tier — shift each
    partial's x-origin from its own bucket start to the coarser bucket's
    (``c`` = offset seconds; see module docstring), then a pure GROUP-BY
    SUM. Never a raw re-scan."""
    seconds = TIER_SECONDS[tier]
    coarse = bucket_col("bucket_start", seconds)
    c = (
        F.unix_timestamp(F.col("bucket_start")) - F.unix_timestamp(coarse)
    ).cast("double")
    n = F.col("n").cast("double")
    return (
        tier_df.select(
            *key_cols,
            coarse.alias("bucket_start"),
            F.col("n").alias("n"),
            (F.col("sum_x") + n * c).alias("sum_x"),
            F.col("sum_y").alias("sum_y"),
            (
                F.col("sum_xx") + 2.0 * c * F.col("sum_x") + n * c * c
            ).alias("sum_xx"),
            (F.col("sum_xy") + c * F.col("sum_y")).alias("sum_xy"),
            F.col("sum_yy").alias("sum_yy"),
        )
        .groupBy(*key_cols, "bucket_start")
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(col).alias(col) for col in SUM_COLS[1:]],
        )
    )


def stats_eval(df: DataFrame, slope_per: float = 3600.0) -> DataFrame:
    """Evaluate carried partial sums to the regression surface:
    ``slope`` (y units per ``slope_per`` seconds — per hour by default),
    ``intercept`` (fitted y at x = 0, i.e. at the row's bucket start),
    ``r2``, and ``stddev_y``
    (sample). NULL where undefined (n < 2, zero x- or y-variance for R²),
    matching SQL ``regr_slope`` / ``regr_r2`` semantics."""
    n = F.col("n").cast("double")
    sxx = n * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x")
    syy = n * F.col("sum_yy") - F.col("sum_y") * F.col("sum_y")
    sxy = n * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")
    # Degenerate buckets (n < 2, or no real x-variance) must be NULL, not
    # a ratio of rounding residue: after the tier-merge origin shift the
    # mathematically-zero sxx of a single-point bucket evaluates to ~ulp
    # instead of exact 0, so the zero test is RELATIVE to the moment's own
    # magnitude, not an equality.
    no_x_var = (F.col("n") < 2) | (
        sxx <= F.lit(1e-9) * F.greatest(n * F.col("sum_xx"), F.lit(1.0))
    )
    no_y_var = syy <= F.lit(1e-9) * F.greatest(n * F.col("sum_yy"), F.lit(1.0))
    null_d = F.lit(None).cast("double")
    slope_sec = F.when(no_x_var, null_d).otherwise(sxy / sxx)
    # the PostgreSQL/DuckDB regr_r2 convention: NULL when x has no
    # variance, 1.0 when y is constant but x is not
    r2 = F.when(no_x_var, null_d).otherwise(
        F.when(no_y_var, F.lit(1.0)).otherwise(
            F.least((sxy * sxy) / (sxx * syy), F.lit(1.0))  # ≤1 by math
        )
    )
    var_y = syy / F.nullif(n * (n - 1), F.lit(0.0))
    return df.select(
        *df.columns,
        (slope_sec * F.lit(slope_per)).alias("slope"),
        ((F.col("sum_y") - slope_sec * F.col("sum_x")) / n).alias("intercept"),
        r2.alias("r2"),
        F.sqrt(var_y).alias("stddev_y"),
    )
