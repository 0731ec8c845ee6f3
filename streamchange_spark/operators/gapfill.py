"""Gap-fill: densify per-key bucket series and interpolate missing values.

Engine-only operator (north rule). All-JVM implementation — no UDF anywhere:

1. per key, ``sequence(min(bucket), max(bucket), interval)`` + ``explode``
   builds the dense grid (one aggregate + one generator, no shuffle beyond
   the aggregate's),
2. a left join attaches observed values (broadcast when the grid is small or
   co-partitioned otherwise; Catalyst/AQE decide),
3. LOCF = ``last(value, ignorenulls=True)`` over the key-ordered window;
   linear interpolation brackets each gap with the previous/next observed
   point via two window passes and lerps in plain column arithmetic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_grid(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    step_seconds: int,
    max_buckets_per_key: int | None = 1_000_000,
) -> DataFrame:
    """One row per (key, bucket) for every step between each key's min and
    max bucket.

    ``max_buckets_per_key`` bounds the generated grid: one key spanning 3
    years at a 1-second step would explode into ~95M rows from a single
    input row pair — a silent OOM/skew bomb at corpus scale. The guard
    fails loudly (executor-side ``raise_error`` naming the offending key
    and its bucket count) instead; pass ``None`` to disable for trusted
    inputs."""
    interval = F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
    bounds = df.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("_min_b"), F.max(bucket_col).alias("_max_b")
    )
    if max_buckets_per_key is not None:
        n_buckets = (
            (
                F.unix_timestamp(F.col("_max_b"))
                - F.unix_timestamp(F.col("_min_b"))
            )
            / F.lit(int(step_seconds))
        ).cast("long") + F.lit(1)
        # The guard rides inside the _min_b expression so Catalyst cannot
        # prune it away; raise_error's NullType coerces into the CASE.
        err = F.raise_error(
            F.concat(
                F.lit("dense_grid: key ("),
                F.concat_ws(", ", *[F.col(k).cast("string") for k in key_cols]),
                F.lit(") would generate "),
                n_buckets.cast("string"),
                F.lit(
                    f" grid rows at step={int(step_seconds)}s, above "
                    f"max_buckets_per_key={int(max_buckets_per_key)}; raise the "
                    "limit, coarsen the step, or split the key range"
                ),
            )
        )
        bounds = bounds.withColumn(
            "_min_b",
            F.when(n_buckets > int(max_buckets_per_key), err).otherwise(
                F.col("_min_b")
            ),
        )
    return bounds.select(
        *key_cols,
        F.explode(F.sequence(F.col("_min_b"), F.col("_max_b"), interval)).alias(
            bucket_col
        ),
    )


def gapfill(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    step_seconds: int,
    method: str = "locf",
    max_buckets_per_key: int | None = 1_000_000,
) -> DataFrame:
    """Densify and fill. ``method``:

    - ``'locf'``  — last observation carried forward,
    - ``'linear'``— linear interpolation between bracketing observations
      (ends stay null where no bracket exists),
    - ``'null'``  — densify only.

    Output: (keys..., bucket, value, gap_filled).
    """
    key_cols = list(key_cols)
    grid = dense_grid(df, key_cols, bucket_col, step_seconds, max_buckets_per_key)
    observed = df.select(*key_cols, bucket_col, F.col(value_col).alias("_obs"))
    dense = grid.join(observed, on=key_cols + [bucket_col], how="left")

    w = Window.partitionBy(*key_cols).orderBy(bucket_col)
    gap_filled = F.col("_obs").isNull()

    if method == "null":
        filled = F.col("_obs")
    elif method == "locf":
        filled = F.last("_obs", ignorenulls=True).over(w)
    elif method == "linear":
        # Two windows (asc + desc) cost a second sort, but beat the
        # single-sort alternative by 10x: first(...) over a
        # [currentRow, unboundedFollowing] frame is a SHRINKING frame that
        # Spark re-evaluates per row (measured 22 s vs 1.8 s at sf0.1).
        w_rev = Window.partitionBy(*key_cols).orderBy(F.col(bucket_col).desc())
        prev_v = F.last("_obs", ignorenulls=True).over(w)
        next_v = F.last("_obs", ignorenulls=True).over(w_rev)
        prev_t = F.last(
            F.when(F.col("_obs").isNotNull(), F.col(bucket_col)), ignorenulls=True
        ).over(w)
        next_t = F.last(
            F.when(F.col("_obs").isNotNull(), F.col(bucket_col)), ignorenulls=True
        ).over(w_rev)
        span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
        frac = (F.unix_timestamp(F.col(bucket_col)) - F.unix_timestamp(prev_t)) / span
        filled = (
            F.when(F.col("_obs").isNotNull(), F.col("_obs"))
            .when(
                prev_v.isNotNull() & next_v.isNotNull(),
                prev_v + (next_v - prev_v) * frac,
            )
            .otherwise(F.lit(None))
        )
    else:
        raise ValueError(f"unknown gapfill method: {method}")

    return dense.select(
        *key_cols,
        F.col(bucket_col),
        filled.alias(value_col),
        gap_filled.alias("gap_filled"),
    )
