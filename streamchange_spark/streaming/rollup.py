"""Streaming continuous aggregates: the 1h tier as a watermarked windowed
aggregation (north rule §2.8 in streaming form).

The state carried per (key, window) is the same re-aggregable tuple the batch
tiers store (count/sum/min/max + first/last by exact event time), so a
streaming 1h tier can be re-aggregated into coarser batch tiers unchanged.
``append`` output mode + watermark closes each hourly bucket once the event
clock passes bucket_end + delay — late rows beyond that are dropped, matching
the engine's ordered-replay exactness contract (SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rollup import check_hop


def streaming_rollup_raw(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    width: str = "1 hour",
    watermark_delay: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """(keys..., bucket_start, n_points, sum_v, min_v, max_v, first_ts,
    first_v, last_ts, last_v) — streaming twin of
    operators.rollup.rollup_raw with the identical schema, so the streamed
    1h tuples feed ``rollup_tier`` into coarser batch tiers unchanged
    (tested); the window aggregation is incremental per micro-batch with
    watermark-bounded state. ``slide`` < ``width`` turns the tier into
    HOPPING windows (each event lands in width/slide overlapping buckets —
    the streaming twin of operators.rollup.rollup_hopping; state grows by
    the same overlap factor)."""
    if slide is not None:
        check_hop(width, slide)
    key_cols = list(key_cols)
    v = F.col(value_col)
    ts = F.col(ts_col)
    return (
        stream.where(v.isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .groupBy(*key_cols, F.window(ts_col, width, slide or width).alias("_w"))
        .agg(
            F.count(v).alias("n_points"),
            F.sum(v).alias("sum_v"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
            F.min(ts).alias("first_ts"),
            F.min_by(v, ts).alias("first_v"),
            F.max(ts).alias("last_ts"),
            F.max_by(v, ts).alias("last_v"),
        )
        .select(*key_cols, F.col("_w.start").alias("bucket_start"),
                "n_points", "sum_v", "min_v", "max_v",
                "first_ts", "first_v", "last_ts", "last_v")
    )
