"""Streaming frequent-item tiers via mergeable heavy-hitter summaries.

Streaming twin of ``operators.heavy_hitters`` with the same
effectively-once shape as streaming.kmv/qsketch: each micro-batch writes
its PARTIAL (key, bucket, n_points, items, err) summaries to a parquet
table partitioned by ``_batch_id``, and the queryable tier is one
``hh_rollup`` merge over the accumulated partials.

Contract: unlike the bottom-k twin (bit-equal to batch), a streamed
heavy-hitters tier carries MORE error than a single batch build — each
micro-batch contributes its own truncation error and the merge adds one
more — but the invariant ``est <= true <= est + err`` holds for the err
the tier actually carries, whatever merge tree the stream produced
(tests/test_streaming_corpus.py asserts it against exact counts over the
full ingested input). A micro-batch that never truncates (distinct items
per bucket <= m) contributes err 0, in which case streamed == batch
exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.heavy_hitters import hh_rollup, hh_tier

__all__ = ["run_streaming_hh_ingest", "hh_tier_from_ingest"]


def run_streaming_hh_ingest(
    spark: SparkSession,
    input_path: str,
    summary_path: str,
    checkpoint_path: str,
    schema: str,
    key_cols: Sequence[str],
    ts_col: str,
    item_col: str,
    tier: str = "1h",
    m: int = 64,
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 600,
) -> None:
    """Summarize every unprocessed file under ``input_path`` (availableNow)
    into per-micro-batch partial summaries at ``summary_path``. Resume-safe:
    the stream checkpoint skips finished files, and a replayed batch
    dynamically overwrites only its own ``_batch_id`` partition."""
    key_cols = list(key_cols)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = hh_tier(batch_df, key_cols, ts_col, item_col, tier, m)
        (
            part.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(summary_path)
        )

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def hh_tier_from_ingest(
    spark: SparkSession,
    summary_path: str,
    key_cols: Sequence[str],
    tier: str = "1h",
    m: int = 64,
) -> DataFrame:
    """The queryable tier: merge every micro-batch's partial summaries into
    one (keys..., bucket_start, n_points, items, err) row per bucket — the
    carried err reflects the stream's actual merge tree. Pass a coarser
    ``tier`` to roll up in the same merge (1h partials -> queryable 1d),
    shuffling only m (item, cnt) pairs per child either way."""
    parts = spark.read.parquet(summary_path).drop("_batch_id")
    return hh_rollup(parts, list(key_cols), tier, m)
