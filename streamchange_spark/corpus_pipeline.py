"""The training-data half of the engine as a resumable pipeline: pages ->
latest snapshot per URL -> clean_corpus verdicts -> surviving corpus, each
shard committed through the SnapshotStore (atomic snapshots, per-partition
lineage, resume-by-skip) exactly like the time-series pipeline.

Work is partitioned by URL hash shard (``pmod(xxhash64(url), n_shards)``) —
the corpus analogue of the time-series pipeline's day partitions: shards are
balanced regardless of per-URL skew, a restart skips completed shards, and
every shard's verdict/corpus files carry lineage metrics in the snapshot
manifest.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import clean_corpus
from .sources.snapshots import SnapshotStore


def latest_pages(pages: DataFrame) -> DataFrame:
    """One row per URL: the newest snapshot's text (dedup across crawls of
    the same URL happens here, before corpus-level dedup across URLs)."""
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_corpus_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    store_dir: str,
    n_shards: int = 8,
    min_quality: float = 0.1,
    keep_langs: tuple[str, ...] | None = ("en",),
) -> dict:
    """Clean the corpus shard by shard, committing verdicts as snapshot
    partitions; re-running resumes (completed shards are skipped). Returns
    run metrics including the keep/drop breakdown."""
    store = SnapshotStore(store_dir)
    docs = latest_pages(pages).select(
        "url", F.col("text"), F.pmod(F.xxhash64("url"), F.lit(n_shards)).alias("_shard")
    )

    done = store.completed_partitions()
    todo = [s for s in range(n_shards) if f"verdicts/shard={s}" not in done]

    t0 = time.time()
    committed = None
    if todo:
        partitions = {}
        for shard in todo:
            shard_docs = docs.where(F.col("_shard") == shard).drop("_shard")
            partitions[f"verdicts/shard={shard}"] = clean_corpus(
                shard_docs,
                id_col="url",
                text_col="text",
                keep_langs=keep_langs,
                min_quality=min_quality,
            )
        committed = store.commit_partitions(
            partitions, properties={"stage": "corpus_verdicts"}
        )
    verdict_sec = time.time() - t0

    verdicts = store.read(spark, prefix="verdicts/")
    breakdown = {
        r["drop_reason"] or "keep": r["n"]
        for r in verdicts.groupBy("drop_reason").agg(F.count("*").alias("n")).collect()
    }
    return {
        "snapshot_id": committed,
        "shards_total": n_shards,
        "shards_built": len(todo),
        "docs": int(verdicts.count()),
        "kept": int(breakdown.get("keep", 0)),
        "breakdown": breakdown,
        "verdict_sec": round(verdict_sec, 2),
    }
