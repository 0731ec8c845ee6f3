"""Pages generator determinism + snapshot store semantics (atomic commit,
time travel, resume, lineage) + the byte-identity text invariant."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamchange_spark.sources import (
    SnapshotStore,
    generate_pages,
    generate_url_history,
    run_resumable,
    text_manifest,
)


def test_url_history_deterministic():
    a = generate_url_history(3, 100, 20, 42)
    b = generate_url_history(3, 100, 20, 42)
    assert a.equals(b)
    c = generate_url_history(3, 100, 20, 43)
    assert not a["text"].equals(c["text"])


def test_generate_pages_partition_invariant(spark):
    """Same table regardless of parallelism — required for the sha256
    manifest to be a stable invariant."""
    p1 = generate_pages(spark, n_urls=20, mean_snapshots=10, num_partitions=1)
    p8 = generate_pages(spark, n_urls=20, mean_snapshots=10, num_partitions=8)
    h1 = text_manifest(p1).orderBy("url", "warc_ts").toPandas()
    h8 = text_manifest(p8).orderBy("url", "warc_ts").toPandas()
    assert h1.equals(h8)
    assert p1.count() == p8.count() > 0


def test_pages_schema_and_skew(spark):
    pages = generate_pages(spark, n_urls=30, mean_snapshots=10)
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    counts = pages.groupBy("url").count().toPandas()
    # Zipf-ish: the hottest url has several times the median crawl count.
    assert counts["count"].max() >= 3 * counts["count"].median()


def test_text_byte_identity_through_roundtrip(spark, tmp_path):
    """Write pages to parquet and read back: sha256(text) per (url, warc_ts)
    unchanged — the per-row invariant from BASELINE.json input_hint."""
    pages = generate_pages(spark, n_urls=10, mean_snapshots=8)
    before = text_manifest(pages).orderBy("url", "warc_ts").toPandas()
    path = str(tmp_path / "pages.parquet")
    pages.write.mode("overwrite").parquet(path)
    after = (
        text_manifest(spark.read.parquet(path)).orderBy("url", "warc_ts").toPandas()
    )
    assert before.equals(after)


def test_snapshot_commit_read_timetravel(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "table"))
    df1 = spark.range(5).withColumn("part", F.lit("p1"))
    s1 = store.commit_partitions({"p1": df1}, watermark="2024-01-01")
    assert store.read(spark).count() == 5

    df2 = spark.range(7).withColumn("part", F.lit("p2"))
    s2 = store.commit_partitions({"p2": df2}, watermark="2024-01-02")
    assert store.read(spark).count() == 12
    # time travel back to snapshot 1
    assert store.read(spark, s1).count() == 5
    assert store.completed_partitions() == {"p1", "p2"}
    assert [m["snapshot_id"] for m in store.history()] == [s2, s1]


def test_snapshot_resume_skips_done_partitions(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "table"))
    built = []

    def build(part):
        built.append(part)
        return spark.range(3).withColumn("part", F.lit(part))

    sid, todo = run_resumable(store, ["p1", "p2", "p3"], build)
    assert sorted(todo) == ["p1", "p2", "p3"]
    # "crash" and resume: nothing left to do, no new snapshot
    sid2, todo2 = run_resumable(store, ["p1", "p2", "p3"], build)
    assert sid2 is None and todo2 == []
    assert built == ["p1", "p2", "p3"]
    # extend with a new partition: only it gets built
    sid3, todo3 = run_resumable(store, ["p1", "p2", "p3", "p4"], build)
    assert todo3 == ["p4"]
    assert store.read(spark).count() == 12
    # lineage has one row per built partition
    lineage = store.lineage(spark).toPandas()
    assert sorted(lineage["partition"]) == ["p1", "p2", "p3", "p4"]


def test_resume_produces_identical_table(spark, tmp_path):
    """Interrupted run + resume == uninterrupted run (final table equality)."""
    parts = [f"d{i}" for i in range(4)]

    def build(part):
        return spark.range(10).withColumn("part", F.lit(part)).withColumn(
            "v", F.col("id") * 2
        )

    interrupted = SnapshotStore(str(tmp_path / "interrupted"))
    run_resumable(interrupted, parts[:2], build)  # crash after 2 partitions
    run_resumable(interrupted, parts, build)  # resume

    clean = SnapshotStore(str(tmp_path / "clean"))
    run_resumable(clean, parts, build)

    a = interrupted.read(spark).orderBy("part", "id").toPandas()
    b = clean.read(spark).orderBy("part", "id").toPandas()
    assert a.equals(b)


def test_retention_expiry_and_snapshot_reclaim(spark, tmp_path):
    """expire_partitions is metadata-only (time travel still sees dropped
    partitions); expire_snapshots physically reclaims files referenced only
    by expired history while keeping live data readable."""
    import os

    from streamchange_spark.sources.snapshots import SnapshotStore

    store = SnapshotStore(str(tmp_path / "tbl"))
    df1 = spark.range(10).withColumnRenamed("id", "v")
    df2 = spark.range(10, 20).withColumnRenamed("id", "v")
    s1 = store.commit_partitions({"raw/2024-01-01": df1, "raw/2024-01-02": df2})

    sid, dropped = store.expire_partitions(
        lambda k: k < "raw/2024-01-02", properties={"policy": "raw<1d"}
    )
    assert dropped == ["raw/2024-01-01"]
    # HEAD no longer sees the expired partition...
    head_vals = sorted(
        r.v for r in store.read(spark, prefix="raw/").collect()
    )
    assert head_vals == list(range(10, 20))
    # ...but time travel to the pre-expiry snapshot still does
    old_vals = sorted(
        r.v for r in store.read(spark, snapshot_id=s1, prefix="raw/").collect()
    )
    assert old_vals == list(range(20))

    deleted = store.expire_snapshots(keep_last=1)
    assert deleted  # the expired partition's files are physically gone
    assert all(not os.path.exists(f) for f in deleted)
    assert len(store.history()) == 1
    assert store.history()[0]["parent"] is None
    # live data still readable after reclaim
    assert sorted(r.v for r in store.read(spark, prefix="raw/").collect()) == list(
        range(10, 20)
    )


def test_partition_granularity_evolution(spark, tmp_path):
    """Iceberg partition-evolution property, for free from key-opaque
    partitions: a table committed with DAILY partition keys can switch to
    MONTHLY keys for new data in a later snapshot — prefix reads span both
    generations, file-stats range pruning prunes across both layouts
    without parsing keys, lineage attributes each generation to its own
    snapshot, and old snapshots still time-travel to the pre-evolution
    layout."""
    store = SnapshotStore(str(tmp_path / "evo"))

    def mk(lo_day, n_days):
        rows = []
        for d in range(n_days):
            for h in (0, 12):
                rows.append((f"u{d % 3}", (lo_day + d) * 86400 + h * 3600,
                             float(d * 100 + h)))
        return spark.createDataFrame(rows, ["url", "sec", "v"]).select(
            "url", F.timestamp_seconds("sec").alias("bucket_start"), "v"
        )

    # generation 1: daily keys
    jan = mk(19723, 4)  # 2024-01-01..04
    s1 = store.commit_partitions(
        {
            f"tier1h/2024-01-0{d + 1}": jan.where(
                F.dayofmonth("bucket_start") == d + 1
            )
            for d in range(4)
        },
        stat_cols=["bucket_start"],
    )
    # generation 2 (spec evolved): ONE monthly key for February
    feb = mk(19754, 3)  # 2024-02-01..03
    s2 = store.commit_partitions({"tier1h/2024-02": feb}, stat_cols=["bucket_start"])

    # prefix read spans both generations
    total = store.read(spark, prefix="tier1h/")
    assert total.count() == jan.count() + feb.count()

    # stats pruning works across the mixed layouts without key parsing:
    # a 1-day February range must prune every January file
    all_files = store.files_for(prefix="tier1h/")
    feb_files = store.files_for(
        prefix="tier1h/",
        ranges={"bucket_start": ("2024-02-02 00:00:00", "2024-02-02 23:59:59")},
    )
    assert 0 < len(feb_files) < len(all_files)
    assert all("2024-02" in f for f in feb_files)

    # lineage: each generation under its own snapshot id
    m = store.manifest()
    assert m["metrics"]["tier1h/2024-01-01"]["snapshot_id"] == s1
    assert m["metrics"]["tier1h/2024-02"]["snapshot_id"] == s2

    # pre-evolution snapshot still time-travels to the daily-only layout
    old = store.read(spark, prefix="tier1h/", snapshot_id=s1)
    assert old.count() == jan.count()
