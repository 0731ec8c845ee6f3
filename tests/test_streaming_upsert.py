"""Streaming MERGE INTO the snapshot store: micro-batch upserts converge to
the batch merge result and replaying a batch is idempotent."""

from pyspark.sql import functions as F

from streamchange_spark.sources import SnapshotStore
from streamchange_spark.streaming import run_streaming_upsert

SCHEMA = "id long, v long, tag string"


def _seed(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tbl"))
    base = spark.range(0, 300).select(
        "id", (F.col("id") * 10).alias("v"), F.lit("base").alias("tag")
    )
    store.commit_partitions(
        {"raw/a": base.where("id % 2 = 0"), "raw/b": base.where("id % 2 = 1")},
        stat_cols=["id"],
        cluster_by=["id"],
        cluster_files=4,
    )
    return store


def test_streaming_upsert_matches_batch_and_replays_idempotently(
    spark, tmp_path
):
    store = _seed(spark, tmp_path)
    feed = tmp_path / "feed"
    feed.mkdir()
    # three disjoint re-crawl shards: two update blocks + one insert block
    shards = [
        [(i, i * 10 + 1, "s0") for i in range(10, 20)],
        [(i, i * 10 + 2, "s1") for i in range(200, 230)],
        [(i, -1, "s2") for i in range(1000, 1040)],  # brand-new keys
    ]
    for i, rows in enumerate(shards):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(feed / f"shard{i}"))

    run_streaming_upsert(
        spark,
        str(feed) + "/*",
        store.table_dir,
        str(tmp_path / "ckpt"),
        SCHEMA,
        ["id"],
        prefix="raw/",
        insert_partition="raw/inserts",
        max_files_per_trigger=1,
    )
    got = {r["id"]: (r["v"], r["tag"]) for r in store.read(spark, prefix="raw/").collect()}
    assert len(got) == 340
    assert got[10] == (101, "s0")
    assert got[205] == (2052, "s1")
    assert got[1000] == (-1, "s2")
    assert got[5] == (50, "base")
    # one store snapshot per micro-batch, batch id recorded
    batch_ids = sorted(
        m["properties"].get("stream_batch_id")
        for m in store.history()
        if "stream_batch_id" in m.get("properties", {})
    )
    assert batch_ids == [0, 1, 2]

    # replaying a shard (at-least-once) is idempotent: same table state
    head_before = store.head()
    store.merge_into(
        spark,
        spark.read.parquet(str(feed / "shard2")),
        ["id"],
        prefix="raw/",
        insert_partition="raw/inserts",
    )
    got2 = {r["id"]: (r["v"], r["tag"]) for r in store.read(spark, prefix="raw/").collect()}
    assert got2 == got
    assert store.head() != head_before  # a new snapshot, same logical state

    # restarting the finished stream from its checkpoint does nothing
    run_streaming_upsert(
        spark,
        str(feed) + "/*",
        store.table_dir,
        str(tmp_path / "ckpt"),
        SCHEMA,
        ["id"],
        prefix="raw/",
        insert_partition="raw/inserts",
    )
    assert store.head() == store.head()
    got3 = {r["id"]: (r["v"], r["tag"]) for r in store.read(spark, prefix="raw/").collect()}
    assert got3 == got


def test_streaming_upsert_latest_by_resolves_in_batch_dups(spark, tmp_path):
    store = _seed(spark, tmp_path)
    feed = tmp_path / "feed"
    feed.mkdir()
    # one shard carries the same key twice (two WARC records of one dump):
    # latest_by keeps the greater v
    rows = [(7, 100, "early"), (7, 200, "late"), (8, 300, "only")]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(feed / "shard0"))
    run_streaming_upsert(
        spark,
        str(feed) + "/*",
        store.table_dir,
        str(tmp_path / "ckpt"),
        SCHEMA,
        ["id"],
        prefix="raw/",
        insert_partition="raw/inserts",
        latest_by="v",
    )
    got = {r["id"]: (r["v"], r["tag"]) for r in store.read(spark, prefix="raw/").collect()}
    assert got[7] == (200, "late")
    assert got[8] == (300, "only")
