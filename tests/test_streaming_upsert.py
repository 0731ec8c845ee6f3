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


def test_streaming_cdc_deletes_and_reinserts(spark, tmp_path):
    """op_col turns the feed into full CDC: tombstones first, then the
    merge — within a batch latest_by picks each key's newest op, across
    batches sequence epochs keep re-inserts alive and older rows dead."""
    store = _seed(spark, tmp_path)
    schema = "id long, v long, tag string, op string, ver long"
    feed = tmp_path / "cdc_feed"
    feed.mkdir()

    def ship(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(feed / name))

    def run():
        run_streaming_upsert(
            spark,
            str(feed) + "/*",
            store.table_dir,
            str(tmp_path / "cdc_ckpt"),
            schema,
            ["id"],
            prefix="raw/",
            insert_partition="raw/inserts",
            latest_by="ver",
            op_col="op",
        )

    # batch 1: plain deletes, an update, and two in-batch op races —
    # id 30 delete(ver1)+upsert(ver2) -> upsert wins; id 40 the reverse
    ship("b1", (
        [(i, 0, None, "delete", 1) for i in (0, 1, 2, 3, 4, 20)]
        + [(10, 111, "cdc", "upsert", 1)]
        + [(30, 0, None, "delete", 1), (30, 333, "cdc", "upsert", 2)]
        + [(40, 444, "cdc", "upsert", 1), (40, 0, None, "delete", 2)]
    ))
    run()
    got = {r["id"]: r["v"] for r in store.read(spark, prefix="raw/").collect()}
    assert len(got) == 293  # 300 - 7 tombstoned (0..4, 20, 40)
    for dead in (0, 1, 2, 3, 4, 20, 40):
        assert dead not in got
    assert got[10] == 111 and got[30] == 333

    # batch 2: CDC re-insert of a tombstoned key + a fresh delete — the
    # re-insert postdates batch 1's tombstone, so it must survive
    ship("b2", [(0, 999, "re", "upsert", 1), (10, 0, None, "delete", 1)])
    run()
    got = {r["id"]: r["v"] for r in store.read(spark, prefix="raw/").collect()}
    assert got[0] == 999 and 10 not in got
    assert len(got) == 293  # -1 (id 10) +1 (id 0 re-inserted)

    # nightly maintenance folds the tombstones into plain files
    store.maintain(spark, keep_last=1, orphan_grace_seconds=0)
    m = store.manifest()
    assert "eq_delete_files" not in m
    after = {r["id"]: r["v"] for r in store.read(spark, prefix="raw/").collect()}
    assert after == got
