"""Row-level UPDATE ... SET on the snapshot store (copy-on-write): the
third DML verb next to MERGE INTO and DELETE FROM. Contract: assignments
evaluate against the OLD row, only TRUE-predicate rows change, types never
drift, untouched files are carried by reference, and updates compose with
merge-on-read deletes (deleted rows are neither updated nor resurrected)."""

import pytest
from pyspark.sql import functions as F

from streamchange_spark.sources import SnapshotStore


def _fixture(spark, tmp_path, name="upd_tbl"):
    store = SnapshotStore(str(tmp_path / name))
    d1 = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 10).alias("v"), F.lit("d1").alias("tag")
    )
    d2 = spark.range(100, 200).select(
        F.col("id"), (F.col("id") * 10).alias("v"), F.lit("d2").alias("tag")
    )
    s1 = store.commit_partitions(
        {"t/d1": d1, "t/d2": d2},
        stat_cols=["id"],
        cluster_by=["id"],
        cluster_files=4,
    )
    return store, s1


def test_update_where_rewrites_only_touched_files(spark, tmp_path):
    store, s1 = _fixture(spark, tmp_path)
    m1 = store.manifest(s1)
    s2, report = store.update_where(
        spark,
        "id >= 40 and id < 45",
        {"v": "v * 2 + id", "tag": F.lit("fixed")},
        prefix="t/",
        ranges={"id": (40, 44)},
    )
    assert s2 is not None and store.head() == s2
    assert report["updated_rows"] == 5
    assert report["touched_files"] == 1
    assert report["pruned_files"] >= 6
    out = store.read(spark, prefix="t/")
    assert out.count() == 200  # UPDATE never changes cardinality
    got = {r["id"]: (r["v"], r["tag"]) for r in out.where("id >= 38 and id < 47").collect()}
    for i in range(40, 45):
        assert got[i] == (i * 10 * 2 + i, "fixed")
    for i in (38, 39, 45, 46):
        assert got[i] == (i * 10, "d1")
    # untouched files carried by reference; time travel sees old values
    m2 = store.manifest(s2)
    assert len(set(m1["files"]["t/d1"]) & set(m2["files"]["t/d1"])) == 3
    assert m2["files"]["t/d2"] == m1["files"]["t/d2"]
    assert store.read(spark, snapshot_id=s1).where("id = 42").collect()[0]["v"] == 420
    assert m2["metrics"]["t/d1"]["n_rows"] == 100

    # no-match update -> no-op, no new snapshot
    out2, rep = store.update_where(spark, "id = -1", {"v": F.lit(0)}, prefix="t/")
    assert out2 is None and rep["updated_rows"] == 0
    assert store.head() == s2

    # unknown SET column raises before any write
    with pytest.raises(ValueError, match="unknown columns"):
        store.update_where(spark, "id = 1", {"nope": F.lit(1)})


def test_update_assignments_see_old_row_and_cast_back(spark, tmp_path):
    store, _ = _fixture(spark, tmp_path)
    # swap semantics: both assignments read the OLD row
    s2, rep = store.update_where(
        spark, "id >= 10 and id < 12", {"id": "v", "v": "id"}
    )
    assert rep["updated_rows"] == 2
    rows = {
        r["v"]: r["id"]
        for r in store.read(spark).where("v in (10, 11)").collect()
    }
    assert rows == {10: 100, 11: 110}
    # result is cast back to the column type (double literal -> bigint col)
    store.update_where(spark, "id = 5", {"v": F.lit(2.9)})
    df = store.read(spark).where("id = 5")
    assert dict(df.dtypes)["v"] == "bigint"
    assert df.collect()[0]["v"] == 2

    # NULL-predicate rows keep their values
    src = spark.createDataFrame([(7, 70, None)], "id long, v long, tag string")
    store.merge_into(spark, src, ["id"], when_not_matched="ignore")
    s4, rep = store.update_where(spark, "tag = 'zzz'", {"v": F.lit(-1)})
    assert s4 is None and rep["updated_rows"] == 0
    assert store.read(spark).where("id = 7").collect()[0]["v"] == 70


def test_update_after_mor_delete_composes(spark, tmp_path):
    store, _ = _fixture(spark, tmp_path)
    store.delete_where(spark, "id = 20", mode="merge-on-read")
    # a whole-partition update rewrites the deleted row's file: the row
    # must stay deleted (not updated back into existence)
    s3, rep = store.update_where(spark, "tag = 'd1'", {"v": "v + 1"})
    assert rep["updated_rows"] == 99  # 100 minus the deleted row
    out = store.read(spark, prefix="t/")
    assert out.where("id = 20").count() == 0
    assert out.where("id = 21").collect()[0]["v"] == 211
    assert out.count() == 199
    # the rewritten files shed the delete entry
    m3 = store.manifest(s3)
    assert "delete_files" not in m3
