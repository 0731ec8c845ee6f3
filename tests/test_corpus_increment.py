"""Incremental dedup against persisted corpus state.

Contract (the global-equals-batch invariant of test_streaming_corpus.py,
restated per increment): with monotonic ids, an increment's verdicts from
``apply_corpus_increment`` are IDENTICAL to a batch ``clean_corpus`` over
(everything ingested so far, union increment) restricted to the increment's
ids — while touching only (increment x colliding-bucket) state rows, never
re-scanning prior documents.
"""

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
KW = dict(keep_langs=("en",), min_quality=0.2)


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _with_cross_split_dups(spark):
    """documents + 20 synthetic tail rows: 10 byte-identical re-crawls of
    prior texts (exact dups across the split) and 10 one-token-appended
    variants (near dups across the split) — guarantees the increment
    exercises both dedup stages against prior state."""
    base = _docs(spark).toPandas().sort_values("doc_id").reset_index(drop=True)
    donors = base.loc[base["text"].str.len() > 200, "text"].head(10).tolist()
    extra = pd.DataFrame(
        {
            "doc_id": range(500, 520),
            "text": donors + [t + " tailword" for t in donors],
        }
    )
    pdf = pd.concat([base, extra], ignore_index=True)
    return spark.createDataFrame(pdf)


def _batch_verdicts(spark, docs, lo, hi):
    from streamchange_spark.operators import clean_corpus

    return (
        clean_corpus(docs.where(f"doc_id < {hi}"), "doc_id", "text", **KW)
        .where(f"doc_id >= {lo}")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _state(spark, docs, hi):
    from streamchange_spark.operators import (
        corpus_features,
        corpus_md5_index,
        corpus_signature_index,
    )

    feats = corpus_features(docs.where(f"doc_id < {hi}"), "doc_id", "text", **KW)
    feats = feats.localCheckpoint()  # materialize: indexes reuse the features
    return corpus_md5_index(feats), corpus_signature_index(feats, "doc_id")


def _assert_verdicts_equal(got, exp):
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang_pred", "keep", "drop_reason"]].reset_index(
            drop=True
        ),
        exp[["doc_id", "lang_pred", "keep", "drop_reason"]].reset_index(
            drop=True
        ),
    )


def test_increment_matches_batch_union(spark):
    """One increment vs batch clean_corpus over the union, restricted to
    increment ids — and the increment actually hits prior state (exact and
    near dup drops against documents it has never joined row-wise)."""
    from streamchange_spark.operators import corpus_features, verdicts_for_increment

    docs = _with_cross_split_dups(spark)
    md5_idx, sig_idx = _state(spark, docs, 300)
    inc = docs.where("doc_id >= 300")
    inc_feats = corpus_features(inc, "doc_id", "text", **KW)
    got = (
        verdicts_for_increment(inc_feats, md5_idx, sig_idx, "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _batch_verdicts(spark, docs, 300, 520)
    _assert_verdicts_equal(got, exp)
    # the synthetic tail must actually exercise both stages across the split
    tail = got[got["doc_id"] >= 500]
    assert (tail["drop_reason"] == "exact_dup").any()
    assert (tail["drop_reason"] == "near_dup").any()


def test_three_sequential_increments(spark):
    """Chained state: each increment's verdicts equal batch over the prefix
    union restricted to that increment (the online-dedup contract — later
    ingests never rewrite earlier verdicts)."""
    from streamchange_spark.operators import apply_corpus_increment, corpus_features

    docs = _with_cross_split_dups(spark)
    md5_idx, sig_idx = _state(spark, docs, 200)
    for lo, hi in [(200, 350), (350, 480), (480, 520)]:
        feats = corpus_features(
            docs.where(f"doc_id >= {lo} and doc_id < {hi}"), "doc_id", "text", **KW
        )
        verdicts, md5_idx, sig_idx = apply_corpus_increment(
            feats, md5_idx, sig_idx, "doc_id"
        )
        # chain state through parquet round-trips like a real pipeline would
        md5_idx = md5_idx.localCheckpoint()
        sig_idx = sig_idx.localCheckpoint()
        got = verdicts.toPandas().sort_values("doc_id").reset_index(drop=True)
        _assert_verdicts_equal(got, _batch_verdicts(spark, docs, lo, hi))


def test_increment_never_scans_prior_documents(spark, tmp_path):
    """Structural scale guarantee: the increment plan reads the two index
    tables, never the prior features/documents — and adds at most
    bands x |increment| signature-index rows (star edges, O(increment))."""
    from streamchange_spark.operators import (
        apply_corpus_increment,
        corpus_features,
        corpus_md5_index,
        corpus_signature_index,
    )

    docs = _with_cross_split_dups(spark)
    prior_path = str(tmp_path / "prior_features")
    corpus_features(docs.where("doc_id < 300"), "doc_id", "text", **KW).write.parquet(
        prior_path
    )
    prior = spark.read.parquet(prior_path)
    md5_path = str(tmp_path / "md5_index")
    sig_path = str(tmp_path / "sig_index")
    corpus_md5_index(prior).write.parquet(md5_path)
    corpus_signature_index(prior, "doc_id").write.parquet(sig_path)

    inc_feats = corpus_features(
        docs.where("doc_id >= 300"), "doc_id", "text", **KW
    ).localCheckpoint()
    md5_idx = spark.read.parquet(md5_path)
    sig_idx = spark.read.parquet(sig_path)
    verdicts, new_md5, new_sig = apply_corpus_increment(
        inc_feats, md5_idx, sig_idx, "doc_id"
    )

    def _formatted(df):
        jvm = spark._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return df._jdf.queryExecution().explainString(mode)

    plans = [_formatted(df) for df in (verdicts, new_md5, new_sig)]
    # state is the ONLY prior touchpoint: no plan reads prior documents
    assert all("prior_features" not in p for p in plans)
    assert "md5_index" in plans[0]  # exact stage joins the md5 index
    assert "sig_index" in plans[2]  # index update merges the prior index

    n_inc = inc_feats.count()
    assert new_sig.count() - sig_idx.count() <= 4 * n_inc


def test_streaming_incremental_ingest_matches_batch(spark, tmp_path):
    """Streaming twin: 3 id-ordered file drops -> 3 micro-batches through
    run_streaming_corpus_ingest_incremental; each batch's persisted verdicts
    equal batch clean_corpus over everything ingested through that batch,
    restricted to that batch's ids — without any micro-batch re-running
    global dedup (the state paths hold per-batch deltas only)."""
    import os
    import time

    from streamchange_spark.operators import clean_corpus
    from streamchange_spark.streaming import (
        incremental_verdicts_from_ingest,
        run_streaming_corpus_ingest_incremental,
    )

    docs = _with_cross_split_dups(spark)
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    bounds = [(0, 200), (200, 400), (400, 520)]
    src = tmp_path / "dumps"
    src.mkdir()
    now = time.time()
    for i, (lo, hi) in enumerate(bounds):
        p = str(src / f"dump_{i}")
        spark.createDataFrame(
            pdf[(pdf["doc_id"] >= lo) & (pdf["doc_id"] < hi)]
        ).coalesce(1).write.parquet(p)
        # monotonic mtimes pin the file-source pickup order to id order
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now + i, now + i))

    verdicts_path = str(tmp_path / "verdicts")
    state_path = str(tmp_path / "state")
    run_streaming_corpus_ingest_incremental(
        spark,
        str(src / "dump_*"),
        verdicts_path,
        state_path,
        str(tmp_path / "ckpt"),
        "doc_id bigint, text string",
        id_col="doc_id",
        text_col="text",
        max_files_per_trigger=1,
        **KW,
    )

    all_verdicts = spark.read.parquet(verdicts_path)
    assert all_verdicts.select("_batch_id").distinct().count() == 3
    got_all = (
        incremental_verdicts_from_ingest(spark, verdicts_path)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got_all) == len(pdf)

    per_batch = all_verdicts.toPandas()
    for b in sorted(per_batch["_batch_id"].unique()):
        ids = set(per_batch.loc[per_batch["_batch_id"] == b, "doc_id"])
        seen_hi = int(
            per_batch.loc[per_batch["_batch_id"] <= b, "doc_id"].max()
        )
        exp = (
            clean_corpus(
                docs.where(f"doc_id <= {seen_hi}"), "doc_id", "text", **KW
            )
            .where(f"doc_id in ({','.join(map(str, sorted(ids)))})")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = (
            per_batch[per_batch["_batch_id"] == b]
            .drop(columns=["_batch_id"])
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        _assert_verdicts_equal(got, exp)

    # effectively-once: re-running with no new files adds nothing
    run_streaming_corpus_ingest_incremental(
        spark,
        str(src / "dump_*"),
        verdicts_path,
        state_path,
        str(tmp_path / "ckpt"),
        "doc_id bigint, text string",
        id_col="doc_id",
        text_col="text",
        **KW,
    )
    assert spark.read.parquet(verdicts_path).count() == len(pdf)


def test_increment_near_dup_disabled(spark):
    """near_dup=False path: exact stage still crosses the split."""
    from streamchange_spark.operators import (
        clean_corpus,
        corpus_features,
        corpus_md5_index,
        verdicts_for_increment,
    )

    docs = _with_cross_split_dups(spark)
    feats_prior = corpus_features(
        docs.where("doc_id < 300"), "doc_id", "text", near_dup=False, **KW
    ).localCheckpoint()
    md5_idx = corpus_md5_index(feats_prior)
    sig_idx = spark.createDataFrame(
        [], "band int, band_key string, nd_component bigint"
    )
    inc_feats = corpus_features(
        docs.where("doc_id >= 300"), "doc_id", "text", near_dup=False, **KW
    )
    got = (
        verdicts_for_increment(
            inc_feats, md5_idx, sig_idx, "doc_id", near_dup=False
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        clean_corpus(docs, "doc_id", "text", near_dup=False, **KW)
        .where("doc_id >= 300")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _assert_verdicts_equal(got, exp)
    assert (got["drop_reason"] == "exact_dup").any()
