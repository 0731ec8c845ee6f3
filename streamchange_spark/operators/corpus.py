"""Training-corpus cleaning: the end-to-end composition of the text-quality
and dedup operators into one keep/drop decision per document — the shape a
100 TB pretraining-data pipeline actually runs.

Stages (each one of the already-certified operators):
1. language filter   — lang_id stopword-hit classifier
2. quality filter    — quality_features linear score threshold
3. exact dedup       — one representative per byte-identical text
4. near-dup dedup    — MinHash-LSH candidate pairs -> connected components
                        -> keep the min-id representative per cluster

The computation is split in two so resumable pipelines can checkpoint the
expensive part without losing global dedup semantics:

- :func:`corpus_features` is the ONE pass that touches payload text
  (tokenize, hash, minhash) and emits an id-level feature row — safe to run
  independently per shard/partition and materialize.
- :func:`verdicts_from_features` is pure id-level bookkeeping (a groupBy on
  text_md5, an LSH band join on signature columns, connected components);
  run it over the UNION of all feature shards and dedup crosses shards —
  identical output to a single global run, because band keys and text
  hashes depend only on per-document values.

:func:`clean_corpus` is simply the composition of the two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    dedup_keep_ids,
    lsh_cluster_edges_from_signatures,
    minhash_signatures,
)
from .textstats import lang_hits_arr_col, lang_pred_from_hits, quality_score_col


def corpus_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_langs: tuple[str, ...] | None = ("en",),
    min_quality: float = 0.0,
    min_lang_hits: int = 1,
    near_dup: bool = True,
    num_hashes: int = 16,
    hash_fn: str = "md5",
) -> DataFrame:
    """The payload-text pass: (id, lang_pred, quality_score, lang_ok,
    quality_ok, text_md5, mh_0..mh_{k-1}) — one id-level row per document,
    no text column in the output.

    Minhash signatures are computed only for documents passing the lang +
    quality filters (null otherwise); exact duplicates still get signatures
    (identical text -> identical signature), so downstream pair generation
    over any survivor subset matches a fresh minhash run on that subset.

    lang/quality/md5 are computed as ONE wide select over the input (the
    column-expression builders from textstats), not lang_id/quality_features
    joins: the join plan re-evaluated the input subtree (at pipeline scale,
    the latest_pages scan+aggregate over the full pages table) once per
    joined frame. The only remaining double evaluation is the survivor
    branch feeding minhash — inherent, since signatures need a second pass
    over the text."""
    # Stage the single-pass lang-hits array under a name, then take the
    # argmax from the bound column: the argmax references its input twice,
    # and staging keeps that from re-evaluating the token aggregate
    # (CollapseProject won't re-inline a non-cheap expression, SPARK-36718).
    staged = df.select(
        F.col(id_col),
        F.col(text_col),
        lang_hits_arr_col(text_col).alias("__lang_hits_arr"),
        quality_score_col(text_col).alias("quality_score"),
    )
    pred, hits = lang_pred_from_hits(F.col("__lang_hits_arr"))
    base = staged.select(
        F.col(id_col),
        F.col(text_col),
        pred.alias("lang_pred"),
        hits.alias("lang_hits"),
        F.col("quality_score"),
    )
    lang_ok = (
        F.lit(True)
        if keep_langs is None
        else (
            F.col("lang_pred").isin(*keep_langs)
            & (F.col("lang_hits") >= min_lang_hits)
        )
    )
    flagged = (
        base.withColumn("lang_ok", lang_ok)
        .withColumn("quality_ok", F.col("quality_score") >= F.lit(min_quality))
        .withColumn("text_md5", F.md5(F.col(text_col).cast("binary")))
    )
    feats = flagged.select(
        id_col, "lang_pred", "quality_score", "lang_ok", "quality_ok", "text_md5"
    )
    if not near_dup:
        return feats
    survivors = flagged.where(F.col("lang_ok") & F.col("quality_ok")).select(
        id_col, text_col
    )
    sig = minhash_signatures(
        survivors, id_col, text_col, num_hashes=num_hashes, hash_fn=hash_fn
    )
    return feats.join(sig, id_col, "left")


def verdicts_from_features(
    features: DataFrame,
    id_col: str = "doc_id",
    near_dup: bool = True,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """id-level verdict assembly over (a union of) corpus_features output.

    All dedup here is GLOBAL over whatever feature rows are passed in:
    exact dedup groups on text_md5, near-dup bands the signature columns —
    neither sees shard boundaries, so feeding per-shard feature tables
    back in deduplicates across shards. The features plan is evaluated more
    than once (survivor grouping + final verdict join); pass a materialized
    table (the pipeline's snapshot parquet) or a cached DataFrame to avoid
    recomputing the text pass."""
    survivors = features.where(F.col("lang_ok") & F.col("quality_ok"))

    exact_keep = (
        survivors.groupBy("text_md5")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, F.lit(True).alias("_exact_keep"))
    )
    after_exact = survivors.join(exact_keep, id_col, "left_semi")

    if near_dup:
        # star edges, not all pairs: LSH buckets are cliques, so per-bucket
        # min->member edges give identical components at O(m) instead of
        # O(m^2) edges per bucket (boilerplate mega-buckets are the norm on
        # web corpora — the all-pairs join is quadratic exactly there)
        edges = lsh_cluster_edges_from_signatures(
            after_exact, id_col, num_hashes=num_hashes, bands=bands
        )
        near_keep = dedup_keep_ids(after_exact, edges, id_col).select(
            F.col("id").alias(id_col), F.lit(True).alias("_near_keep")
        )
    else:
        near_keep = after_exact.select(
            F.col(id_col), F.lit(True).alias("_near_keep")
        )

    return (
        features.join(exact_keep, id_col, "left")
        .join(near_keep, id_col, "left")
        .select(
            id_col,
            "lang_pred",
            "quality_score",
            F.when(~F.col("lang_ok"), "lang")
            .when(~F.col("quality_ok"), "quality")
            .when(F.col("_exact_keep").isNull(), "exact_dup")
            .when(F.col("_near_keep").isNull(), "near_dup")
            .otherwise(None)
            .alias("drop_reason"),
        )
        .withColumn("keep", F.col("drop_reason").isNull())
        .select(id_col, "lang_pred", "quality_score", "keep", "drop_reason")
    )


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_langs: tuple[str, ...] | None = ("en",),
    min_quality: float = 0.0,
    min_lang_hits: int = 1,
    near_dup: bool = True,
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, lang_pred, quality_score, keep, drop_reason).

    One row per input document with the cleaning verdict; ``keep`` rows are
    the surviving corpus, ``drop_reason`` in {'lang', 'quality',
    'exact_dup', 'near_dup'} explains each rejection (first failing stage
    wins). Filters run before dedup so duplicate clusters are formed only
    over documents that would otherwise survive — the standard order (a
    near-dup of a dropped document should not lose its own representative
    slot)."""
    feats = corpus_features(
        df,
        id_col,
        text_col,
        keep_langs=keep_langs,
        min_quality=min_quality,
        min_lang_hits=min_lang_hits,
        near_dup=near_dup,
        num_hashes=num_hashes,
        hash_fn=hash_fn,
    )
    return verdicts_from_features(
        feats, id_col, near_dup=near_dup, num_hashes=num_hashes, bands=bands
    )
