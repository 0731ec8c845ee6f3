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

from pyspark.sql import Window

from .dedup import (
    _lsh_band_rows,
    connected_components,
    dedup_keep_ids,
    lsh_cluster_edges_from_signatures,
    minhash_signatures,
)
from .textstats import (
    lang_hits_arr_sql,
    lang_pred_from_hits,
    lang_stage1_col,
    lang_stage2_cols,
    quality_score_col,
)


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
    # Stage the lang plan through named columns (lowered text -> stopword
    # token array -> hits array), then take the argmax from the bound hits
    # column: each later stage references its input multiple times, and
    # staging keeps that from re-evaluating the tokenize (CollapseProject
    # won't re-inline a non-cheap expression, SPARK-36718).
    s1 = df.select(
        F.col(id_col), F.col(text_col), lang_stage1_col(text_col)
    )
    s2 = s1.select(
        F.col(id_col), F.col(text_col), F.col("__lang_low"),
        *lang_stage2_cols(),
    )
    staged = s2.select(
        F.col(id_col),
        F.col(text_col),
        F.expr(lang_hits_arr_sql(text_col)).alias("__lang_hits_arr"),
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


# ---------------------------------------------------------------------------
# Incremental dedup against persisted corpus state
# ---------------------------------------------------------------------------
# At 100 TB a daily crawl increment must NOT re-run global LSH over the union
# of everything ever ingested (what verdicts_from_features over a feature
# union does — correct, but the verdict pass re-touches the world every day).
# The persisted state is two small id-level side tables derived from the
# corpus_features store:
#
#   md5 index        (text_md5)                      — one row per distinct
#                    surviving text; blocks exact re-crawls.
#   signature index  (band, band_key, nd_component)  — one row per occupied
#                    LSH bucket, labelled with the component representative
#                    (= min doc id) of the bucket's clique. An LSH bucket is
#                    a clique, so all members share one component and the
#                    bucket needs exactly one row, NOT one per member: index
#                    size is O(distinct buckets), ~bands rows per unique doc.
#
# The increment pass then touches only (increment x colliding-bucket) rows:
# band-key join of the increment's signatures against the index, never a
# scan of prior documents. On a real cluster both indexes live bucketed by
# their join key (text_md5 / band_key), so the joins are co-located.
#
# PRECONDITION (documented contract, asserted in tests): ids are assigned
# monotonically — every increment id exceeds every prior id. Under that
# invariant the increment's verdicts are IDENTICAL to a batch clean_corpus
# over (prior union increment) restricted to increment ids: a prior doc can
# never lose its representative slot to a later one (min-id policy), so the
# union run's graph restricted to increment decisions is exactly the
# contracted graph built here (prior nodes collapse to their component
# labels; new bridges between prior components only lower the min, which
# already belongs to a prior doc either way).


def corpus_md5_index(features: DataFrame) -> DataFrame:
    """(text_md5) — distinct text hashes of lang+quality survivors. Exact
    dedup groups over survivors (not over exact-dedup winners), so any
    surviving prior text blocks byte-identical later copies."""
    return (
        features.where(F.col("lang_ok") & F.col("quality_ok"))
        .select("text_md5")
        .distinct()
    )


def _after_exact(features: DataFrame, id_col: str) -> DataFrame:
    """Survivor rows that win their exact-dup group (min id per text_md5) —
    the node set of the near-dup graph, same definition as
    verdicts_from_features."""
    survivors = features.where(F.col("lang_ok") & F.col("quality_ok"))
    w = Window.partitionBy("text_md5")
    return (
        survivors.withColumn("_md5_min", F.min(id_col).over(w))
        .where(F.col(id_col) == F.col("_md5_min"))
        .drop("_md5_min")
    )


def corpus_signature_index(
    features: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(band, band_key, nd_component): the persisted LSH signature index —
    one row per occupied bucket, labelled with the component representative
    of the bucket's clique (min doc id over the connected component, the
    same label dedup_keep_ids keeps)."""
    nodes = _after_exact(features, id_col)
    edges = lsh_cluster_edges_from_signatures(
        nodes, id_col, num_hashes=num_hashes, bands=bands
    )
    comp = connected_components(edges)
    rows = _lsh_band_rows(nodes, id_col, num_hashes, bands)
    labeled = (
        rows.join(comp, rows[id_col] == comp["id"], "left")
        .withColumn("nd_component", F.coalesce("component", id_col))
        .select("band", "band_key", "nd_component")
    )
    # clique => one component per bucket; min() dedups to one row per bucket
    return labeled.groupBy("band", "band_key").agg(
        F.min("nd_component").alias("nd_component")
    )


def corpus_increment_deltas(
    new_features: DataFrame,
    md5_index: DataFrame,
    signature_index: DataFrame,
    id_col: str = "doc_id",
    near_dup: bool = True,
    num_hashes: int = 16,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Verdicts for ONE increment of corpus_features rows against persisted
    state, plus the increment's state DELTAS (not merged indexes).

    Returns ``(verdicts, md5_delta, sig_delta)``: ``md5_delta`` is the
    increment's survivor hashes, ``sig_delta`` its (band, band_key,
    nd_component) rows. Deltas are what a resumable pipeline persists — one
    append-only partition per ingest, current state recovered by
    merge-on-read (distinct for md5, groupBy min for signatures; both
    merges are associative, so any prefix of deltas folds to the same index
    the sequential :func:`apply_corpus_increment` chain would build).

    Cost shape: the only joins against prior state are increment-md5 x
    md5-index and increment-band-rows x signature-index — (increment x
    colliding-bucket) work, never a re-scan of prior documents. Requires
    monotonic ids (every increment id > every prior id); see module notes
    for why that makes the output hash-exact with a batch clean_corpus over
    the union restricted to increment ids."""
    survivors = new_features.where(F.col("lang_ok") & F.col("quality_ok"))
    w_md5 = Window.partitionBy("text_md5")
    flagged = survivors.withColumn("_inc_min", F.min(id_col).over(w_md5)).join(
        md5_index.withColumn("_prior_md5", F.lit(True)), "text_md5", "left"
    )
    after_exact = flagged.where(
        (F.col(id_col) == F.col("_inc_min")) & F.col("_prior_md5").isNull()
    ).drop("_inc_min", "_prior_md5")
    exact_keep = after_exact.select(
        F.col(id_col), F.lit(True).alias("_exact_keep")
    )

    if near_dup:
        inc_rows = _lsh_band_rows(after_exact, id_col, num_hashes, bands)
        # Contracted-graph edges: per bucket, hub = the prior component
        # label if the bucket exists in the index, else the increment's
        # bucket-min. Prior labels < every increment id, so component = own
        # id iff the doc collides with nothing prior and wins its increment
        # cliques — exactly the union run's keep rule for increment docs.
        joined = inc_rows.join(
            signature_index, ["band", "band_key"], "left"
        )
        w_bucket = Window.partitionBy("band", "band_key")
        hubbed = joined.withColumn(
            "_hub",
            F.coalesce(F.col("nd_component"), F.min(id_col).over(w_bucket)),
        )
        edges = (
            hubbed.where(F.col("_hub") != F.col(id_col))
            .select(F.col("_hub").alias("id_a"), F.col(id_col).alias("id_b"))
            .distinct()
        )
        comp = connected_components(edges)
        # dedup_keep_ids semantics, reusing comp instead of recomputing it:
        # keep = nodes absent from the graph + component representatives.
        drop = comp.where(F.col("id") != F.col("component")).select("id")
        near_keep = (
            after_exact.select(F.col(id_col).alias("id"))
            .join(drop, "id", "left_anti")
            .select(F.col("id").alias(id_col), F.lit(True).alias("_near_keep"))
        )
        inc_index_rows = (
            inc_rows.join(comp, inc_rows[id_col] == comp["id"], "left")
            .withColumn("nd_component", F.coalesce("component", id_col))
            .select("band", "band_key", "nd_component")
        )
    else:
        near_keep = after_exact.select(
            F.col(id_col), F.lit(True).alias("_near_keep")
        )
        inc_index_rows = None  # no signatures without near_dup features

    verdicts = (
        new_features.join(exact_keep, id_col, "left")
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

    md5_delta = survivors.select("text_md5").distinct()
    if inc_index_rows is None:
        sig_delta = new_features.sparkSession.createDataFrame(
            [], "band int, band_key string, nd_component bigint"
        )
    else:
        sig_delta = inc_index_rows
    return verdicts, md5_delta, sig_delta


def apply_corpus_increment(
    new_features: DataFrame,
    md5_index: DataFrame,
    signature_index: DataFrame,
    id_col: str = "doc_id",
    near_dup: bool = True,
    num_hashes: int = 16,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Verdicts for ONE increment plus the MERGED updated state.

    ``(verdicts, md5_index', signature_index')`` — the primed indexes cover
    prior union increment, ready for the next increment. min() keeps prior
    labels on shared buckets (they're smaller under monotonic ids) and
    relabels any bucket the increment bridged downward. See
    :func:`corpus_increment_deltas` for semantics, cost shape, and the
    monotonic-id precondition."""
    verdicts, md5_delta, sig_delta = corpus_increment_deltas(
        new_features,
        md5_index,
        signature_index,
        id_col=id_col,
        near_dup=near_dup,
        num_hashes=num_hashes,
        bands=bands,
    )
    new_md5_index = md5_index.unionByName(md5_delta).distinct()
    new_signature_index = (
        signature_index.unionByName(sig_delta)
        .groupBy("band", "band_key")
        .agg(F.min("nd_component").alias("nd_component"))
    )
    return verdicts, new_md5_index, new_signature_index


def verdicts_for_increment(
    new_features: DataFrame,
    md5_index: DataFrame,
    signature_index: DataFrame,
    id_col: str = "doc_id",
    near_dup: bool = True,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Verdicts for an increment against persisted state — the read-only
    form of :func:`apply_corpus_increment` (same output, no state update)."""
    verdicts, _, _ = apply_corpus_increment(
        new_features,
        md5_index,
        signature_index,
        id_col=id_col,
        near_dup=near_dup,
        num_hashes=num_hashes,
        bands=bands,
    )
    return verdicts
