"""Training-corpus cleaning: the end-to-end composition of the text-quality
and dedup operators into one keep/drop decision per document — the shape a
100 TB pretraining-data pipeline actually runs.

Stages (each one of the already-certified operators):
1. language filter   — lang_id stopword-hit classifier
2. quality filter    — quality_features linear score threshold
3. exact dedup       — one representative per byte-identical text
4. near-dup dedup    — MinHash-LSH candidate pairs -> connected components
                        -> keep the min-id representative per cluster

Every stage is a column-expression or certified-operator pass; the only
data that re-shuffles between stages is (id)-level bookkeeping, joined back
anti/semi so payload text crosses the wire once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_keep_ids, exact_dedup, minhash_lsh_pairs
from .textstats import lang_id, quality_features


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
) -> DataFrame:
    """(id, lang_pred, quality_score, keep, drop_reason).

    One row per input document with the cleaning verdict; ``keep`` rows are
    the surviving corpus, ``drop_reason`` in {'lang', 'quality',
    'exact_dup', 'near_dup'} explains each rejection (first failing stage
    wins). Filters run before dedup so duplicate clusters are formed only
    over documents that would otherwise survive — the standard order (a
    near-dup of a dropped document should not lose its own representative
    slot)."""
    langs = lang_id(df, id_col, text_col)
    qual = quality_features(df, id_col, text_col).select(
        id_col, "quality_score"
    )
    base = (
        df.select(id_col, text_col)
        .join(langs, id_col)
        .join(qual, id_col)
    )
    lang_ok = (
        F.lit(True)
        if keep_langs is None
        else (F.col("lang_pred").isin(*keep_langs) & (F.col("lang_hits") >= min_lang_hits))
    )
    flagged = base.withColumn("_lang_ok", lang_ok).withColumn(
        "_quality_ok", F.col("quality_score") >= F.lit(min_quality)
    )
    survivors = flagged.where(F.col("_lang_ok") & F.col("_quality_ok"))

    exact_keep = exact_dedup(survivors, id_col, text_col).select(
        F.col("keep_id").alias(id_col), F.lit(True).alias("_exact_keep")
    )
    after_exact = survivors.join(exact_keep, id_col, "left_semi")

    if near_dup:
        pairs = minhash_lsh_pairs(
            after_exact, id_col, text_col, num_hashes=num_hashes, bands=bands
        )
        near_keep = dedup_keep_ids(after_exact, pairs, id_col).select(
            F.col("id").alias(id_col), F.lit(True).alias("_near_keep")
        )
    else:
        near_keep = after_exact.select(
            F.col(id_col), F.lit(True).alias("_near_keep")
        )

    verdict = (
        flagged.join(exact_keep, id_col, "left")
        .join(near_keep, id_col, "left")
        .select(
            id_col,
            "lang_pred",
            "quality_score",
            F.when(~F.col("_lang_ok"), "lang")
            .when(~F.col("_quality_ok"), "quality")
            .when(F.col("_exact_keep").isNull(), "exact_dup")
            .when(F.col("_near_keep").isNull(), "near_dup")
            .otherwise(None)
            .alias("drop_reason"),
        )
        .withColumn("keep", F.col("drop_reason").isNull())
        .select(id_col, "lang_pred", "quality_score", "keep", "drop_reason")
    )
    return verdict
