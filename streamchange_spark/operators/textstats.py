"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting. Pure column expressions (whole-stage
codegen); every function has an exact ANSI-SQL twin used as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

# Tiny high-frequency stopword lists per language — a deterministic n-gram/
# stopword-hit heuristic (not a model), identical in engine and oracle.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "no": ["og", "i", "det", "som", "en", "av", "er", "til"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}


def token_count_col(text_col: str) -> Column:
    return F.size(tokens_col(text_col))


def stopword_hits_col(text_col: str, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    toks = tokens_col(text_col)
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def lang_pred_cols(text_col: str) -> tuple[Column, Column]:
    """(lang_pred, lang_hits) as bare columns — composable into a wider
    single-pass select (corpus_features) without a join."""
    hits = {lang: stopword_hits_col(text_col, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    # reversed() so the earlier language wins ties (chained when/otherwise).
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when((hits[lang] == best) & (best > 0), lang).otherwise(pred)
    return pred, best.cast("long")


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang_pred, lang_hits): language with the most stopword hits;
    ties and zero-hit rows resolve to 'und' / lexicographic order."""
    pred, best = lang_pred_cols(text_col)
    return df.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        best.alias("lang_hits"),
    )


def quality_score_col(text_col: str) -> Column:
    """The quality_features linear-blend score as a bare column (identical
    expression tree to quality_features' quality_score output)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    en_hits = stopword_hits_col(text_col, "en")
    alpha_ratio = F.when(n_chars > 0, alpha.cast("double") / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, en_hits.cast("double") / n_tokens).otherwise(0.0)
    return (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.25
        + alpha_ratio * 0.35
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.25
        + (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.15
    )


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, mean_token_len, alpha_ratio, punct_ratio,
    stopword_ratio, quality_score) — all engine-side arithmetic; the score is
    a fixed linear blend in [0, 1]."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    en_hits = stopword_hits_col(text_col, "en")
    mean_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0)
    alpha_ratio = F.when(n_chars > 0, alpha.cast("double") / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, en_hits.cast("double") / n_tokens).otherwise(0.0)
    score = quality_score_col(text_col)
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok.alias("mean_token_len"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp): polynomial rolling hash of the character stream,
    h = (h * 31 + ascii(char)) mod (2^31 - 1) — overflow-free under ANSI mode
    (h < 2^31, so h*31 + 255 < 2^36) and bit-identical in any SQL engine."""
    chars = F.split(F.col(text_col), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(2147483647),
    )
    return df.select(F.col(id_col), fp.alias("fp"))
