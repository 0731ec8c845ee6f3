"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting. Pure column expressions (whole-stage
codegen); every function has an exact ANSI-SQL twin used as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

# High-frequency stopword lists per language — a deterministic word-unigram
# + char-unigram ensemble (not a model), replayed identically by the DuckDB
# oracle and the serial corpus replay. Ten European word-tokenized languages
# plus zh via CJK-codepoint counting (whitespace tokens carry no signal
# there). Overlap across lists (Scandinavian especially) is fine: prediction
# is an argmax and the diacritic evidence below breaks most cross-language
# confusions a short stopword list can't.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it",
           "was", "for", "with", "as", "his", "on", "be", "at",
           "by", "are", "this", "from", "they", "not", "but", "have"],
    "no": ["og", "i", "det", "som", "en", "av", "er", "til",
           "på", "med", "for", "ikke", "den", "har", "de", "et",
           "om", "å", "var", "seg", "men", "kan", "ved", "fra"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu",
           "den", "von", "mit", "sich", "des", "auf", "für", "im",
           "dem", "eine", "als", "auch", "es", "an", "werden", "aus"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est",
           "dans", "que", "qui", "pour", "pas", "sur", "par", "plus",
           "avec", "son", "au", "il", "ne", "se", "ce", "du"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los",
           "se", "del", "las", "por", "con", "para", "una", "su",
           "es", "no", "al", "lo", "como", "más", "pero", "sus"],
    # no bare "a" (the en/nl article would feed pt everywhere)
    "pt": ["o", "de", "que", "e", "do", "da", "em", "um",
           "para", "é", "com", "não", "uma", "os", "no",
           "se", "na", "por", "mais", "dos", "como", "mas", "ao"],
    "it": ["il", "di", "che", "e", "la", "per", "un", "in",
           "una", "sono", "non", "le", "si", "con", "del", "da",
           "al", "lo", "come", "più", "ma", "nel", "alla", "dei"],
    "nl": ["de", "het", "een", "en", "van", "ik", "te", "dat",
           "die", "in", "is", "zijn", "niet", "met", "aan", "er",
           "om", "ook", "als", "dan", "maar", "bij", "voor", "naar"],
    "sv": ["och", "i", "att", "det", "som", "en", "på", "är",
           "av", "för", "med", "till", "den", "inte", "har", "de",
           "ett", "om", "var", "sig", "men", "kan", "vid", "från"],
    "da": ["og", "i", "at", "det", "som", "en", "på", "er",
           "af", "for", "med", "til", "den", "ikke", "har", "de",
           "et", "om", "var", "sig", "men", "kan", "ved", "fra"],
}

# Characteristic diacritics per language (char-unigram evidence, counted on
# the lowercased text). Shared chars (æøå in no/da, ç in fr/pt) are fine —
# the stopword signal disambiguates; ties resolve lexicographically.
LANG_CHARS = {
    "de": "äöüß",
    "fr": "éèêàçâîôûëï",
    "es": "ñáíóúü¿¡",
    "pt": "ãõçáéêíóú",
    "it": "àèéìòù",
    "no": "æøå",
    "da": "æøå",
    "sv": "åäö",
    "nl": "",
    "en": "",
}

# CJK unified ideographs (U+4E00..U+9FFF) as a literal char range — valid in
# both Java regex (Spark) and RE2 (DuckDB with the 'g' flag).
CJK_RANGE = "[一-鿿]"

# The quality score's stopword-ratio feature is FROZEN on the original
# 8-word English list: it's a bounded [0,1] feature inside a fixed linear
# blend, and pinning it keeps every quality threshold / oracle / fixture
# bit-identical while the language-ID lists above evolve independently.
QUALITY_STOPWORDS_EN = ["the", "and", "of", "to", "in", "is", "that", "it"]


def token_count_col(text_col: str) -> Column:
    return F.size(tokens_col(text_col))


def stopword_hits_col(text_col: str, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    toks = tokens_col(text_col)
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def quality_stopword_hits_col(text_col: str) -> Column:
    """Stopword hits for the quality score — FROZEN 8-word list (see
    QUALITY_STOPWORDS_EN), independent of the language-ID lists."""
    toks = tokens_col(text_col)
    return F.size(F.filter(toks, lambda t: t.isin(QUALITY_STOPWORDS_EN)))


def char_hits_col(text_col: str, lang: str) -> Column:
    """Occurrences of the language's characteristic diacritics in the
    lowercased text — length minus length-after-translate, a codegen
    projection with an exact DuckDB twin (translate is Postgres-compatible
    in both engines)."""
    chars = LANG_CHARS.get(lang, "")
    if not chars:
        return F.lit(0)
    low = F.lower(F.col(text_col))
    return F.length(low) - F.length(F.translate(low, chars, ""))


def cjk_hits_col(text_col: str) -> Column:
    """Count of CJK-unified-ideograph codepoints (the zh evidence; word
    tokenization carries no signal for unsegmented scripts)."""
    text = F.col(text_col)
    return F.length(text) - F.length(F.regexp_replace(text, CJK_RANGE, ""))


# All scored languages in lexicographic order — the tie-break order of the
# argmax (position in this list = position in the hits array).
LANGS: list[str] = sorted([*LANG_STOPWORDS, "zh"])


# Union of every language's stopwords — the one-pass token prefilter: a
# token not in ANY list contributes to no language, so the per-language
# counts only need to scan the (much shorter) stopword-only token array.
ALL_STOPWORDS: list[str] = sorted(
    {w for ws in LANG_STOPWORDS.values() for w in ws}
)


def _sql_in_list(words) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))


def lang_stage1_col(text_col: str) -> Column:
    """Stage 1 of the language-ID plan: the lowercased text, computed once.
    The whole lang plan is built as a handful of F.expr SQL strings instead
    of per-literal Column calls: the previous builders issued one py4j
    round-trip per literal (~4.4k for the word->multi-hot map), which put
    2-4 s of DRIVER-side construction+planning on every invocation — 30x the
    actual executor work at bench scale. SQL strings parse JVM-side in one
    call and produce the same expression tree."""
    return F.expr(f"lower(`{text_col}`)").alias("__lang_low")


def lang_stage2_cols() -> list[Column]:
    """Stage 2: text length and the stopword-only token array, both from the
    staged ``__lang_low``. Tokens are split once and immediately filtered to
    the union stopword set (IN-list above the InSet threshold -> one hash
    probe per token); empty split artifacts are never stopwords, so the
    explicit empty-token filter of tokens_col is unnecessary here."""
    stops = (
        "filter(split(__lang_low, '\\\\s+'), "
        f"t -> t IN ({_sql_in_list(ALL_STOPWORDS)}))"
    )
    return [
        F.expr("length(__lang_low)").alias("__lang_len"),
        F.expr(stops).alias("__lang_stops"),
    ]


def lang_hits_arr_sql(
    text_col: str,
    low: str = "__lang_low",
    ln: str = "__lang_len",
    stops: str = "__lang_stops",
) -> str:
    """SQL for the array<long> of per-language evidence scores in LANGS
    order: per-language stopword hits counted over the staged stopword-only
    token array (one InSet probe per stopword token per language), plus the
    per-language diacritic translate / CJK regexp columns over the staged
    lowercased text. ONE tokenize pass total — replaces the per-language
    stopword fan-out that re-split the whole text once per language (round-4
    verdict: ~11 full-string scans per row)."""
    parts: list[str] = []
    for lang in LANGS:
        if lang == "zh":
            parts.append(
                f"cast(length(`{text_col}`) - length(regexp_replace("
                f"`{text_col}`, '{CJK_RANGE}', '')) as bigint)"
            )
            continue
        word = (
            f"size(filter({stops}, "
            f"t -> t IN ({_sql_in_list(LANG_STOPWORDS[lang])})))"
        )
        chars = LANG_CHARS.get(lang, "")
        if chars:
            parts.append(
                f"cast({word} + ({ln} - length(translate({low}, "
                f"'{chars}', ''))) as bigint)"
            )
        else:
            parts.append(f"cast({word} as bigint)")
    return "array(" + ", ".join(parts) + ")"


def lang_hits_arr_col(text_col: str) -> Column:
    """array<long> of per-language evidence scores as ONE self-contained
    Column (no staged inputs) — the reference/composability path: the
    lowercase/tokenize subexpressions are inlined per reference, so this
    re-lowers the text once per language. Engine paths (lang_id,
    corpus_features) stage lang_stage1_col/lang_stage2_cols through named
    columns first and build the array with lang_hits_arr_sql instead."""
    low = f"lower(`{text_col}`)"
    stops = (
        f"filter(split({low}, '\\\\s+'), "
        f"t -> t IN ({_sql_in_list(ALL_STOPWORDS)}))"
    )
    return F.expr(
        lang_hits_arr_sql(text_col, low=low, ln=f"length({low})", stops=stops)
    )


def lang_pred_from_hits(hits_arr: Column) -> tuple[Column, Column]:
    """(lang_pred, lang_hits) from a materialized hits array (LANGS order).
    array_position returns the FIRST index of the max, so ties resolve to the
    lexicographically smallest language (LANGS is sorted); zero evidence ->
    'und'. Pass a bound column (see lang_id's staged select), not the raw
    lang_hits_arr_col expression — each reference here re-evaluates its input."""
    best = F.array_max(hits_arr)
    langs_arr = F.array(*[F.lit(lang) for lang in LANGS])
    pred = F.when(
        best > 0,
        F.element_at(langs_arr, F.array_position(hits_arr, best).cast("int")),
    ).otherwise(F.lit("und"))
    return pred, best.cast("long")


def lang_score_cols(text_col: str) -> dict[str, Column]:
    """Per-language integer evidence scores: stopword hits + diacritic hits
    for word-tokenized languages; CJK codepoint count for zh. Kept as the
    per-language reference definition (tests, oracle generation); the engine
    path is the single-pass lang_hits_arr_col."""
    scores = {
        lang: (
            stopword_hits_col(text_col, lang) + char_hits_col(text_col, lang)
        ).cast("long")
        for lang in LANG_STOPWORDS
    }
    scores["zh"] = cjk_hits_col(text_col).cast("long")
    return scores


def lang_pred_cols(text_col: str) -> tuple[Column, Column]:
    """(lang_pred, lang_hits) as bare columns — composable into a wider
    select. Single-pass internals (lang_hits_arr_col); prefer staging the
    array through a named column first (as lang_id and corpus_features do)
    so the argmax's two references don't each re-evaluate the aggregate."""
    return lang_pred_from_hits(lang_hits_arr_col(text_col))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang_pred, lang_hits): language with the highest evidence score
    (stopword hits + diacritic hits; CJK codepoints for zh); ties and
    zero-evidence rows resolve to lexicographic order / 'und'.

    Staged selects: lowercased text, then the stopword-only token array,
    then the hits array, each materialized under a name so later references
    bind a column instead of re-inlining the tokenize (CollapseProject keeps
    the stages split because the referenced expressions are non-cheap and
    multiply referenced, SPARK-36718)."""
    s1 = df.select(F.col(id_col), F.col(text_col), lang_stage1_col(text_col))
    s2 = s1.select(
        F.col(id_col), F.col(text_col), F.col("__lang_low"),
        *lang_stage2_cols(),
    )
    staged = s2.select(
        F.col(id_col),
        F.expr(lang_hits_arr_sql(text_col)).alias("__lang_hits_arr"),
    )
    pred, best = lang_pred_from_hits(F.col("__lang_hits_arr"))
    return staged.select(
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
    en_hits = quality_stopword_hits_col(text_col)
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
    en_hits = quality_stopword_hits_col(text_col)
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


# (name, pattern, replacement) triples, applied IN ORDER — emails first so
# the digit-run rule cannot eat the local part of an address. Patterns are
# restricted to the syntax Java regex and RE2 (the DuckDB oracle) interpret
# identically: character classes, bounded repeats, \b, ASCII \d.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("longnum", r"\b\d{9,}\b", "<NUM>"),
]


def scrub_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: list[tuple[str, str, str]] | None = None,
    clean_col: str = "clean_text",
) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4 addresses, long digit runs) —
    the scrubbing pass a web corpus gets before training.

    Returns (id, clean_text, n_<name>... per pattern). Each pattern's count
    is taken on the text AS IT STANDS when that pattern runs (sequential
    semantics: an address inside an already-redacted email is not counted
    twice); the oracle nests the same stages in SQL. NULL text propagates
    to NULL outputs in both engines.

    Scale shape: a pure projection — regexp_count + regexp_replace chains
    inside whole-stage codegen, no shuffle, no UDF; composes with scans so
    column pruning still reaches the parquet reader.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    text = F.col(text_col)
    counts = []
    for name, pat, repl in patterns:
        counts.append(F.regexp_count(text, F.lit(pat)).alias(f"n_{name}"))
        text = F.regexp_replace(text, pat, repl)
    return df.select(F.col(id_col), text.alias(clean_col), *counts)


def _line_col(text_col: str) -> Column:
    """Non-empty lines (whitespace-trimmed) as an array<string>."""
    return F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )


def _run_stats(arr: Column) -> Column:
    """Single-pass run scan over a SORTED array: struct(n, n_distinct,
    max_run, total_chars, dup_chars). Equal elements are adjacent after the
    sort, so one aggregate() yields distinct count, the longest run (= the
    max multiplicity), and the characters inside runs longer than 1 — no
    explode, no shuffle: the whole computation is a map-side expression."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("n_distinct"),
        F.lit(0).cast("long").alias("max_run"),
        F.lit(0).cast("long").alias("total_chars"),
        F.lit(0).cast("long").alias("dup_chars"),
    )

    def step(st, x):
        same = st["prev"].isNotNull() & (st["prev"] == x)
        run = F.when(same, st["run"] + 1).otherwise(F.lit(1).cast("long"))
        ln = F.length(x).cast("long")
        # a run crossing 2 retroactively owes the first copy's chars too
        dup_add = (
            F.when(run == 2, ln * 2)
            .when(run > 2, ln)
            .otherwise(F.lit(0).cast("long"))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (st["n"] + 1).alias("n"),
            (st["n_distinct"] + F.when(same, 0).otherwise(1)).alias("n_distinct"),
            F.greatest(st["max_run"], run).alias("max_run"),
            (st["total_chars"] + ln).alias("total_chars"),
            (st["dup_chars"] + dup_add).alias("dup_chars"),
        )

    return F.aggregate(F.sort_array(arr), init, step)


def repetition_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition (boilerplate) signals per document:
    (id, n_lines, dup_line_frac, dup_line_char_frac, top_token_frac).

    - ``dup_line_frac``: 1 - distinct/total over non-empty trimmed lines —
      the "fraction of duplicate lines" filter (nav bars, cookie banners).
    - ``dup_line_char_frac``: fraction of line characters inside lines
      occurring more than once (weights long repeated blocks).
    - ``top_token_frac``: the most frequent token's share of all tokens
      (degenerate keyword-stuffed pages).

    Plan: sort_array + one aggregate() per column family — a pure projection
    (no explode, no shuffle, no UDF); cost is the per-document O(L log L)
    sort, bounded by document size. Empty documents score 0.0. The driver
    oracle recomputes every number relationally (unnest + GROUP BY in
    DuckDB), an independent execution path. NULL text counts as empty.

    The two run-scan structs are materialized in their OWN projection and
    the ratios reference struct fields from a second one: inlining the
    fields directly would re-evaluate the whole sort+scan per numerator,
    denominator, and guard (~10 O(L log L) passes per row — measured 17 s
    vs 3.6 s for the noop write at sf0.1). CollapseProject leaves the
    boundary alone because the producing expressions are non-cheap and
    referenced more than once."""
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    staged = df.select(
        F.col(id_col),
        _run_stats(_line_col(text_col)).alias("_lines"),
        _run_stats(tokens_col(text_col)).alias("_toks"),
    )
    lines = F.col("_lines")
    toks = F.col("_toks")
    return staged.select(
        F.col(id_col),
        lines["n"].alias("n_lines"),
        F.when(
            lines["n"] > 0,
            F.lit(1.0) - lines["n_distinct"].cast("double") / lines["n"].cast("double"),
        )
        .otherwise(0.0)
        .alias("dup_line_frac"),
        F.when(
            lines["total_chars"] > 0,
            lines["dup_chars"].cast("double") / lines["total_chars"].cast("double"),
        )
        .otherwise(0.0)
        .alias("dup_line_char_frac"),
        F.when(
            toks["n"] > 0,
            toks["max_run"].cast("double") / toks["n"].cast("double"),
        )
        .otherwise(0.0)
        .alias("top_token_frac"),
    )


def token_topk(
    df: DataFrame,
    text_col: str,
    k: int = 100,
    by_col: str | None = None,
) -> DataFrame:
    """Corpus vocabulary heavy hitters: the k most frequent tokens (whitespace
    tokenization, lowercased) with their counts and corpus share — optionally
    per ``by_col`` group (e.g. per language). Output: [by_col,] token, n,
    frac, rank. Ties break lexicographically for determinism.

    Scale shape (see :func:`topk_from_token_counts` for the second half):
    the counted table is consumed TWICE (top-K branch and totals branch),
    and Spark recomputes the explode+count subtree for each consumer —
    ReuseExchange does not fire across differently-partitioned consumers,
    and a grouping-sets single-pass formulation does not survive the
    optimizer either (the grouping-id filters get pushed below the
    aggregation, splitting the branches again; verified on the executed
    plan). For a one-off query that is fine; a PIPELINE should materialize
    :func:`token_counts` once (persist / write) and call
    :func:`topk_from_token_counts` — the same split this package uses for
    minhash signatures vs LSH banding.
    """
    counted = token_counts(df, text_col, by_col=by_col)
    return topk_from_token_counts(counted, k, by_col=by_col)


def token_counts(
    df: DataFrame, text_col: str, by_col: str | None = None
) -> DataFrame:
    """([by_col,] token, n): token occurrence counts — the expensive text
    pass (explode + map-side partial count; the shuffle carries one row per
    distinct token per task, not per occurrence). Materialize THIS table in
    pipelines that feed it to several consumers."""
    groups = [by_col] if by_col else []
    toks = df.select(*groups, F.explode(tokens_col(text_col)).alias("token"))
    return toks.groupBy(*groups, "token").agg(F.count(F.lit(1)).alias("n"))


def topk_from_token_counts(
    counted: DataFrame, k: int = 100, by_col: str | None = None
) -> DataFrame:
    """Top-k + corpus share from a (possibly materialized) counts table.

    The ``row_number() <= k`` top-K is a WindowGroupLimit (partial top-K
    per input partition BEFORE its exchange — even the global no-``by_col``
    mode moves only k rows per task through the single-partition window),
    and ``frac`` joins the one-row-per-group totals AFTER the top-K filter
    as a NULL-SAFE broadcast (a plain equi-join would silently DROP the
    NULL group — e.g. untagged-language documents), so the full vocabulary
    never crosses a single-partition boundary.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    groups = [by_col] if by_col else []
    rank_w = (
        Window.partitionBy(*groups) if groups else Window.partitionBy()
    ).orderBy(F.col("n").desc(), F.col("token"))
    top = counted.withColumn("rank", F.row_number().over(rank_w)).where(
        F.col("rank") <= k
    )
    totals = counted.groupBy(*groups).agg(F.sum("n").alias("_total"))
    if groups:
        g = groups[0]
        joined = top.join(
            F.broadcast(totals), top[g].eqNullSafe(totals[g])
        ).drop(totals[g])
    else:
        joined = top.crossJoin(F.broadcast(totals))
    return joined.withColumn("frac", F.col("n") / F.col("_total")).select(
        *groups, "token", "n", "frac", "rank"
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k keywords per document by smoothed TF-IDF:
    ``score = tf * (ln((N + 1) / (df + 1)) + 1)`` (sklearn's smooth idf).
    Output: (id, token, tf, df, score, rank); ties break lexicographically.

    Scale shape: text is exploded and aggregated to (doc, token, tf) ONCE;
    doc-frequency is a ``count over (partition by token)`` window on that
    same table — no self-join, and no second evaluation of the explode (a
    groupBy+join formulation computes the tf subtree twice: Spark's
    ReuseExchange does not fire across the differently-partitioned
    consumers, verified on the executed plan). N arrives as a broadcast
    scalar and the final ``row_number() <= k`` is a WindowGroupLimit
    partial top-K keyed by doc. Exchanges: (doc, token) agg -> token
    window -> doc window, each carrying one row per distinct (doc, token).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (F.ln((F.col("_n") + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "score", "rank")
    )


def url_features(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Append per-URL curation keys: ``domain`` (lower-cased host),
    ``tld`` (last dot-label of the host), ``path_depth`` (non-empty path
    segments), ``is_https``. The domain column is what
    :func:`~streamchange_spark.operators.sampling.cap_per_group` and
    per-domain mixture rates key on in a web-corpus pipeline.

    Pure ``try_parse_url``/regexp projections (JVM codegen, no UDF);
    malformed URLs yield NULL host rather than an ANSI-mode error (plain
    ``parse_url`` throws INVALID_URL under ANSI), and every derived column
    is NULL for such rows — a curation rule like ``path_depth == 0`` must
    not classify garbage URLs as root pages.
    """
    url = F.col(url_col)
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    path = F.try_parse_url(url, F.lit("PATH"))
    segs = F.filter(F.split(F.coalesce(path, F.lit("")), "/"), lambda s: s != F.lit(""))
    valid = host.isNotNull()
    return (
        df.withColumn("domain", host)
        .withColumn("tld", F.element_at(F.split(host, r"\."), -1))
        .withColumn("path_depth", F.when(valid, F.size(segs)))
        .withColumn(
            "is_https", F.when(valid, F.startswith(F.lower(url), F.lit("https://")))
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 0,
    chunk_col: str = "chunk_text",
) -> DataFrame:
    """Split each document into token-window chunks with optional overlap —
    the context-length slicing pass of an LLM training pipeline. Output:
    (id, chunk_id, n_tokens, chunk_text); chunk i covers tokens
    ``[i*(chunk-overlap), i*(chunk-overlap)+chunk)`` of the lower-cased
    whitespace tokenization (consistent with every other token operator
    here); empty/NULL documents yield no rows, short documents yield one.

    Scale shape: pure projection + one explode — the chunk index sequence
    is generated per row (``sequence`` + ``explode``) and each chunk is a
    ``slice``+``array_join`` over the already-tokenized array, all inside
    whole-stage codegen; no shuffle, no UDF. Fan-out is bounded by
    n_tokens/(chunk-overlap) rows per document.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1: {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, chunk_tokens): {overlap}")
    step = chunk_tokens - overlap
    toks = tokens_col(text_col)
    staged = df.select(
        F.col(id_col), toks.alias("_tk"), F.size(toks).alias("_n")
    ).where(F.col("_n") > 0)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.col("_n") - F.lit(overlap)) / F.lit(float(step)))
    ).cast("int")
    exploded = staged.select(
        F.col(id_col),
        "_tk",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("_tk"), F.col("chunk_id") * step + 1, chunk_tokens
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias(chunk_col),
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    nfc: bool = True,
    lowercase: bool = False,
    collapse_whitespace: bool = False,
    strip_controls: bool = False,
) -> DataFrame:
    """Canonical text normalization — the step that runs BEFORE hashing/
    dedup so that byte-different-but-equivalent texts (decomposed accents,
    stray control bytes, whitespace runs) collapse to one form. Applied in
    a fixed order: strip control chars -> NFC -> lowercase -> collapse
    whitespace (each opt-in).

    Everything except NFC is a JVM regexp/lower projection. Unicode
    normalization has no Spark builtin, so the NFC step is the one
    Arrow-batched pandas piece (``Series.str.normalize`` — skipped
    entirely when ``nfc=False``, keeping the all-JVM fast path); it is
    byte-identical to DuckDB's ``nfc_normalize`` (verified incl.
    ligatures / fullwidth / combining marks), which keeps the driver
    oracle hash-exact. NULL text stays NULL. Whitespace collapse uses
    ASCII ``\\s`` semantics — Java regex and DuckDB's RE2 agree; NBSP and
    other unicode spaces are PRESERVED (and NFC keeps them), matching the
    tokenizer convention used across this package."""
    col = F.col(text_col)
    if strip_controls:
        col = F.regexp_replace(col, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    if nfc:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        @pandas_udf(StringType())
        def _nfc(s):
            return s.str.normalize("NFC")

        col = _nfc(col)
    if lowercase:
        col = F.lower(col)
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return df.withColumn(out_col, col)
