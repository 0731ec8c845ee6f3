"""Deterministic corpus splitting and sampling for training-data pipelines.

A training corpus is split train/valid/test ONCE and the assignment must be
stable forever: independent of row order, partitioning, cluster size, and
re-runs over a grown corpus (a document added tomorrow must not flip the
split of a document ingested today). Spark's ``randomSplit`` guarantees none
of that (it samples per-partition positionally). The operators here assign by
hashing the document KEY — a pure projection, no shuffle, no state:

- :func:`split_bucket_col` — md5(key ':' seed) -> 60-bit int -> bucket in
  [0, n_buckets). Same bridge as every other hash oracle in this repo:
  Spark ``conv(substr(md5(x),1,15),16,10)`` == DuckDB
  ``('0x' || substr(md5(x),1,15))::BIGINT`` (__spark_entry__ docstring).
- :func:`train_test_split` — named split per row from cumulative weight
  thresholds over the bucket. Keying by url (not doc_id) also keeps every
  re-crawl of one page in one split — the leakage the positional splitter
  can't prevent.
- :func:`sample_fraction` — deterministic keyed Bernoulli sample (the
  "seeded 1% slice" every ablation run re-reads); same hash, so the slice
  is a subset relation across rates: sample(0.01) ⊂ sample(0.1).

At 100 TB all three are map-only column expressions inside whole-stage
codegen — they compose with scans (predicate pushdown still applies to other
filters) and cost one md5 per row.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cap_per_group",
    "weighted_sample_k",
    "mixture_sample",
    "sample_fraction",
    "split_bucket_col",
    "train_test_split",
]

_MD5_HEX_CHARS = 15  # 60 bits: fits bigint in both engines, no sign issues


def split_bucket_col(
    key_col: str, seed: int = 0, n_buckets: int = 10_000, salt: str = ""
) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key and seed.

    NULL keys hash the literal string 'null' (stable, never a null bucket).

    CROSS-OPERATOR CORRELATION: every sampler in this module shares this
    bucket at the same ``(seed, salt)``, so a default-seed
    :func:`sample_fraction` slice selects the LOWEST buckets — which nest
    entirely inside the first-named split of :func:`train_test_split` (a 1%
    sample is drawn 100% from 'train'), and any two samplers at one seed
    pick identical keys. WITHIN one operator that nesting is the feature
    (subset relation across rates; splits stable under re-runs). ACROSS
    operators it is usually unwanted: pass a distinct ``salt`` (or seed)
    per purpose — e.g. ``salt='split'`` for the split pass and
    ``salt='ablation'`` for a sample — to decorrelate the draws. The salt
    participates as ``md5(key ':' salt ':' seed)`` (DuckDB twin:
    ``('0x' || substr(md5(key || ':salt:seed'), 1, 15))::BIGINT``); the
    default '' preserves the historical ``md5(key ':' seed)`` form.
    """
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("null"))
    tag = f":{salt}:{int(seed)}" if salt else f":{int(seed)}"
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(tag))), 1, _MD5_HEX_CHARS),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(int(n_buckets)))


def train_test_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float] | None = None,
    seed: int = 0,
    n_buckets: int = 10_000,
    split_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Append ``split_col`` naming each row's split, assigned by hashed key.

    ``weights`` maps split name -> relative weight (normalized; insertion
    order defines the bucket ranges, so pass the same dict to reproduce).
    All rows sharing a key land in the same split — key by url/domain to
    keep near-identical re-crawls out of the eval sets. Realized fractions
    converge on the weights at corpus scale (bucket granularity 1/n_buckets).
    """
    weights = dict(weights or {"train": 0.9, "valid": 0.05, "test": 0.05})
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    total = float(sum(weights.values()))
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative with a positive sum: {weights}")

    bucket = split_bucket_col(key_col, seed=seed, n_buckets=n_buckets, salt=salt)
    names = list(weights)
    expr = F.lit(names[-1])  # last split takes the remainder buckets
    acc = 0.0
    uppers = []
    for name in names[:-1]:
        acc += weights[name] / total
        uppers.append((name, int(round(acc * n_buckets))))
    for name, upper in reversed(uppers):
        expr = F.when(bucket < upper, name).otherwise(expr)
    return df.withColumn(split_col, expr)


def sample_fraction(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 0,
    n_buckets: int = 10_000,
    salt: str = "",
) -> DataFrame:
    """Keyed deterministic sample: keep rows whose bucket < fraction·n_buckets.

    Re-running, repartitioning, or growing the corpus never changes which
    keys are in; a smaller fraction at the same seed is a subset of a larger.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    bucket = split_bucket_col(key_col, seed=seed, n_buckets=n_buckets, salt=salt)
    return df.where(bucket < int(round(fraction * n_buckets)))


def mixture_sample(
    df: DataFrame,
    group_col: str,
    fractions: Mapping[str | None, float],
    key_col: str,
    seed: int = 0,
    n_buckets: int = 10_000,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keyed Bernoulli sample at a PER-GROUP rate — the data-mixing pass
    that up/down-weights sources into a training mix (e.g. wiki 2.0 is
    expressed as two passes at 1.0; code 0.3; web 0.08). Groups absent
    from ``fractions`` keep ``default_fraction`` (0 = drop).

    Same md5-bucket hash as :func:`sample_fraction`, so the per-group
    slices are deterministic, partition-invariant, and nested across
    rates. The rate lookup is a CASE expression (no join): still a pure
    map-side projection at 100 TB. Mixture maps are small by nature (a
    training mix has tens of sources); if rates came per-DOMAIN (10^5+
    entries) prefer a broadcast join against a rates table over a 10^5-arm
    CASE — the evaluator walks CASE arms linearly per row.

    NULL groups: a row with a NULL ``group_col`` never equals any string
    key (SQL three-valued logic), so it falls through to
    ``default_fraction`` — at the default 0.0, NULL-source rows are
    DROPPED. To assign the NULL group its own rate, put ``None`` in
    ``fractions`` (matched with ``isNull()``), mirroring the NULL-group
    retention convention of ``topk_from_token_counts``."""
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1]: {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1]: {default_fraction}")
    bucket = split_bucket_col(key_col, seed=seed, n_buckets=n_buckets, salt=salt)
    cutoff = F.lit(int(round(default_fraction * n_buckets)))
    for g, f in fractions.items():
        cond = (
            F.col(group_col).isNull() if g is None else F.col(group_col) == g
        )
        cutoff = F.when(cond, F.lit(int(round(f * n_buckets)))).otherwise(cutoff)
    return df.where(bucket < cutoff)


_U_DENOM = float((1 << 60) + 1)  # maps the 60-bit hash into (0, 1)


def weighted_sample_k(
    df: DataFrame,
    group_col: str,
    k: int,
    weight_col: str,
    key_col: str,
    seed: int = 0,
    rank_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep k rows per
    group with inclusion probability proportional to ``weight_col`` —
    Efraimidis–Spirakis reservoir keys ``u^(1/w)`` ranked per group, with
    the uniform u derived from the SAME md5 bucket hash as every sampler
    here (``(h+1)/(2^60+1)`` in (0,1)), so the draw is reproducible,
    partition-invariant, and re-run-stable. The hash is salted with the
    GROUP as well as the key and seed: a key that appears in several
    groups (user_id sampled per day) must get a fresh uniform per group,
    or the per-group samples are correlated replicas — ES assumes
    independent draws per item. Ranking uses the monotone transform
    ``ln(u)/w`` (descending); rows with weight <= 0 or NULL are excluded
    (zero mass). The quality-weighted corpus subsample: weight by quality
    score, group by source, keep the top-k race winners.

    Scale shape: identical to :func:`cap_per_group` — ``row_number() <= k``
    triggers Catalyst's WindowGroupLimit partial top-K, so each input
    partition ships at most k rows per group into the exchange; the hash
    and ln are map-side codegen expressions.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("null"))
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("null"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(grp, F.lit(":"), key, F.lit(f":{int(seed)}"))),
            1,
            _MD5_HEX_CHARS,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_U_DENOM)
    es = F.ln(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(es.desc(), F.col(key_col))
    rank = "_wrank" if rank_col is None else rank_col
    out = (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(rank, F.row_number().over(w))
        .where(F.col(rank) <= k)
    )
    return out.drop("_wrank") if rank_col is None else out


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    order_by: Sequence[Column | str],
    rank_col: str | None = None,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group — the per-domain document
    cap every web-corpus curation pipeline applies so one mega-site cannot
    dominate the training mix.

    ``order_by`` decides WHICH rows survive (e.g. quality desc, then id as
    the deterministic tiebreak — pass a total order for reproducible
    output). ``rank_col`` optionally exposes the 1-based rank.

    Scale shape: expressed as ``row_number() <= K`` so Catalyst's
    InferWindowGroupLimit rewrites it into a WindowGroupLimit pair — a
    map-side partial top-K per partition BEFORE the exchange, then the
    final top-K after — meaning the shuffle carries at most K rows per
    group per input partition, not the whole group. A mega-domain with
    10^8 pages ships ~K·partitions rows, not 10^8 (verified in the plan
    test; skew never reaches one reducer)."""
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1: {max_rows}")
    w = Window.partitionBy(group_col).orderBy(*order_by)
    rank = "_rank" if rank_col is None else rank_col
    out = df.withColumn(rank, F.row_number().over(w)).where(
        F.col(rank) <= max_rows
    )
    return out.drop("_rank") if rank_col is None else out
