"""Sequence packing: map documents onto fixed-token training sequences.

The last hop of a pretraining data pipeline: the cleaned corpus must be
laid out as fixed-length token sequences. This implements the standard
concat-then-chunk discipline (documents are concatenated in a deterministic
order and the stream is cut every ``budget`` tokens; documents may straddle
sequence boundaries — attention masks downstream handle that), which unlike
greedy bin-packing is a PREFIX SUM, so it runs as window arithmetic with no
sequential state and has an exact SQL twin.

Scale shape: a single global document order would serialize the cumsum
(one-partition window). Instead the corpus is sharded by a deterministic
hash of the id into ``n_shards`` independent streams, each packed in
parallel — sequence identity is (shard, seq_id), and every shard's layout
is reproducible under re-runs, repartitioning, and corpus growth *within
unchanged shards*. ``n_shards`` should be >= cluster cores; each shard's
window is one partition's sort, the same cost class as sessionize.

Output columns (one row per document):
  shard, doc_id, n_tokens, tok_start (offset in the shard's concatenated
  stream), seq_first / seq_last (the fixed-budget sequences the document
  touches), seq_offset (position within seq_first where the document
  begins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _MD5_HEX_CHARS, split_bucket_col
from .textstats import token_count_col

__all__ = ["pack_sequences"]


def _md5_long(key_col: str, seed: int, salt: str) -> Column:
    """The engine's oracle-replayable hash (sampling.py convention):
    DuckDB twin ``('0x' || substr(md5(key || ':salt:seed'), 1, 15))::BIGINT``."""
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("null"))
    return F.conv(
        F.substring(
            F.md5(F.concat(key, F.lit(f":{salt}:{int(seed)}"))),
            1,
            _MD5_HEX_CHARS,
        ),
        16,
        10,
    ).cast("bigint")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str | None = None,
    token_count_col_name: str | None = None,
    budget: int = 2048,
    n_shards: int = 64,
    seed: int = 0,
    drop_empty: bool = True,
) -> DataFrame:
    """Assign every document its (shard, token-offset, sequence-span) in a
    concat-then-chunk packing of ``budget``-token sequences.

    Token counts come from ``token_count_col_name`` if the table already
    carries them (the corpus_features flow), else from whitespace
    tokenization of ``text_col``. Shard and in-shard order both come from
    the engine's md5 keyed-hash convention (sampling.py — exactly
    replayable in DuckDB), so the layout is deterministic, uncorrelated
    with crawl order (adjacent-in-crawl near-duplicates don't co-locate in
    sequences), and oracle-checkable end to end.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1: {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    if (text_col is None) == (token_count_col_name is None):
        raise ValueError("pass exactly one of text_col / token_count_col_name")
    n_tok = (
        F.col(token_count_col_name)
        if token_count_col_name
        else token_count_col(text_col)
    ).cast("long")
    base = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        split_bucket_col(id_col, seed=seed, n_buckets=n_shards, salt="packshard")
        .cast("int")
        .alias("shard"),
        _md5_long(id_col, seed, "packorder").alias("_ord"),
    )
    if drop_empty:
        base = base.where(F.col("n_tokens") > 0)
    w = Window.partitionBy("shard").orderBy("_ord", id_col)
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (cum - F.col("n_tokens")).alias("tok_start")
    out = base.select(
        "shard",
        F.col(id_col),
        "n_tokens",
        start,
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("seq_first"),
        F.floor((cum - 1) / budget).cast("long").alias("seq_last"),
        F.pmod(cum - F.col("n_tokens"), F.lit(int(budget)))
        .cast("long")
        .alias("seq_offset"),
    )
    return out
