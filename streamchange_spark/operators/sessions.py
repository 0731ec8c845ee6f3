"""Gap-based sessionization of event streams.

The classic time-series segmentation every analytics engine ships: split each
key's ordered event stream wherever the gap to the previous event exceeds a
threshold, label the pieces, and aggregate per-session stats. (The reference
engine segments series by *statistical* change — `WindowSegmentor` etc.;
sessionization is the degenerate rule-based cousin over the same
key-ordered-stream shape, reference `streamchange/base.py` contract.)

Scale shape: ONE hash exchange on the key. The lag/cumsum windows partition
by the key, and the follow-up per-session aggregate groups by
``(key, session_id)`` — ``HashPartitioning(key)`` already satisfies the
clustered distribution of the superset key, so Catalyst inserts no second
exchange (asserted in tests). Everything else is whole-stage-codegen column
arithmetic; nothing leaves the JVM.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def _ms(col: Column) -> Column:
    """Epoch milliseconds; the cast makes TIMESTAMP_NTZ parquet columns
    acceptable to unix_millis (identity under the pinned UTC session tz)."""
    return F.unix_millis(col.cast("timestamp"))


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: float,
    order_tiebreak: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Append ``session_col``: 1-based session index per key, ordered by
    ``ts_col`` (+ ``order_tiebreak`` for a deterministic total order when
    timestamps tie). A new session starts when the gap to the previous
    event exceeds ``gap_seconds``.

    Millisecond arithmetic (``unix_millis``) so sub-second timestamps are
    honored without float-epoch comparisons.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0: {gap_seconds}")
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    ms = _ms(F.col(ts_col))
    prev_ms = F.lag(ms).over(w)
    is_new = F.when(
        prev_ms.isNull() | ((ms - prev_ms) > int(round(gap_seconds * 1000))),
        F.lit(1),
    ).otherwise(F.lit(0))
    # Running sum of session starts = the session index. Both windows share
    # the same partitioning + ordering, so they run in one Window exec.
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(running))


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: float,
    value_col: str | None = None,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Sessionize, then aggregate one row per ``(key..., session_id)``:
    ``session_start`` / ``session_end`` / ``n_events`` /
    ``duration_sec`` (+ ``sum_value`` when ``value_col`` given).

    The groupBy keys are a superset of the window's partition keys, so the
    window's exchange is reused — one shuffle end to end.
    """
    sess = sessionize(
        df, key_cols, ts_col, gap_seconds, order_tiebreak=order_tiebreak
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (_ms(F.max(ts_col)) - _ms(F.min(ts_col))) / F.lit(1000.0)
        ).alias("duration_sec"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return sess.groupBy(*key_cols, "session_id").agg(*aggs)
