"""As-of join: point-in-time enrichment of an event stream with the most
recent state row per key — the canonical time-series join Spark lacks as a
built-in (engine-only operator; DuckDB's ``ASOF JOIN`` is the oracle).

Plan shape (100 TB): NO range-explode, NO per-row subquery, NO broadcast
requirement. Both inputs are unioned into one stream tagged by side, hash
partitioned by key, and sorted once by (ts, side) with state rows ordering
before event rows at equal timestamps; a single ``last(..., ignorenulls)``
running window then carries the whole state row (one struct — so a null
attribute inside a state row stays null) forward onto the events. Cost
= one co-partitioning exchange + one sort — the same bound as any windowed
aggregation on the key, and strictly cheaper than the
join-then-filter-then-argmax plans (which shuffle the full cross-bucket
pair set). Hot keys land on one partition, as with any window; pre-split
extreme keys upstream if a single key's history exceeds a partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
    matched_ts_col: str = "asof_ts",
) -> DataFrame:
    """Left join: every ``left`` row, enriched with ``right_cols`` from the
    ``right`` row with the greatest ``right_ts`` <= ``left_ts`` on the same
    key (``direction='backward'``; ``'forward'`` takes the smallest
    ``right_ts`` >= ``left_ts``). Ties on the timestamp itself match
    (inclusive, as in DuckDB/pandas ``merge_asof``). No match (or match
    farther than ``tolerance_seconds``) leaves the enrichment columns null.

    ``right`` should be unique per (key, right_ts); among duplicates the
    carried row is the last in partition sort order (unspecified).
    Output: all ``left`` columns + ``matched_ts_col`` + ``right_cols``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction}")
    key_cols = list(key_cols)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (*key_cols, right_ts)
        ]
    right_cols = list(right_cols)
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left columns; "
            "rename before joining"
        )
    left_other = [c for c in left.columns if c not in key_cols]

    # One unioned stream: state rows (side=0) order before event rows
    # (side=1) at equal timestamps, making the equal-ts match inclusive.
    # The carried state is ONE struct per right row (non-null iff side=0):
    # per-column last(ignorenulls) would skip a right row's legitimately-null
    # attribute and resurrect a stale value from an older state row.
    state_struct = F.struct(
        F.col(right_ts).alias(matched_ts_col),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r_branch = right.select(
        *key_cols,
        F.col(right_ts).alias("_asof_sort_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_other],
        state_struct.alias("_asof_state"),
    )
    null_struct_t = right.select(state_struct.alias("s")).schema["s"].dataType
    l_branch = left.select(
        *key_cols,
        F.col(left_ts).alias("_asof_sort_ts"),
        F.lit(1).alias("_asof_side"),
        *left_other,
        F.lit(None).cast(null_struct_t).alias("_asof_state"),
    )
    merged = r_branch.unionByName(l_branch)

    order = (
        F.col("_asof_sort_ts").asc()
        if direction == "backward"
        else F.col("_asof_sort_ts").desc()
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order, F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *key_cols,
        "_asof_side",
        *left_other,
        F.last("_asof_state", ignorenulls=True).over(w).alias("_asof_state"),
    )
    out = (
        carried.where(F.col("_asof_side") == 1)
        .select(
            *key_cols,
            *left_other,
            *[
                F.col(f"_asof_state.{c}").alias(c)
                for c in (matched_ts_col, *right_cols)
            ],
        )
    )

    if tolerance_seconds is not None:
        gap = F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(
            F.col(matched_ts_col)
        )
        if direction == "forward":
            gap = -gap
        in_tol = F.col(matched_ts_col).isNotNull() & (
            gap <= int(tolerance_seconds)
        )
        out = out.select(
            *key_cols,
            *left_other,
            *[
                F.when(in_tol, F.col(c)).alias(c)
                for c in (matched_ts_col, *right_cols)
            ],
        )
    return out.select(
        *key_cols, *left_other, matched_ts_col, *right_cols
    )
