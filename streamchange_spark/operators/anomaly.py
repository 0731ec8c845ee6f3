"""Rolling-baseline anomaly scores.

The lightweight SQL-native cousin of the reference's sequential detectors
(reference `streamchange/sequential/base.py` score contract): score each
observation against a trailing window of its own key's history —
``z = (x - mean(trailing W)) / stddev(trailing W)`` — and flag |z| above a
threshold. Where `SequentialChangeDetector` carries kernel state across rows,
this is a pure window expression: one hash exchange on the key, one sort,
whole-stage codegen for the frame aggregates; nothing leaves the JVM.

The trailing frame EXCLUDES the current row (``rows between W preceding and
1 preceding``): the baseline must not contain the observation being judged,
or a level shift drags the mean toward itself and mutes the score.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_zscore"]


def rolling_zscore(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    window: int = 24,
    min_periods: int = 8,
    threshold: float = 3.0,
    order_tiebreak: Sequence[str] = (),
    z_col: str = "zscore",
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """Append ``z_col`` (double, null when the baseline is undefined) and
    ``flag_col`` (boolean, null iff z is null).

    z is null when fewer than ``min_periods`` prior rows exist in the frame
    or the trailing stddev is 0 (a constant baseline makes any deviation
    infinitely surprising — surface it as null, not ±inf). ``window`` and
    ``min_periods`` count ROWS, not time: pair with a rollup tier (e.g.
    hourly buckets from :func:`rollup_tier`) when a time-based baseline is
    wanted. All frame aggregates share one Window exec (same partitioning,
    ordering, and frame), so the plan carries a single exchange.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    if min_periods < 2:
        raise ValueError(f"min_periods must be >= 2 (stddev needs 2): {min_periods}")
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    frame = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(-window, -1)
    )
    mean = F.avg(value_col).over(frame)
    sd = F.stddev_samp(F.col(value_col)).over(frame)
    n = F.count(value_col).over(frame)
    z = F.when(
        (n >= min_periods) & (sd > 0),
        (F.col(value_col) - mean) / sd,
    )
    return df.withColumn(z_col, z).withColumn(
        flag_col, F.abs(F.col(z_col)) > threshold
    )
