"""Structured Streaming change-point detection (stretch path; SURVEY.md §7.8).

Batch mode replays each key's series ordered by time, which reproduces the
reference's strictly-ordered stream exactly. This module is the true-streaming
variant: ``applyInPandasWithState`` keeps per-key detector state across
micro-batches. Late rows (watermark-expired) are dropped — the exact-match
guarantee holds only for in-order delivery, matching the reference's model of
a strictly ordered stream (SURVEY.md §2.7).

State is the pickled kernel detector itself: the kernels are plain-Python/
NumPy objects, so they serialize cheaply and the per-batch cost is just the
new rows' updates.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType([StructField("blob", BinaryType(), True)])

CPT_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("detection_ts", TimestampType(), True),
        StructField("changepoint_ts", TimestampType(), True),
    ]
)


def streaming_window_segmentor(
    df: DataFrame,
    detector_factory: Callable,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """readStream DataFrame -> change-point stream.

    Emits one row per detected change point, keyed by ``key_col``. Each key's
    WindowSegmentor (plus its absolute-time counter) lives in the group state.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            detector, t_abs, times = pickle.loads(state.get[0])
        else:
            detector, t_abs, times = detector_factory(), 0, []

        out_rows: list[dict[str, Any]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            values = pdf[value_col].to_numpy(dtype="float64")
            tss = list(pdf[ts_col])
            for v, ts in zip(values, tss):
                detector.update(v)
                times.append(ts)
                # bound the replay buffer to the detector's window
                if len(times) > detector.max_window + 1:
                    times = times[-(detector.max_window + 1) :]
                if detector.change_detected:
                    for cpt in detector.changepoints:
                        out_rows.append(
                            {
                                "key": key[0],
                                "detection_ts": ts,
                                "changepoint_ts": times[-(cpt + 1)],
                            }
                        )
                t_abs += 1

        state.update((pickle.dumps((detector, t_abs, times)),))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in CPT_SCHEMA.fields])

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=CPT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
