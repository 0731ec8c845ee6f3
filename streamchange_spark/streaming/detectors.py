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
from collections import deque
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


def _streaming_per_update(
    df: DataFrame,
    detector_factory: Callable,
    emit: Callable,
    out_schema: StructType,
    key_col: str,
    ts_col: str,
    value_col,
    watermark: str,
    max_history: int,
) -> DataFrame:
    """Shared per-key stateful scan: pickled kernel detector + bounded
    replay-time buffer in group state; ``emit(detector, key, ts, times)``
    returns 0..n output dicts after each update. ``value_col`` may be a
    list of columns — each update then feeds the detector a p-vector (the
    reference's multivariate ``update(np.ndarray)`` contract)."""
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            detector, times = pickle.loads(state.get[0])
            # older checkpoints stored a plain list
            if not isinstance(times, deque):
                times = deque(times, maxlen=max_history)
        else:
            detector, times = detector_factory(), deque(maxlen=max_history)

        out_rows: list[dict[str, Any]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            if len(value_cols) == 1:
                values = pdf[value_cols[0]].to_numpy(dtype="float64")
            else:
                values = pdf[value_cols].to_numpy(dtype="float64")
            tss = list(pdf[ts_col])
            # One update() per row is intentional: the sequential contract
            # emits per-observation (alarm/last_cpt/anomaly state after EACH
            # update), so the block-batched replay used in the batch path
            # cannot be applied here without changing semantics.
            for v, ts in zip(values, tss):
                detector.update(v)
                # deque(maxlen=...) trims in O(1); a list re-slice here would
                # copy max_history entries per row (O(rows * max_history))
                times.append(ts)
                out_rows.extend(emit(detector, key[0], ts, times))

        state.update((pickle.dumps((detector, times)),))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=[f.name for f in out_schema.fields]
            )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ALARM_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("detection_ts", TimestampType(), True),
        StructField("penalised_score", DoubleType(), True),
        StructField("changepoint", LongType(), True),
    ]
)


def streaming_sequential_detector(
    df: DataFrame,
    detector_factory: Callable,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col="value",
    watermark: str = "1 hour",
    max_history: int = 10_000,
) -> DataFrame:
    """Online penalized-score monitor as a stream (reference
    sequential/detector.py:10-79 — its flagship `update()` API): one output
    row per ALARM (penalized score > 0), carrying the score and the score's
    changepoint offset (observations back from the alarm; null when the
    score has no changepoint estimate), matching what
    ``SequentialChangeDetector.fit`` records per alarm."""

    def emit(detector, key, ts, times):
        if detector.change_detected:
            cpt = detector.changepoint
            return [
                {
                    "key": key,
                    "detection_ts": ts,
                    "penalised_score": float(detector.penalised_score.value),
                    "changepoint": int(cpt) if cpt else None,
                }
            ]
        return []

    return _streaming_per_update(
        df, detector_factory, emit, ALARM_SCHEMA,
        key_col, ts_col, value_col, watermark, max_history,
    )


PELT_STREAM_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("last_cpt", LongType(), True),
        StructField("changepoint_ts", TimestampType(), True),
    ]
)


def streaming_pelt(
    df: DataFrame,
    detector_factory: Callable,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
    max_history: int = 10_000,
) -> DataFrame:
    """Online Pelt as a stream: one row per update with the DP's current
    ``last_cpt`` (most recent optimal changepoint, observations back) and
    its absolute time — the per-update surface of the reference's online
    `update()` loop (final segments are a batch product; replay the trail
    through ``Pelt.extract_segments`` for those)."""

    def emit(detector, key, ts, times):
        lc = int(detector.last_cpt)
        # lc == len(times) is valid: the changepoint at the first buffered
        # observation (times[-lc] == times[0])
        cpt_ts = times[-lc] if 0 < lc <= len(times) else None
        return [{"key": key, "ts": ts, "last_cpt": lc, "changepoint_ts": cpt_ts}]

    return _streaming_per_update(
        df, detector_factory, emit, PELT_STREAM_SCHEMA,
        key_col, ts_col, value_col, watermark, max_history,
    )


CAPA_STREAM_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("kind", StringType(), True),
        StructField("start_ts", TimestampType(), True),
    ]
)


def streaming_capa(
    df: DataFrame,
    detector_factory: Callable,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
    max_history: int = 10_000,
) -> DataFrame:
    """Online CAPA as a stream: one row per update whose DP state classifies
    the current time as anomalous — kind 'point' (anomaly_start == 0) or
    'collective' (anomaly_start k > 0, start_ts = k observations back).
    Non-anomalous updates emit nothing (append-mode friendly)."""

    def emit(detector, key, ts, times):
        start = int(detector.anomaly_start)
        if start < 0:
            return []
        if start == 0:
            return [{"key": key, "ts": ts, "kind": "point", "start_ts": ts}]
        start_ts = times[-(start + 1)] if start + 1 <= len(times) else None
        return [
            {"key": key, "ts": ts, "kind": "collective", "start_ts": start_ts}
        ]

    return _streaming_per_update(
        df, detector_factory, emit, CAPA_STREAM_SCHEMA,
        key_col, ts_col, value_col, watermark, max_history,
    )
