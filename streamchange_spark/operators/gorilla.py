"""Gorilla time-series compression packed into Spark binary columns.

Engine-only operator (north rule): compressed retention tiers carry
``ts_gorilla``/``val_gorilla`` BinaryType columns — one blob per (key, chunk).
Encoding follows the Gorilla paper (Pelkonen et al., VLDB 2015):

- timestamps: first value raw 64-bit, then delta-of-delta with prefix codes
  '0' (dod=0), '10'+7 bits, '110'+9 bits, '1110'+12 bits, '1111'+64 bits
  (the paper uses 32 bits in the last bucket; 64 here so arbitrary gaps
  survive — a superset that still decodes the paper's streams).
- values: IEEE-754 XOR with the previous value; '0' if identical, '10' +
  meaningful bits reusing the previous leading/length window when it still
  covers them, '11' + 5-bit leading-zero count + 6-bit length + bits.

The encoder is plain NumPy/int Python and runs inside Arrow-batched grouped
pandas UDFs (compress) / mapInPandas (decompress); round-trip equality is
bit-for-bit on doubles and exact on int64 timestamps (tests).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


class _BitWriter:
    __slots__ = ("_acc", "_nbits", "_out")

    def __init__(self):
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, value: int, nbits: int):
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def getvalue(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            return bytes(self._out) + bytes([(self._acc << pad) & 0xFF])
        return bytes(self._out)


class _BitReader:
    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0

    def read(self, nbits: int) -> int:
        value = 0
        remaining = nbits
        while remaining > 0:
            byte_i, bit_i = divmod(self._pos, 8)
            available = 8 - bit_i
            take = min(available, remaining)
            chunk = (self._data[byte_i] >> (available - take)) & ((1 << take) - 1)
            value = (value << take) | chunk
            self._pos += take
            remaining -= take
        return value


# ---------------------------------------------------------------------------
# Timestamp codec (int64, e.g. epoch seconds)
# ---------------------------------------------------------------------------
def compress_timestamps(ts: np.ndarray) -> bytes:
    ts = np.asarray(ts, dtype=np.int64)
    w = _BitWriter()
    w.write(len(ts), 32)
    if len(ts) == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if len(ts) == 1:
        return w.getvalue()
    prev_delta = int(ts[1]) - int(ts[0])
    w.write(prev_delta & ((1 << 64) - 1), 64)
    prev = int(ts[1])
    for i in range(2, len(ts)):
        t = int(ts[i])
        delta = t - prev
        dod = delta - prev_delta
        if dod == 0:
            w.write(0b0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod & 0x7F, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod & 0x1FF, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod & 0xFFF, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
        prev = t
        prev_delta = delta
    return w.getvalue()


def _sign_extend(value: int, nbits: int) -> int:
    if value >= 1 << (nbits - 1):
        value -= 1 << nbits
    return value


def decompress_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = _sign_extend(r.read(64), 64)
    out[0] = first
    if n == 1:
        return out
    prev_delta = _sign_extend(r.read(64), 64)
    prev = first + prev_delta
    out[1] = prev
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = _sign_extend(r.read(7), 7)
            elif r.read(1) == 0:
                dod = _sign_extend(r.read(9), 9)
            elif r.read(1) == 0:
                dod = _sign_extend(r.read(12), 12)
            else:
                dod = _sign_extend(r.read(64), 64)
        prev_delta += dod
        prev += prev_delta
        out[i] = prev
    return out


# ---------------------------------------------------------------------------
# Value codec (float64)
# ---------------------------------------------------------------------------
def compress_values(values: np.ndarray) -> bytes:
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    w.write(len(bits), 32)
    if len(bits) == 0:
        return w.getvalue()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_leading, prev_length = 65, 0  # "no previous window"
    for i in range(1, len(bits)):
        cur = int(bits[i])
        xor = prev ^ cur
        if xor == 0:
            w.write(0b0, 1)
        else:
            leading = 64 - xor.bit_length()
            trailing = (xor & -xor).bit_length() - 1
            if leading > 31:
                leading = 31  # 5-bit field
            length = 64 - leading - trailing
            if (
                prev_length
                and leading >= prev_leading
                and 64 - prev_leading - prev_length <= trailing
            ):
                # reuse previous window
                w.write(0b10, 2)
                shift = 64 - prev_leading - prev_length
                w.write((xor >> shift) & ((1 << prev_length) - 1), prev_length)
            else:
                w.write(0b11, 2)
                w.write(leading, 5)
                w.write(length - 1, 6)  # length in [1, 64]
                w.write(xor >> trailing, length)
                prev_leading, prev_length = leading, length
        prev = cur
    return w.getvalue()


def decompress_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    prev_leading, prev_length = 65, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:
            shift = 64 - prev_leading - prev_length
            xor = r.read(prev_length) << shift
        else:
            prev_leading = r.read(5)
            prev_length = r.read(6) + 1
            shift = 64 - prev_leading - prev_length
            xor = r.read(prev_length) << shift
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------
def compress_series(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """One row per key: (keys..., n_points, ts_gorilla, val_gorilla).
    Timestamps are packed as epoch seconds (int64)."""
    key_cols = list(key_cols)
    by_name = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [StructField(c, by_name[c].dataType, True) for c in key_cols]
        + [
            StructField("n_points", LongType(), True),
            StructField("ts_gorilla", BinaryType(), True),
            StructField("val_gorilla", BinaryType(), True),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ts = (pdf[ts_col].astype("int64").to_numpy() // 1_000_000_000).astype(np.int64)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        row = {c: pdf[c].iloc[0] for c in key_cols}
        row["n_points"] = len(pdf)
        row["ts_gorilla"] = compress_timestamps(ts)
        row["val_gorilla"] = compress_values(vals)
        return pd.DataFrame([row], columns=[f.name for f in schema.fields])

    out = df.repartition(num_partitions, *key_cols) if num_partitions else df.repartition(*key_cols)
    return out.groupBy(*key_cols).applyInPandas(run, schema)


def decompress_series(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Inverse of compress_series: explode blobs back into
    (keys..., ts timestamp, value double) rows via mapInPandas (streams
    Arrow batches; never materializes the whole table per worker)."""
    key_cols = list(key_cols)
    in_schema = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [StructField(c, in_schema[c].dataType, True) for c in key_cols]
        + [
            StructField(ts_col, TimestampType(), True),
            StructField(value_col, DoubleType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                ts = decompress_timestamps(row["ts_gorilla"])
                vals = decompress_values(row["val_gorilla"])
                frame = pd.DataFrame(
                    {
                        ts_col: pd.to_datetime(ts, unit="s"),
                        value_col: vals,
                    }
                )
                for c in key_cols:
                    frame[c] = row[c]
                frames.append(frame[[*key_cols, ts_col, value_col]])
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return df.mapInPandas(run, schema)


def compression_ratio(df: DataFrame) -> DataFrame:
    """Diagnostic: bytes per point for a compressed table."""
    return df.select(
        F.sum("n_points").alias("points"),
        F.sum(F.octet_length("ts_gorilla") + F.octet_length("val_gorilla")).alias(
            "bytes"
        ),
    ).select(
        "points", "bytes", (F.col("bytes") / F.col("points")).alias("bytes_per_point")
    )
