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
# Bit packing (vectorized): tokens are (value, nbits) pairs, nbits <= 64
# ---------------------------------------------------------------------------
def _pack_tokens(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Concatenate variable-width big-endian tokens into a byte blob.
    Final byte is zero-padded in the low bits (bit-stream convention: big-endian, zero-padded tail)."""
    nbits = np.asarray(nbits, dtype=np.int64)
    values = np.asarray(values, dtype=np.uint64)
    keep = nbits > 0
    nbits, values = nbits[keep], values[keep]
    total = int(nbits.sum())
    if total == 0:
        return b""
    # Token i's nbits_i bits are the tail of its 64-bit big-endian image;
    # gather them all with one fancy-index into the unpacked bit matrix —
    # O(total_bits) with a fixed handful of numpy calls (a per-bit-position
    # loop costs ~1.2 ms/call on short series; this is ~30x cheaper).
    allbits = np.unpackbits(values.astype(">u8").view(np.uint8))
    reps = np.repeat(np.arange(len(nbits)), nbits)
    k = np.arange(total) - np.repeat(np.cumsum(nbits) - nbits, nbits)
    src = reps * 64 + (64 - np.repeat(nbits, nbits)) + k
    return np.packbits(allbits[src]).tobytes()


_POW2 = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized int.bit_length for uint64 (no float round-off)."""
    return np.searchsorted(_POW2, x, side="right").astype(np.int64)


# ---------------------------------------------------------------------------
# Timestamp codec (int64, e.g. epoch seconds)
# ---------------------------------------------------------------------------
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def compress_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta prefix codes, fully vectorized: classify every dod into
    its bucket with np.select, then bit-pack prefix+payload token pairs in
    one shot. Buckets are two's-complement widths 7/9/12/64 (so the decoder's
    sign-extension is exact for every representable value)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    head_v = [np.uint64(n & 0xFFFFFFFF)]
    head_b = [32]
    if n >= 1:
        head_v.append(ts[:1].view(np.uint64)[0])
        head_b.append(64)
    if n >= 2:
        head_v.append((ts[1:2] - ts[:1]).view(np.uint64)[0])
        head_b.append(64)
    if n <= 2:
        return _pack_tokens(np.array(head_v, dtype=np.uint64), np.array(head_b))

    d = np.diff(ts)
    dod = d[1:] - d[:-1]
    zero = dod == 0
    c7 = (dod >= -64) & (dod <= 63) & ~zero
    c9 = (dod >= -256) & (dod <= 255) & ~c7 & ~zero
    c12 = (dod >= -2048) & (dod <= 2047) & ~c9 & ~c7 & ~zero
    conds = [zero, c7, c9, c12]
    prefix_v = np.select(conds, [0b0, 0b10, 0b110, 0b1110], 0b1111).astype(np.uint64)
    prefix_b = np.select(conds, [1, 2, 3, 4], 4)
    pay_b = np.select(conds, [0, 7, 9, 12], 64)
    mask = np.where(
        pay_b >= 64, _M64, np.left_shift(np.uint64(1), np.minimum(pay_b, 63).astype(np.uint64)) - np.uint64(1)
    )
    pay_v = dod.view(np.uint64) & mask

    m = len(dod)
    vals = np.empty(len(head_v) + 2 * m, dtype=np.uint64)
    bits = np.empty(len(head_b) + 2 * m, dtype=np.int64)
    vals[: len(head_v)] = head_v
    bits[: len(head_b)] = head_b
    vals[len(head_v)::2], vals[len(head_v) + 1::2] = prefix_v, pay_v
    bits[len(head_b)::2], bits[len(head_b) + 1::2] = prefix_b, pay_b
    return _pack_tokens(vals, bits)


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
    """XOR float codec. The leading/trailing-zero counts of every xor are
    vectorized up front (exact, via binary search — no float log round-off);
    the remaining Python loop only tracks the sequential window-reuse state
    and emits (value, nbits) tokens, packed vectorized at the end."""
    fbits = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(fbits)
    if n == 0:
        return _pack_tokens(np.array([0], dtype=np.uint64), np.array([32]))
    xors_np = fbits[:-1] ^ fbits[1:]
    bl = _bit_length_u64(xors_np)
    leading_np = np.minimum(64 - bl, 31)
    low = xors_np & (np.uint64(0) - xors_np)  # isolate lowest set bit
    trailing_np = _bit_length_u64(low) - 1  # -1 for xor==0 (unused)
    xors = xors_np.tolist()
    leadings = leading_np.tolist()
    trailings = trailing_np.tolist()

    vals = [n & 0xFFFFFFFF, int(fbits[0])]
    bits = [32, 64]
    prev_leading, prev_length = 65, 0  # "no previous window"
    for i in range(n - 1):
        xor = xors[i]
        if xor == 0:
            vals.append(0b0)
            bits.append(1)
            continue
        leading = leadings[i]
        trailing = trailings[i]
        length = 64 - leading - trailing
        if (
            prev_length
            and leading >= prev_leading
            and 64 - prev_leading - prev_length <= trailing
        ):
            # reuse previous window: '10' control token + payload token
            # (separate tokens: control+payload can exceed 64 bits combined)
            shift = 64 - prev_leading - prev_length
            vals.append(0b10)
            bits.append(2)
            vals.append((xor >> shift) & ((1 << prev_length) - 1))
            bits.append(prev_length)
        else:
            # '11' + 5-bit leading + 6-bit (length-1), then payload token
            vals.append((0b11 << 11) | (leading << 6) | (length - 1))
            bits.append(13)
            vals.append(xor >> trailing)
            bits.append(length)
            prev_leading, prev_length = leading, length
    return _pack_tokens(
        np.array(vals, dtype=np.uint64), np.array(bits, dtype=np.int64)
    )


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
    assume_partitioned: bool = False,
) -> DataFrame:
    """One row per key: (keys..., n_points, ts_gorilla, val_gorilla).
    Timestamps are packed as epoch seconds (int64). Pass
    ``assume_partitioned=True`` when rows are already hash-clustered by key
    to skip the exchange."""
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

    colnames = [f.name for f in schema.fields]

    def run(batches):
        # One sort + two array conversions per PARTITION, then pure NumPy
        # slices per key — per-group pandas ops (sort_values/astype/iloc)
        # cost ~1 ms each and dominate on short per-URL series.
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if pdf.empty:
            return
        pdf = pdf.sort_values([*key_cols, ts_col], ignore_index=True)
        ts_all = (pdf[ts_col].astype("int64").to_numpy() // 1_000_000_000).astype(
            np.int64
        )
        vals_all = pdf[value_col].to_numpy(dtype=np.float64)
        rows = []
        for key, idx in pdf.groupby(key_cols, sort=False, dropna=False).indices.items():
            if not isinstance(key, tuple):
                key = (key,)
            lo, hi = idx[0], idx[-1] + 1  # contiguous after the sort
            row = dict(zip(key_cols, key))
            row["n_points"] = hi - lo
            row["ts_gorilla"] = compress_timestamps(ts_all[lo:hi])
            row["val_gorilla"] = compress_values(vals_all[lo:hi])
            rows.append(row)
        yield pd.DataFrame(rows, columns=colnames)

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Project BEFORE the shuffle: extra input columns would be shuffled,
    # Arrow-converted, and concat'd in the workers for nothing.
    slim = df.select(*key_cols, ts_col, value_col)
    if assume_partitioned:
        return slim.mapInPandas(run, schema)
    return slim.repartition(n, *key_cols).mapInPandas(run, schema)


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
            key_series = {c: pdf[c] for c in key_cols}
            for i in range(len(pdf)):
                ts = decompress_timestamps(pdf["ts_gorilla"].iloc[i])
                vals = decompress_values(pdf["val_gorilla"].iloc[i])
                frame = pd.DataFrame(
                    {
                        ts_col: pd.to_datetime(ts, unit="s"),
                        value_col: vals,
                    }
                )
                for c in key_cols:
                    frame[c] = key_series[c].iloc[i]
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
