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

The read path uses ``decompress_*_batch``: all blobs of an Arrow batch are
decoded in lockstep, one token per vectorized round across rows (see the
"Vectorized batch decoders" section). The scalar ``decompress_timestamps`` /
``decompress_values`` loops are kept as the readable reference
implementation; fuzz tests assert batch == scalar bit-for-bit.
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


def _finish_timestamps_scalar(
    r: _BitReader, out: np.ndarray, base: int, start: int, n: int,
    prev: int, prev_delta: int,
) -> None:
    """Token loop shared by the scalar decoder and the batch decoder's
    narrow-tail fallback: decode points ``start..n-1`` into
    ``out[base+start : base+n]`` given mid-stream state."""
    for i in range(start, n):
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
        out[base + i] = prev


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
    _finish_timestamps_scalar(r, out, 0, 2, n, prev, prev_delta)
    return out


# ---------------------------------------------------------------------------
# Value codec (float64)
# ---------------------------------------------------------------------------
def compress_values(values: np.ndarray) -> bytes:
    """XOR float codec, fully vectorized.

    Window policy (the one encoder choice the format leaves open): a token
    reuses the previous window ('10') iff its (leading, length) pair equals
    the previous nonzero token's, else it re-declares the window ('11').
    This differs from the paper's greedy containment reuse — which needs a
    sequential scan, see ``compress_values_greedy`` — but produces an
    equally valid stream for the same decoder: runs of identical windows
    (the common smooth-series case) pay the 13-bit header once. Everything
    is array arithmetic + one vectorized bit-pack, ~100x the greedy loop's
    throughput."""
    fbits = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(fbits)
    if n == 0:
        return _pack_tokens(np.array([0], dtype=np.uint64), np.array([32]))
    head_v = np.array([n & 0xFFFFFFFF, fbits[0]], dtype=np.uint64)
    head_b = np.array([32, 64], dtype=np.int64)
    if n == 1:
        return _pack_tokens(head_v, head_b)
    xors = fbits[:-1] ^ fbits[1:]
    bl = _bit_length_u64(xors)
    leading = np.minimum(64 - bl, 31)
    low = xors & (np.uint64(0) - xors)
    trailing = _bit_length_u64(low) - 1
    length = 64 - leading - trailing  # garbage where xor==0 (masked below)

    nz = xors != 0
    m = len(xors)
    # Window of the previous NONZERO token (zero tokens don't touch window
    # state): forward-fill each nonzero position's predecessor index.
    nzidx = np.flatnonzero(nz)
    same = np.zeros(m, dtype=bool)
    if nzidx.size > 1:
        cur, prv = nzidx[1:], nzidx[:-1]
        same[cur] = (leading[cur] == leading[prv]) & (length[cur] == length[prv])
    # Token layout per xor: zero -> ('0',1); reuse -> ('10',2)+(payload,len);
    # new window -> (13-bit header,13)+(payload,len).
    n_tok = np.where(nz, 2, 1)
    off = np.cumsum(n_tok) - n_tok + 2  # +2 for the two header tokens
    total = 2 + int(n_tok.sum())
    vals = np.zeros(total, dtype=np.uint64)
    bits = np.zeros(total, dtype=np.int64)
    vals[:2], bits[:2] = head_v, head_b
    # control / header token
    ctrl_v = np.where(
        nz,
        np.where(
            same,
            np.uint64(0b10),
            (np.uint64(0b11) << np.uint64(11))
            | (leading.astype(np.uint64) << np.uint64(6))
            | np.where(nz, length - 1, 0).astype(np.uint64),
        ),
        np.uint64(0),
    )
    ctrl_b = np.where(nz, np.where(same, 2, 13), 1)
    vals[off] = ctrl_v
    bits[off] = ctrl_b
    # payload token (nonzero xors only)
    pay_pos = off[nz] + 1
    vals[pay_pos] = xors[nz] >> trailing[nz].astype(np.uint64)
    bits[pay_pos] = length[nz]
    return _pack_tokens(vals, bits)


def compress_values_greedy(values: np.ndarray) -> bytes:
    """The paper's greedy containment window-reuse policy (reuse while the
    previous window still covers the xor's meaningful bits). Sequential by
    nature — kept as the readable reference; decodes with the same decoder
    and is used to fuzz encoder-policy equivalence after round-trip."""
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


def _finish_values_scalar(
    r: _BitReader, out: np.ndarray, base: int, start: int, n: int,
    prev: int, prev_leading: int, prev_length: int,
) -> None:
    """Token loop shared by the scalar decoder and the batch decoder's
    narrow-tail fallback (see _finish_timestamps_scalar)."""
    for i in range(start, n):
        if r.read(1) == 0:
            out[base + i] = prev
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
        out[base + i] = prev


def decompress_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    _finish_values_scalar(r, out, 0, 1, n, prev, 65, 0)
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# Vectorized batch decoders (the read path).
#
# Variable-width prefix codes are inherently sequential WITHIN one stream —
# token i+1's position depends on token i — but a partition of a compressed
# tier carries thousands of per-key blobs, so the decoder vectorizes ACROSS
# streams instead: every blob in the batch advances one token per "round",
# and each round is a handful of NumPy gathers over all still-active rows.
# Work is O(total tokens) with NumPy-width = #active rows, replacing the
# per-bit Python loop (~0.7 s per 100k points) that dominated the read path.
# Rounds = longest series in the batch, so per-key series of similar length
# (the rollup-tier shape) decode at near-full vector width throughout.
# ---------------------------------------------------------------------------
def _concat_bits(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """All blobs as one 0/1 uint8 bit array (+tail padding so classification
    reads never index out of bounds) and each blob's starting bit offset."""
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=len(blobs))
    data = np.frombuffer(b"".join(blobs) + b"\x00" * 16, dtype=np.uint8)
    bits = np.unpackbits(data)
    starts = (np.cumsum(lens) - lens) * 8
    return bits, starts


def _read_fixed(bits: np.ndarray, pos: np.ndarray, width: int) -> np.ndarray:
    """Read a ``width``-bit big-endian uint at each position (vectorized)."""
    if pos.size == 0:
        return np.empty(0, dtype=np.uint64)
    chunk = bits[pos[:, None] + np.arange(width)].astype(np.uint64)
    weights = np.left_shift(
        np.uint64(1), np.arange(width - 1, -1, -1, dtype=np.uint64)
    )
    return (chunk * weights).sum(axis=1, dtype=np.uint64)


def _read_var(bits: np.ndarray, pos: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Per-row variable-width big-endian reads (widths in 1..64)."""
    if pos.size == 0:
        return np.empty(0, dtype=np.uint64)
    k = np.arange(int(widths.max()))
    chunk = bits[pos[:, None] + k].astype(np.uint64)
    active = k[None, :] < widths[:, None]
    shift = np.where(active, widths[:, None] - 1 - k, 0).astype(np.uint64)
    return np.where(active, chunk << shift, np.uint64(0)).sum(
        axis=1, dtype=np.uint64
    )


_TS_PREFIX = np.array([1, 2, 3, 4, 4], dtype=np.int64)
_TS_WIDTH = np.array([0, 7, 9, 12, 64], dtype=np.int64)


def decompress_timestamps_batch(
    blobs: list[bytes],
) -> tuple[np.ndarray, np.ndarray]:
    """Decode many timestamp blobs in lockstep.

    Returns (values, lengths): all series concatenated in blob order as
    int64, plus the per-blob point count."""
    R = len(blobs)
    if R == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    bits, pos = _concat_bits(blobs)
    n = _read_fixed(bits, pos, 32).astype(np.int64)
    pos = pos + 32
    out_base = np.cumsum(n) - n
    out = np.empty(int(n.sum()), dtype=np.int64)
    prev = np.zeros(R, dtype=np.int64)
    delta = np.zeros(R, dtype=np.int64)

    has1 = n >= 1
    first = _read_fixed(bits, pos[has1], 64).view(np.int64)
    prev[has1] = first
    out[out_base[has1]] = first
    pos[has1] += 64

    has2 = n >= 2
    d0 = _read_fixed(bits, pos[has2], 64).view(np.int64)
    delta[has2] = d0
    prev[has2] += d0
    out[out_base[has2] + 1] = prev[has2]
    pos[has2] += 64

    act = np.flatnonzero(n > 2)
    pos_a, prev_a, delta_a = pos[act], prev[act], delta[act]
    n_a, base_a = n[act], out_base[act]
    cnt_a = np.full(act.size, 2, dtype=np.int64)
    while pos_a.size:
        if pos_a.size <= 8 and (n_a - cnt_a).max() > 4096:
            # Lockstep width has collapsed to a few long series (skew tail);
            # per-round NumPy overhead now exceeds the scalar loop's cost.
            packed = np.packbits(bits).tobytes()
            for j in range(pos_a.size):
                r = _BitReader(packed)
                r._pos = int(pos_a[j])
                _finish_timestamps_scalar(
                    r, out, int(base_a[j]), int(cnt_a[j]), int(n_a[j]),
                    int(prev_a[j]), int(delta_a[j]),
                )
            break
        b0, b1 = bits[pos_a], bits[pos_a + 1]
        b2, b3 = bits[pos_a + 2], bits[pos_a + 3]
        # class k reads only the k+1 leading prefix bits that belong to the
        # token; later conditions are masked out, so the (possibly
        # out-of-token) b1..b3 gathers are harmless.
        cls = np.where(
            b0 == 0,
            0,
            np.where(b1 == 0, 1, np.where(b2 == 0, 2, np.where(b3 == 0, 3, 4))),
        )
        prefix = _TS_PREFIX[cls]
        width = _TS_WIDTH[cls]
        dod = np.zeros(pos_a.size, dtype=np.int64)
        nz = cls > 0
        if nz.any():
            w = width[nz]
            v = _read_var(bits, (pos_a + prefix)[nz], w)
            full = w == 64
            small = v.astype(np.int64)  # < 2^63 whenever w < 64
            signed = np.where(
                full,
                v.view(np.int64),
                small
                - np.where(
                    (small >> np.maximum(w - 1, 0)) & 1 == 1,
                    np.left_shift(np.int64(1), np.minimum(w, 63)),
                    0,
                ),
            )
            dod[nz] = signed
        delta_a = delta_a + dod
        prev_a = prev_a + delta_a
        out[base_a + cnt_a] = prev_a
        cnt_a += 1
        pos_a = pos_a + prefix + width
        alive = cnt_a < n_a
        if not alive.all():
            pos_a, prev_a, delta_a = pos_a[alive], prev_a[alive], delta_a[alive]
            n_a, base_a, cnt_a = n_a[alive], base_a[alive], cnt_a[alive]
    return out, n


def decompress_values_batch(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Decode many value blobs in lockstep.

    Returns (values, lengths): all series concatenated in blob order as
    float64 (bit-exact), plus the per-blob point count."""
    R = len(blobs)
    if R == 0:
        return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64)
    bits, pos = _concat_bits(blobs)
    n = _read_fixed(bits, pos, 32).astype(np.int64)
    pos = pos + 32
    out_base = np.cumsum(n) - n
    out = np.empty(int(n.sum()), dtype=np.uint64)
    prev = np.zeros(R, dtype=np.uint64)

    has1 = n >= 1
    first = _read_fixed(bits, pos[has1], 64)
    prev[has1] = first
    out[out_base[has1]] = first
    pos[has1] += 64

    act = np.flatnonzero(n > 1)
    pos_a, prev_a = pos[act], prev[act]
    n_a, base_a = n[act], out_base[act]
    cnt_a = np.full(act.size, 1, dtype=np.int64)
    lead_a = np.full(act.size, 65, dtype=np.int64)
    len_a = np.zeros(act.size, dtype=np.int64)
    while pos_a.size:
        if pos_a.size <= 8 and (n_a - cnt_a).max() > 4096:
            packed = np.packbits(bits).tobytes()
            for j in range(pos_a.size):
                r = _BitReader(packed)
                r._pos = int(pos_a[j])
                _finish_values_scalar(
                    r, out, int(base_a[j]), int(cnt_a[j]), int(n_a[j]),
                    int(prev_a[j]), int(lead_a[j]), int(len_a[j]),
                )
            break
        b0, b1 = bits[pos_a], bits[pos_a + 1]
        zero = b0 == 0
        new_win = (b0 == 1) & (b1 == 1)
        if new_win.any():
            lead_a[new_win] = _read_fixed(bits, (pos_a + 2)[new_win], 5).astype(
                np.int64
            )
            len_a[new_win] = (
                _read_fixed(bits, (pos_a + 7)[new_win], 6).astype(np.int64) + 1
            )
        prefix = np.where(zero, 1, np.where(new_win, 13, 2))
        width = np.where(zero, 0, len_a)
        nz = ~zero
        if nz.any():
            v = _read_var(bits, (pos_a + prefix)[nz], width[nz])
            shift = (64 - lead_a[nz] - len_a[nz]).astype(np.uint64)
            prev_a[nz] ^= v << shift
        out[base_a + cnt_a] = prev_a
        cnt_a += 1
        pos_a = pos_a + prefix + width
        alive = cnt_a < n_a
        if not alive.all():
            pos_a, prev_a, cnt_a = pos_a[alive], prev_a[alive], cnt_a[alive]
            n_a, base_a = n_a[alive], base_a[alive]
            lead_a, len_a = lead_a[alive], len_a[alive]
    return out.view(np.float64), n


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
    chunk_points: int | None = None,
) -> DataFrame:
    """One row per key: (keys..., n_points, ts_gorilla, val_gorilla).
    Timestamps are packed as epoch seconds (int64). Pass
    ``assume_partitioned=True`` when rows are already hash-clustered by key
    to skip the exchange.

    ``chunk_points`` (opt-in) splits each key's series into consecutive
    chunks of at most that many points, one output row per (key, chunk)
    with an extra ``chunk_id`` column. At 100 TB this bounds the skew
    tail: a hot key's multi-million-point series otherwise becomes a
    single blob whose decode is one sequential token stream (the batch
    decoder's scalar fallback), whereas chunks decode at full lockstep
    width and re-compress independently under retention rewrites."""
    key_cols = list(key_cols)
    by_name = {f.name: f for f in df.schema.fields}
    chunk_fields = (
        [StructField("chunk_id", LongType(), True)] if chunk_points else []
    )
    schema = StructType(
        [StructField(c, by_name[c].dataType, True) for c in key_cols]
        + chunk_fields
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
            step = chunk_points or (hi - lo)
            for chunk_id, c_lo in enumerate(range(lo, hi, max(step, 1))):
                c_hi = min(c_lo + step, hi)
                row = dict(zip(key_cols, key))
                if chunk_points:
                    row["chunk_id"] = chunk_id
                row["n_points"] = c_hi - c_lo
                row["ts_gorilla"] = compress_timestamps(ts_all[c_lo:c_hi])
                row["val_gorilla"] = compress_values(vals_all[c_lo:c_hi])
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
    """Inverse of compress_series: blobs back to
    (keys..., ts timestamp, value double) rows.

    The Python stage emits ONE row per blob carrying the decoded series as
    arrays; the row explosion happens JVM-side (``arrays_zip`` +
    ``explode``, whole-stage codegen). Exploding in Python instead would
    repeat every key string per POINT through the Arrow channel — at 25M
    points / 20k string keys the array plan measured 6.9 s vs 10.7 s on 8
    cores, and the gap widens with key width."""
    key_cols = list(key_cols)
    in_schema = {f.name: f for f in df.schema.fields}
    from pyspark.sql.types import ArrayType, LongType as _Long

    arr_schema = StructType(
        [StructField(c, in_schema[c].dataType, True) for c in key_cols]
        + [
            StructField("_ts_arr", ArrayType(_Long()), True),
            StructField("_v_arr", ArrayType(DoubleType()), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ts, n = decompress_timestamps_batch(pdf["ts_gorilla"].tolist())
            vals, _ = decompress_values_batch(pdf["val_gorilla"].tolist())
            bounds = np.cumsum(n)
            out = {c: pdf[c] for c in key_cols}
            out["_ts_arr"] = np.split(ts, bounds[:-1])
            out["_v_arr"] = np.split(vals, bounds[:-1])
            yield pd.DataFrame(out)

    arrs = df.mapInPandas(run, arr_schema)
    return (
        arrs.select(
            *key_cols, F.explode(F.arrays_zip("_ts_arr", "_v_arr")).alias("_z")
        )
        .select(
            *key_cols,
            F.timestamp_seconds(F.col("_z._ts_arr")).alias(ts_col),
            F.col("_z._v_arr").alias(value_col),
        )
    )


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
