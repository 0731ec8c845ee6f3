"""Gorilla codec: pure-codec round trips + the Spark compress/decompress
operators (binary tier columns) end to end."""

import numpy as np
import pandas as pd
import pytest

from streamchange_spark.operators import compress_series, decompress_series
from streamchange_spark.operators.gorilla import (
    compress_timestamps,
    compress_values,
    decompress_timestamps,
    decompress_values,
)


def test_timestamp_roundtrip_exact():
    rng = np.random.RandomState(3)
    ts = np.cumsum(rng.choice([1, 3600, 3600, 3600, 7200, 86400 * 40], 4000)) + 1_700_000_000
    assert np.array_equal(decompress_timestamps(compress_timestamps(ts)), ts)


def test_timestamp_regular_grid_compresses_hard():
    ts = 1_700_000_000 + 3600 * np.arange(10000)
    blob = compress_timestamps(ts)
    # constant delta -> dod = 0 -> 1 bit per point after the header
    assert len(blob) < 10000 / 8 + 32


def test_value_roundtrip_bitexact():
    rng = np.random.RandomState(4)
    for vals in [
        rng.normal(0, 1, 3000),
        np.repeat(2.5, 500),
        np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 5e-324, 1.7e308]),
        rng.randint(0, 100, 1000).astype(float),
    ]:
        back = decompress_values(compress_values(vals))
        assert np.array_equal(vals.view(np.uint64), back.view(np.uint64))


def test_empty_and_singleton():
    assert decompress_timestamps(compress_timestamps(np.array([], dtype=np.int64))).size == 0
    assert decompress_values(compress_values(np.array([]))).size == 0
    assert decompress_timestamps(compress_timestamps(np.array([7])))[0] == 7
    assert decompress_values(compress_values(np.array([1.5])))[0] == 1.5


@pytest.fixture(scope="module")
def tier_df(spark):
    rng = np.random.RandomState(5)
    frames = []
    for key in ["u1", "u2"]:
        n = 300
        ts = 1_704_067_200 + 3600 * np.arange(n) + rng.choice([0, 3600], n).cumsum()
        frames.append(
            pd.DataFrame(
                {
                    "key": key,
                    "bucket_start": pd.to_datetime(ts, unit="s"),
                    "v": rng.normal(50, 4, n),
                }
            )
        )
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def test_spark_compress_decompress_roundtrip(spark, tier_df):
    compressed = compress_series(tier_df, ["key"], "bucket_start", "v")
    comp_pd = compressed.toPandas()
    assert set(comp_pd["key"]) == {"u1", "u2"}
    assert (comp_pd["n_points"] == 300).all()

    restored = (
        decompress_series(compressed, ["key"], ts_col="bucket_start", value_col="v")
        .orderBy("key", "bucket_start")
        .toPandas()
    )
    original = tier_df.orderBy("key", "bucket_start").toPandas()
    assert len(restored) == len(original)
    assert (restored["key"].to_numpy() == original["key"].to_numpy()).all()
    assert np.array_equal(
        restored["bucket_start"].to_numpy(), original["bucket_start"].to_numpy()
    )
    # bit-for-bit on the doubles
    assert np.array_equal(
        restored["v"].to_numpy().view(np.uint64),
        original["v"].to_numpy().view(np.uint64),
    )


def test_chunked_compress_roundtrip(spark, tier_df):
    """chunk_points splits each key into bounded blobs (skew-tail bound);
    the decompressed union must equal the unchunked round trip exactly."""
    compressed = compress_series(
        tier_df, ["key"], "bucket_start", "v", chunk_points=64
    )
    comp_pd = compressed.toPandas()
    assert "chunk_id" in comp_pd.columns
    assert (comp_pd["n_points"] <= 64).all()
    # 300 points per key -> ceil(300/64) = 5 chunks each
    assert comp_pd.groupby("key")["chunk_id"].count().eq(5).all()
    restored = (
        decompress_series(compressed, ["key"], ts_col="bucket_start", value_col="v")
        .orderBy("key", "bucket_start")
        .toPandas()
    )
    original = tier_df.orderBy("key", "bucket_start").toPandas()
    assert np.array_equal(
        restored["v"].to_numpy().view(np.uint64),
        original["v"].to_numpy().view(np.uint64),
    )
    assert np.array_equal(
        restored["bucket_start"].to_numpy(), original["bucket_start"].to_numpy()
    )


def test_timestamp_dod_bucket_boundaries():
    """dod values at the two's-complement bucket edges (+-64, +-256, +-2048)
    must survive the round trip — a sign-extension regression guard."""
    deltas = [100]
    for dod in (64, -64, 63, -65, 256, -256, 255, -257, 2048, -2048, 2047, -2049):
        deltas.append(deltas[-1] + dod)
    ts = np.concatenate([[0], np.cumsum(deltas)]).astype(np.int64)
    from streamchange_spark.operators.gorilla import (
        compress_timestamps,
        decompress_timestamps,
    )
    assert np.array_equal(decompress_timestamps(compress_timestamps(ts)), ts)


def test_batch_decoders_match_scalar_fuzz():
    """Lockstep batch decoders == scalar reference, bit for bit, across both
    encoder policies (vectorized equal-window + greedy containment), empty/
    1/2-point edge blobs, and one long series that exercises the batch
    decoder's narrow-tail scalar fallback."""
    from streamchange_spark.operators.gorilla import (
        compress_timestamps,
        compress_values,
        compress_values_greedy,
        decompress_timestamps,
        decompress_timestamps_batch,
        decompress_values,
        decompress_values_batch,
    )

    rng = np.random.RandomState(11)
    ts_blobs, val_blobs = [], []
    for trial in range(120):
        n = int(rng.randint(0, 60))
        ts = np.cumsum(rng.randint(-5000, 5000, n)).astype(np.int64)
        vals = [
            rng.randn(n),
            np.round(np.cumsum(rng.randn(n)), 3),
            np.repeat(rng.randn(max(n // 3, 1)), 3)[:n].astype(float),
            rng.choice([0.0, 1.5, np.inf, -np.inf, np.nan, 1e300, 5e-324], n),
        ][trial % 4]
        enc = compress_values if trial % 2 else compress_values_greedy
        ts_blobs.append(compress_timestamps(ts))
        val_blobs.append(enc(np.asarray(vals, dtype=np.float64)))
    n_long = 6000
    ts_blobs.append(
        compress_timestamps(np.cumsum(rng.randint(1, 3600, n_long)).astype(np.int64))
    )
    val_blobs.append(compress_values(np.round(np.cumsum(rng.randn(n_long)), 3)))

    bt, nt = decompress_timestamps_batch(ts_blobs)
    bv, nv = decompress_values_batch(val_blobs)
    off = 0
    for i, blob in enumerate(ts_blobs):
        ref = decompress_timestamps(blob)
        assert np.array_equal(bt[off : off + nt[i]], ref), f"ts blob {i}"
        off += nt[i]
    off = 0
    for i, blob in enumerate(val_blobs):
        ref = decompress_values(blob)
        assert np.array_equal(
            bv[off : off + nv[i]].view(np.uint64), ref.view(np.uint64)
        ), f"val blob {i}"
        off += nv[i]


def test_vectorized_encoder_not_larger_than_greedy_on_smooth_series():
    """The equal-window policy should compress typical rollup series at
    least as well as greedy containment (narrower re-declared windows beat
    wide-window reuse on rounded-value streams)."""
    from streamchange_spark.operators.gorilla import (
        compress_values,
        compress_values_greedy,
    )

    rng = np.random.RandomState(12)
    smooth = np.round(np.cumsum(rng.randn(20000)), 3)
    assert len(compress_values(smooth)) <= len(compress_values_greedy(smooth))


def test_random_walk_fuzz_roundtrip():
    from streamchange_spark.operators.gorilla import (
        compress_timestamps,
        compress_values,
        decompress_timestamps,
        decompress_values,
    )
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = int(rng.integers(1, 4000))
        ts = np.cumsum(rng.integers(-5000, 5000, n)).astype(np.int64)
        vals = np.where(
            rng.random(n) < 0.3, rng.normal(0, 1e6, n), np.round(rng.normal(0, 10, n), 3)
        )
        assert np.array_equal(decompress_timestamps(compress_timestamps(ts)), ts)
        assert np.array_equal(
            decompress_values(compress_values(vals)).view(np.uint64),
            vals.view(np.uint64),
        )


def test_hypothesis_roundtrip_property():
    """Property-based fuzz (hypothesis): ANY int64-delta-safe timestamp
    series and ANY float64 series (incl. nan/inf/subnormals/negative zero)
    round-trip bit-exactly through both encoder policies and both decoder
    paths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from streamchange_spark.operators.gorilla import (
        compress_timestamps,
        compress_values,
        compress_values_greedy,
        decompress_timestamps,
        decompress_timestamps_batch,
        decompress_values,
        decompress_values_batch,
    )

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**40), max_value=2**40), max_size=60
        ),
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            max_size=60,
        ),
    )
    def check(ts_list, val_list):
        ts = np.asarray(ts_list, dtype=np.int64)
        vals = np.asarray(val_list, dtype=np.float64)
        tb = compress_timestamps(ts)
        assert np.array_equal(decompress_timestamps(tb), ts)
        bt, nt = decompress_timestamps_batch([tb])
        assert np.array_equal(bt, ts)
        for enc in (compress_values, compress_values_greedy):
            vb = enc(vals)
            assert np.array_equal(
                decompress_values(vb).view(np.uint64), vals.view(np.uint64)
            )
            bv, _ = decompress_values_batch([vb])
            assert np.array_equal(bv.view(np.uint64), vals.view(np.uint64))

    check()
