"""Time-series hyperfunctions: time-weighted average, counter-reset-aware
rate, LTTB downsampling (operators/hyper.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamchange_spark.operators import (
    counter_rate,
    lttb,
    lttb_select,
    time_weighted_avg,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, float(s), float(v)) for k, s, v in rows], ["k", "sec", "v"]
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "v")


def test_twa_locf_weighting(spark):
    """1.0 held for 59 minutes then 100.0 for the last minute: the
    time-weighted average is 2.65, not the plain avg 50.5."""
    df = _events(spark, [("a", 0, 1.0), ("a", 3540, 100.0)])
    row = time_weighted_avg(df, ["k"], "ts", "v", "1h").collect()[0]
    assert row["n_points"] == 2
    assert row["held_seconds"] == pytest.approx(3600.0)
    assert row["twa"] == pytest.approx((1.0 * 3540 + 100.0 * 60) / 3600)


def test_twa_truncates_at_bucket_boundary(spark):
    """A point held across a bucket boundary contributes only up to its own
    bucket's end; the next bucket starts fresh from its first point."""
    df = _events(spark, [("a", 3000, 10.0), ("a", 4000, 20.0), ("a", 5000, 40.0)])
    out = {
        r["bucket_start"].minute * 60 + r["bucket_start"].hour * 3600: r
        for r in time_weighted_avg(df, ["k"], "ts", "v", "1h").collect()
    }
    b0, b1 = out[0], out[3600]
    assert b0["held_seconds"] == pytest.approx(600.0)  # 3000 -> 3600 only
    assert b0["twa"] == pytest.approx(10.0)
    # bucket 1: 4000 holds 1000s (to 5000), 5000 holds to bucket end 7200
    assert b1["held_seconds"] == pytest.approx(1000.0 + 2200.0)
    assert b1["twa"] == pytest.approx((20.0 * 1000 + 40.0 * 2200) / 3200)


def test_counter_rate_reset_correction(spark):
    """0 -> 10 -> 25 -> 5 (reset) -> 20: increase = 10+15+5+15 = 45 with one
    reset; the first sample contributes nothing."""
    df = _events(
        spark,
        [("a", 10, 0.0), ("a", 20, 10.0), ("a", 30, 25.0),
         ("a", 40, 5.0), ("a", 50, 20.0)],
    )
    row = counter_rate(df, ["k"], "ts", "v", "1h").collect()[0]
    assert row["n_samples"] == 4  # first observation excluded
    assert row["increase"] == pytest.approx(45.0)
    assert row["n_resets"] == 1
    assert row["rate_per_sec"] == pytest.approx(45.0 / 3600)


def test_counter_rate_multi_key_isolation(spark):
    """lag() never crosses keys: each key's first sample is excluded
    independently."""
    df = _events(
        spark,
        [("a", 10, 100.0), ("a", 20, 110.0), ("b", 15, 5.0), ("b", 25, 9.0)],
    )
    out = {r["k"]: r for r in counter_rate(df, ["k"], "ts", "v", "1h").collect()}
    assert out["a"]["increase"] == pytest.approx(10.0)
    assert out["b"]["increase"] == pytest.approx(4.0)
    assert out["a"]["n_resets"] == out["b"]["n_resets"] == 0


def test_lttb_select_pins_endpoints_and_extremes():
    ts = np.arange(1000, dtype=np.float64)
    vs = np.sin(ts / 40.0)
    vs[500] = 25.0  # a spike LTTB must keep
    idx = lttb_select(ts, vs, 50)
    assert len(idx) == 50
    assert idx[0] == 0 and idx[-1] == 999
    assert (np.diff(idx) > 0).all()
    assert 500 in idx  # the spike forms the largest triangle of its bucket


def test_lttb_select_passthrough_when_small():
    ts = np.arange(5, dtype=np.float64)
    assert list(lttb_select(ts, ts, 10)) == [0, 1, 2, 3, 4]


def test_lttb_operator_matches_serial_and_is_partition_invariant(spark):
    rows = []
    rng = np.random.default_rng(7)
    for k in ("a", "b"):
        base = rng.normal(0, 1, 400).cumsum()
        rows += [(k, 100 * i, float(v)) for i, v in enumerate(base)]
    df = _events(spark, rows)

    out = lttb(df, ["k"], "ts", "v", n_out=30)
    got = {
        k: g.sort_values("rank")
        for k, g in out.toPandas().groupby("k")
    }
    pdf = df.toPandas()
    for k, g in pdf.groupby("k"):
        g = g.sort_values("ts").reset_index(drop=True)
        ts_ns = g["ts"].to_numpy("datetime64[ns]").astype(np.int64)
        idx = lttb_select(ts_ns.astype(np.float64), g["v"].to_numpy(), 30)
        assert list(got[k]["value"]) == list(g["v"].to_numpy()[idx])
        assert len(got[k]) == 30

    # Partitioning must not change the selection (groupBy re-collects keys).
    out2 = lttb(df.repartition(7, "ts"), ["k"], "ts", "v", n_out=30).toPandas()
    a = out.toPandas().sort_values(["k", "rank"]).reset_index(drop=True)
    b = out2.sort_values(["k", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_lttb_validates_n_out(spark):
    df = _events(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        lttb(df, ["k"], "ts", "v", n_out=2)


@pytest.mark.parametrize("op", [time_weighted_avg, counter_rate])
def test_twa_and_rate_plan_single_exchange(spark, op):
    """The window pass and the (key, bucket) groupBy share ONE hash exchange:
    hashpartitioning(k) satisfies the aggregate's ClusteredDistribution over
    (k, bucket_start), so Catalyst must not re-shuffle between the lag/lead
    window and the aggregation. At 100 TB that reuse halves the shuffled
    bytes of the whole operator."""
    df = _events(spark, [("a", 100 * i, float(i)) for i in range(50)])
    out = op(df, ["k"], "ts", "v", "1h")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # One sort (the window's orderBy); the hash aggregate must not add one.
    assert plan.count("Sort [") == 1, plan


def test_stats_tier_merge_equals_direct_and_numpy(spark):
    """Regression tiers re-aggregate: 1h partials shifted+summed into 1d
    equal a direct 1d build, and the evaluated slope/r2/stddev match a
    NumPy least-squares fit."""
    from streamchange_spark.operators import stats_eval, stats_rollup, stats_tier

    rng = np.random.default_rng(7)
    rows = []
    for k in ("a", "b"):
        base = 1_704_067_200  # 2024-01-01
        for i in range(200):
            ts = base + int(rng.integers(0, 3 * 86400))
            rows.append((k, ts, float(i) * 0.5 + rng.normal(0, 3.0)))
    df = _events(spark, rows)
    direct = stats_eval(stats_tier(df, ["k"], "ts", "v", "1d"))
    merged = stats_eval(
        stats_rollup(stats_tier(df, ["k"], "ts", "v", "1h"), ["k"], "1d")
    )
    a = {(r["k"], r["bucket_start"]): r for r in direct.collect()}
    b = {(r["k"], r["bucket_start"]): r for r in merged.collect()}
    assert a.keys() == b.keys() and len(a) >= 6
    for key in a:
        for c in ("n", "slope", "r2", "stddev_y", "intercept"):
            x, y = a[key][c], b[key][c]
            assert (x is None) == (y is None), (key, c)
            if x is not None:
                assert abs(x - y) <= 1e-6 * max(1.0, abs(x)), (key, c, x, y)

    # numpy cross-check on one bucket of one key
    import datetime as dt

    key, row = next((k, r) for k, r in a.items() if r["n"] >= 20)
    b0 = row["bucket_start"].replace(tzinfo=dt.timezone.utc).timestamp()
    pts = [
        (ts - b0, v)
        for kk, ts, v in rows
        if kk == key[0] and b0 <= ts < b0 + 86400
    ]
    xs = np.array([p[0] for p in pts]); ys = np.array([p[1] for p in pts])
    slope, intercept = np.polyfit(xs, ys, 1)
    assert abs(row["slope"] - slope * 3600) < 1e-6 * max(1.0, abs(slope * 3600))
    assert abs(row["intercept"] - intercept) < 1e-6 * max(1.0, abs(intercept))
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(row["r2"] - r * r) < 1e-9
    assert abs(row["stddev_y"] - np.std(ys, ddof=1)) < 1e-9


def test_stats_eval_degenerate_buckets_are_null(spark):
    from streamchange_spark.operators import stats_eval, stats_rollup, stats_tier

    rows = [
        ("single", 0, 5.0),                      # n=1 -> NULL
        ("dup_x", 10, 1.0), ("dup_x", 10, 9.0),  # same ts -> NULL
        ("const_y", 20, 4.0), ("const_y", 500, 4.0),  # flat line -> r2=1
    ]
    df = _events(spark, rows)
    out = stats_eval(
        stats_rollup(stats_tier(df, ["k"], "ts", "v", "1h"), ["k"], "1d")
    )
    got = {r["k"]: r for r in out.collect()}
    for k in ("single", "dup_x"):
        assert got[k]["slope"] is None and got[k]["r2"] is None, k
    assert got["const_y"]["slope"] == 0.0
    assert got["const_y"]["r2"] == 1.0


def test_asap_window_prefers_smoothing_noisy_periodic():
    """A noisy periodic series: ASAP picks a window >1 that cuts roughness
    while preserving kurtosis (the paper's contract); a pure spike series
    whose kurtosis any smoothing would destroy keeps window 1 behavior or
    a kurtosis-preserving choice only."""
    from streamchange_spark.operators import asap_window
    from streamchange_spark.operators.hyper import (
        _kurtosis,
        _roughness,
        moving_avg,
    )

    rng = np.random.RandomState(5)
    t = np.arange(400)
    noisy = np.sin(2 * np.pi * t / 24) + rng.randn(400) * 0.4
    w = asap_window(noisy)
    assert w > 1
    sm = moving_avg(noisy, w)
    assert _roughness(sm) < _roughness(noisy)
    assert _kurtosis(sm) >= _kurtosis(noisy)
    # degenerate inputs: constant and tiny series stay unsmoothed
    assert asap_window(np.ones(100)) == 1
    assert asap_window(np.arange(5.0)) == 1


def test_asap_smooth_serial_equals_distributed(spark):
    """The grouped Arrow scan reproduces the serial replay bit-for-bit
    (same kernel, independent execution path) and emits no partial
    windows."""
    from streamchange_spark.operators import asap_smooth, asap_window
    from streamchange_spark.operators.hyper import moving_avg

    rng = np.random.RandomState(17)
    rows = []
    for k in ("a", "b", "c"):
        base = {"a": 10.0, "b": -3.0, "c": 0.0}[k]
        for i in range(150):
            rows.append(
                (k, float(i * 60),
                 float(base + np.sin(i / 7.0) + rng.randn() * 0.3))
            )
    df = spark.createDataFrame(rows, ["k", "sec", "v"]).select(
        "k", F.timestamp_seconds("sec").alias("ts"), "v"
    )
    out = asap_smooth(df, ["k"], "ts", "v").toPandas()
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["k", "sec", "v"])
    for k, g in pdf.groupby("k"):
        vs = g.sort_values("sec")["v"].to_numpy(np.float64)
        w = asap_window(vs)
        sm = moving_avg(vs, w)
        got = out[out["k"] == k].sort_values("ts")
        assert (got["window"] == w).all()
        assert len(got) == len(vs) - w + 1
        assert np.array_equal(got["smoothed"].to_numpy(np.float64), sm)
        # trailing alignment: first emitted ts is the w-th observation's
        assert got["ts"].iloc[0].timestamp() == float((w - 1) * 60)


def test_asap_window_hypothesis_invariants():
    """Property fuzz (hypothesis, serial kernel only): for ANY float series,
    asap_window returns a window in [1, n//4] and, whenever it smooths
    (w > 1), the smoothed series preserves kurtosis and does not increase
    roughness — the algorithm's two defining guarantees."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from streamchange_spark.operators import asap_window
    from streamchange_spark.operators.hyper import (
        _kurtosis,
        _roughness,
        moving_avg,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1,
            max_size=300,
        ),
        st.integers(0, 2**31),
    )
    def prop(vals, seed):
        rng = np.random.RandomState(seed % 2**31)
        vs = np.asarray(vals, dtype=np.float64)
        if len(vs) >= 16 and seed % 3 == 0:
            # mix in periodic+noise shapes so the ACF-peak path is hit
            vs = vs + np.sin(np.arange(len(vs)) / max(2, seed % 13)) * (
                1.0 + rng.rand()
            )
        w = asap_window(vs)
        assert 1 <= w <= max(1, len(vs) // 4)
        if w > 1:
            sm = moving_avg(vs, w)
            assert _kurtosis(sm) >= _kurtosis(vs)
            assert _roughness(sm) <= _roughness(vs) + 1e-12

    prop()
