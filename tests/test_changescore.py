"""Inter-snapshot change scores (operators/changescore.py).

The strongest check available: a pure-Python md5 mirror of the whole
computation (shingles -> per-permutation min-hash -> match fraction ->
score assembly) must agree EXACTLY with the Spark output — the hashes are
md5-based specifically so every value is engine-reproducible.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from streamchange_spark.operators import snapshot_change_scores

K = 8
_WS = re.compile(r"\s+")


def _sig(text: str, k: int = K, n: int = 3):
    toks = [t for t in _WS.split(text.lower()) if t]
    sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    if not sh:
        return None
    return [
        min(
            int(hashlib.md5(f"{s}#{i}".encode()).hexdigest()[:15], 16)
            for s in sh
        )
        for i in range(k)
    ]


def _expected(rows):
    """rows: list of (url, ts, text) sorted by ts within url."""
    out = {}
    by_url: dict = {}
    for url, ts, text in rows:
        by_url.setdefault(url, []).append((ts, text))
    for url, snaps in by_url.items():
        snaps.sort()
        prev_md5 = prev_sig = None
        for idx, (ts, text) in enumerate(snaps):
            md5 = hashlib.md5(text.encode()).hexdigest()
            sig = _sig(text)
            changed = None if idx == 0 else md5 != prev_md5
            jac = (
                sum(a == b for a, b in zip(sig, prev_sig)) / K
                if idx > 0 and sig is not None and prev_sig is not None
                else None
            )
            if changed is None:
                score = None
            elif not changed:
                score = 0.0
            else:
                score = None if jac is None else 1.0 - jac
            out[(url, ts)] = (len(text), changed, jac, score)
            prev_md5, prev_sig = md5, sig
    return out


@pytest.fixture()
def snapshots():
    base = "the quick brown fox jumps over the lazy dog again and again today"
    edited = base.replace("lazy dog", "sleepy cat")
    other = "completely different content with no shared phrases at all here now"
    return [
        # url a: identical -> edited -> identical -> rewritten
        ("a", 1, base),
        ("a", 2, base),
        ("a", 3, edited),
        ("a", 4, edited),
        ("a", 5, other),
        # url b: short texts (no 3-gram shingle) -> changed works, score null
        ("b", 1, "tiny text"),
        ("b", 2, "tiny text"),
        ("b", 3, "other bit"),
        # url c: single snapshot -> all null
        ("c", 7, base),
    ]


def test_matches_pure_python_mirror_exactly(spark, snapshots):
    df = spark.createDataFrame(snapshots, "url string, ts long, text string")
    got = {
        (r.url, r.ts): (r.text_len, r.changed, r.jaccard_est, r.change_score)
        for r in snapshot_change_scores(
            df, "url", "ts", "text", num_hashes=K
        ).collect()
    }
    assert got == _expected(snapshots)

    # semantic spot checks, independent of the mirror
    assert got[("a", 2)][3] == 0.0  # identical snapshot
    assert got[("a", 5)][3] == 1.0  # disjoint shingle sets -> full change
    assert 0.0 < got[("a", 3)][3] < 1.0  # partial edit
    assert got[("a", 1)] [1] is None  # first snapshot
    assert got[("b", 3)][1] is True and got[("b", 3)][3] is None  # short text
    assert got[("c", 7)][1] is None


def test_partition_invariance_and_detector_composition(spark, snapshots):
    df = spark.createDataFrame(snapshots, "url string, ts long, text string")
    a = snapshot_change_scores(df, "url", "ts", "text", num_hashes=K)
    b = snapshot_change_scores(
        df.repartition(7), "url", "ts", "text", num_hashes=K
    )
    key = ["url", "ts"]
    pd.testing.assert_frame_equal(
        a.orderBy(*key).toPandas(), b.orderBy(*key).toPandas()
    )

    with pytest.raises(ValueError, match="num_hashes"):
        snapshot_change_scores(df, num_hashes=0)


def test_churn_detector_fires_on_regime_shift(spark):
    """Positive control for the pipeline's churn stage (pipeline.py:163-173):
    a url whose change-score regime shifts (stable -> rewritten on every
    crawl) must be flagged by the exact detector composition run_pipeline
    uses, and a url with a stationary all-zero churn series must not be.
    Guards against the failure mode where churn_changepoints == 0 in the
    pipeline metrics silently means "series was all NULL/zero by bug"
    rather than "no regime shifts in the data"."""
    from streamchange_spark.operators import (
        change_scores_from_signatures,
        snapshot_signatures,
        window_segmentor_changepoints,
    )
    from streamchange_spark.pipeline import default_detector_factory

    stable_text = " ".join(f"word{i}" for i in range(30))
    rows = [("stable", t, stable_text) for t in range(1, 61)]
    rows += [("shifting", t, stable_text) for t in range(1, 31)]
    rows += [
        # disjoint shingle set per snapshot -> change_score exactly 1.0
        ("shifting", t, " ".join(f"w{t}x{i}" for i in range(30)))
        for t in range(31, 61)
    ]
    df = spark.createDataFrame(rows, "url string, ts long, text string")

    sigs = snapshot_signatures(df, "url", "ts", "text", num_hashes=K)
    churn = change_scores_from_signatures(sigs, "url", "ts", num_hashes=K)

    # sanity on the series itself: zeros before the shift, ones after
    vals = {
        (r.url, r.ts): r.change_score
        for r in churn.where(F.col("change_score").isNotNull()).collect()
    }
    assert vals[("shifting", 30)] == 0.0
    assert vals[("shifting", 31)] == 1.0 and vals[("shifting", 60)] == 1.0
    assert all(vals[("stable", t)] == 0.0 for t in range(2, 61))

    scored = churn.where(F.col("change_score").isNotNull())

    # Raw [0,1] scores structurally cannot clear the default BIC penalty
    # at max_window=100 (max squared-CUSUM k(n-k)/n * 1^2 = 25 < 36.8) —
    # this is WHY the pipeline standardizes (pipeline.py churn stage).
    raw = window_segmentor_changepoints(
        scored,
        default_detector_factory,
        key_cols=["url"],
        ts_col="ts",
        value_cols=["change_score"],
    ).count()
    assert raw == 0

    cpts = window_segmentor_changepoints(
        scored,
        default_detector_factory,
        key_cols=["url"],
        ts_col="ts",
        value_cols=["change_score"],
        standardize=True,
    ).collect()
    by_url: dict = {}
    for r in cpts:
        by_url.setdefault(r.url, []).append(r.changepoint_ts)
    # all-zero series z-scores to NaN -> dropna -> no alarms
    assert "stable" not in by_url
    assert by_url.get("shifting")  # the regime shift is detected...
    # ...and the earliest detected changepoint localizes near ts=31
    assert 28 <= min(by_url["shifting"]) <= 34


def test_zscore_per_key_unit():
    import numpy as np

    from streamchange_spark.operators.detect import zscore_per_key

    x = np.array([1.0, 2.0, 3.0, 4.0])
    z = zscore_per_key(x)
    assert np.allclose(z.mean(), 0.0) and np.allclose(z.std(ddof=1), 1.0)
    assert z[0] < z[1] < z[2] < z[3]  # order-preserving

    # constant column -> NaN (dropped downstream by detector dropna)
    assert np.isnan(zscore_per_key(np.full(5, 7.0))).all()
    # too-short series (n <= ddof) -> NaN, not a divide-by-zero
    assert np.isnan(zscore_per_key(np.array([3.0]))).all()

    # 2-d: per-column, one constant column does not poison the other
    m = np.column_stack([np.arange(6.0), np.full(6, 2.0)])
    zm = zscore_per_key(m)
    assert np.allclose(zm[:, 0].mean(), 0.0)
    assert np.isnan(zm[:, 1]).all()

    # NaN rows pass through as NaN and are excluded from the moments
    xn = np.array([1.0, np.nan, 2.0, 3.0, 4.0])
    zn = zscore_per_key(xn)
    assert np.isnan(zn[1])
    assert np.allclose(zn[[0, 2, 3, 4]], zscore_per_key(x))
