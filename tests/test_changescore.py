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
