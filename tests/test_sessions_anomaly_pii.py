"""sessionize / session_stats, rolling_zscore, scrub_pii."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from streamchange_spark.operators import (
    rolling_zscore,
    scrub_pii,
    session_stats,
    sessionize,
)


def _ts(minute, second=0):
    return dt.datetime(2026, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    # user 1: gaps of 10m, 40m (split), 5m; user 2: single event.
    rows = [
        (1, _ts(0), 10.0, 100),
        (1, _ts(10), 20.0, 101),
        (1, _ts(50), 30.0, 102),
        (1, _ts(55), 40.0, 103),
        (2, _ts(7), 5.0, 200),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")


def test_sessionize_splits_on_gap(events):
    out = (
        sessionize(events, ["user_id"], "ts", gap_seconds=1800.0,
                   order_tiebreak=["event_id"])
        .select("event_id", "session_id")
        .collect()
    )
    got = {r.event_id: r.session_id for r in out}
    assert got == {100: 1, 101: 1, 102: 2, 103: 2, 200: 1}


def test_session_stats_values(events):
    rows = session_stats(
        events, ["user_id"], "ts", 1800.0, value_col="value",
        order_tiebreak=["event_id"],
    ).collect()
    by_key = {(r.user_id, r.session_id): r for r in rows}
    assert set(by_key) == {(1, 1), (1, 2), (2, 1)}
    s = by_key[(1, 2)]
    assert s.n_events == 2
    assert s.duration_sec == 300.0
    assert s.sum_value == 70.0
    assert by_key[(2, 1)].duration_sec == 0.0


def test_session_stats_single_exchange(events):
    """The groupBy keys are a superset of the window partition keys, so
    Catalyst must not add a second shuffle."""
    plan = session_stats(
        events, ["user_id"], "ts", 1800.0, order_tiebreak=["event_id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_sessionize_partition_invariant(events):
    base = sessionize(events, ["user_id"], "ts", 600.0).collect()
    spread = sessionize(
        events.repartition(7), ["user_id"], "ts", 600.0
    ).collect()
    key = lambda r: (r.user_id, r.event_id)
    assert sorted(base, key=key) == sorted(spread, key=key)


def test_rolling_zscore_values(spark):
    # one key, values 0..9 then an outlier; window=3 trailing, min_periods=2
    vals = [1.0, 1.0, 3.0, 1.0, 100.0]
    rows = [(1, _ts(i), v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double, event_id long")
    out = rolling_zscore(
        df, ["k"], "ts", "value", window=3, min_periods=2, threshold=3.0
    ).orderBy("event_id").collect()
    # row0: no history -> null; row1: 1 prior row < min_periods -> null;
    # row2: baseline [1,1] sd=0 -> null
    assert out[0].zscore is None and out[1].zscore is None
    assert out[2].zscore is None and out[2].is_anomaly is None
    # row3: baseline [1,1,3] mean=5/3 sd=sqrt(4/3)
    import math

    exp = (1.0 - 5.0 / 3.0) / math.sqrt(4.0 / 3.0)
    assert abs(out[3].zscore - exp) < 1e-12
    assert out[3].is_anomaly is False
    # row4: outlier against [1,3,1]
    assert out[4].zscore > 3.0 and out[4].is_anomaly is True


def test_rolling_zscore_excludes_current_row(spark):
    # constant history + a jump: if the frame included the current row the
    # baseline sd would be nonzero at row3 via the jump itself.
    rows = [(1, _ts(i), v, i) for i, v in enumerate([2.0, 2.0, 2.0, 50.0])]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double, event_id long")
    out = rolling_zscore(
        df, ["k"], "ts", "value", window=3, min_periods=2
    ).orderBy("event_id").collect()
    # baseline of row3 is [2,2,2]: sd=0 -> null, NOT a finite self-diluted z
    assert out[3].zscore is None


PII_DOC = (
    "contact Jane.Doe+spam@sub.example.org or call 5551234567890, "
    "server at 10.0.255.7, ticket 123456789; short 12345 stays."
)


def test_scrub_pii_sequential_semantics(spark):
    df = spark.createDataFrame([(1, PII_DOC)], "doc_id long, text string")
    row = scrub_pii(df, "doc_id", "text").collect()[0]
    assert "<EMAIL>" in row.clean_text and "<IP>" in row.clean_text
    assert row.n_email == 1 and row.n_ip == 1
    # 5551234567890 and 123456789 redact; 12345 (<9 digits) survives.
    assert row.n_longnum == 2
    assert "12345 stays" in row.clean_text
    assert "@" not in row.clean_text and "10.0.255.7" not in row.clean_text


def test_scrub_pii_matches_duckdb_on_pii_text(spark):
    """Java regex (engine) and RE2 (oracle) must agree span-for-span on text
    that actually CONTAINS PII — the sf corpora are mostly clean prose, so
    this is the adversarial parity check the driver row can't give."""
    from __spark_entry__ import _scrub_pii_oracle

    docs = [
        (1, PII_DOC),
        (2, "a@b.cd x@y.z 1.2.3.4.5 999999999999"),  # 1-letter TLD no-match
        (3, None),
        (4, "edge 255.255.255.255\nnext@line.email\t0123456789"),
        (5, "no pii here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_email, r.n_ip, r.n_longnum)
        for r in scrub_pii(df, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame(docs, columns=["doc_id", "text"]),
    )
    sql = _scrub_pii_oracle().replace("md5(t3) AS clean_md5", "t3 AS clean_text")
    for doc_id, clean, ne, ni, nn in con.sql(sql).fetchall():
        assert got[doc_id] == (clean, ne, ni, nn), doc_id


def test_sessionize_agrees_with_builtin_session_window(spark):
    """Spark's native session_window groupBy is an independent JVM
    implementation of gap-based sessions (merge-on-overlap). For events
    whose consecutive gaps are never EXACTLY the gap threshold the two
    semantics coincide ([t, t+gap) half-open vs strict > on deltas), so the
    per-session (start, end, n) sets must match on random-ish data."""
    import random

    rng = random.Random(42)
    rows, t = [], 0
    for uid in range(20):
        t = 0
        for i in range(50):
            t += rng.choice([30, 120, 600, 1700, 1900, 4000])  # never 1800
            rows.append((uid, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=t), float(i)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    mine = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_stats(df, ["user_id"], "ts", 1800.0).collect()
    }
    builtin = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in (
            df.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        )
    }
    assert mine == builtin
