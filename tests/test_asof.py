"""asof_join vs pandas.merge_asof (independent oracle) — backward/forward,
ties, tolerance, and no-match nulls."""

import numpy as np
import pandas as pd
import pytest


def _fixture(seed=3, n_keys=6, n_left=400, n_right=120):
    rng = np.random.RandomState(seed)
    t0 = 1_704_067_200
    left = pd.DataFrame(
        {
            "k": rng.randint(0, n_keys, n_left).astype(np.int64),
            "ts": pd.to_datetime(
                t0 + rng.randint(0, 500_000, n_left), unit="s"
            ),
            "ev": np.arange(n_left, dtype=np.int64),
        }
    )
    # unique (k, rts): state table
    right = (
        pd.DataFrame(
            {
                "k": rng.randint(0, n_keys, n_right).astype(np.int64),
                "rts": pd.to_datetime(
                    t0 + rng.randint(0, 500_000, n_right), unit="s"
                ),
                "price": rng.randn(n_right).round(4),
            }
        )
        .drop_duplicates(["k", "rts"])
        .reset_index(drop=True)
    )
    # force some exact-timestamp ties and some keys with no right rows at all
    left.loc[0, ["k", "ts"]] = [right.loc[0, "k"], right.loc[0, "rts"]]
    left.loc[1, "k"] = n_keys + 7
    return left, right


def _oracle(left, right, direction, tolerance=None):
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("rts").rename(columns={"rts": "asof_ts"}),
        left_on="ts",
        right_on="asof_ts",
        by="k",
        direction=direction,
        allow_exact_matches=True,
        **kw,
    )
    return exp.sort_values("ev").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_merge_asof(spark, direction):
    from streamchange_spark.operators import asof_join

    left, right = _fixture()
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "ts",
            "rts",
            direction=direction,
        )
        .toPandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    exp = _oracle(left, right, direction)
    assert len(got) == len(left)  # left join: every event row survives
    pd.testing.assert_series_equal(got["asof_ts"], exp["asof_ts"], check_names=False)
    pd.testing.assert_series_equal(got["price"], exp["price"], check_names=False)
    # the fixture exercises both a tie and a keyless event
    assert got.loc[got.ev == 0, "asof_ts"].iloc[0] == left.loc[0, "ts"]
    assert got.loc[got.ev == 1, "price"].isna().iloc[0]


def test_asof_join_tolerance(spark):
    from streamchange_spark.operators import asof_join

    left, right = _fixture(seed=5)
    tol = 20_000
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "ts",
            "rts",
            tolerance_seconds=tol,
        )
        .toPandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    exp = _oracle(left, right, "backward", tolerance=tol)
    pd.testing.assert_series_equal(got["asof_ts"], exp["asof_ts"], check_names=False)
    pd.testing.assert_series_equal(got["price"], exp["price"], check_names=False)
    # tolerance actually nulled something a plain backward join matched
    plain = _oracle(left, right, "backward")
    assert exp["price"].isna().sum() > plain["price"].isna().sum()


def test_asof_join_single_exchange_plan(spark):
    """The physical plan co-partitions both sides with ONE hash exchange on
    the key (union before shuffle) — no broadcast, no range explode."""
    from streamchange_spark.operators import asof_join

    left, right = _fixture()
    plan = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "ts",
            "rts",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_join_null_state_attribute_not_resurrected(spark):
    """A matched state row whose attribute is NULL must yield NULL — not a
    stale value carried from an older state row (the per-column
    last(ignorenulls) trap; the state travels as one struct)."""
    from streamchange_spark.operators import asof_join

    right = pd.DataFrame(
        {
            "k": [1, 1],
            "rts": pd.to_datetime([100, 200], unit="s"),
            "price": [5.0, None],
            "tag": ["a", None],
        }
    )
    left = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime([150, 250], unit="s"),
            "ev": [0, 1],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "ts",
            "rts",
        )
        .toPandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    # ev=0 matches rts=100 (price 5.0); ev=1 matches rts=200 whose price/tag
    # are NULL and must stay NULL.
    assert got.loc[0, "price"] == 5.0 and got.loc[0, "tag"] == "a"
    assert got.loc[1, "asof_ts"] == pd.Timestamp("1970-01-01 00:03:20")
    assert pd.isna(got.loc[1, "price"]) and got.loc[1, "tag"] is None
