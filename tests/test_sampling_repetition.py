"""train_test_split / sample_fraction (deterministic keyed splits) and
repetition_features (Gopher-style boilerplate signals) vs independent
pure-Python oracles."""

import hashlib
from collections import Counter

import pandas as pd
import pytest


def _bucket(key: str, seed: int = 0, n_buckets: int = 10_000) -> int:
    # the documented md5 bridge, recomputed with hashlib (independent path)
    h = int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16)
    return h % n_buckets


def test_train_test_split_matches_md5_oracle_and_is_stable(spark):
    from streamchange_spark.operators import train_test_split

    df = spark.range(0, 3000).withColumnRenamed("id", "k")
    weights = {"train": 0.8, "valid": 0.1, "test": 0.1}
    got = train_test_split(df, "k", weights=weights, seed=7).toPandas()

    def oracle(k):
        b = _bucket(str(k), seed=7)
        if b < 8000:
            return "train"
        if b < 9000:
            return "valid"
        return "test"

    exp = got["k"].map(oracle)
    assert (got["split"] == exp).all()
    # realized fractions near the weights
    frac = Counter(got["split"])
    assert abs(frac["train"] / 3000 - 0.8) < 0.03
    assert abs(frac["test"] / 3000 - 0.1) < 0.02
    # partitioning-invariant: same assignment after a repartition
    again = (
        train_test_split(df.repartition(13), "k", weights=weights, seed=7)
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (again["split"] == got.sort_values("k").reset_index(drop=True)["split"]).all()


def test_train_test_split_key_level_no_leakage(spark):
    """Rows sharing a key always land in one split (url-keyed recrawls)."""
    from streamchange_spark.operators import train_test_split

    rows = [(f"url{u}", s) for u in range(200) for s in range(5)]
    df = spark.createDataFrame(rows, "url string, snap long")
    got = train_test_split(df, "url", seed=1).toPandas()
    assert (got.groupby("url")["split"].nunique() == 1).all()


def test_train_test_split_validates_weights(spark):
    from streamchange_spark.operators import train_test_split

    df = spark.range(5)
    with pytest.raises(ValueError, match="at least two"):
        train_test_split(df, "id", weights={"train": 1.0})
    with pytest.raises(ValueError, match="non-negative"):
        train_test_split(df, "id", weights={"a": -1.0, "b": 2.0})


def test_sample_fraction_subset_and_deterministic(spark):
    from streamchange_spark.operators import sample_fraction

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    small = set(sample_fraction(df, "k", 0.02, seed=3).toPandas()["k"])
    big = set(sample_fraction(df, "k", 0.2, seed=3).toPandas()["k"])
    assert small <= big  # same seed: smaller rate is a subset
    assert small == {k for k in range(5000) if _bucket(str(k), 3) < 200}
    assert abs(len(big) / 5000 - 0.2) < 0.03
    with pytest.raises(ValueError, match="fraction"):
        sample_fraction(df, "k", 1.5)


def _rep_oracle(text: str) -> dict:
    lines = [l.strip() for l in text.split("\n") if l.strip() != ""]
    toks = [t for t in text.lower().split() if t != ""]
    lc, tc = Counter(lines), Counter(toks)
    n_lines = len(lines)
    total_chars = sum(len(l) for l in lines)
    dup_chars = sum(len(l) * c for l, c in lc.items() if c > 1)
    return {
        "n_lines": n_lines,
        "dup_line_frac": 1.0 - len(lc) / n_lines if n_lines else 0.0,
        "dup_line_char_frac": dup_chars / total_chars if total_chars else 0.0,
        "top_token_frac": max(tc.values()) / len(toks) if toks else 0.0,
    }


def test_repetition_features_matches_counter_oracle(spark):
    from streamchange_spark.operators import repetition_features

    texts = [
        "home\nabout\ncontact\nhome\nabout\nreal content line here",
        "buy now buy now buy now buy now limited offer",
        "a\nb\nc\nd",  # no duplicates at all
        "same line\nsame line\nsame line",
        "",  # empty doc scores 0.0 everywhere
        "   \n  \n",  # whitespace-only doc
        "one two three two three three",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = (
        repetition_features(df, "doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame([_rep_oracle(t) for t in texts])
    for col in ["n_lines", "dup_line_frac", "dup_line_char_frac", "top_token_frac"]:
        pd.testing.assert_series_equal(
            got[col], exp[col].astype(got[col].dtype), check_names=False
        )
    # spot semantics: doc 3 is one distinct line repeated 3x
    assert got.loc[3, "dup_line_frac"] == pytest.approx(2 / 3)
    assert got.loc[3, "dup_line_char_frac"] == 1.0


def test_repetition_features_is_projection_no_shuffle(spark):
    """The plan must contain NO exchange and NO generate (explode): the
    whole computation is a map-side expression over each row."""
    from streamchange_spark.operators import repetition_features

    df = spark.createDataFrame([(1, "x\ny\nx")], "doc_id long, text string")
    plan = (
        repetition_features(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Generate" not in plan


def test_contamination_flags_matches_set_oracle(spark):
    """n-gram decontamination vs a pure-Python shingle-set oracle."""
    from streamchange_spark.operators import contamination_flags

    corpus = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "completely unrelated text about spark dataframes here"),
        (2, "quick brown fox jumps again somewhere else entirely"),
        (3, "short"),  # too short for any 3-gram
    ]
    evals = [(100, "a quick brown fox jumps high")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    edf = spark.createDataFrame(evals, "doc_id long, text string")
    got = (
        contamination_flags(cdf, edf, "doc_id", "text", n=3)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def shingles(t, n=3):
        toks = t.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    eset = set().union(*(shingles(t) for _, t in evals))
    for i, (_, text) in enumerate(corpus):
        expect = len(shingles(text) & eset)
        assert got.loc[i, "contaminated_ngrams"] == expect
        assert bool(got.loc[i, "contaminated"]) == (expect > 0)
    # sanity: doc 0 and 2 share "quick brown fox"/"brown fox jumps"; doc 1/3 clean
    assert got.loc[0, "contaminated"] and got.loc[2, "contaminated"]
    assert not got.loc[1, "contaminated"] and not got.loc[3, "contaminated"]


def test_contamination_flags_broadcast_plan(spark):
    """The eval side broadcasts: no shuffle of the corpus shingle stream."""
    from streamchange_spark.operators import contamination_flags

    cdf = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(50)],
        "doc_id long, text string",
    )
    edf = spark.createDataFrame([(0, "alpha beta gamma")], "doc_id long, text string")
    plan = (
        contamination_flags(cdf, edf, "doc_id", "text", n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_cap_per_group_matches_pandas_and_uses_window_group_limit(spark):
    """Per-group cap vs a pandas replay of the same total order, plus the
    scale property: the optimizer must rewrite row_number<=K into a
    WindowGroupLimit (map-side partial top-K before the exchange)."""
    from pyspark.sql import functions as F

    from streamchange_spark.operators import cap_per_group

    rows = [
        (i, f"g{i % 7}", (i * 37) % 101) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, score long")
    capped = cap_per_group(
        df, "grp", 3, [F.col("score").desc(), F.col("id").asc()], rank_col="rank"
    )
    got = capped.toPandas().sort_values(["grp", "rank"]).reset_index(drop=True)

    pdf = pd.DataFrame(rows, columns=["id", "grp", "score"])
    pdf = pdf.sort_values(["score", "id"], ascending=[False, True])
    exp = pdf.groupby("grp").head(3)
    assert len(got) == len(exp) == 21
    exp_ids = {g: list(sub["id"]) for g, sub in exp.groupby("grp")}
    for g, sub in got.groupby("grp"):
        assert list(sub.sort_values("rank")["id"]) == exp_ids[g]
    assert (got.groupby("grp")["rank"].max() == 3).all()

    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan

    with pytest.raises(ValueError):
        cap_per_group(df, "grp", 0, ["score"])


def test_mixture_sample_per_group_rates_and_determinism(spark):
    """Per-group keep rates realize near the requested fractions, the kept
    set is exactly the keyed-hash oracle, and absent groups follow
    default_fraction."""
    from streamchange_spark.operators import mixture_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(6000)]
    df = spark.createDataFrame(rows, "k long, grp string")
    kept = mixture_sample(
        df, "grp", {"a": 1.0, "b": 0.25}, key_col="k", seed=3,
        default_fraction=0.0,
    ).toPandas()

    def keep(k, frac):
        return _bucket(str(k), seed=3) < round(frac * 10_000)

    exp = {
        k for k, g in rows
        if (g == "a" and keep(k, 1.0)) or (g == "b" and keep(k, 0.25))
    }
    assert set(kept["k"]) == exp
    counts = kept.groupby("grp")["k"].count()
    assert counts.get("a", 0) == 2000          # 1.0 keeps everything
    assert abs(counts.get("b", 0) / 2000 - 0.25) < 0.05
    assert counts.get("c", 0) == 0             # default_fraction=0 drops

    with pytest.raises(ValueError):
        mixture_sample(df, "grp", {"a": 1.5}, key_col="k")


def test_weighted_sample_k_basic_and_plan(spark):
    from streamchange_spark.operators import weighted_sample_k

    rows = [(g, i, float(w)) for g in ("a", "b") for i, w in enumerate([5, 1, 3, 0, 2, 4, 7, 6])]
    df = spark.createDataFrame(rows, "src string, id long, w double")
    out = weighted_sample_k(df, "src", 3, "w", "id", seed=1, rank_col="rank")
    got = out.collect()
    # exactly k winners per group, ranks 1..k, zero-weight rows never drawn
    by_g = {}
    for r in got:
        by_g.setdefault(r.src, []).append(r)
    for g, rs in by_g.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3]
        assert all(r.w > 0 for r in rs)
    # deterministic + partition-invariant
    again = weighted_sample_k(
        df.repartition(9), "src", 3, "w", "id", seed=1, rank_col="rank"
    ).collect()
    key = lambda r: (r.src, r.id)
    assert sorted(got, key=key) == sorted(again, key=key)
    # different seed -> (almost surely) different draw for some group
    other = weighted_sample_k(df, "src", 3, "w", "id", seed=2).collect()
    assert {(r.src, r.id) for r in other} != {(r.src, r.id) for r in got}
    # map-side partial top-K survives in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_weighted_sample_k_inclusion_proportional_to_weight(spark):
    """For k=1, Efraimidis-Spirakis includes item i with probability exactly
    w_i / sum(w). 400 independent replicate groups (group id salts the key,
    so each group gets fresh uniforms) with weights 9:1 -> the heavy item
    should win ~360; a fair sampler would win ~200. One Spark job."""
    from streamchange_spark.operators import weighted_sample_k

    rows = []
    for g in range(400):
        rows.append((g, f"{g}:heavy", 9.0))
        rows.append((g, f"{g}:light", 1.0))
    df = spark.createDataFrame(rows, "grp long, id string, w double")
    won = weighted_sample_k(df, "grp", 1, "w", "id", seed=0).collect()
    heavy_wins = sum(1 for r in won if r.id.endswith("heavy"))
    assert len(won) == 400
    # binomial(400, 0.9): sd ~ 6 -> [330, 390] is a >5-sigma corridor
    assert 330 <= heavy_wins <= 390, heavy_wins


def test_weighted_sample_k_fresh_uniforms_per_group(spark):
    """A key appearing in many groups must get an independent draw per
    group — with equal weights, the per-group winners must differ across
    groups (a key-only hash makes every group pick the same winner)."""
    from streamchange_spark.operators import weighted_sample_k

    rows = [(g, u, 1.0) for g in range(40) for u in range(20)]
    df = spark.createDataFrame(rows, "grp long, uid long, w double")
    winners = {r.grp: r.uid for r in weighted_sample_k(df, "grp", 1, "w", "uid", seed=3).collect()}
    assert len(winners) == 40
    assert len(set(winners.values())) > 5  # correlated draws -> exactly 1


def _bucket_salted(key: str, salt: str, seed: int = 0, n_buckets: int = 10_000) -> int:
    h = int(hashlib.md5(f"{key}:{salt}:{seed}".encode()).hexdigest()[:15], 16)
    return h % n_buckets


def test_salt_decorrelates_samplers(spark):
    """Same-seed samplers share the bucket hash (a 1% sample nests inside
    'train'); a distinct salt per purpose decorrelates the draws while
    keeping each operator's own determinism and subset nesting."""
    from streamchange_spark.operators import sample_fraction, train_test_split

    df = spark.createDataFrame([(i,) for i in range(8000)], "k long")

    split = train_test_split(df, "k", {"train": 0.5, "test": 0.5}).toPandas()
    train_keys = set(split.loc[split["split"] == "train", "k"])

    unsalted = set(sample_fraction(df, "k", 0.05).toPandas()["k"])
    assert unsalted <= train_keys  # the documented correlation hazard

    salted = set(sample_fraction(df, "k", 0.05, salt="ablation").toPandas()["k"])
    # matches the independent hashlib oracle for the salted form
    exp = {k for k in range(8000) if _bucket_salted(str(k), "ablation") < 500}
    assert salted == exp
    # decorrelated: lands in both splits, and differs from the unsalted draw
    assert salted - train_keys and salted & train_keys
    assert salted != unsalted
    # subset nesting still holds WITHIN one salt
    bigger = set(sample_fraction(df, "k", 0.2, salt="ablation").toPandas()["k"])
    assert salted <= bigger


def test_mixture_sample_null_group(spark):
    """NULL groups fall through to default_fraction unless fractions carries
    a None key, which matches via isNull()."""
    from streamchange_spark.operators import mixture_sample

    rows = [(i, "a" if i % 2 else None) for i in range(4000)]
    df = spark.createDataFrame(rows, "k long, grp string")

    dropped = mixture_sample(df, "grp", {"a": 1.0}, key_col="k").toPandas()
    assert dropped["grp"].notna().all()  # default 0.0 drops NULL-group rows

    kept = mixture_sample(
        df, "grp", {"a": 1.0, None: 0.5}, key_col="k", seed=3
    ).toPandas()
    got_null = set(kept.loc[kept["grp"].isna(), "k"])
    exp_null = {
        k for k, g in rows if g is None and _bucket(str(k), seed=3) < 5000
    }
    assert got_null == exp_null and len(got_null) > 0


def test_contamination_prefilter_hash_identical_and_mapside(spark):
    """prefilter_hash=True (the big-eval-set scale path) returns the exact
    path's output row-for-row, and the hash probe is a BROADCAST join (the
    corpus is filtered map-side before any shuffle)."""
    from streamchange_spark.operators import contamination_flags

    rng_rows = [
        (i, " ".join(f"w{(i * 17 + j * 5) % 91}" for j in range(14)))
        for i in range(120)
    ]
    cdf = spark.createDataFrame(rng_rows, "doc_id long, text string")
    from pyspark.sql import functions as F

    edf = cdf.where(F.col("doc_id") % 10 == 0)
    exact = (
        contamination_flags(cdf, edf, "doc_id", "text", n=3)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pre = contamination_flags(
        cdf, edf, "doc_id", "text", n=3, prefilter_hash=True
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = pre.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(exact)


def test_pack_sequences_coverage_and_determinism(spark):
    """Concat-then-chunk packing: within every shard the token stream is
    gapless (each doc starts where the previous ended), sequence spans
    match floor arithmetic, empty docs drop, and the layout is identical
    across re-runs and repartitionings."""
    from streamchange_spark.operators import pack_sequences

    rows = [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(
        df, "doc_id", text_col="text", budget=16, n_shards=4, seed=3
    ).toPandas()
    assert (out["n_tokens"] > 0).all()  # empties dropped
    assert len(out) == sum(1 for _, t in rows if t)
    for _, g in out.groupby("shard"):
        g = g.sort_values("tok_start")
        expect_start = 0
        for _, r in g.iterrows():
            assert r["tok_start"] == expect_start
            assert r["seq_first"] == r["tok_start"] // 16
            assert r["seq_last"] == (r["tok_start"] + r["n_tokens"] - 1) // 16
            assert r["seq_offset"] == r["tok_start"] % 16
            expect_start += r["n_tokens"]
    again = (
        pack_sequences(
            df.repartition(7), "doc_id", text_col="text", budget=16,
            n_shards=4, seed=3,
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert again.equals(out.sort_values("doc_id").reset_index(drop=True))
