"""Line-level corpus dedup (C4/MassiveText boilerplate removal):
frequency-based line drops, order-preserving reassembly, short-line
immunity, empty-doc retention, partition invariance."""

import pytest

from streamchange_spark.operators import dedup_lines

BOILER = "this exact navigation footer repeats on every single page here"
RARE = [
    "first unique paragraph with enough characters to participate fine",
    "second unique paragraph also long enough to participate in counting",
    "third unique paragraph likewise long enough for the frequency pass",
]


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (0, "\n".join([BOILER, RARE[0], "ok"])),
        (1, "\n".join([RARE[1], BOILER, ""])),
        (2, "\n".join(["ok", BOILER, RARE[2]])),
        (3, BOILER),           # only the boilerplate -> empty after dedup
        (4, ""),               # empty doc stays empty
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _result(pages, **kw):
    out = dedup_lines(pages, "doc_id", "text",
                      min_chars=kw.pop("min_chars", 30),
                      max_occurrences=kw.pop("max_occurrences", 2), **kw)
    return {r["doc_id"]: r["text"] for r in out.collect()}


def test_boilerplate_dropped_order_preserved(pages):
    got = _result(pages)
    # BOILER occurs 4x > max_occurrences=2 -> dropped everywhere;
    # short lines ("ok", "") are immune; original order preserved.
    assert got[0] == "\n".join([RARE[0], "ok"])
    assert got[1] == "\n".join([RARE[1], ""])
    assert got[2] == "\n".join(["ok", RARE[2]])


def test_all_lines_dropped_doc_stays_with_empty_text(pages):
    got = _result(pages)
    assert got[3] == ""
    assert got[4] == ""
    assert len(got) == 5


def test_under_threshold_lines_kept(pages):
    # max_occurrences=4: BOILER occurs exactly 4x -> not dropped.
    got = _result(pages, max_occurrences=4)
    assert got[0] == "\n".join([BOILER, RARE[0], "ok"])
    assert got[3] == BOILER


def test_short_lines_immune_even_when_frequent(spark):
    rows = [(i, "menu\n" + f"unique long paragraph number {i} padded out to length") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in
           dedup_lines(df, "doc_id", "text", min_chars=30,
                       max_occurrences=2).collect()}
    assert all(t.startswith("menu\n") for t in got.values())


def test_within_doc_repeats_count(spark):
    # One doc repeats a line 3x; corpus count 3 > 2 -> dropped even though
    # it appears in a single document (total occurrences, MassiveText-style).
    line = "a sufficiently long line repeated three times in one document"
    df = spark.createDataFrame([(0, "\n".join([line, line, line, "tail"]))],
                               ["doc_id", "text"])
    got = dedup_lines(df, "doc_id", "text", min_chars=30,
                      max_occurrences=2).collect()[0]["text"]
    assert got == "tail"


def test_space_delimiter_word_units(spark):
    df = spark.createDataFrame(
        [(0, "spam rareword spam"), (1, "spam otherword spam")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in
           dedup_lines(df, "doc_id", "text", min_chars=4,
                       max_occurrences=3, delimiter=" ").collect()}
    assert got == {0: "rareword", 1: "otherword"}


def test_partition_invariance(pages):
    a = _result(pages)
    b = _result(pages.repartition(7, "text"))
    assert a == b


# ---------------------------------------------------------------------------
# Incremental line dedup against a persisted count index
# ---------------------------------------------------------------------------
def _texts(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


@pytest.fixture(scope="module")
def crawl(spark):
    """Three 'daily' increments; BOILER crosses the >2 threshold only once
    increment B lands, so the hot set genuinely evolves across merges."""
    a = [(0, "\n".join([BOILER, RARE[0]])), (1, RARE[1])]
    b = [(2, "\n".join([RARE[2], BOILER])), (3, BOILER)]
    c = [(4, "\n".join([BOILER, "short"])),
         (5, "another unique paragraph long enough to take part in counts")]
    mk = lambda rows: spark.createDataFrame(rows, ["doc_id", "text"])
    return mk(a), mk(b), mk(c)


def test_increment_equals_batch_on_union_restricted(spark, crawl):
    from streamchange_spark.operators import (
        dedup_lines_against_counts,
        line_count_index,
        merge_line_count_indexes,
    )

    a, b, c = crawl
    kw = dict(min_chars=30, delimiter="\n", hash_fn="md5")
    state = line_count_index(a, "text", **kw)
    union = a
    for inc in (b, c):
        state = merge_line_count_indexes(
            state, line_count_index(inc, "text", **kw)
        ).localCheckpoint()
        union = union.unionByName(inc)
        got = _texts(dedup_lines_against_counts(
            inc, "doc_id", "text", state, max_occurrences=2, **kw))
        inc_ids = [r["doc_id"] for r in inc.select("doc_id").collect()]
        want = {k: v for k, v in _texts(
            dedup_lines(union, "doc_id", "text", max_occurrences=2, **kw)
        ).items() if k in inc_ids}
        assert got == want


def test_increment_counts_include_own_lines(spark, crawl):
    # A line that becomes hot ONLY counting the increment itself must be
    # dropped from the increment (within-batch occurrences count).
    from streamchange_spark.operators import (
        dedup_lines_against_counts,
        line_count_index,
        merge_line_count_indexes,
    )

    base = spark.createDataFrame([(0, RARE[0])], ["doc_id", "text"])
    line = "a line that repeats across three documents of one increment ok"
    inc = spark.createDataFrame(
        [(1, line), (2, line), (3, "\n".join([line, RARE[1]]))],
        ["doc_id", "text"])
    kw = dict(min_chars=30, delimiter="\n", hash_fn="md5")
    state = merge_line_count_indexes(
        line_count_index(base, "text", **kw),
        line_count_index(inc, "text", **kw))
    got = _texts(dedup_lines_against_counts(
        inc, "doc_id", "text", state, max_occurrences=2, **kw))
    assert got == {1: "", 2: "", 3: RARE[1]}


def test_merge_is_associative(spark, crawl):
    from streamchange_spark.operators import (
        line_count_index,
        merge_line_count_indexes,
    )

    a, b, c = crawl
    kw = dict(min_chars=30, delimiter="\n", hash_fn="md5")
    ia, ib, ic = (line_count_index(x, "text", **kw) for x in (a, b, c))
    left = merge_line_count_indexes(merge_line_count_indexes(ia, ib), ic)
    right = merge_line_count_indexes(ia, merge_line_count_indexes(ib, ic))
    assert sorted(map(tuple, left.collect())) == \
        sorted(map(tuple, right.collect()))


def test_increment_plan_never_scans_prior_documents(spark, crawl):
    # Structural guarantee: the incremental verdict plan reads the
    # increment and the (line_key, n) index — no scan of the base corpus'
    # text ever appears in it.
    from streamchange_spark.operators import (
        dedup_lines_against_counts,
        line_count_index,
    )
    import tempfile

    a, b, _ = crawl
    kw = dict(min_chars=30, delimiter="\n", hash_fn="md5")
    with tempfile.TemporaryDirectory() as d:
        line_count_index(a, "text", **kw).write.parquet(f"{d}/idx")
        state = spark.read.parquet(f"{d}/idx")
        out = dedup_lines_against_counts(
            b, "doc_id", "text", state, max_occurrences=2, **kw)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "idx" in plan             # reads the persisted index
        # the ONLY file scan in the plan is the index — the base corpus'
        # documents are never re-read by the incremental path
        assert plan.count("FileScan") == 1


def test_streaming_line_dedup_matches_batch(spark, tmp_path):
    """Streaming twin: 3 id-ordered file drops -> 3 micro-batches through
    run_streaming_line_dedup; each batch's persisted rebuilt texts equal
    batch dedup_lines over everything ingested through that batch,
    restricted to that batch's ids (append-only verdicts); re-running with
    no new files adds nothing (effectively-once)."""
    import os
    import time

    from streamchange_spark.streaming import run_streaming_line_dedup

    rows = []
    for i in range(24):
        parts = [f"unique paragraph number {i:03d} padded well past the floor"]
        if i % 2 == 0:
            parts.append(BOILER)      # hot from batch 1 onward (count > 2)
        if i % 3 == 0:
            parts.append("ok")        # short, immune
        rows.append((i, "\n".join(parts)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)

    src = tmp_path / "dumps"
    src.mkdir()
    now = time.time()
    for b, (lo, hi) in enumerate([(0, 8), (8, 16), (16, 24)]):
        p = str(src / f"dump_{b}")
        spark.createDataFrame(
            pdf[(pdf["doc_id"] >= lo) & (pdf["doc_id"] < hi)]
        ).coalesce(1).write.parquet(p)
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now + b, now + b))

    out_path = str(tmp_path / "out")
    state_path = str(tmp_path / "state")
    kw = dict(min_chars=30, max_occurrences=2, delimiter="\n",
              hash_fn="md5")
    run_streaming_line_dedup(
        spark, str(src / "dump_*"), out_path, state_path,
        str(tmp_path / "ckpt"), "doc_id bigint, text string",
        max_files_per_trigger=1, **kw)

    got_all = spark.read.parquet(out_path)
    assert got_all.select("_batch_id").distinct().count() == 3
    per_batch = got_all.toPandas()
    for b, (lo, hi) in enumerate([(0, 8), (8, 16), (16, 24)]):
        want = {k: v for k, v in _texts(dedup_lines(
            docs.where(f"doc_id < {hi}"), "doc_id", "text", **kw
        )).items() if lo <= k < hi}
        got = {r.doc_id: r.text for _, r in
               per_batch[per_batch["_batch_id"] == b].iterrows()}
        assert got == want, f"batch {b}"

    # effectively-once: replay with no new files adds nothing
    run_streaming_line_dedup(
        spark, str(src / "dump_*"), out_path, state_path,
        str(tmp_path / "ckpt"), "doc_id bigint, text string", **kw)
    assert spark.read.parquet(out_path).count() == 24
