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
