"""Two-parallelism-level scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox substitution per BASELINE.md:
the same job at local[8] vs local[32] on the same pre-generated input).

The job is the flagship pages pipeline:
  pages parquet -> select(url, warc_ts, length(text))       [column pruning]
  -> 1h/1d/30d continuous-aggregate tiers                   [rolled-up points]
  -> Gorilla-compress the 1h tier                           [binary columns]
  -> WindowSegmentor change points on each url's 1h mean    [change points]
plus the training-data corpus stage over the same pages table:
  pages -> hash-sampled snapshot docs (~0.8% of rows)       [doc table]
  -> corpus_features (lang/quality/md5/minhash, persisted)  [the text pass]
  -> verdicts_from_features (LSH bands -> components -> verdicts)

Usage:
  PYTHONPATH=/root/repo python tools/bench_scaling.py [--urls 20000] \
      [--snapshots 60] [--levels 8,32] [--repeats 1] [--stages all] [--keep]

Prints one JSON line per (pass, level), then one merged line per level, then
a summary line with scaling efficiency
  eff = (throughput_hi / throughput_lo) / (hi / lo).

--repeats N interleaves full passes over the levels (2,8,32,2,8,32,...) and
takes the per-stage MIN time per level — the same stall-decorrelation
protocol as bench.py (multi-second host stalls hit one pass, not both).
--stages lets a re-measure touch only some stages (csv of
ingest,rollup,gorilla,detect,corpus; the pipeline total needs the first four).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ALL_STAGES = (
    "ingest", "rollup", "gorilla", "detect", "corpus", "sessions",
    "sessions_sorted", "sketch", "freq", "increment", "lines",
    "lines_increment", "churn", "crawlfreq", "refresh", "dml", "state",
    "state_sorted",
)
PIPELINE_STAGES = ("ingest", "rollup", "gorilla", "detect")
SORTED_BUCKETS = 64


def build_input(path: str, n_urls: int, snapshots: int, cpus: int) -> None:
    from streamchange_spark.session import get_spark
    from streamchange_spark.sources import generate_pages

    spark = get_spark("bench_gen", master=f"local[{cpus}]")
    t0 = time.time()
    pages = generate_pages(spark, n_urls=n_urls, mean_snapshots=snapshots,
                           num_partitions=cpus * 4)
    pages.write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    print(f"# generated {n} rows in {time.time() - t0:.1f}s -> {path}",
          file=sys.stderr)
    spark.stop()


def build_sorted_input(path: str, srt_path: str, cpus: int) -> None:
    """One-time write of the url-bucketed (url, warc_ts)-sorted layout —
    ONE file per bucket (repartition on the bucket column before the
    bucketed write) so the scan can report its ordering. This is the
    write-time cost the sorted layout amortizes; reported once, not part
    of the per-level measurement."""
    from streamchange_spark.session import get_spark
    from streamchange_spark.sources import write_bucketed

    spark = get_spark("bench_srt_gen", master=f"local[{cpus}]")
    t0 = time.time()
    pages = spark.read.parquet(path).select("url", "warc_ts")
    write_bucketed(
        pages.repartition(SORTED_BUCKETS, "url"),
        "pages_srt_bench_w",
        ["url"],
        n_buckets=SORTED_BUCKETS,
        sort_cols=["url", "warc_ts"],
        path=srt_path,
    )
    print(
        f"# sorted-bucketed write: {time.time() - t0:.1f}s -> {srt_path}",
        file=sys.stderr,
    )
    spark.stop()


def build_sorted_state_input(path: str, srt_path: str, cpus: int) -> None:
    """Sorted one-file-per-bucket layout carrying (url, warc_ts, lang) for
    the state_sorted stage — same scheme as build_sorted_input, one more
    column so the time-in-state window can ride the scan order."""
    from streamchange_spark.session import get_spark
    from streamchange_spark.sources import write_bucketed

    spark = get_spark("bench_srtst_gen", master=f"local[{cpus}]")
    t0 = time.time()
    pages = spark.read.parquet(path).select("url", "warc_ts", "lang")
    write_bucketed(
        pages.repartition(SORTED_BUCKETS, "url"),
        "pages_srtst_bench_w",
        ["url"],
        n_buckets=SORTED_BUCKETS,
        sort_cols=["url", "warc_ts"],
        path=srt_path,
    )
    print(
        f"# sorted-state write: {time.time() - t0:.1f}s -> {srt_path}",
        file=sys.stderr,
    )
    spark.stop()


def _increment_docs(pages, cutoff: str | None = None):
    """The corpus-stage doc sample with MONOTONIC string ids (zero-padded
    crawl epoch + url): every later-crawl doc id sorts after every earlier
    one, the precondition of the incremental-dedup contract."""
    from pyspark.sql import functions as F

    docs = pages.where(
        F.pmod(F.xxhash64("url", "warc_ts"), F.lit(126)) == 0
    ).select(
        F.format_string(
            "%012d#%s", F.unix_timestamp("warc_ts"), F.col("url")
        ).alias("doc_id"),
        "text",
    )
    return docs


def build_increment_state(path: str, state_dir: str, cpus: int) -> None:
    """One-time build of the persisted dedup state a daily increment joins
    against: the base (first ~90% of crawls) corpus_features store plus the
    two id-level indexes derived from it. Build cost is the ONE historical
    backfill, amortized over every subsequent increment — excluded from the
    per-level measurement like the input generation itself."""
    from pyspark.sql import functions as F

    from streamchange_spark.operators import (
        corpus_features,
        corpus_md5_index,
        corpus_signature_index,
    )
    from streamchange_spark.session import get_spark

    spark = get_spark("bench_inc_gen", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    t0 = time.time()
    pages = spark.read.parquet(path)
    docs = _increment_docs(pages)
    cutoff_epoch = docs.select(
        F.percentile_approx(F.split("doc_id", "#").getItem(0).cast("long"),
                            0.9).alias("c")
    ).collect()[0]["c"]
    cutoff = f"{cutoff_epoch:012d}"
    base = docs.where(F.col("doc_id") < cutoff)
    base_feats_path = os.path.join(state_dir, "base_feats.parquet")
    corpus_features(
        base, id_col="doc_id", text_col="text", keep_langs=None,
        min_quality=0.0, hash_fn="xxhash",
    ).write.mode("overwrite").parquet(base_feats_path)
    feats = spark.read.parquet(base_feats_path)
    corpus_md5_index(feats).write.mode("overwrite").parquet(
        os.path.join(state_dir, "md5_index.parquet"))
    corpus_signature_index(feats, id_col="doc_id").write.mode(
        "overwrite").parquet(os.path.join(state_dir, "sig_index.parquet"))
    with open(os.path.join(state_dir, "meta.json"), "w") as f:
        json.dump({"cutoff": cutoff, "base_docs": feats.count()}, f)
    print(f"# increment state built in {time.time() - t0:.1f}s -> "
          f"{state_dir}", file=sys.stderr)
    spark.stop()


def run_level(path: str, cpus: int, stages: set[str]) -> dict:
    from pyspark.sql import functions as F

    from streamchange_spark.kernels import BIC, CUSUM, WindowSegmentor
    from streamchange_spark.operators import (
        compress_series,
        window_segmentor_changepoints,
    )
    from streamchange_spark.session import get_spark

    spark = get_spark(
        "bench_scaling",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        # tmpfs shuffle dirs: a real cluster's shuffle bandwidth scales with
        # node count (one disk per node); local-mode's single disk does not,
        # which would understate scaling for reasons that vanish on a cluster.
        extra_conf={"spark.local.dir": f"/dev/shm/spark-local-{cpus}"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up

    pages = spark.read.parquet(path)
    metrics = pages.select(
        "url", "warc_ts", F.length("text").cast("double").alias("text_len")
    )
    n_rows = metrics.count()
    out: dict = {"cpus": cpus, "input_rows": n_rows}

    if "ingest" in stages:
        # Ingest invariant: sha256(text) per row (BASELINE.json input_hint's
        # byte-identity manifest) — pure scan+hash, the linearly-scaling
        # part of a real 100 TB ingest.
        from streamchange_spark.sources import text_manifest

        t0 = time.time()
        text_manifest(pages).select(
            F.count(F.lit(1)), F.max("text_sha256")
        ).collect()
        out["ingest_sec"] = round(time.time() - t0, 2)

    tier1h = None
    if stages & {"rollup", "gorilla", "detect", "crawlfreq"}:
        from streamchange_spark.operators import rollup_raw, rollup_tier

        # Materialize the 1h tier once; coarser tiers re-aggregate the
        # persisted tier (the continuous-aggregate contract — no raw
        # re-scan per tier).
        t0 = time.time()
        tier1h = rollup_raw(metrics, ["url"], "warc_ts", "text_len", "1h").persist()
        out["hourly_points"] = tier1h.count()
        tier1d = rollup_tier(tier1h, ["url"], "1d")
        tier1d.write.mode("overwrite").format("noop").save()
        rollup_tier(tier1d, ["url"], "30d").write.mode(
            "overwrite"
        ).format("noop").save()
        out["rollup_sec"] = round(time.time() - t0, 2)

    if "gorilla" in stages:
        from streamchange_spark.operators import decompress_series

        t0 = time.time()
        compressed = compress_series(
            tier1h, ["url"], "bucket_start", "sum_v"
        ).persist()
        compressed.count()
        out["gorilla_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        decompress_series(compressed, ["url"], "bucket_start", "sum_v").write.mode(
            "overwrite"
        ).format("noop").save()
        out["gorilla_decompress_sec"] = round(time.time() - t0, 2)
        compressed.unpersist()

    if "detect" in stages:
        # Detectors assume standardized series (reference: pelt/pelt.py:12,
        # capa/capa.py:12); standardize each url's hourly mean JVM-side via
        # the standardize_per_key operator (constant series -> NULL ->
        # filtered, matching the historical coalesce-to-0 rows only in that
        # both produce no change points for constant urls).
        from streamchange_spark.operators import standardize_per_key

        hourly_mean = (
            standardize_per_key(
                tier1h.select(
                    "url", "bucket_start",
                    (F.col("sum_v") / F.col("n_points")).alias("v"),
                ),
                ["url"], ["v"],
            )
            .where(F.col("v").isNotNull())
            .select("url", "bucket_start", "v")
        )
        t0 = time.time()
        cpts = window_segmentor_changepoints(
            hourly_mean,
            lambda: WindowSegmentor(CUSUM(penalty=BIC(scale=1.0)), 4, 100),
            key_cols=["url"],
            ts_col="bucket_start",
            value_cols=["v"],
        )
        out["changepoints"] = cpts.count()
        out["detect_sec"] = round(time.time() - t0, 2)

    if "crawlfreq" in stages:
        # Crawl-frequency stage (pipeline.py freq stage): densify the 1h
        # tier per url with gapfill(method="null") — a frequency drop is
        # MISSING hours — zero-fill, then the grouped detector scan with
        # in-UDF per-key standardization. Cost shape = `detect` plus one
        # per-key window'd grid build, over the DENSE grid (>= hourly
        # points). Grid size for throughput normalization comes from a
        # cheap per-key min/max aggregate, not a second pass.
        from streamchange_spark.operators import gapfill

        spans = tier1h.groupBy("url").agg(
            (
                (F.unix_timestamp(F.max("bucket_start"))
                 - F.unix_timestamp(F.min("bucket_start"))) / 3600 + 1
            ).alias("_g")
        )
        out["crawlfreq_grid_rows"] = int(
            spans.agg(F.sum("_g")).collect()[0][0]
        )
        t0 = time.time()
        hourly_freq = gapfill(
            tier1h.select("url", "bucket_start", "n_points"),
            ["url"], "bucket_start", "n_points", step_seconds=3600,
            method="null",
        ).select(
            "url",
            "bucket_start",
            F.coalesce(F.col("n_points"), F.lit(0)).cast("double").alias("v"),
        )
        fcpts = window_segmentor_changepoints(
            hourly_freq,
            lambda: WindowSegmentor(CUSUM(penalty=BIC(scale=1.0)), 4, 100),
            key_cols=["url"],
            ts_col="bucket_start",
            value_cols=["v"],
            standardize=True,
        )
        out["crawlfreq_changepoints"] = fcpts.count()
        out["crawlfreq_sec"] = round(time.time() - t0, 2)

    if "state" in stages:
        # Time-in-state tier (operators/stateagg.py): per-url LOCF lang
        # spans split at 1h boundaries (window lead + bounded explode +
        # (url, bucket, state) groupBy), then the 1d tier merged from the
        # persisted 1h partials — the continuous-aggregate chain. Cost
        # shape = one per-key window pass + ~1-2 exploded rows per
        # observation at the 15-min crawl grid.
        from streamchange_spark.operators import state_rollup, state_tier

        t0 = time.time()
        st1h = state_tier(
            pages.select("url", "warc_ts", "lang"),
            ["url"], "warc_ts", "lang", "1h",
        ).persist()
        out["state_rows_1h"] = st1h.count()
        out["state_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        state_rollup(st1h, ["url"], "1d").write.mode("overwrite").format(
            "noop"
        ).save()
        out["state_merge_sec"] = round(time.time() - t0, 2)
        st1h.unpersist()
    if tier1h is not None:
        tier1h.unpersist()

    if "corpus" in stages:
        # Corpus dedup stage (same pages input): the pipeline shape — one
        # persisted feature pass (the only stage that touches payload text),
        # then id-level global dedup + verdict assembly. Docs are individual
        # page SNAPSHOTS (url#ts), deterministically hash-sampled to ~500k
        # docs so per-document work dominates the measurement (a
        # latest_pages collapse leaves 20k docs — all fixed cost, no
        # scaling signal); recrawls of one url are genuine near-duplicates,
        # so the minhash-LSH path does real dedup work.
        from streamchange_spark.operators import (
            corpus_features,
            verdicts_from_features,
        )

        t0 = time.time()
        docs = pages.where(
            F.pmod(F.xxhash64("url", "warc_ts"), F.lit(126)) == 0
        ).select(
            F.concat_ws("#", "url", F.col("warc_ts").cast("string")).alias(
                "doc_id"
            ),
            "text",
        )
        feats = corpus_features(
            docs, id_col="doc_id", text_col="text", keep_langs=None,
            min_quality=0.0,
            # xxhash = the pipeline's scale default (md5 is for oracle
            # reproducibility only; the digest dominated the text pass:
            # 76s vs 27s at 8 cores / 300k docs)
            hash_fn="xxhash",
        ).persist()
        out["corpus_docs"] = feats.count()
        verdicts_from_features(feats, id_col="doc_id").write.mode(
            "overwrite"
        ).format("noop").save()
        out["corpus_sec"] = round(time.time() - t0, 2)
        feats.unpersist()

    if "churn" in stages:
        # The pipeline's third page-metric series (run_pipeline's sig/churn
        # stages): per-snapshot minhash signatures (the one text pass —
        # shuffle carries k+2 small columns per snapshot, never text),
        # inter-snapshot Jaccard change scores (lag window per url), then
        # the standardized churn change-point scan. Hash-sampled to a third
        # of the urls so the signature pass dominates the per-job fixed
        # costs (~10-15 s: Python-worker spin-up, stage scheduling) while
        # 2-core repeats stay bounded.
        from streamchange_spark.operators import (
            change_scores_from_signatures,
            snapshot_signatures,
        )
        from streamchange_spark.pipeline import SIG_HASHES, default_detector_factory

        t0 = time.time()
        churn_pages = pages.where(
            F.pmod(F.xxhash64("url"), F.lit(3)) == 0
        ).select("url", "warc_ts", "text")
        sigs = snapshot_signatures(
            churn_pages, "url", "warc_ts", "text", num_hashes=SIG_HASHES,
            # xxhash = the pipeline's production hash (md5 is the oracle-
            # reproducibility default; its 16 JVM digests per shingle made
            # this stage 3.4-4.5x slower — BASELINE.md churn rows)
            hash_fn="xxhash",
        ).persist()
        out["churn_snapshots"] = sigs.count()
        out["churn_sig_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        churn = change_scores_from_signatures(
            sigs, "url", "warc_ts", num_hashes=SIG_HASHES
        )
        out["churn_changepoints"] = window_segmentor_changepoints(
            churn.where(F.col("change_score").isNotNull()),
            default_detector_factory,
            key_cols=["url"],
            ts_col="warc_ts",
            value_cols=["change_score"],
            standardize=True,
        ).count()
        out["churn_detect_sec"] = round(time.time() - t0, 2)
        sigs.unpersist()

    if "sessions" in stages:
        # Crawl-activity sessionization over the full pages table: per-url
        # gap-based sessions on warc_ts (1-day gap) + per-session stats —
        # exercises the lag/cumsum window + superset-keyed aggregate on one
        # exchange at the full 63M-row input.
        from streamchange_spark.operators import session_stats

        t0 = time.time()
        sess = session_stats(
            pages.select("url", "warc_ts"), ["url"], "warc_ts", 86400.0
        )
        out["sessions"] = sess.count()
        out["sessions_sec"] = round(time.time() - t0, 2)

    if "sketch" in stages:
        # Mergeable percentile tier over the full table (global hourly
        # text-length percentiles -> 1d merged from the 1h blobs): the
        # build pays the one raw scan; the tier-from-tier merge shuffles
        # only ~3 KB blobs per bucket.
        from streamchange_spark.operators import (
            sketch_percentiles,
            sketch_rollup,
            sketch_tier,
        )

        t0 = time.time()
        t1h = sketch_tier(metrics, [], "warc_ts", "text_len", "1h").persist()
        out["sketch_buckets"] = t1h.count()
        out["sketch_build_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        sketch_percentiles(sketch_rollup(t1h, [], "1d"), []).write.mode(
            "overwrite"
        ).format("noop").save()
        out["sketch_merge_sec"] = round(time.time() - t0, 2)
        t1h.unpersist()

    if "freq" in stages:
        # The other two mergeable tier families over the same table:
        # bottom-k cardinality (distinct urls per hour -> 1d merged from
        # the persisted hour arrays) and heavy hitters (top urls per hour
        # -> 1d). Build pays the raw scan + per-bucket dedupe/count
        # shuffles; the merges shuffle k longs / m (item, cnt) pairs per
        # child bucket — the shapes that stay flat at 100x.
        from streamchange_spark.operators import (
            hh_rollup,
            hh_tier,
            hh_topk,
            kmv_distinct,
            kmv_rollup,
            kmv_tier,
        )

        t0 = time.time()
        kmv1h = kmv_tier(metrics, [], "warc_ts", "url", "1h", k=1024).persist()
        out["kmv_buckets"] = kmv1h.count()
        out["kmv_build_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        kmv_distinct(kmv_rollup(kmv1h, [], "1d", k=1024), k=1024).write.mode(
            "overwrite"
        ).format("noop").save()
        out["kmv_merge_sec"] = round(time.time() - t0, 2)
        kmv1h.unpersist()

        t0 = time.time()
        hh1h = hh_tier(metrics, [], "warc_ts", "url", "1h", m=256).persist()
        out["hh_buckets"] = hh1h.count()
        out["hh_build_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        hh_topk(hh_rollup(hh1h, [], "1d", m=256), [], k=64).write.mode(
            "overwrite"
        ).format("noop").save()
        out["hh_merge_sec"] = round(time.time() - t0, 2)
        hh1h.unpersist()

    if "increment" in stages:
        # Incremental dedup vs global re-dedup, same increment (~10% of the
        # corpus docs = one "daily crawl dump" against a 90% historical
        # base). Both paths consume the SAME persisted increment features —
        # the timed difference is purely the verdict stage: joining the
        # increment's md5/band keys against the persisted indexes
        # (increment x colliding-bucket work) vs re-running global LSH over
        # the union of all feature rows (what a stateless pipeline re-pays
        # every day, and what stops scaling at 100 TB).
        from streamchange_spark.operators import (
            corpus_features,
            verdicts_for_increment,
            verdicts_from_features,
        )

        state_dir = path + "_incstate"
        with open(os.path.join(state_dir, "meta.json")) as f:
            meta = json.load(f)
        cutoff = meta["cutoff"]
        base_feats = spark.read.parquet(
            os.path.join(state_dir, "base_feats.parquet"))
        md5_idx = spark.read.parquet(
            os.path.join(state_dir, "md5_index.parquet"))
        sig_idx = spark.read.parquet(
            os.path.join(state_dir, "sig_index.parquet"))

        inc_docs = _increment_docs(spark.read.parquet(path)).where(
            F.col("doc_id") >= cutoff)
        inc_feats = corpus_features(
            inc_docs, id_col="doc_id", text_col="text", keep_langs=None,
            min_quality=0.0, hash_fn="xxhash",
        ).persist()
        out["increment_docs"] = inc_feats.count()
        out["increment_base_docs"] = meta["base_docs"]

        t0 = time.time()
        verdicts_for_increment(
            inc_feats, md5_idx, sig_idx, id_col="doc_id"
        ).write.mode("overwrite").format("noop").save()
        out["increment_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        verdicts_from_features(
            base_feats.unionByName(inc_feats), id_col="doc_id"
        ).where(F.col("doc_id") >= cutoff).write.mode(
            "overwrite").format("noop").save()
        out["increment_global_sec"] = round(time.time() - t0, 2)
        inc_feats.unpersist()

    if "lines" in stages:
        # Line-level dedup (dedup_lines, round 5) over the same hash-sampled
        # ~500k-doc snapshot corpus as the corpus stage, word-delimited like
        # the driver query. The frequency aggregation shuffles only the
        # 8-byte line key; the one full-text shuffle is the positional
        # reassembly. xxhash64 keys (the production path; md5 is the
        # oracle-reproducibility path). Doc sampling is persisted and
        # counted OUTSIDE the timed section.
        from streamchange_spark.operators import dedup_lines

        ldocs = _increment_docs(spark.read.parquet(path)).persist()
        out["lines_docs"] = ldocs.count()
        t0 = time.time()
        dedup_lines(
            ldocs, "doc_id", "text", min_chars=4,
            max_occurrences=1_000_000, delimiter=" ", hash_fn="xxhash",
        ).write.mode("overwrite").format("noop").save()
        out["lines_sec"] = round(time.time() - t0, 2)
        ldocs.unpersist()

    if "lines_increment" in stages:
        # Incremental line dedup vs stateless global recount, same shape
        # as the doc-dedup `increment` stage: a hash-10% crawl increment is
        # judged against (persisted base counts + its own counts) vs
        # against a fresh count over the full union. Both paths use
        # dedup_lines_against_counts, so the timed difference is exactly
        # "merge two indexes" vs "re-scan every prior document's text".
        from streamchange_spark.operators import (
            dedup_lines_against_counts,
            line_count_index,
            merge_line_count_indexes,
        )

        kw = dict(min_chars=4, delimiter=" ", hash_fn="xxhash")
        alldocs = _increment_docs(spark.read.parquet(path))
        is_inc = F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0
        linc = alldocs.where(is_inc).persist()
        lbase = alldocs.where(~is_inc)
        out["lines_inc_docs"] = linc.count()
        t0 = time.time()
        base_idx = line_count_index(lbase, "text", **kw).persist()
        out["lines_base_keys"] = base_idx.count()
        out["lines_state_build_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        state = merge_line_count_indexes(
            base_idx, line_count_index(linc, "text", **kw))
        dedup_lines_against_counts(
            linc, "doc_id", "text", state, max_occurrences=1_000_000, **kw
        ).write.mode("overwrite").format("noop").save()
        out["lines_inc_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        fresh = line_count_index(alldocs, "text", **kw)
        dedup_lines_against_counts(
            linc, "doc_id", "text", fresh, max_occurrences=1_000_000, **kw
        ).write.mode("overwrite").format("noop").save()
        out["lines_inc_global_sec"] = round(time.time() - t0, 2)
        base_idx.unpersist()
        linc.unpersist()

    if "refresh" in stages:
        # Late-data refresh vs full rebuild: a delayed shard of ONE crawl
        # day (~20% of that day's rows) lands after the day committed —
        # refresh_pipeline's exact shape. The base 1h tier is materialized
        # day-partitioned OUTSIDE the timed section (it stands in for the
        # committed store). Timed refresh = partition-pruned read of the hot
        # day's tier + aggregate ONLY the late raw rows + merge_tier; timed
        # rebuild = re-aggregate ALL raw rows. At 100 TB the gap is the
        # whole game: refresh cost is O(late rows + the ONE invalidated
        # partition), independent of base-corpus size (the speedup here
        # grows linearly with the number of committed days).
        from streamchange_spark.operators import merge_tier, rollup_raw

        hot_day = str(
            metrics.groupBy(F.to_date("warc_ts").alias("d"))
            .count()
            .orderBy(F.desc("count"), F.desc("d"))
            .limit(1)
            .collect()[0]["d"]
        )
        late_flag = (F.to_date("warc_ts") == F.lit(hot_day)) & (
            F.pmod(F.xxhash64("url", "warc_ts"), F.lit(5)) == 0
        )
        base_tier_path = path + f"_basetier_{cpus}"
        late_path = path + f"_late_{cpus}"
        rollup_raw(
            metrics.where(~late_flag), ["url"], "warc_ts", "text_len", "1h"
        ).withColumn("day", F.to_date("bucket_start")).write.mode(
            "overwrite"
        ).partitionBy("day").parquet(base_tier_path)
        # The late batch arrives as its own small file (a delayed WARC
        # shard), not as a filter over the full corpus — materialize it
        # outside the timed section like the base tier.
        metrics.where(late_flag).write.mode("overwrite").parquet(late_path)
        late = spark.read.parquet(late_path)
        out["refresh_late_rows"] = late.count()

        t0 = time.time()
        merge_tier(
            [
                spark.read.parquet(base_tier_path)
                .where(F.col("day") == F.lit(hot_day))
                .drop("day"),
                rollup_raw(late, ["url"], "warc_ts", "text_len", "1h"),
            ],
            ["url"],
        ).write.mode("overwrite").format("noop").save()
        out["refresh_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        rollup_raw(
            metrics, ["url"], "warc_ts", "text_len", "1h"
        ).write.mode("overwrite").format("noop").save()
        out["refresh_rebuild_sec"] = round(time.time() - t0, 2)
        shutil.rmtree(base_tier_path, ignore_errors=True)
        shutil.rmtree(late_path, ignore_errors=True)

    if "dml" in stages:
        # Copy-on-write DML vs the naive full-table rewrite: a re-crawl
        # shard updates ~0.4% of (url, warc_ts) keys + appends new rows.
        # merge_into's cost is probe (one column-pruned scan) + rewrite of
        # ONLY the files containing a match; the naive alternative rewrites
        # every byte of the table. At 100 TB the naive path is simply not
        # runnable per crawl dump — the measured gap here is the floor of
        # the real one, because a day-partitioned production table also
        # stats-prunes the probe itself (here source keys span all files).
        from streamchange_spark.sources import SnapshotStore

        store_path = path + f"_dml_{cpus}"
        scratch = path + f"_dml_rw_{cpus}"
        for p in (store_path, scratch):
            shutil.rmtree(p, ignore_errors=True)
        n_parts, files_per_part = 8, 16
        # UNTIMED setup: one pass to lay out url-hash partitions on disk,
        # then a url-range-clustered commit with per-file url bounds.
        part_path = path + f"_dml_parts_{cpus}"
        metrics.withColumn(
            "p", F.pmod(F.xxhash64("url"), F.lit(n_parts))
        ).write.mode("overwrite").partitionBy("p").parquet(part_path)
        store = SnapshotStore(store_path)
        store.commit_partitions(
            {
                f"raw/p{i}": spark.read.parquet(f"{part_path}/p={i}")
                for i in range(n_parts)
            },
            stat_cols=["url"],
            cluster_by=["url"],
            cluster_files=files_per_part,
        )
        # A DOMAIN-LOCALIZED re-crawl shard (how crawl increments actually
        # arrive: one url neighborhood at a time, not a uniform sprinkle
        # over the key space): all rows of a contiguous ~0.5% slice of the
        # sorted url domain. Uniform-random updates would touch every file
        # and degrade COW to a full rewrite — that shape belongs to
        # partition-replacing commits, not row-level MERGE.
        urls = metrics.select("url").distinct()
        n_urls = urls.count()
        block = urls.orderBy("url").limit(max(20, n_urls // 200))
        lo_hi = block.agg(F.min("url"), F.max("url")).collect()[0]
        updates = metrics.where(
            (F.col("url") >= lo_hi[0]) & (F.col("url") <= lo_hi[1])
        ).withColumn("text_len", F.col("text_len") + 1.0)
        inserts = block.select(
            F.concat(F.col("url"), F.lit("#new")).alias("url"),
            F.lit("2031-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            F.lit(1.0).alias("text_len"),
        )
        src_path = path + f"_dml_src_{cpus}"
        updates.unionByName(inserts).coalesce(4).write.mode(
            "overwrite"
        ).parquet(src_path)
        src = spark.read.parquet(src_path)
        out["dml_src_rows"] = src.count()
        out["dml_total_files"] = len(store.files_for(prefix="raw/"))

        t0 = time.time()
        _, rep = store.merge_into(
            spark,
            src,
            ["url", "warc_ts"],
            prefix="raw/",
            insert_partition="raw/p0",
        )
        out["dml_merge_sec"] = round(time.time() - t0, 2)
        out["dml_touched_files"] = rep["touched_files"]
        out["dml_inserted_rows"] = rep["inserted_rows"]

        # Naive full-table COW (no file-level planning): marker-join the
        # whole table against the source and rewrite every byte.
        t0 = time.time()
        tbl = store.read(spark, prefix="raw/")
        marked = F.broadcast(
            src.select(
                "url",
                "warc_ts",
                F.col("text_len").alias("__src_text_len"),
                F.lit(True).alias("__m"),
            )
        )
        (
            tbl.join(marked, ["url", "warc_ts"], "left")
            .select(
                "url",
                "warc_ts",
                F.when(F.col("__m"), F.col("__src_text_len"))
                .otherwise(F.col("text_len"))
                .alias("text_len"),
            )
            .unionByName(
                src.join(
                    tbl.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti"
                )
            )
            .write.mode("overwrite")
            .parquet(scratch)
        )
        out["dml_rewrite_sec"] = round(time.time() - t0, 2)

        # Right-to-be-forgotten purge of ONE url: the ranges hint must
        # prune nearly every file from the probe via the manifest stats.
        victim = metrics.agg(F.min("url")).collect()[0][0]
        t0 = time.time()
        _, drep = store.delete_where(
            spark,
            F.col("url") == F.lit(victim),
            prefix="raw/",
            ranges={"url": (victim, victim)},
        )
        out["dml_delete_sec"] = round(time.time() - t0, 2)
        out["dml_delete_rows"] = drep["deleted_rows"]
        out["dml_delete_pruned_files"] = drep["pruned_files"]

        # Same purge as a merge-on-read positional delete (second victim
        # url — the first is gone): the commit writes O(deleted rows)
        # bytes instead of rewriting the touched file, which is the only
        # viable delete shape when a compliance sweep grazes thousands of
        # 100 TB-table files. Report payload bytes so the O(rows)-not-
        # O(file) claim is a measured number.
        victim2 = (
            metrics.where(F.col("url") > F.lit(victim))
            .agg(F.min("url"))
            .collect()[0][0]
        )
        if victim2 is not None:
            t0 = time.time()
            _, mrep = store.delete_where(
                spark,
                F.col("url") == F.lit(victim2),
                prefix="raw/",
                ranges={"url": (victim2, victim2)},
                mode="merge-on-read",
            )
            out["dml_mor_delete_sec"] = round(time.time() - t0, 2)
            out["dml_mor_delete_rows"] = mrep["deleted_rows"]
            out["dml_mor_delete_bytes"] = mrep.get("delete_bytes", 0)
        for p in (store_path, scratch, part_path, src_path):
            shutil.rmtree(p, ignore_errors=True)

    if "state_sorted" in stages:
        # Same state-tier build over the sorted one-file-per-bucket layout:
        # the lead window rides the scan order and HashPartitioning(url)
        # clusters the (url, bucket, state) groups — ZERO Exchange, ZERO
        # Sort (plan-asserted each run; the 2.1-2.2x layout win in
        # BASELINE.md, now reproducible instead of a one-off).
        from streamchange_spark.operators import state_tier as _state_tier
        from streamchange_spark.sources import enable_sorted_bucketed_scan

        srtst = path + "_srtst"
        enable_sorted_bucketed_scan(spark)
        spark.sql("DROP TABLE IF EXISTS pages_srtst_bench")
        spark.sql(
            f"""CREATE TABLE pages_srtst_bench
            (url STRING, warc_ts TIMESTAMP, lang STRING)
            USING parquet CLUSTERED BY (url)
            SORTED BY (url, warc_ts) INTO {SORTED_BUCKETS} BUCKETS
            LOCATION '{srtst}'"""
        )
        st = _state_tier(
            spark.table("pages_srtst_bench"), ["url"], "warc_ts", "lang", "1h"
        )
        plan = st._jdf.queryExecution().executedPlan().toString()
        out["state_sorted_plan_ok"] = (
            "Exchange" not in plan and "Sort" not in plan
        )
        t0 = time.time()
        st.write.mode("overwrite").format("noop").save()
        out["state_sorted_sec"] = round(time.time() - t0, 2)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )

    if "sessions_sorted" in stages:
        # Same sessionization over the sorted one-file-per-bucket layout:
        # the scan reports HashPartitioning(url) AND (url, warc_ts) order,
        # so the window pipeline plans ZERO Exchange and ZERO Sort — the
        # sort the plain stage pays at read time moved to write time.
        from streamchange_spark.operators import session_stats
        from streamchange_spark.sources import enable_sorted_bucketed_scan

        srt_path = path + "_srt"
        enable_sorted_bucketed_scan(spark)
        spark.sql("DROP TABLE IF EXISTS pages_srt_bench")
        spark.sql(
            f"""CREATE TABLE pages_srt_bench (url STRING, warc_ts TIMESTAMP)
            USING parquet CLUSTERED BY (url)
            SORTED BY (url, warc_ts) INTO {SORTED_BUCKETS} BUCKETS
            LOCATION '{srt_path}'"""
        )
        t = spark.table("pages_srt_bench")
        sess = session_stats(t, ["url"], "warc_ts", 86400.0)
        plan = sess._jdf.queryExecution().executedPlan().toString()
        out["sessions_sorted_plan_ok"] = (
            "Exchange" not in plan and "Sort" not in plan
        )
        t0 = time.time()
        out["sessions_sorted"] = sess.count()
        out["sessions_sorted_sec"] = round(time.time() - t0, 2)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )

    spark.stop()
    return out


def _derive(merged: dict) -> dict:
    """Recompute throughputs (and the pipeline total) from merged times."""
    n_rows = merged["input_rows"]
    if "ingest_sec" in merged:
        merged["ingest_rows_per_sec"] = round(n_rows / merged["ingest_sec"], 1)
    if "rollup_sec" in merged:
        merged["rolled_points_per_sec"] = round(3 * n_rows / merged["rollup_sec"], 1)
    if "detect_sec" in merged:
        merged["detect_points_per_sec"] = round(
            merged["hourly_points"] / merged["detect_sec"], 1
        )
    if "crawlfreq_sec" in merged:
        merged["crawlfreq_points_per_sec"] = round(
            merged["crawlfreq_grid_rows"] / merged["crawlfreq_sec"], 1
        )
    if "corpus_sec" in merged:
        merged["corpus_docs_per_sec"] = round(
            merged["corpus_docs"] / merged["corpus_sec"], 1
        )
    if "sessions_sec" in merged:
        merged["sessions_rows_per_sec"] = round(
            n_rows / merged["sessions_sec"], 1
        )
    if "sessions_sorted_sec" in merged:
        merged["sessions_sorted_rows_per_sec"] = round(
            n_rows / merged["sessions_sorted_sec"], 1
        )
    if "sketch_build_sec" in merged:
        merged["sketch_rows_per_sec"] = round(
            n_rows / merged["sketch_build_sec"], 1
        )
    if "lines_sec" in merged:
        merged["lines_docs_per_sec"] = round(
            merged["lines_docs"] / merged["lines_sec"], 1
        )
    if "lines_inc_sec" in merged:
        merged["lines_inc_speedup_vs_global"] = round(
            merged["lines_inc_global_sec"] / merged["lines_inc_sec"], 2
        )
    if "increment_sec" in merged:
        merged["increment_docs_per_sec"] = round(
            merged["increment_docs"] / merged["increment_sec"], 1
        )
        merged["increment_speedup_vs_global"] = round(
            merged["increment_global_sec"] / merged["increment_sec"], 2
        )
    if "refresh_sec" in merged:
        merged["refresh_speedup_vs_rebuild"] = round(
            merged["refresh_rebuild_sec"] / merged["refresh_sec"], 2
        )
    if "dml_merge_sec" in merged:
        merged["dml_merge_speedup_vs_rewrite"] = round(
            merged["dml_rewrite_sec"] / merged["dml_merge_sec"], 2
        )
    if "state_sec" in merged:
        merged["state_rows_per_sec"] = round(n_rows / merged["state_sec"], 1)
    if "state_sorted_sec" in merged:
        merged["state_sorted_rows_per_sec"] = round(
            n_rows / merged["state_sorted_sec"], 1
        )
    if "churn_sig_sec" in merged:
        merged["churn_snapshots_per_sec"] = round(
            merged["churn_snapshots"] / merged["churn_sig_sec"], 1
        )
    if all(f"{s}_sec" in merged for s in PIPELINE_STAGES):
        merged["pipeline_sec"] = round(
            sum(merged[f"{s}_sec"] for s in PIPELINE_STAGES), 2
        )
        merged["pipeline_rows_per_sec"] = round(n_rows / merged["pipeline_sec"], 1)
    return merged


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=20000)
    ap.add_argument("--snapshots", type=int, default=60)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--stages", default="all")
    ap.add_argument("--workdir", default="/root/repo/.bench")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    stages = (
        set(ALL_STAGES)
        if args.stages == "all"
        else {s.strip() for s in args.stages.split(",")}
    )
    unknown = stages - set(ALL_STAGES)
    if unknown:
        raise SystemExit(f"unknown stages: {sorted(unknown)}")

    levels = sorted(int(x) for x in args.levels.split(","))
    path = os.path.join(args.workdir, f"pages_{args.urls}x{args.snapshots}.parquet")
    if not os.path.exists(path):
        build_input(path, args.urls, args.snapshots, cpus=os.cpu_count() or 8)
    if "sessions_sorted" in stages and not os.path.exists(path + "_srt"):
        build_sorted_input(path, path + "_srt", cpus=os.cpu_count() or 8)
    if "state_sorted" in stages and not os.path.exists(path + "_srtst"):
        build_sorted_state_input(path, path + "_srtst",
                                 cpus=os.cpu_count() or 8)
    if "increment" in stages and not os.path.exists(
        os.path.join(path + "_incstate", "meta.json")
    ):
        build_increment_state(path, path + "_incstate",
                              cpus=os.cpu_count() or 8)

    # Interleaved passes: pass 0 over every level, then pass 1, ... so a
    # host stall window degrades one pass, not every repeat of one level.
    raw: dict[int, list[dict]] = {c: [] for c in levels}
    for rep in range(max(1, args.repeats)):
        for cpus in levels:
            try:
                r = run_level(path, cpus, stages)
            finally:
                # tmpfs shuffle dirs are outside workdir's cleanup path;
                # leaving spill in /dev/shm across runs would eat shared mem.
                shutil.rmtree(f"/dev/shm/spark-local-{cpus}", ignore_errors=True)
            raw[cpus].append(r)
            print(json.dumps({"pass": rep, **r}))

    results = []
    for cpus in levels:
        merged = dict(raw[cpus][0])
        for r in raw[cpus][1:]:
            for k, v in r.items():
                if k.endswith("_sec"):
                    merged[k] = min(merged[k], v)
        results.append(_derive(merged))
        print(json.dumps(results[-1]))

    metrics = {
        "ingest": "ingest_rows_per_sec",
        "rollup": "rolled_points_per_sec",
        "gorilla": "gorilla_sec",
        "gorilla_decompress": "gorilla_decompress_sec",
        "detect": "detect_points_per_sec",
        "crawlfreq": "crawlfreq_points_per_sec",
        "corpus": "corpus_docs_per_sec",
        "sessions": "sessions_rows_per_sec",
        "sessions_sorted": "sessions_sorted_rows_per_sec",
        "sketch": "sketch_rows_per_sec",
        "sketch_merge": "sketch_merge_sec",
        "increment": "increment_docs_per_sec",
        "lines": "lines_docs_per_sec",
        "lines_increment": "lines_inc_sec",
        "lines_increment_global": "lines_inc_global_sec",
        "increment_global": "increment_global_sec",
        "pipeline": "pipeline_rows_per_sec",
        "dml_merge": "dml_merge_sec",
        "dml_rewrite": "dml_rewrite_sec",
        "dml_delete": "dml_delete_sec",
        "churn_sig": "churn_snapshots_per_sec",
        "churn_detect": "churn_detect_sec",
        "state": "state_rows_per_sec",
        "state_merge": "state_merge_sec",
        "state_sorted": "state_sorted_rows_per_sec",
    }

    def thr(r, key):
        # *_per_sec keys are already throughputs; bare *_sec keys are times.
        is_time = key.endswith("_sec") and not key.endswith("_per_sec")
        return 1.0 / r[key] if is_time else r[key]

    summary = {"levels": [r["cpus"] for r in results], "pairs": {}}
    for lo, hi in zip(results, results[1:]):
        ratio = hi["cpus"] / lo["cpus"]
        summary["pairs"][f'{lo["cpus"]}->{hi["cpus"]}'] = {
            name: round((thr(hi, key) / thr(lo, key)) / ratio, 3)
            for name, key in metrics.items()
            if key in lo and key in hi
        }
    print(json.dumps(summary))
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
