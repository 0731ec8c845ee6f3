"""Two-parallelism-level scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox substitution per BASELINE.md:
the same job at local[8] vs local[32] on the same pre-generated input).

The job is the flagship pages pipeline:
  pages parquet -> select(url, warc_ts, length(text))       [column pruning]
  -> 1h/1d/30d continuous-aggregate tiers                   [rolled-up points]
  -> Gorilla-compress the 1h tier                           [binary columns]
  -> WindowSegmentor change points on each url's 1h mean    [change points]
plus the training-data corpus stage over the same pages table:
  pages -> latest_pages (newest text per url)               [crawl collapse]
  -> corpus_features (lang/quality/md5/minhash, persisted)  [the text pass]
  -> verdicts_from_features (LSH bands -> components -> verdicts)

Usage:
  PYTHONPATH=/root/repo python tools/bench_scaling.py [--urls 20000] \
      [--snapshots 60] [--levels 8,32] [--keep]

Prints one JSON line per level plus a summary line with scaling efficiency
  eff = (throughput_hi / throughput_lo) / (hi / lo).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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


def run_level(path: str, cpus: int) -> dict:
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

    # Ingest invariant: sha256(text) per row (BASELINE.json input_hint's
    # byte-identity manifest) — pure scan+hash, the linearly-scaling part of
    # a real 100 TB ingest.
    from streamchange_spark.sources import text_manifest

    t0 = time.time()
    text_manifest(pages).select(
        F.count(F.lit(1)), F.max("text_sha256")
    ).collect()
    ingest_sec = time.time() - t0

    from streamchange_spark.operators import rollup_raw, rollup_tier

    # Materialize the 1h tier once; coarser tiers re-aggregate the persisted
    # tier (the continuous-aggregate contract — no raw re-scan per tier).
    t0 = time.time()
    tier1h = rollup_raw(metrics, ["url"], "warc_ts", "text_len", "1h").persist()
    n_points = tier1h.count()
    tier1d = rollup_tier(tier1h, ["url"], "1d")
    tier1d.write.mode("overwrite").format("noop").save()
    rollup_tier(tier1d, ["url"], "30d").write.mode("overwrite").format("noop").save()
    rollup_sec = time.time() - t0

    from streamchange_spark.operators import decompress_series

    t0 = time.time()
    compressed = compress_series(tier1h, ["url"], "bucket_start", "sum_v").persist()
    compressed.count()
    gorilla_sec = time.time() - t0

    t0 = time.time()
    decompress_series(compressed, ["url"], "bucket_start", "sum_v").write.mode(
        "overwrite"
    ).format("noop").save()
    gunzip_sec = time.time() - t0
    compressed.unpersist()

    # Detectors assume standardized series (reference: pelt/pelt.py:12,
    # capa/capa.py:12); standardize each url's hourly mean JVM-side.
    from pyspark.sql import Window

    w = Window.partitionBy("url")
    hourly_mean = (
        tier1h.withColumn("_m", F.col("sum_v") / F.col("n_points"))
        .withColumn("v", (F.col("_m") - F.avg("_m").over(w)) /
                    # nullif: constant series (stddev 0, short-snapshot
                    # inputs) standardize to 0 instead of ANSI div-by-zero
                    F.coalesce(F.nullif(F.stddev("_m").over(w), F.lit(0.0)),
                               F.lit(1.0)))
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
    n_cpts = cpts.count()
    detect_sec = time.time() - t0
    tier1h.unpersist()

    # Corpus dedup stage (same pages input): the pipeline shape — one
    # persisted feature pass (the only stage that touches payload text),
    # then id-level global dedup + verdict assembly.
    from streamchange_spark.corpus_pipeline import latest_pages
    from streamchange_spark.operators import corpus_features, verdicts_from_features

    t0 = time.time()
    docs = latest_pages(pages, ["text"]).select("url", "text")
    feats = corpus_features(
        docs, id_col="url", text_col="text", keep_langs=None, min_quality=0.0,
        # xxhash = the pipeline's scale default (md5 is for oracle
        # reproducibility only; the digest dominated the text pass 76s vs 27s)
        hash_fn="xxhash",
    ).persist()
    n_docs = feats.count()
    verdicts_from_features(feats, id_col="url").write.mode("overwrite").format(
        "noop"
    ).save()
    corpus_sec = time.time() - t0
    feats.unpersist()

    spark.stop()
    pipeline_sec = ingest_sec + rollup_sec + gorilla_sec + detect_sec
    return {
        "cpus": cpus,
        "input_rows": n_rows,
        "ingest_sec": round(ingest_sec, 2),
        "ingest_rows_per_sec": round(n_rows / ingest_sec, 1),
        "rollup_sec": round(rollup_sec, 2),
        "rolled_points_per_sec": round(3 * n_rows / rollup_sec, 1),
        "gorilla_sec": round(gorilla_sec, 2),
        "gorilla_decompress_sec": round(gunzip_sec, 2),
        "hourly_points": n_points,
        "detect_sec": round(detect_sec, 2),
        "detect_points_per_sec": round(n_points / detect_sec, 1),
        "changepoints": n_cpts,
        "corpus_docs": n_docs,
        "corpus_sec": round(corpus_sec, 2),
        "corpus_docs_per_sec": round(n_docs / corpus_sec, 1),
        "pipeline_sec": round(pipeline_sec, 2),
        "pipeline_rows_per_sec": round(n_rows / pipeline_sec, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=20000)
    ap.add_argument("--snapshots", type=int, default=60)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--workdir", default="/root/repo/.bench")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    levels = sorted(int(x) for x in args.levels.split(","))
    path = os.path.join(args.workdir, f"pages_{args.urls}x{args.snapshots}.parquet")
    if not os.path.exists(path):
        build_input(path, args.urls, args.snapshots, cpus=os.cpu_count() or 8)

    results = []
    for cpus in levels:
        try:
            r = run_level(path, cpus)
        finally:
            # tmpfs shuffle dirs are outside workdir's cleanup path; leaving
            # spill in /dev/shm across runs would eat shared memory.
            shutil.rmtree(f"/dev/shm/spark-local-{cpus}", ignore_errors=True)
        results.append(r)
        print(json.dumps(r))

    # (result key, invert?) — gorilla is recorded as seconds, the rest as
    # throughput already
    metrics = {
        "ingest": ("ingest_rows_per_sec", False),
        "rollup": ("rolled_points_per_sec", False),
        "gorilla": ("gorilla_sec", True),
        "gorilla_decompress": ("gorilla_decompress_sec", True),
        "detect": ("detect_points_per_sec", False),
        "corpus": ("corpus_docs_per_sec", False),
        "pipeline": ("pipeline_rows_per_sec", False),
    }

    def thr(r, spec):
        key, invert = spec
        return 1.0 / r[key] if invert else r[key]

    summary = {"levels": [r["cpus"] for r in results], "pairs": {}}
    for lo, hi in zip(results, results[1:]):
        ratio = hi["cpus"] / lo["cpus"]
        summary["pairs"][f'{lo["cpus"]}->{hi["cpus"]}'] = {
            name: round((thr(hi, spec) / thr(lo, spec)) / ratio, 3)
            for name, spec in metrics.items()
        }
    print(json.dumps(summary))
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
