"""spark-submit entry point for the flagship pages pipeline (north rule:
"launched via spark-submit --py-files on multi-executor clusters").

Usage (what tools/submit_pipeline.sh wraps):

    spark-submit --master local[8] --py-files /tmp/streamchange_spark.zip \
        tools/run_pipeline.py --store /tmp/pipeline_store \
        [--pages /path/to/pages.parquet] [--urls 2000] [--snapshots 40]

Without --pages a deterministic synthetic pages table is generated. Prints
one JSON line of run metrics; re-running over the same --store resumes from
the last committed snapshot (completed day-partitions are skipped).
"""

from __future__ import annotations

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--pages", default=None, help="existing pages parquet")
    ap.add_argument("--urls", type=int, default=2000)
    ap.add_argument("--snapshots", type=int, default=40)
    ap.add_argument(
        "--mode", choices=["timeseries", "corpus"], default="timeseries",
        help="timeseries: rollup tiers + change points; corpus: "
        "clean_corpus verdicts (both resumable from --store)",
    )
    args = ap.parse_args()

    # Under spark-submit the session already exists with the submitted
    # master/confs; builder.getOrCreate attaches to it.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("streamchange_pipeline").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from streamchange_spark.corpus_pipeline import run_corpus_pipeline
    from streamchange_spark.pipeline import run_pipeline
    from streamchange_spark.sources import generate_pages

    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        pages = generate_pages(
            spark, n_urls=args.urls, mean_snapshots=args.snapshots
        )
    if args.mode == "corpus":
        metrics = run_corpus_pipeline(spark, pages, args.store)
    else:
        metrics = run_pipeline(spark, pages, args.store)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
