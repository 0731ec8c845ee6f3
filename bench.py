"""Benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

Each query executes end to end via the `noop` sink (full plan runs, nothing
is collected to the driver). Extra context fields: rows_per_sec for the
rollup path and the events row count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "rollup_1h",
    "rollup_1d_from_1h",
    "rollup_30d_from_1d",
    "gapfill_locf",
    "gorilla_roundtrip",
    "moving_sum_w8",
    "cusum_transform_sql",
    "tpch_pricing",
    "order_revenue_by_status",
    "window_segmentor",
    "sequential_alarms",
    "pelt_segments",
    "dedup_exact",
    "minhash_signatures",
    "simhash",
    "ngram_jaccard",
    "ann_topk",
    "lang_id",
    "quality",
    "fingerprint",
    "gapfill_linear",
    "retention_1h",
    "mosum_scores_sql",
    "minhash_lsh_pairs",
    "multivariate_alarms",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from streamchange_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    # Warm the JVM + Arrow path once so per-query timings measure the queries.
    spark.range(1000).selectExpr("sum(id)").collect()

    events_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    # min of 2 executions per query: this sandbox VM shows sporadic multi-
    # second host-level stalls in the serial driver phases (planning/codegen);
    # the min is the reproducible engine cost.
    for name in HEADLINE:
        fn = queries[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        pass
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "events_rows": events_rows,
        "rollup_points_per_sec": round(events_rows / timings["rollup_1h"], 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
