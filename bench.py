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
    "plot_table",
    "asof_enrich",
    "sessionize",
    "rolling_zscore",
    "scrub_pii",
    "weighted_sample",
    "percentile_rollup",
    "sketch_percentiles_1d",
    "sequence_packing",
    "token_topk",
    "hopping_rollup",
    "tfidf_topk",
    "distinct_rollup",
    "props_extract",
    "pivot_events",
    "rollup_totals",
    "dedup_lines",
    "distinct_sketch_1d",
    "heavy_hitters_1d",
    "hopping_distinct",
    "hopping_topk",
    "hopping_percentiles",
    "change_scores",
    "normalize_text",
    "standardize",
    "freq_changepoints",
    "refresh_1h",
    "twa_1h",
    "twa_1d_from_1h",
    "counter_rate",
    "lttb",
    "asap_smooth",
    "trend_1d",
    "state_durations_1d",
    "uptime_1h",
    "pruned_tier_read",
    "merge_upsert",
    "delete_rows",
    "mor_delete",
    "update_rows",
    "eq_delete",
    "zorder_read",
    "bloom_read",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "4"))

    from streamchange_spark.session import get_spark

    import __spark_entry__ as entry_mod

    # Self-contained environment pinning (everything the number depends on):
    # - get_spark() pins a fixed pre-touched ParallelGC heap (no G1 heap
    #   uncommit -> hypervisor refault storms) and UTC/Arrow/AQE confs.
    # - shuffle dirs on tmpfs so local-disk contention does not pollute
    #   timings (a cluster's shuffle bandwidth scales with node count).
    local_dir = f"/dev/shm/spark-bench-{os.getpid()}"
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.local.dir": local_dir},
    )
    # Warm the JVM + Arrow path once so per-query timings measure the queries.
    spark.range(1000).selectExpr("sum(id)").collect()

    events_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    queries = entry_mod.queries()
    # This sandbox VM shows sporadic multi-second host-level stalls that can
    # last longer than one query. Back-to-back repeats of the same query both
    # eat the same stall, so min-of-N per query is only robust if the repeats
    # are spread out in time: run full INTERLEAVED passes over all queries
    # and take the per-query min across passes.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for p in range(passes):
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples[name].append(time.time() - t0)
        print(f"# pass {p}: {round(sum(s[-1] for s in samples.values()), 2)}s",
              file=sys.stderr)
    timings = {name: round(min(s), 3) for name, s in samples.items()}
    for name in HEADLINE:
        print(f"# {name}: {timings[name]}s (all: "
              f"{[round(x, 2) for x in samples[name]]})", file=sys.stderr)

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
        "env": {
            "passes": passes,
            "aggregation": "min per query across interleaved passes",
            "spark_local_dir": "tmpfs (/dev/shm)",
            "jvm": "-Xms==-Xmx pre-touched ParallelGC heap (see session.py)",
            "shuffle_partitions": max(cpus, 8),
        },
    }
    print(json.dumps(result))
    import shutil

    spark.stop()
    shutil.rmtree(local_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
