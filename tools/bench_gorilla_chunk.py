"""A/B: compress_series chunk_points=None vs 65536 (the run_pipeline default)
on the 1h tier of a large pages table — same-session interleaved min-of-N so
host stalls cannot masquerade as a plan cost.

The chunked path is the pipeline default for skew-tail reasons (a hot key's
multi-million-point series otherwise decodes as one sequential token stream
in one task); this measures what the default costs/buys at a benign key
distribution, where chunking should be ~free.

Usage:
  PYTHONPATH=/root/repo python tools/bench_gorilla_chunk.py \
      [--input /root/repo/.bench/pages_20000x1000.parquet] [--cpus 8]
      [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input", default="/root/repo/.bench/pages_20000x1000.parquet"
    )
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from streamchange_spark.operators import (
        compress_series,
        decompress_series,
        rollup_raw,
    )
    from streamchange_spark.session import get_spark

    spark = get_spark(
        "bench_gorilla_chunk",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
        extra_conf={"spark.local.dir": f"/dev/shm/spark-gch-{args.cpus}"},
    )
    pages = spark.read.parquet(args.input)
    metrics = pages.select(
        "url", "warc_ts", F.length("text").cast("double").alias("text_len")
    )
    tier1h = rollup_raw(metrics, ["url"], "warc_ts", "text_len", "1h").persist()
    n_points = tier1h.count()

    def run(chunk_points):
        t0 = time.time()
        blobs = compress_series(
            tier1h, ["url"], "bucket_start", "sum_v", chunk_points=chunk_points
        ).persist()
        nb = blobs.count()
        c_sec = time.time() - t0
        keys = ["url"] if chunk_points is None else ["url", "chunk_id"]
        t0 = time.time()
        decompress_series(blobs, keys, "bucket_start", "sum_v").write.mode(
            "overwrite"
        ).format("noop").save()
        d_sec = time.time() - t0
        blobs.unpersist()
        return c_sec, d_sec, nb

    variants = {"unchunked": None, "chunk64k": 65536}
    res = {k: {"compress": [], "decompress": [], "blobs": None} for k in variants}
    for _ in range(args.passes):
        for name, cp in variants.items():
            c, d, nb = run(cp)
            res[name]["compress"].append(round(c, 2))
            res[name]["decompress"].append(round(d, 2))
            res[name]["blobs"] = nb
    out = {
        "points": n_points,
        "cpus": args.cpus,
        **{
            f"{name}_{stage}_min_sec": min(res[name][stage])
            for name in variants
            for stage in ("compress", "decompress")
        },
        **{f"{name}_blobs": res[name]["blobs"] for name in variants},
        "raw": res,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
