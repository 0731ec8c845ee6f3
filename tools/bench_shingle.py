"""Shingler shoot-out (VERDICT round-1 item 5): the window-`lead` plan
shuffles the full token stream to build n-grams; the mapInPandas local
shingler computes them row-locally with zero shuffle. Same downstream
minhash aggregation either way. This harness times minhash_signatures with
both at a multi-million-token scale; the winner is the operators' default.

Usage: PYTHONPATH=/root/repo python tools/bench_shingle.py [--docs 400000]
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
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from streamchange_spark.operators.dedup import minhash_signatures
    from streamchange_spark.session import get_spark

    spark = get_spark(
        "bench_shingle",
        master=f"local[{args.cpus}]",
        extra_conf={"spark.local.dir": f"/dev/shm/spark-shingle-{os.getpid()}"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    # Deterministic synthetic corpus: ~60 tokens/doc drawn from a 50k-word
    # vocabulary, fully distributed generation (no driver data).
    words = F.expr(
        "transform(sequence(1, 40 + cast(pmod(xxhash64(id), 41) as int)), "
        "j -> concat('w', pmod(xxhash64(id * 1000003 + j), 50000)))"
    )
    docs = (
        spark.range(args.docs)
        .repartition(args.cpus * 4)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
        )
        .persist()
    )
    n_tokens = docs.select(
        F.sum(F.size(F.split(F.col("text"), " ")))
    ).collect()[0][0]
    print(f"# corpus: {args.docs} docs, {n_tokens} tokens", file=sys.stderr)

    out = {"docs": args.docs, "tokens": int(n_tokens), "cpus": args.cpus}
    for shingler in ("window", "local"):
        best = None
        for _ in range(2):
            t0 = time.time()
            minhash_signatures(
                docs, "doc_id", "text", num_hashes=16, shingler=shingler,
                hash_fn="xxhash",
            ).write.mode("overwrite").format("noop").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out[f"{shingler}_sec"] = round(best, 2)
        out[f"{shingler}_tokens_per_sec"] = round(n_tokens / best, 0)
        print(f"# {shingler}: {best:.2f}s", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(f"/dev/shm/spark-shingle-{os.getpid()}", ignore_errors=True)


if __name__ == "__main__":
    main()
