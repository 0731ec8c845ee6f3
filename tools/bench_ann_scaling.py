"""ANN scaling + recall evidence (round-4 verdict item 4).

The scaling table in BASELINE.md covers pipeline/corpus/sessions; this adds
the similarity tier: ``lsh_ann_pairs`` (hyperplane-LSH near-dup pairs) and
``ivf_topk`` (IVF coarse-quantizer top-k) on a >=1M-vector synthetic corpus
at two parallelism levels (north-rule substitution: local[N] vs local[4N]
on the same pre-generated input), plus recall measured against exact
brute-force ground truth (``cosine_topk_gemm``) at the same scale.

The corpus is a deterministic hash-generated Gaussian-ish mixture:
- 256 cluster directions; every vector = center(cluster) + 1.0*dir(group)
  + 0.1*dir(id)  -> same-cluster non-dup pairs sit near cosine 0.5
  (below the 0.9 emit threshold), cross-cluster near 0.
- ids with id % 10 == 0 share (center + dir) with id+1 -> 10% of N planted
  near-duplicate pairs at cosine ~0.995. These are the LSH recall truth.
- queries are singleton corpus vectors + 0.05 jitter -> each query's exact
  neighbors live in one cluster, the regime IVF probing is built for.

All vectors derive from splitmix64 hashes of (id, dim, salt) — the SAME
function runs in the Spark generator and the driver-side truth check, so
no vectors ever need to be collected for the planted-pair analysis.

LSH sizing note (the scale lesson this bench encodes): bucket_bits IS the
per-band signature width; random-pair collision rate is ~0.5^bucket_bits
per band, so bits must grow with log2(N) — at N=1.5M, 16-bit bands would
admit ~70M random candidate pairs, 24-bit bands ~0.3M. Defaults here:
n_planes=96, bucket_bits=24, n_bands=4 (planted-pair retention
(1-0.1/pi)^24 = 0.46/band -> expected recall 1-(1-0.46)^4 ~ 0.92).

Usage:
  PYTHONPATH=/root/repo python tools/bench_ann_scaling.py \
      [--n 1500000] [--levels 2,8] [--repeats 2] [--queries 64] \
      [--workdir /root/repo/.bench_ann] [--keep] [--skip-recall]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DIM = 64
N_CLUSTERS = 256
LSH = dict(n_planes=96, bucket_bits=24, n_bands=4, threshold=0.9, seed=7)
IVF = dict(k=10, n_centroids=256, nprobe=8, sample_size=8192, seed=7)


def _mix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _dirs(keys: np.ndarray, salt: int) -> np.ndarray:
    """(len(keys), DIM) uniforms in [-1, 1) from splitmix64(key, dim, salt)."""
    k = keys.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)
    j = (np.arange(DIM, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0xD1B54A32D192ED03
    )
    s = np.uint64(salt) * np.uint64(0x2545F4914F6CDD1D)
    x = _mix(k + j[None, :] + s)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 2.0 - 1.0


def make_vectors(ids: np.ndarray) -> np.ndarray:
    """The corpus construction (see module docstring); pure function of id."""
    ids = ids.astype(np.int64)
    grp = ids - np.where(ids % 10 < 2, ids % 10, 0)
    clu = grp % N_CLUSTERS
    return _dirs(clu, 1) + _dirs(grp, 2) + 0.1 * _dirs(ids, 3)


def make_queries(n_corpus: int, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Query ids (singleton corpus ids, stride-spread) and vectors."""
    stride = max((n_corpus - 10) // max(n_queries, 1), 10)
    qids = (np.arange(n_queries, dtype=np.int64) * stride) + 5  # id%10==5
    qids = qids % n_corpus
    return qids, make_vectors(qids) + 0.05 * _dirs(qids, 4)


def build_input(path: str, n: int, cpus: int) -> None:
    import pandas as pd

    from streamchange_spark.session import get_spark

    spark = get_spark("ann_gen", master=f"local[{cpus}]")
    t0 = time.time()

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            V = make_vectors(ids)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(V)})

    (
        spark.range(n, numPartitions=cpus * 4)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .write.mode("overwrite")
        .parquet(path)
    )
    rows = spark.read.parquet(path).count()
    print(f"# generated {rows} vectors in {time.time() - t0:.1f}s", file=sys.stderr)
    spark.stop()


def run_level(path: str, cpus: int, n_queries: int) -> dict:
    import pandas as pd

    from streamchange_spark.operators.similarity import ivf_topk, lsh_ann_pairs
    from streamchange_spark.session import get_spark

    spark = get_spark(
        "bench_ann",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.local.dir": f"/dev/shm/spark-local-{cpus}"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
    corpus = spark.read.parquet(path)
    n = corpus.count()
    out = {"cpus": cpus, "n_vectors": n}

    t0 = time.time()
    pairs = lsh_ann_pairs(corpus, "vec_id", "embedding", **LSH)
    out["lsh_pairs"] = pairs.count()
    out["lsh_sec"] = round(time.time() - t0, 2)

    qids, Q = make_queries(n, n_queries)
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": qids, "embedding": list(Q)})
    )
    t0 = time.time()
    topk = ivf_topk(corpus, queries, "vec_id", "embedding", "query_id", **IVF)
    out["ivf_rows"] = topk.count()
    out["ivf_sec"] = round(time.time() - t0, 2)
    spark.stop()
    return out


def measure_recall(path: str, cpus: int, n_queries: int) -> dict:
    """Recall vs exact brute force at full scale (one session, not timed
    against the scaling criterion)."""
    import pandas as pd

    from streamchange_spark.operators.similarity import (
        cosine_topk_gemm,
        ivf_topk,
        lsh_ann_pairs,
    )
    from streamchange_spark.session import get_spark

    spark = get_spark("ann_recall", master=f"local[{cpus}]")
    corpus = spark.read.parquet(path)
    n = corpus.count()
    qids, Q = make_queries(n, n_queries)
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": qids, "embedding": list(Q)})
    )

    exact = (
        cosine_topk_gemm(corpus, queries, "vec_id", "embedding", "query_id",
                         k=IVF["k"])
        .select("query_id", "vec_id")
        .toPandas()
    )
    approx = (
        ivf_topk(corpus, queries, "vec_id", "embedding", "query_id", **IVF)
        .select("query_id", "vec_id")
        .toPandas()
    )
    truth = exact.groupby("query_id")["vec_id"].apply(set)
    got = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth.index
    ]
    ivf_recall = float(np.mean(recalls))

    # planted near-dup pairs: ids (g, g+1) for g % 10 == 0; verify which are
    # above the emit threshold with the SAME generator, driver-side.
    g = np.arange(0, n - 1, 10, dtype=np.int64)
    A, B = make_vectors(g), make_vectors(g + 1)
    num = np.einsum("ij,ij->i", A, B)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    planted = set(
        (int(a), int(a + 1))
        for a, c in zip(g, num / np.maximum(den, 1e-30))
        if c >= LSH["threshold"]
    )
    emitted = lsh_ann_pairs(corpus, "vec_id", "embedding", **LSH).select(
        "id_a", "id_b"
    ).toPandas()
    emitted_set = set(
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(emitted["id_a"], emitted["id_b"])
    )
    lsh_recall = len(planted & emitted_set) / max(len(planted), 1)
    # every emitted pair is exactly verified -> precision vs threshold is 1
    # by construction; report how many non-planted (true, unplanned) pairs
    # were also found rather than calling them errors.
    spark.stop()
    return {
        "ivf_recall_at_10": round(ivf_recall, 4),
        "lsh_planted_pairs": len(planted),
        "lsh_planted_found": len(planted & emitted_set),
        "lsh_recall": round(lsh_recall, 4),
        "lsh_extra_true_pairs": len(emitted_set - planted),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_500_000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--workdir", default="/root/repo/.bench_ann")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-recall", action="store_true")
    args = ap.parse_args()

    levels = sorted(int(x) for x in args.levels.split(","))
    path = os.path.join(args.workdir, f"vecs_{args.n}.parquet")
    if not os.path.exists(path):
        build_input(path, args.n, cpus=os.cpu_count() or 8)

    raw: dict[int, list[dict]] = {c: [] for c in levels}
    for rep in range(max(1, args.repeats)):
        for cpus in levels:
            try:
                r = run_level(path, cpus, args.queries)
            finally:
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
        merged["lsh_vectors_per_sec"] = round(merged["n_vectors"] / merged["lsh_sec"], 1)
        merged["ivf_vectors_per_sec"] = round(merged["n_vectors"] / merged["ivf_sec"], 1)
        results.append(merged)
        print(json.dumps(merged))

    summary = {"levels": [r["cpus"] for r in results], "pairs": {}}
    for lo, hi in zip(results, results[1:]):
        ratio = hi["cpus"] / lo["cpus"]
        summary["pairs"][f'{lo["cpus"]}->{hi["cpus"]}'] = {
            "lsh": round((hi["lsh_vectors_per_sec"] / lo["lsh_vectors_per_sec"]) / ratio, 3),
            "ivf": round((hi["ivf_vectors_per_sec"] / lo["ivf_vectors_per_sec"]) / ratio, 3),
        }
    if not args.skip_recall:
        summary["recall"] = measure_recall(path, os.cpu_count() or 8, args.queries)
    print(json.dumps(summary))
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
