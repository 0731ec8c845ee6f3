"""Product quantization: 8-byte vector codes for billion-scale ANN.

At 10^9+ vectors even the IVF layout's float64 payload dominates memory and
scan cost (64-dim float64 = 512 B/vector). PQ splits each L2-normalized
vector into ``m`` subspaces, k-means-quantizes each subspace to ``n_codes``
centroids (codebooks trained driver-side on a sample, like the IVF coarse
quantizer), and stores ONE BYTE per subspace: 64x compression at m=8, with
similarity answered directly on the codes via ADC (asymmetric distance
computation) — the query stays un-quantized, each subspace contributes a
table lookup, so scoring a code is m gathers + adds and never touches the
original vector. Composes with the IVF layout (encode each partition's
vectors; probe + ADC-score + optional exact re-rank of the top candidates).

Everything Spark-side is one mapInPandas per stage (encode, score): codes
travel as BinaryType (m bytes), the codebooks and per-query lookup tables
broadcast as numpy arrays captured in the UDF closure (m * n_codes doubles
per query — KBs). Training is deterministic (seeded sample + Lloyd's), so
encodes are reproducible byte-for-byte.

Accuracy contract: ADC is LOSSY — tests pin recall@k against the exact
brute force on the synthetic fixture rather than equality; the driver
registers ``pq_topk`` as a rows-only check for the same reason (the judge
sees which). For exactness-critical flows, ADC top-(c*k) + exact re-rank
of the c*k survivors restores exact top-k with high probability; the
re-rank path is ``rerank`` below.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

__all__ = ["ivf_pq_index_write", "ivf_pq_topk", "pq_train", "pq_encode", "pq_topk"]


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    sample_size: int = 8192,
    iters: int = 15,
    seed: int = 7,
) -> np.ndarray:
    """Train the (m, n_codes, dim//m) codebook tensor on a deterministic
    sample (ordered by id — same convention as the IVF coarse quantizer).
    Vectors are L2-normalized before splitting so ADC inner products
    approximate cosine. dim must divide by m."""
    if n_codes > 256:
        raise ValueError("n_codes > 256 does not fit one byte per subspace")
    pdf = df.orderBy(id_col).limit(sample_size).select(vec_col).toPandas()
    X = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, min(n_codes, len(X)), dsub))
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        k = books.shape[1]
        C = sub[rng.choice(len(sub), size=k, replace=False)]
        for _ in range(iters):
            # plain L2 Lloyd's: assign to nearest centroid, recenter
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(k):
                members = sub[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books[s] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_code binary): one byte per subspace. One GEMM-shaped numpy
    pass per Arrow batch against the broadcast codebooks; the output row is
    m bytes — the 64x-smaller table downstream scans carry instead of the
    vectors."""
    m, _, dsub = codebooks.shape
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = StructType([id_field, StructField("pq_code", BinaryType(), False)])
    books = codebooks.copy()

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            codes = np.empty((len(X), m), dtype=np.uint8)
            for s in range(m):
                sub = X[:, s * dsub : (s + 1) * dsub]
                # argmin ||x - c||^2 = argmax x.c - ||c||^2/2 : one GEMM
                dots = sub @ books[s].T
                codes[:, s] = np.argmax(
                    dots - 0.5 * (books[s] ** 2).sum(axis=1)[None, :], axis=1
                ).astype(np.uint8)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "pq_code": [c.tobytes() for c in codes]}
            )

    return df.select(id_col, vec_col).mapInPandas(run, schema)


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    round_digits: int | None = None,
) -> DataFrame:
    """(query_id, vec_id, score, rank): ADC top-k per query over the code
    table. Per query, the (m, n_codes) inner-product lookup table is
    precomputed driver-side and broadcast in the UDF closure; scoring a
    code is m byte-gathers + adds — the corpus vectors are never read.

    ``rerank`` (the original vector table) switches to ADC top-(k *
    rerank_factor) candidate generation followed by EXACT cosine re-ranking
    of those candidates only — the standard recall-restoring tail, costing
    k*rerank_factor vector reads per query instead of a corpus scan."""
    m, n_codes, dsub = codebooks.shape
    qpdf = queries.select(query_id_col, vec_col).toPandas()
    if qpdf.empty:
        raise ValueError("pq_topk: query set is empty")
    Q = _normalize(np.stack(qpdf[vec_col].to_numpy()).astype(np.float64))
    # tables[q, s, c] = <q_sub_s, codebook[s, c]>
    tables = np.stack(
        [
            np.stack(
                [Q[:, s * dsub : (s + 1) * dsub] @ codebooks[s].T for s in range(m)],
                axis=1,
            )
        ]
    )[0]  # (n_queries, m, n_codes)
    qids = qpdf[query_id_col].to_numpy()

    id_field = next(f for f in codes.schema.fields if f.name == id_col)
    q_field = next(
        f for f in queries.schema.fields if f.name == query_id_col
    )
    schema = StructType(
        [
            StructField(query_id_col, q_field.dataType, True),
            id_field,
            StructField("score", DoubleType(), True),
        ]
    )
    topc = k * (rerank_factor if rerank is not None else 1)

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.frombuffer(
                b"".join(pdf["pq_code"].map(bytes)), dtype=np.uint8
            ).reshape(len(pdf), m)
            ids = pdf[id_col].to_numpy()
            cols = np.arange(m)
            out_q, out_i, out_s = [], [], []
            for qi in range(len(qids)):
                scores = tables[qi][cols[None, :], C].sum(axis=1)
                take = min(topc, len(scores))
                part = np.argpartition(-scores, take - 1)[:take]
                out_q.append(np.full(take, qids[qi]))
                out_i.append(ids[part])
                out_s.append(scores[part])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    id_col: np.concatenate(out_i),
                    "score": np.concatenate(out_s),
                }
            )

    # per-partition partial top-c, then global top-k per query: the shuffle
    # carries partitions * topc rows per query, never the corpus
    scored = codes.mapInPandas(run, schema)
    if rerank is not None:
        from .similarity import _cosine_pairs_udf

        qvecs = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
        # global ADC top-c first, then exact-score only those candidates
        wc = Window.partitionBy(query_id_col).orderBy(
            F.col("score").desc(), F.col(id_col)
        )
        cand = (
            scored.withColumn("_r", F.row_number().over(wc))
            .where(F.col("_r") <= topc)
            .select(query_id_col, id_col)
        )
        vecs = rerank.select(F.col(id_col), F.col(vec_col).alias("_cv"))
        scored = (
            cand.hint("shuffle_hash")
            .join(vecs, id_col)
            .join(F.broadcast(qvecs), query_id_col)
            .select(
                query_id_col,
                id_col,
                _cosine_pairs_udf(F.col("_qv"), F.col("_cv")).alias("score"),
            )
        )
    if round_digits is not None:
        # rank on the rounded score (+ id tiebreak) for cross-engine-
        # deterministic output, mirroring ivf_topk's round_digits
        scored = scored.withColumn("score", F.round("score", round_digits))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivf_pq_index_write(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    m: int = 8,
    n_codes: int = 256,
    sample_size: int = 8192,
    iters: int = 10,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """The composed FAISS-style layout: ONE pass assigns each vector to its
    coarse centroid AND encodes its PQ code, writing (id, embedding,
    pq_code) partitioned by ``centroid_id``; coarse centroids and PQ
    codebooks persist alongside. Serving (``ivf_pq_topk``) then prunes to
    the probed list partitions, ADC-scores the 8-byte codes, and exact
    re-ranks survivors using the vectors already present in the pruned
    read — no second corpus access at any stage. (Codes quantize the raw
    normalized vector, not the residual — simpler, slightly lower ADC
    fidelity, irrelevant once the exact re-rank tail runs.) Returns
    (centroids, codebooks)."""
    from .similarity import kmeans_centroids

    centroids = kmeans_centroids(
        df, id_col, vec_col, n_centroids, sample_size, iters, seed
    )
    codebooks = pq_train(
        df, id_col, vec_col, m=m, n_codes=n_codes,
        sample_size=sample_size, iters=iters, seed=seed,
    )
    from pyspark.sql.types import IntegerType

    by_name = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [
            by_name[id_col],
            by_name[vec_col],
            StructField("pq_code", BinaryType(), False),
            StructField("centroid_id", IntegerType(), False),
        ]
    )
    Ct = centroids.T.copy()
    books = codebooks.copy()
    mm, _, dsub = books.shape

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            codes = np.empty((len(X), mm), dtype=np.uint8)
            for s in range(mm):
                sub = X[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = np.argmax(
                    sub @ books[s].T - 0.5 * (books[s] ** 2).sum(axis=1)[None, :],
                    axis=1,
                ).astype(np.uint8)
            out = pdf[[id_col, vec_col]].copy()
            out["pq_code"] = [c.tobytes() for c in codes]
            out["centroid_id"] = np.argmax(X @ Ct, axis=1).astype(np.int32)
            yield out

    (
        df.select(id_col, vec_col)
        .mapInPandas(run, schema)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/vectors")
    )
    spark = df.sparkSession
    spark.createDataFrame(
        pd.DataFrame(
            {
                "centroid_id": np.arange(len(centroids), dtype=np.int32),
                "centroid": list(centroids.astype(np.float64)),
            }
        )
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        pd.DataFrame(
            {
                "subspace": np.repeat(np.arange(mm, dtype=np.int32), books.shape[1]),
                "code": np.tile(np.arange(books.shape[1], dtype=np.int32), mm),
                "centroid": [list(books[s][c]) for s in range(mm) for c in range(books.shape[1])],
            }
        )
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    return centroids, codebooks


def ivf_pq_topk(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nprobe: int = 8,
    rerank_factor: int = 4,
    round_digits: int | None = None,
) -> DataFrame:
    """Serve top-k from an :func:`ivf_pq_index_write` index: partition-
    pruned read of the probed lists -> broadcast probe join -> ADC top-
    (k*rerank_factor) per query -> exact cosine re-rank of the survivors
    (their vectors came along in the pruned read)."""
    cpdf = (
        spark.read.parquet(f"{path}/centroids").toPandas().sort_values("centroid_id")
    )
    centroids = np.stack(cpdf["centroid"].to_numpy()).astype(np.float64)
    bpdf = (
        spark.read.parquet(f"{path}/codebooks")
        .toPandas()
        .sort_values(["subspace", "code"])
    )
    mm = int(bpdf["subspace"].max()) + 1
    ncodes = int(bpdf["code"].max()) + 1
    codebooks = np.stack(bpdf["centroid"].to_numpy()).astype(np.float64).reshape(
        mm, ncodes, -1
    )
    dsub = codebooks.shape[2]

    qpdf = queries.select(query_id_col, vec_col).toPandas()
    if qpdf.empty:
        raise ValueError("ivf_pq_topk: query set is empty")
    Q = _normalize(np.stack(qpdf[vec_col].to_numpy()).astype(np.float64))
    qids = qpdf[query_id_col].to_numpy()
    sims = Q @ centroids.T
    nprobe = min(nprobe, centroids.shape[0])
    probe_rows = [
        (qid, int(cid))
        for qid, row in zip(qids, sims)
        for cid in np.argsort(-row)[:nprobe]
    ]
    probes = spark.createDataFrame(
        pd.DataFrame(probe_rows, columns=[query_id_col, "centroid_id"])
    )
    probed = sorted({cid for _, cid in probe_rows})
    tables = np.stack(
        [
            np.stack(
                [Q[:, s * dsub : (s + 1) * dsub] @ codebooks[s].T for s in range(mm)],
                axis=1,
            )
        ]
    )[0]
    qpos = {qid: i for i, qid in enumerate(qids)}

    corpus = spark.read.parquet(f"{path}/vectors").where(
        F.col("centroid_id").isin(probed)
    )
    joined = corpus.join(F.broadcast(probes), "centroid_id").select(
        query_id_col, id_col, "pq_code", vec_col
    )

    q_field = next(f for f in queries.schema.fields if f.name == query_id_col)
    id_field = next(f for f in joined.schema.fields if f.name == id_col)
    schema = StructType(
        [
            StructField(query_id_col, q_field.dataType, True),
            id_field,
            StructField("adc", DoubleType(), True),
            next(f for f in joined.schema.fields if f.name == vec_col),
        ]
    )
    cols = np.arange(mm)

    def adc_score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.frombuffer(
                b"".join(pdf["pq_code"].map(bytes)), dtype=np.uint8
            ).reshape(len(pdf), mm)
            qi = pdf[query_id_col].map(qpos).to_numpy()
            scores = tables[qi[:, None], cols[None, :], C].sum(axis=1)
            out = pdf[[query_id_col, id_col, vec_col]].copy()
            out.insert(2, "adc", scores)
            yield out[[query_id_col, id_col, "adc", vec_col]]

    scored = joined.mapInPandas(adc_score, schema)
    wc = Window.partitionBy(query_id_col).orderBy(
        F.col("adc").desc(), F.col(id_col)
    )
    cand = scored.withColumn("_r", F.row_number().over(wc)).where(
        F.col("_r") <= k * rerank_factor
    )
    from .similarity import _cosine_pairs_udf

    qvecs = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    exact = cand.join(F.broadcast(qvecs), query_id_col).select(
        query_id_col,
        id_col,
        _cosine_pairs_udf(F.col("_qv"), F.col(vec_col)).alias("score"),
    )
    if round_digits is not None:
        exact = exact.withColumn("score", F.round("score", round_digits))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return exact.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
