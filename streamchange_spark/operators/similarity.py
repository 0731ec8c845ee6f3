"""Approximate-nearest-neighbor search over embedding columns.

- ``cosine_topk``: exact brute-force baseline — broadcast the (small) query
  set, score every (query, candidate) with JVM-side ``zip_with`` arithmetic,
  keep top-k per query with one window. Cost O(Q * N); correct by
  construction, used as the oracle for the approximate path.
- ``lsh_ann_pairs`` / ``lsh_topk``: random-hyperplane LSH — H seeded
  hyperplanes turn each vector into an H-bit sign signature entirely in
  column expressions; candidates collide on signature prefix buckets, so the
  join shuffles only (bucket, id) pairs. Recall/latency tunes with H and the
  bucket-bit count, never touching Python per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_col


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — exact top-k by cosine per query.
    ``queries``: (query_id, <vec_col>). The query side is broadcast."""
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    )
    c = candidates.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    scored = q.crossJoin(c).select(
        query_id_col,
        id_col,
        cosine_col(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(0.0, 1.0, (n_planes, dim))


def hyperplane_band_keys(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    bucket_bits: int,
    n_bands: int,
    seed: int,
) -> DataFrame:
    """(id, band, band_key) rows — the LSH bucketing stage.

    All sign bits of one Arrow batch come from a single BLAS matmul against
    the (dim x n_planes) plane matrix (the pattern proven in
    ``cosine_topk_gemm``); band keys are packed with NumPy shifts and the
    band fan-out happens inside the same UDF, so the shuffle carries only
    (id, band, key) longs. Planes are derived deterministically from
    (seed, dim) inside each worker — no driver-side ``first()`` probe, dim
    is read off the batch itself."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    assert n_planes >= bucket_bits * n_bands
    assert bucket_bits <= 63
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = StructType(
        [
            id_field,
            StructField("band", IntegerType(), False),
            StructField("band_key", LongType(), False),
        ]
    )

    def run(batches):
        planes_t = None
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes_t is None or planes_t.shape[0] != V.shape[1]:
                planes_t = _hyperplanes(V.shape[1], n_planes, seed).T
            S = (V @ planes_t) > 0  # (B, n_planes) sign bits
            keys = np.zeros((len(V), n_bands), dtype=np.int64)
            for b in range(n_bands):
                base = b * bucket_bits
                for j in range(bucket_bits):
                    keys[:, b] |= S[:, base + j].astype(np.int64) << j
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(V)),
                    "band_key": keys.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(run, schema)


def _cosine_pairs_udf(vec_a: Column, vec_b: Column) -> Column:
    """Vectorized cosine of two array columns (one NumPy pass per Arrow
    batch — replaces the interpreted ``aggregate``/``zip_with`` folds in
    the verification hot path)."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / np.maximum(den, 1e-30))

    return cos(vec_a, vec_b)


# Key tables persisted by lsh_ann_pairs(cache_keys=True): the cache must
# outlive the caller's action, so release is explicit (see
# release_lsh_key_caches). Bounded by the number of lsh_ann_pairs calls
# between releases, not by data size.
_PERSISTED_KEY_TABLES: list[DataFrame] = []


def release_lsh_key_caches() -> int:
    """Unpersist every key table cached by ``lsh_ann_pairs(cache_keys=True)``
    since the last release; returns how many were dropped. Call after the
    consuming action in long-lived sessions — each pairs call otherwise
    leaves one (id, band, key) table pinned in storage memory."""
    n = len(_PERSISTED_KEY_TABLES)
    while _PERSISTED_KEY_TABLES:
        _PERSISTED_KEY_TABLES.pop().unpersist()
    return n


def lsh_ann_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 64,
    bucket_bits: int = 16,
    n_bands: int = 4,
    threshold: float = 0.8,
    seed: int = 7,
    dim: int | None = None,
    max_bucket_size: int | None = None,
    cache_keys: bool = True,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs above threshold; candidates limited to
    sign-signature band collisions.

    ``cache_keys`` persists the (id, band, key) table before the self-join:
    the two join sides otherwise each recompute the signature GEMM pass
    over the full corpus (measured: exchange reuse does NOT deduplicate the
    mapInPandas subtrees, even under AQE). The cached table is 3 longs per
    (vector, band) — orders of magnitude smaller than re-scanning the
    vectors; set False only if executor storage memory is tighter than a
    second full GEMM pass is expensive. LIFETIME: the persisted table must
    outlive the caller's action, so it is NOT unpersisted here — in a
    long-lived session, call :func:`release_lsh_key_caches` after consuming
    the result (repeated calls otherwise accumulate cached key tables and
    evict useful storage memory).

    Scale shape: the bucketing stage shuffles only (id, band, key) longs;
    the self-join runs on 2^bucket_bits buckets per band (default 65k — at
    N vectors expected occupancy N/2^bits per band, so bucket_bits should
    grow with log2(N) to keep within-bucket pairing linear); vectors are
    joined back only for the surviving candidate pairs and verified with a
    vectorized batch cosine. ``max_bucket_size`` drops pathological
    mega-buckets (near-duplicate floods / zero vectors) to bound worst-case
    pair counts; dropped buckets mean lost recall, not wrong pairs, since
    every emitted pair is exactly verified. ``dim`` is accepted for API
    compatibility but unused (planes are derived from the observed batch
    dim inside the workers)."""
    keys = hyperplane_band_keys(
        df, id_col, vec_col, n_planes, bucket_bits, n_bands, seed
    )
    if cache_keys:
        from pyspark.storagelevel import StorageLevel

        keys = keys.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED_KEY_TABLES.append(keys)
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "band_key")
        keys = keys.withColumn("_bsz", F.count(F.lit(1)).over(w)).where(
            F.col("_bsz") <= max_bucket_size
        ).drop("_bsz")
    l, r = keys.alias("l"), keys.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    # Join the vectors back with SHUFFLE-HASH joins built on the skinny
    # candidate side: sort-merge would SORT the wide (id, 64-double) vector
    # rows twice, and sorting wide rows is the same DRAM-bound stage that
    # caps the plain sessionize path — hash joins stream the vectors.
    vecs = df.select(F.col(id_col), F.col(vec_col))
    paired = (
        cand.hint("shuffle_hash")
        .join(
            vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")),
            "id_a",
        )
        .hint("shuffle_hash")
        .join(
            vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")),
            "id_b",
        )
    )
    # Verify in ONE Python crossing that also applies the threshold.
    # The obvious `select(cosine_udf).where(cosine >= t)` plans TWO
    # ArrowEvalPython nodes (Catalyst pushes the filter below the project
    # and re-evaluates the UDF), shipping every candidate's vectors into
    # Python twice; mapInPandas computes once and returns only survivors.
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_type = next(f for f in df.schema.fields if f.name == id_col).dataType
    out_schema = StructType(
        [
            StructField("id_a", id_type, True),
            StructField("id_b", id_type, True),
            StructField("cosine", DoubleType(), True),
        ]
    )

    def verify(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.stack(pdf["_va"].to_numpy()).astype(np.float64)
            B = np.stack(pdf["_vb"].to_numpy()).astype(np.float64)
            num = np.einsum("ij,ij->i", A, B)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            cos = num / np.maximum(den, 1e-30)
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cosine": cos[keep],
                }
            )

    return paired.mapInPandas(verify, out_schema)


def cosine_topk_gemm(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine per query — the throughput path.

    The (small) query set is collected once, L2-normalized, and shipped in
    the UDF closure; each Arrow batch of candidates becomes one BLAS matrix
    multiply (B x D @ D x Q), and only each batch's local top-k per query
    (ordered by -cosine, then id — the global tie-break) crosses the wire,
    so the shuffle carries at most partitions*k*Q rows regardless of N.
    A final window re-ranks the survivors exactly."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    qpdf = queries.select(query_id_col, vec_col).toPandas()
    if qpdf.empty:
        raise ValueError("cosine_topk_gemm: query set is empty")
    qids = qpdf[query_id_col].to_numpy()
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    # Clamp norms so zero vectors score 0.0 instead of NaN (NaN would rank
    # inconsistently between numpy's local top-k and Spark's final window).
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)

    in_fields = {f.name: f for f in candidates.schema.fields}
    q_fields = {f.name: f for f in queries.schema.fields}
    schema = StructType(
        [
            q_fields[query_id_col],
            in_fields[id_col],
            StructField("cosine", DoubleType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
            sims = Cn @ Qn.T  # (B, Q)
            kk = min(k, sims.shape[0])
            out_q, out_id, out_c = [], [], []
            order_ids = np.argsort(ids, kind="stable")
            for qi in range(sims.shape[1]):
                col = sims[:, qi]
                # top-kk by (-cosine, id): sort ids first (stable), then by
                # -cosine — lexicographic without building tuples
                top = order_ids[np.argsort(-col[order_ids], kind="stable")[:kk]]
                out_q.extend([qids[qi]] * len(top))
                out_id.extend(ids[top])
                out_c.extend(col[top])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_id, "cosine": out_c}
            )

    scored = candidates.select(id_col, vec_col).mapInPandas(run, schema)
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------
def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 64,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Spherical Lloyd's k-means on a deterministic sample (ordered by id),
    run driver-side: the quantizer is tiny and training it distributedly
    buys nothing — the CLUSTER-side work is assignment and search. Vectors
    and centroids are L2-normalized so nearest-centroid = max dot product =
    max cosine. Returns the (n_centroids x dim) centroid matrix."""
    pdf = df.orderBy(id_col).limit(sample_size).select(vec_col).toPandas()
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    rng = np.random.RandomState(seed)
    k = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / max(float(np.linalg.norm(c)), 1e-30)
    return C


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """(id, centroid_id): one GEMM per Arrow batch against the broadcast
    centroid matrix — the build side of the inverted file. At scale this is
    a single narrow map stage; persist/bucket the result by centroid_id to
    make probe reads partition-pruned."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = StructType(
        [id_field, StructField("centroid_id", IntegerType(), False)]
    )
    Ct = centroids.T.copy()

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "centroid_id": np.argmax(V @ Ct, axis=1).astype(np.int32),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(run, schema)


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 7,
    centroids: np.ndarray | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """IVF approximate top-k by cosine per query.

    Shape: train a tiny spherical k-means quantizer (driver), assign every
    candidate to its nearest centroid (one GEMM map stage), pick each
    query's ``nprobe`` closest centroids (driver, queries are small), and
    score ONLY candidates in the probed lists — a broadcast join on
    centroid_id prunes the corpus to ~nprobe/n_centroids of its rows before
    any distance math. ``nprobe == n_centroids`` searches every list and is
    EXACT (the oracle configuration); recall tunes with nprobe.
    ``round_digits`` ranks on the rounded cosine (+ id tiebreak) for
    cross-engine-deterministic output."""
    if centroids is None:
        centroids = kmeans_centroids(
            candidates, id_col, vec_col, n_centroids, sample_size, iters, seed
        )
    assign = ivf_assign(candidates, id_col, vec_col, centroids)

    qpdf = queries.select(query_id_col, vec_col).toPandas()
    if qpdf.empty:
        raise ValueError("ivf_topk: query set is empty")
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    sims = Qn @ centroids.T
    nprobe = min(nprobe, centroids.shape[0])
    probe_rows = [
        (qid, int(cid))
        for qid, row in zip(qpdf[query_id_col], sims)
        for cid in np.argsort(-row)[:nprobe]
    ]
    spark = candidates.sparkSession
    probes = spark.createDataFrame(
        pd.DataFrame(probe_rows, columns=[query_id_col, "centroid_id"])
    )

    cand = assign.join(F.broadcast(probes), "centroid_id").select(
        query_id_col, id_col
    )
    vecs = candidates.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    qvecs = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    )
    # shuffle_hash on the skinny (query_id, id) probe side: sort-merge
    # would sort the wide vector rows (see lsh_ann_pairs).
    scored = (
        cand.hint("shuffle_hash")
        .join(vecs, id_col)
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            query_id_col,
            id_col,
            _cosine_pairs_udf(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    if round_digits is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_digits))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivf_index_write(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 7,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Build and persist the inverted file: one pass assigns every vector
    to its nearest centroid (per-batch GEMM, vectors carried through — no
    join) and writes ``<path>/vectors`` PARTITIONED BY ``centroid_id``,
    plus the centroid matrix at ``<path>/centroids``. At 100 TB this is
    the ANN SERVING layout: a query that probes ``nprobe`` lists reads
    only those directory partitions — the scan's PartitionFilters prune
    the other ``n_centroids - nprobe`` lists before any IO (plan-asserted
    in tests). Returns the centroid matrix."""
    if centroids is None:
        centroids = kmeans_centroids(
            df, id_col, vec_col, n_centroids, sample_size, iters, seed
        )
    from pyspark.sql.types import IntegerType, StructField, StructType

    by_name = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [
            by_name[id_col],
            by_name[vec_col],
            StructField("centroid_id", IntegerType(), False),
        ]
    )
    Ct = centroids.T.copy()

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            out = pdf[[id_col, vec_col]].copy()
            out["centroid_id"] = np.argmax(Vn @ Ct, axis=1).astype(np.int32)
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
    return centroids


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nprobe: int = 8,
    round_digits: int | None = None,
) -> DataFrame:
    """IVF top-k served from a persisted :func:`ivf_index_write` index.

    Same math as :func:`ivf_topk`, different IO shape: the corpus scan is
    restricted to the union of every query's probed lists via an
    ``isin`` on the PARTITION column, so Spark prunes the un-probed list
    directories at planning time — with nprobe/n_centroids = 1/8, seven
    eighths of the index bytes are never read. The pruned rows already
    carry their vectors (the index stores them), so no join back to the
    corpus is needed — one broadcast probe join and the verify UDF."""
    cpdf = (
        spark.read.parquet(f"{path}/centroids")
        .toPandas()
        .sort_values("centroid_id")
    )
    centroids = np.stack(cpdf["centroid"].to_numpy()).astype(np.float64)

    qpdf = queries.select(query_id_col, vec_col).toPandas()
    if qpdf.empty:
        raise ValueError("ivf_topk_indexed: query set is empty")
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    sims = Qn @ centroids.T
    nprobe = min(nprobe, centroids.shape[0])
    probe_rows = [
        (qid, int(cid))
        for qid, row in zip(qpdf[query_id_col], sims)
        for cid in np.argsort(-row)[:nprobe]
    ]
    probes = spark.createDataFrame(
        pd.DataFrame(probe_rows, columns=[query_id_col, "centroid_id"])
    )
    probed = sorted({cid for _, cid in probe_rows})

    corpus = spark.read.parquet(f"{path}/vectors").where(
        F.col("centroid_id").isin(probed)
    )
    qvecs = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    scored = (
        corpus.join(F.broadcast(probes), "centroid_id")
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            query_id_col,
            id_col,
            _cosine_pairs_udf(F.col("_qv"), F.col(vec_col)).alias("cosine"),
        )
    )
    if round_digits is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_digits))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
