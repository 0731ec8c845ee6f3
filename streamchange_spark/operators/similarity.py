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


def signature_col(vec_col: str, planes: np.ndarray) -> Column:
    """H-bit sign signature of a vector column vs fixed hyperplanes; each dot
    product is a ``zip_with``/``aggregate`` fold over literal arrays."""
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        lits = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lits, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(0)
        )
    return sig


def lsh_ann_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bucket_bits: int = 8,
    n_bands: int = 2,
    threshold: float = 0.8,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs above threshold, candidates limited to
    signature-bucket collisions (banded prefixes of the sign signature)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    sig = df.select(
        F.col(id_col), F.col(vec_col), signature_col(vec_col, planes).alias("_sig")
    )
    assert n_planes >= bucket_bits * n_bands
    bucketed = None
    for band in range(n_bands):
        part = sig.select(
            id_col,
            vec_col,
            F.lit(band).alias("_band"),
            F.shiftright(F.col("_sig"), band * bucket_bits)
            .bitwiseAND(F.lit((1 << bucket_bits) - 1))
            .alias("_bucket"),
        )
        bucketed = part if bucketed is None else bucketed.unionAll(part)
    l, r = bucketed.alias("l"), bucketed.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bucket") == F.col("r._bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine_col(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("cosine"),
        )
        .distinct()
    )
    return cand.where(F.col("cosine") >= threshold)


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
