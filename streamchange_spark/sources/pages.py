"""Deterministic Common-Crawl-style pages table generator.

Input shape per BASELINE.json ``input_hint``:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.

Design (FIXTURES.md §1):
- one generator seed + the url id fully determine every row — the table is
  reproducible under any partitioning, so the sha256(text) manifest is a
  stable per-row invariant across pipeline runs;
- crawl frequency across urls is Zipf-like (rank-based), exercising the skew
  path; crawl times sit on an hourly grid with deterministic jitter and
  deliberate gaps (gap-fill tests);
- text length follows per-url segmented-Gaussian regimes (the same RNG
  recipe as the reference's ``simulate``, data/simulate.py:5-18, applied per
  url with a derived seed) so detectors find planted change points.

Generation is distributed: ``spark.range(n_urls)`` fans url ids across
executors and ``mapInPandas`` emits each url's crawl history — no driver-side
materialization, scales linearly with cluster size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

_LANGS = ("en", "no", "de", "fr")
_EPOCH_START = 1704067200  # 2024-01-01T00:00:00Z
_FILLER = (
    "the quick brown fox jumps over the lazy dog while the crawler records "
    "every page revision it can reach across the open web "
)


def _url_seed(generator_seed: int, url_id: int) -> int:
    digest = hashlib.sha256(f"{generator_seed}:{url_id}".encode()).digest()
    return int.from_bytes(digest[:4], "big")


def _snapshots_for_rank(rank: int, n_urls: int, mean_snapshots: int) -> int:
    """Zipf-like crawl frequency: rank 0 is crawled ~20x the median url."""
    boost = 20.0 / (1.0 + 19.0 * rank / max(n_urls - 1, 1))
    return max(8, int(mean_snapshots * boost))


def generate_url_history(
    url_id: int, n_urls: int, mean_snapshots: int, generator_seed: int
) -> pd.DataFrame:
    """All rows of one url — pure function of (seed, url_id, params)."""
    seed = _url_seed(generator_seed, url_id)
    rng = np.random.RandomState(seed)
    n = _snapshots_for_rank(url_id, n_urls, mean_snapshots)

    # Crawl times: 15-min grid with jitter (~2.4 snapshots per hour bucket,
    # so the 1h rollup genuinely aggregates map-side), ~20% multi-hour gaps
    # for the gap-fill path.
    steps = rng.choice([900, 900, 900, 900, 900, 900, 900, 900, 7200, 10800], n)
    jitter = rng.randint(0, 60, n)
    ts = _EPOCH_START + (url_id % 24) * 3600 + np.cumsum(steps) + jitter

    # Text-length regimes: segmented Gaussian, one or two planted changes.
    n_segments = 1 + (seed % 3 > 0) + (seed % 5 == 0)
    bounds = np.linspace(0, n, n_segments + 1, dtype=int)
    means = 400.0 + 250.0 * rng.permutation(n_segments)
    lengths = np.concatenate(
        [
            rng.normal(means[i], 20.0, bounds[i + 1] - bounds[i])
            for i in range(n_segments)
        ]
    )
    lengths = np.clip(lengths, 64, 4000).astype(int)

    url = f"https://site{url_id % max(n_urls // 16, 1)}.example/p{url_id}"
    lang = _LANGS[seed % len(_LANGS)]
    filler = (_FILLER * 40)
    texts = [
        f"url={url} rev={k} lang={lang} " + filler[: int(lengths[k])]
        for k in range(n)
    ]
    htmls = [("<html><body>" + t + "</body></html>").encode() for t in texts]
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": pd.to_datetime(ts, unit="s"),
            "html": htmls,
            "text": texts,
            "lang": lang,
        }
    )


def generate_pages(
    spark: SparkSession,
    n_urls: int = 100,
    mean_snapshots: int = 50,
    generator_seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed pages table; ~n_urls * mean_snapshots * 1.6 rows."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def emit(batches):
        for pdf in batches:
            for url_id in pdf["id"].tolist():
                yield generate_url_history(
                    int(url_id), n_urls, mean_snapshots, generator_seed
                )

    ids = spark.range(0, n_urls, 1, num_partitions)
    return ids.mapInPandas(emit, PAGES_SCHEMA)


def text_manifest(pages: DataFrame) -> DataFrame:
    """Per-row invariant manifest: sha256(text) keyed by (url, warc_ts).
    Computed JVM-side (no UDF); any stage that claims to preserve ``text``
    byte-identically must reproduce these hashes exactly."""
    return pages.select(
        "url",
        "warc_ts",
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
    )
