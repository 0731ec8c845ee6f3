"""Dedup / text-analysis / similarity operators on the driver's documents and
embeddings tables, cross-checked against pandas/NumPy recomputations."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from streamchange_spark.operators import (
    cosine_topk,
    embedding_neardup_pairs,
    exact_dedup,
    extract_binary_meta,
    decode_image_features,
    lang_id,
    lsh_ann_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_features,
    sample_video_frames,
    simhash_cluster_edges,
    simhash_pairs,
)
from streamchange_spark.operators.textstats import fingerprint

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, "doc_id", "text").toPandas()
    pdf = docs.select("doc_id", "text").toPandas()
    by_md5 = pdf.groupby(pdf["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()))
    expected = by_md5["doc_id"].min().sort_values()
    assert sorted(out["keep_id"]) == sorted(expected)
    assert out["dup_count"].sum() == len(pdf)


def test_minhash_jaccard_behaviour(spark):
    # Near-identical docs must collide; unrelated docs must not.
    base = "the quick brown fox jumps over the lazy dog " * 10
    rows = [
        (0, base),
        (1, base + "extra tail words here"),
        (2, "completely different content about spark engines and parquet files " * 8),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=4).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_local_shingler_matches_window_shingler(spark, docs):
    """The shuffle-free mapInPandas shingler and the explode+window plan
    must emit identical (id, shingle) multisets — incl. null/short texts
    and whitespace runs."""
    from streamchange_spark.operators.dedup import shingle_rows, shingle_rows_local

    extra = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [9001, 9002, 9003, 9004],
                "text": [None, "  one  two\tthree\nfour ", "a b", ""],
            }
        )
    )
    df = docs.select(F.col("doc_id").cast("long"), "text").unionAll(extra)
    a = shingle_rows(df, "doc_id", "text", 3).groupBy("doc_id", "shingle").count()
    b = shingle_rows_local(df, "doc_id", "text", 3).groupBy("doc_id", "shingle").count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_minhash_signature_is_min_over_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    sig = minhash_signatures(df, "doc_id", "text", num_hashes=2, shingle_size=2).toPandas()
    shingles = ["a b", "b c", "c d", "d e"]

    def h(s, i):
        return int(hashlib.md5(f"{s}#{i}".encode()).hexdigest()[:15], 16)

    for i in range(2):
        assert sig[f"mh_{i}"][0] == min(h(s, i) for s in shingles)


def test_simhash_pairs(spark):
    base = "tokens shared across both documents in large numbers " * 20
    rows = [(0, base), (1, base + " tiny difference"), (2, "unrelated words entirely " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_pairs(df, "doc_id", "text", max_hamming=8).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 1) in got
    assert (0, 2) not in got


def test_simhash_pairs_mega_bucket_cap(spark):
    # Template-heavy corpus: 40 near-identical pages collide on every 16-bit
    # block -> uncapped candidate generation is quadratic (m*(m-1)/2 per
    # block). The cap bounds pair counts; star edges stay linear with NO cap.
    base = "identical boilerplate template page body " * 30
    rows = [(i, base + f" v{i % 2}") for i in range(40)] + [
        (100, "entirely different content words " * 25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = simhash_pairs(df, "doc_id", "text", max_hamming=64).toPandas()
    assert len(uncapped) == 40 * 39 // 2  # full clique survives verify

    capped = simhash_pairs(
        df, "doc_id", "text", max_hamming=64, max_bucket_size=10
    ).toPandas()
    # every block bucket holding the 40 template docs exceeds the cap and is
    # dropped wholesale -> pair count bounded (here: zero template pairs)
    assert len(capped) <= 10 * 9 // 2 * 4
    # emitted pairs (if any) are a subset of the exact result: recall loss
    # only, never wrong pairs
    got_capped = set(map(tuple, capped[["id_a", "id_b"]].values))
    got_full = set(map(tuple, uncapped[["id_a", "id_b"]].values))
    assert got_capped <= got_full

    from streamchange_spark.operators import simhash_cluster_edges

    edges = simhash_cluster_edges(df, "doc_id", "text").toPandas()
    # star edges: linear in bucket size — at most (m-1) per bucket value,
    # <= 4*(n-1) total before distinct; and the clique stays connected
    assert len(edges) <= 4 * 40


def _uf_components(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    return {i: find(i) for i in n_ids}


def test_simhash_cluster_edges_same_components_as_pairs(spark):
    """max_hamming=None (verification off) reproduces the CANDIDATE graph's
    components — equal to simhash_pairs only with ITS verification disabled
    too (max_hamming=64). The verified default is exercised separately in
    test_simhash_star_edges_verification."""
    base = "identical boilerplate template page body " * 30
    rows = [(i, base) for i in range(20)] + [
        (100, "entirely different content words " * 25),
        (101, "another unrelated page talking about something else " * 20),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ids = [r[0] for r in rows]
    pair_edges = set(
        map(tuple, simhash_pairs(df, "doc_id", "text", max_hamming=64)
            .toPandas()[["id_a", "id_b"]].values)
    )
    star_edges = set(
        map(tuple, simhash_cluster_edges(df, "doc_id", "text", max_hamming=None)
            .toPandas()[["id_a", "id_b"]].values)
    )
    assert len(star_edges) < len(pair_edges)  # m-1 vs m(m-1)/2
    comp_pairs = _uf_components(ids, pair_edges)
    comp_star = _uf_components(ids, star_edges)
    # identical partition of ids into components
    from collections import defaultdict

    def groups(comp):
        g = defaultdict(set)
        for k, v in comp.items():
            g[v].add(k)
        return {frozenset(s) for s in g.values()}

    assert groups(comp_pairs) == groups(comp_star)


def test_simhash_star_edges_verification(spark):
    """The default hub-hamming verification kills random single-block
    collisions (the web-scale giant-cluster failure mode) while keeping
    genuinely-near members: crafted signatures where doc 3 shares block 0
    with the hub but differs in 48 bits."""
    from streamchange_spark.operators.dedup import _simhash_star_edges

    rows = [
        (1, 0),                      # hub
        (2, 1),                      # hamming 1 from hub, shares blocks 1-3
        (3, -(1 << 16)),             # upper 48 bits set: shares ONLY block 0
    ]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    verified = set(
        map(tuple, _simhash_star_edges(sig, "doc_id", max_hamming=8)
            .toPandas()[["id_a", "id_b"]].values)
    )
    assert verified == {(1, 2)}  # the block-collision edge (1,3) is rejected
    unverified = set(
        map(tuple, _simhash_star_edges(sig, "doc_id", max_hamming=None)
            .toPandas()[["id_a", "id_b"]].values)
    )
    assert unverified == {(1, 2), (1, 3)}


def test_ngram_jaccard_matches_numpy(spark, docs):
    sample = docs.limit(40)
    got = ngram_jaccard_pairs(sample, "doc_id", "text", n=3, threshold=0.2).toPandas()
    pdf = sample.select("doc_id", "text").toPandas()

    def shingle_set(t):
        toks = [w for w in t.lower().split() if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {r.doc_id: shingle_set(r.text) for r in pdf.itertuples()}
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / len(sets[a] | sets[b])
                if j >= 0.2:
                    expected[(a, b)] = j
    got_map = {(r.id_a, r.id_b): r.jaccard for r in got.itertuples()}
    assert set(got_map) == set(expected)
    for k in expected:
        assert got_map[k] == pytest.approx(expected[k], rel=1e-12)


def test_embedding_neardup_and_topk(spark, embs):
    pdf = embs.toPandas()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    # top-k vs numpy for 3 query vectors
    qids = sorted(vecs)[:3]
    queries = embs.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(embs, queries, k=5).toPandas()
    for q in qids:
        scored = sorted(
            ((cos(vecs[q], v), -i) for i, v in vecs.items()), reverse=True
        )
        expected_ids = [-s[1] for s in scored[:5]]
        actual = got[got.query_id == q].sort_values("rank")["vec_id"].tolist()
        assert actual == expected_ids, q


def test_lsh_ann_recall(spark, embs):
    exact = embedding_neardup_pairs(embs.limit(120), "vec_id", "embedding", 0.9).toPandas()
    approx = lsh_ann_pairs(
        embs.limit(120), "vec_id", "embedding", n_planes=16, bucket_bits=6,
        n_bands=2, threshold=0.9,
    ).toPandas()
    exact_pairs = set(map(tuple, exact[["id_a", "id_b"]].values))
    approx_pairs = set(map(tuple, approx[["id_a", "id_b"]].values))
    assert approx_pairs <= exact_pairs  # no false positives (verified cosine)
    if exact_pairs:
        recall = len(approx_pairs) / len(exact_pairs)
        assert recall >= 0.5, recall


def test_lsh_band_keys_deterministic_and_recall_at_k(spark, embs):
    """Scale-default banding (64 planes, 16-bit keys, 4 bands): band keys
    must be deterministic across runs, and the LSH candidate set must
    recover a healthy fraction of the exact top-k neighbourhood pairs
    produced by the cosine_topk_gemm oracle."""
    from streamchange_spark.operators import cosine_topk_gemm
    from streamchange_spark.operators.similarity import (
        hyperplane_band_keys,
        lsh_ann_pairs,
    )

    k1 = hyperplane_band_keys(embs, "vec_id", "embedding", 64, 16, 4, seed=7)
    k2 = hyperplane_band_keys(embs, "vec_id", "embedding", 64, 16, 4, seed=7)
    assert k1.exceptAll(k2).count() == 0

    # exact top-3 per query over the whole table (excluding self-pairs)
    queries = embs.select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).limit(30)
    topk = cosine_topk_gemm(embs, queries, k=4).where(
        F.col("query_id") != F.col("vec_id")
    )
    gt = topk.where(F.col("cosine") >= 0.5).toPandas()
    truth = {
        (min(a, b), max(a, b))
        for a, b in zip(gt["query_id"], gt["vec_id"])
    }
    got = lsh_ann_pairs(
        embs, "vec_id", "embedding", n_planes=64, bucket_bits=8, n_bands=8,
        threshold=0.5,
    ).toPandas()
    found = {(min(a, b), max(a, b)) for a, b in zip(got["id_a"], got["id_b"])}
    if truth:
        recall = len(truth & found) / len(truth)
        assert recall >= 0.5, (recall, len(truth))


def test_lang_id_and_quality(spark):
    rows = [
        (0, "the cat and the dog sat in the garden and it is warm"),
        (1, "der hund und die katze das ist nicht ein problem zu haben"),
        (2, "le chat et la maison les fleurs des jardins est une merveille"),
        (3, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lang_id(df, "doc_id", "text").toPandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[1, "lang_pred"] == "de"
    assert out.loc[2, "lang_pred"] == "fr"
    assert out.loc[3, "lang_pred"] == "und"

    q = quality_features(df, "doc_id", "text").toPandas().set_index("doc_id")
    assert (q["quality_score"] >= 0).all() and (q["quality_score"] <= 1).all()
    assert q.loc[0, "quality_score"] > q.loc[3, "quality_score"]


def test_fingerprint_matches_python(spark, docs):
    sample = docs.limit(20)
    got = fingerprint(sample, "doc_id", "text").toPandas().set_index("doc_id")
    for r in sample.select("doc_id", "text").toPandas().itertuples():
        h = 0
        for ch in r.text:
            h = (h * 31 + ord(ch)) % 2147483647
        assert got.loc[r.doc_id, "fp"] == h


def test_multimodal_meta_and_stubs(spark):
    rows = [
        (0, bytearray(b"\x89PNG\r\n" + b"x" * 100)),
        (1, bytearray(b"\xff\xd8\xff\xe0" + b"y" * 50)),
        (2, bytearray(b"RIFFxxxx" + b"z" * 64)),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    meta = extract_binary_meta(df, "id", "payload").toPandas().set_index("id")
    assert meta.loc[0, "mime"] == "image/png"
    assert meta.loc[1, "mime"] == "image/jpeg"
    assert meta.loc[2, "mime"] == "audio/wav"
    assert meta.loc[0, "n_bytes"] == 106
    assert meta.loc[0, "sha256"] == hashlib.sha256(bytes(rows[0][1])).hexdigest()

    feats = decode_image_features(df, "id", "payload", feature_dim=4).toPandas()
    assert len(feats) == 3
    assert all(len(f) == 4 for f in feats["features"])
    # Deterministic: same payload -> same features.
    feats2 = decode_image_features(df, "id", "payload", feature_dim=4).toPandas()
    a = [list(map(float, f)) for f in feats.sort_values("id")["features"]]
    b = [list(map(float, f)) for f in feats2.sort_values("id")["features"]]
    assert a == b

    frames = sample_video_frames(df, "id", "payload", n_frames=3).toPandas()
    assert len(frames) == 9
    assert set(frames["frame_idx"]) == {0, 1, 2}

    # target_size=None -> native (mixed) sizes: the per-row fallback must
    # report per-image width/height instead of crashing on np.stack
    mixed = (
        decode_image_features(df, "id", "payload", target_size=None, feature_dim=4)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(mixed) == 3
    assert all(len(f) == 4 for f in mixed["features"])
    assert mixed[["width", "height"]].drop_duplicates().shape[0] > 1
    mixed2 = (
        decode_image_features(df, "id", "payload", target_size=None, feature_dim=4)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert [list(map(float, f)) for f in mixed["features"]] == [
        list(map(float, f)) for f in mixed2["features"]
    ]


def test_cosine_topk_gemm_matches_fold(spark):
    """GEMM top-k == zip_with-fold top-k (same ids and ranks) on random
    embeddings; both exact, so only float ULP noise could differ — random
    normal vectors have no near-ties at rank boundaries."""
    import numpy as np
    import pandas as pd
    from streamchange_spark.operators import cosine_topk
    from streamchange_spark.operators.similarity import cosine_topk_gemm

    rng = np.random.default_rng(5)
    n, d = 300, 16
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": list(rng.normal(0, 1, (n, d)))}
    )
    cands = spark.createDataFrame(pdf).repartition(6)
    queries = spark.createDataFrame(pdf.iloc[:4]).selectExpr(
        "vec_id as query_id", "embedding"
    )
    a = (
        cosine_topk(cands, queries, k=7)
        .select("query_id", "vec_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        cosine_topk_gemm(cands, queries, k=7)
        .select("query_id", "vec_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_ngram_jaccard_doc_freq_cap(spark, docs):
    """max_doc_freq drops high-frequency shingles from the inverted index:
    the capped pair set is a subset with jaccard <= the uncapped value."""
    full = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).toPandas()
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, max_doc_freq=2
    ).toPandas()
    full_map = {(a, b): j for a, b, j in full.itertuples(index=False)}
    for a, b, j in capped.itertuples(index=False):
        assert (a, b) in full_map
        assert j <= full_map[(a, b)] + 1e-12


def test_ivf_topk_exact_when_all_probes_and_recall_when_pruned(spark, embs):
    """nprobe == n_centroids must reproduce the exact top-k (every inverted
    list searched); pruned probes trade recall and must stay a subset of
    the candidate scoring (no invented neighbours)."""
    from streamchange_spark.operators import cosine_topk_gemm, ivf_topk

    queries = embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk_gemm(embs, queries, k=3).toPandas()
    full = ivf_topk(
        embs, queries, k=3, n_centroids=8, nprobe=8
    ).toPandas()
    key = ["query_id", "rank"]
    e = exact.sort_values(key).reset_index(drop=True)
    f = full.sort_values(key).reset_index(drop=True)
    assert list(e["vec_id"]) == list(f["vec_id"])
    assert np.allclose(e["cosine"], f["cosine"], rtol=0, atol=1e-12)

    pruned = ivf_topk(embs, queries, k=3, n_centroids=8, nprobe=2).toPandas()
    exact_pairs = set(zip(e["query_id"], e["vec_id"]))
    pruned_pairs = set(zip(pruned["query_id"], pruned["vec_id"]))
    recall = len(exact_pairs & pruned_pairs) / len(exact_pairs)
    assert recall >= 0.4, recall


def test_connected_components_and_keep_ids(spark):
    """Min-label propagation == union-find on a graph with a chain, a
    triangle, and singletons; keep-ids = everything minus non-representative
    cluster members."""
    from streamchange_spark.operators import connected_components, dedup_keep_ids

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    comp = connected_components(pairs).toPandas().set_index("id")["component"]
    assert comp.to_dict() == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
    }
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]], "doc_id long")
    kept = sorted(dedup_keep_ids(docs, pairs, "doc_id").toPandas()["id"])
    assert kept == [1, 10, 20, 99]


def test_audio_features_plumbing(spark, docs):
    """Audio feature extraction: real Spark plumbing (schema, batching,
    pooled-RMS math), deterministic stubbed decode; allow_stub=False raises."""
    from streamchange_spark.operators import extract_audio_features

    payloads = docs.limit(20).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    out = extract_audio_features(payloads, "doc_id", "payload", feature_dim=4).toPandas()
    assert len(out) == 20
    assert (out["sample_rate"] == 16000).all()
    assert (out["duration_s"] > 0).all()
    assert out["features"].map(len).eq(4).all()
    # deterministic: same payload -> same features
    out2 = extract_audio_features(payloads, "doc_id", "payload", feature_dim=4).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert all(np.allclose(x, y) for x, y in zip(a["features"], b["features"]))

    strict = extract_audio_features(payloads, "doc_id", "payload", allow_stub=False)
    with pytest.raises(Exception):
        strict.collect()


def test_clean_corpus_verdicts(spark):
    """End-to-end corpus cleaning: every drop_reason reachable, keep rows =
    survivors of lang -> quality -> exact-dedup -> near-dup in that order."""
    from streamchange_spark.operators import clean_corpus

    base = "the cat and the dog sat in the warm garden near the house " * 8
    rows = [
        (0, base),                                # keep (representative)
        (1, base),                                # exact_dup of 0
        (2, base + "with one extra tail"),        # near_dup of 0
        (3, "der hund und die katze sind nicht hier aber das haus ist da " * 8),  # lang
        (4, "a b"),                               # too short -> quality or lang
        (5, "completely different english words about the spark engine and the parquet files in the cluster " * 6),  # keep
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(
        df, min_quality=0.2, keep_langs=("en",)
    ).toPandas().set_index("doc_id")
    assert bool(out.loc[0, "keep"]) and bool(out.loc[5, "keep"])
    assert out.loc[1, "drop_reason"] == "exact_dup"
    assert out.loc[2, "drop_reason"] == "near_dup"
    assert out.loc[3, "drop_reason"] == "lang"
    assert out.loc[4, "drop_reason"] in ("lang", "quality")
    assert len(out) == len(rows)  # one verdict per input row


def test_connected_components_distributed_path_matches_driver_path(spark):
    """driver_threshold=0 forces the distributed min-label loop; it must
    produce the same labelling as the union-find fast path — including a
    chain (worst diameter) crossing micro-cluster boundaries."""
    from streamchange_spark.operators import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)] + [(20, 22), (21, 22)],
        "id_a long, id_b long",
    )
    fast = connected_components(pairs).toPandas().set_index("id")["component"]
    dist = connected_components(pairs, driver_threshold=0).toPandas().set_index("id")[
        "component"
    ]
    assert fast.sort_index().to_dict() == dist.sort_index().to_dict()
    assert set(fast.values) == {1, 20}
    assert fast.loc[4] == 1  # chain fully contracted


def test_connected_components_distributed_raises_on_nonconvergence(spark):
    """A chain whose diameter exceeds max_iters must fail loudly (a silent
    return would split one component into several wrong ones)."""
    from streamchange_spark.operators import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, driver_threshold=0, max_iters=2)
    ok = (
        connected_components(chain, driver_threshold=0, max_iters=15)
        .toPandas()
    )
    assert set(ok["component"]) == {0}


def test_connected_components_pointer_jumping_is_logarithmic(spark):
    """A 300-node path (diameter 299) must converge in ~log2(299)+slack
    rounds, not 299 — the pointer-jumping step doubles label reach per
    round, so 12 iterations suffice where one-hop propagation needs 299."""
    from streamchange_spark.operators import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "id_a long, id_b long"
    )
    out = (
        connected_components(chain, driver_threshold=0, max_iters=12)
        .toPandas()
    )
    assert len(out) == 300
    assert set(out["component"]) == {0}


def test_ngram_jaccard_default_cap_bounds_boilerplate(spark):
    """The DEFAULT max_doc_freq suppresses corpus-wide boilerplate shingles:
    300 pages sharing heavy boilerplate produce no O(n^2) pair explosion,
    while a true near-dup pair (df=2 shingles, under the cap) still pairs."""
    boiler = "all rights reserved terms of service privacy policy contact us about " * 4
    rows = [
        (i, boiler + f"unique page body number {i} token{i * 7} token{i * 13}")
        for i in range(300)
    ]
    dup = "identical real article content about spark partitioning strategy " * 4
    rows += [(1000, dup), (1001, dup + "trailing byline")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.2).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (1000, 1001) in got
    # boilerplate shingles have df=300 > default cap (256) -> dropped before
    # the self-join; the 300*299/2 boilerplate-only pairs must not appear
    assert all(a >= 1000 for a, _ in got)


def test_token_topk_counts_and_plan(spark):
    from streamchange_spark.operators.textstats import token_topk

    docs = [
        (1, "en", "the cat the dog THE bird"),
        (2, "en", "a cat a cat"),
        (3, "no", "og og og det"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    rows = token_topk(df, "text", k=2, by_col="lang").collect()
    got = {(r.lang, r.token): (r.n, r.rank) for r in rows}
    # en: 'the' x3 (case-folded) and 'cat' x3 (1+2) tie; 'cat' wins lexically
    assert got[("en", "cat")] == (3, 1)
    assert got[("en", "the")] == (3, 2)
    assert ("en", "a") not in got
    assert got[("no", "og")] == (3, 1) and got[("no", "det")] == (1, 2)
    en_rows = {r.token: r for r in rows if r.lang == "en"}
    assert abs(en_rows["the"].frac - 3 / 10) < 1e-12
    # global mode (no by_col): one partition, still a bounded top-k
    all_rows = token_topk(df, "text", k=1).collect()
    assert len(all_rows) == 1 and all_rows[0].token == "cat"  # 3-way tie, lexical
    # plan: partial count before the shuffle + WindowGroupLimit top-K
    plan = (
        token_topk(df, "text", k=2, by_col="lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_tfidf_topk_matches_sklearn_style_recomputation(spark):
    import math

    from streamchange_spark.operators import tfidf_topk

    docs = [
        (1, "spark spark engine rollup"),
        (2, "spark parquet parquet parquet"),
        (3, "rollup tier tier"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = tfidf_topk(df, "doc_id", "text", k=2).collect()
    got = {(r.doc_id, r.token): (r.tf, r.df, r.score, r.rank) for r in rows}

    def idf(dfreq, n=3):
        return math.log((n + 1.0) / (dfreq + 1.0)) + 1.0

    # doc1: spark tf2 df2, engine tf1 df1, rollup tf1 df2
    assert got[(1, "spark")][0:2] == (2, 2)
    assert abs(got[(1, "spark")][2] - 2 * idf(2)) < 1e-12
    # engine (tf1, df1) outscores rollup (tf1, df2)
    assert got[(1, "engine")][3] < 3
    assert (1, "rollup") not in got  # rank 3 cut at k=2
    # doc2: parquet tf3 dominates
    assert got[(2, "parquet")][3] == 1
    # every doc contributes at most k rows
    from collections import Counter

    assert max(Counter(r.doc_id for r in rows).values()) <= 2


def test_url_features_matches_urllib(spark):
    from urllib.parse import urlparse

    from streamchange_spark.operators import url_features

    urls = [
        "https://News.Example.COM/a/b/c.html?q=1",
        "http://sub.domain.org/",
        "https://example.net",
        "not a url at all",
        None,
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    got = {r.i: r for r in url_features(df, "url").collect()}
    for i, u in enumerate(urls):
        if u is None or "://" not in u:
            # every derived column is NULL for unparseable rows — garbage
            # must not look like a root page (path_depth=0) or http
            assert got[i].domain is None and got[i].tld is None
            assert got[i].path_depth is None and got[i].is_https is None
            continue
        p = urlparse(u)
        assert got[i].domain == p.hostname, u
        assert got[i].tld == p.hostname.split(".")[-1]
        assert got[i].path_depth == len([s for s in p.path.split("/") if s])
        assert got[i].is_https == u.lower().startswith("https://")


def test_token_topk_keeps_null_group_and_single_explode(spark):
    from streamchange_spark.operators.textstats import token_topk

    docs = [(1, "en", "a a b"), (2, None, "x x y"), (3, None, "x z")]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    rows = token_topk(df, "text", k=1, by_col="lang").collect()
    got = {r.lang: (r.token, r.n, r.frac) for r in rows}
    # the NULL-lang group must survive the totals join
    assert got[None] == ("x", 3, 3 / 5)
    assert got["en"] == ("a", 2, 2 / 3)
    # a MATERIALIZED counts table feeds both consumers without recompute
    from streamchange_spark.operators.textstats import (
        token_counts,
        topk_from_token_counts,
    )

    counted = token_counts(df, "text", by_col="lang").persist()
    try:
        rows2 = topk_from_token_counts(counted, k=1, by_col="lang").collect()
        assert {(r.lang, r.token, r.n) for r in rows2} == {
            (r.lang, r.token, r.n) for r in rows
        }
    finally:
        counted.unpersist()


def test_chunk_documents_coverage_and_overlap(spark):
    from streamchange_spark.operators import chunk_documents

    text = " ".join(f"t{i}" for i in range(23))
    df = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=10, overlap=2).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 23 tokens, step 8: chunks at 0,8,16 -> ceil((23-2)/8)=3
    assert [r.n_tokens for r in by_doc[1]] == [10, 10, 7]
    # consecutive chunks share exactly `overlap` tokens
    c0, c1 = by_doc[1][0].chunk_text.split(), by_doc[1][1].chunk_text.split()
    assert c0[-2:] == c1[:2]
    # every token covered in order when overlap stripped
    recon = c0 + c1[2:] + by_doc[1][2].chunk_text.split()[2:]
    assert recon == [f"t{i}" for i in range(23)]
    # short doc -> one chunk; empty/null -> none
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 2
    assert 3 not in by_doc and 4 not in by_doc


def test_lang_id_wide_coverage(spark):
    """Languages the original 4-list/8-word heuristic could never label
    (es/pt/it/nl/sv/zh have no list there) are now identified, including
    unsegmented zh via CJK codepoint counting and diacritic evidence."""
    rows = [
        (0, "el perro y el gato se fueron a la casa de los vecinos por la tarde"),
        (1, "o cachorro e o gato foram para a casa dos vizinhos não é uma surpresa"),
        (2, "il cane e il gatto sono andati alla casa dei vicini non è una sorpresa"),
        (3, "de hond en de kat zijn naar het huis van de buren gegaan met een bal"),
        (4, "hunden och katten gick till grannarnas hus på kvällen är det inte sant"),
        (5, "狗和猫晚上去了邻居家这并不是一个令人惊讶的事情"),
        (6, "the dog and the cat went to the house of the neighbours in the evening"),
        (7, "hunden og katten gik hen til naboernes hus om aftenen er det ikke sandt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lang_id(df, "doc_id", "text").toPandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "es"
    assert out.loc[1, "lang_pred"] == "pt"
    assert out.loc[2, "lang_pred"] == "it"
    assert out.loc[3, "lang_pred"] == "nl"
    assert out.loc[4, "lang_pred"] == "sv"
    assert out.loc[5, "lang_pred"] == "zh"
    assert out.loc[5, "lang_hits"] > 0
    assert out.loc[6, "lang_pred"] == "en"
    assert out.loc[7, "lang_pred"] == "da"


def test_quality_score_frozen_under_lang_list_growth(spark):
    """quality_score uses the FROZEN 8-word list, not the widened lang-ID
    lists: a text hitting only the new en words ('was for with') scores the
    same stopword_ratio as one with no stopwords at all."""
    from streamchange_spark.operators import quality_features

    rows = [(0, "was for with his they have are this"),
            (1, "zebra quartz jumble vortex crispy plasma nimbus dune")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_features(df, "doc_id", "text").toPandas().set_index("doc_id")
    assert out.loc[0, "stopword_ratio"] == 0.0
    assert out.loc[1, "stopword_ratio"] == 0.0


def test_ivf_index_roundtrip_and_partition_pruning(spark, embs, tmp_path):
    """Persisted IVF index: ivf_topk_indexed == ivf_topk given the same
    centroids, and the serving scan reads ONLY the probed list partitions
    (PartitionFilters prune the rest before IO)."""
    from streamchange_spark.operators import (
        ivf_index_write,
        ivf_topk,
        ivf_topk_indexed,
    )

    path = str(tmp_path / "ivf_index")
    queries = embs.where(F.col("vec_id") < 4).withColumnRenamed(
        "vec_id", "query_id"
    )
    centroids = ivf_index_write(
        embs, path, "vec_id", "embedding", n_centroids=16, seed=7
    )
    served = ivf_topk_indexed(
        spark, path, queries, "vec_id", "embedding", "query_id",
        k=5, nprobe=4, round_digits=4,
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters", 1
    )[1][:300]
    direct = ivf_topk(
        embs, queries, "vec_id", "embedding", "query_id",
        k=5, nprobe=4, centroids=centroids, round_digits=4,
    )
    a = served.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = direct.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a[["query_id", "vec_id", "rank"]].equals(b[["query_id", "vec_id", "rank"]])
    assert np.allclose(a["cosine"], b["cosine"])
    # pruning is real: fewer list directories read than exist
    import os
    n_dirs = len([d for d in os.listdir(f"{path}/vectors") if d.startswith("centroid_id=")])
    assert n_dirs == 16


def test_pq_roundtrip_recall_and_rerank(spark, embs):
    """PQ codes are 8 bytes/vector; ADC top-10 holds high recall vs exact
    brute force on the fixture, and the exact re-rank tail restores the
    exact top-10 whenever ADC's top-(4k) contains it. Encoding is
    deterministic across runs."""
    from streamchange_spark.operators import (
        cosine_topk_gemm,
        pq_encode,
        pq_topk,
        pq_train,
    )

    books = pq_train(embs, "vec_id", "embedding", m=8, n_codes=256, seed=7)
    codes = pq_encode(embs, books, "vec_id", "embedding")
    again = pq_encode(embs, books, "vec_id", "embedding")
    a = codes.toPandas().set_index("vec_id")["pq_code"].map(bytes).sort_index()
    b = again.toPandas().set_index("vec_id")["pq_code"].map(bytes).sort_index()
    assert list(a) == list(b)
    assert a.map(len).eq(8).all()

    queries = embs.where(F.col("vec_id") < 8).withColumnRenamed("vec_id", "query_id")
    exact = (
        cosine_topk_gemm(embs, queries, "vec_id", "embedding", "query_id", k=10)
        .toPandas().groupby("query_id")["vec_id"].apply(set)
    )
    adc = (
        pq_topk(codes, queries, books, "vec_id", "embedding", "query_id", k=10)
        .toPandas().groupby("query_id")["vec_id"].apply(set)
    )
    recall = np.mean([len(exact[q] & adc[q]) / 10 for q in exact.index])
    assert recall >= 0.5, recall  # lossy 8-byte codes, 64-dim fixture

    rr = (
        pq_topk(codes, queries, books, "vec_id", "embedding", "query_id",
                k=10, rerank=embs, rerank_factor=8)
        .toPandas().groupby("query_id")["vec_id"].apply(set)
    )
    rr_recall = np.mean([len(exact[q] & rr[q]) / 10 for q in exact.index])
    assert rr_recall >= recall and rr_recall >= 0.8, (recall, rr_recall)


def test_ivf_pq_index_serving(spark, embs, tmp_path):
    """Composed IVF-PQ index: partition-pruned probe read + ADC + exact
    re-rank. With every list probed and the candidate set covering the
    corpus the answer equals exact brute force; with pruned probes it
    keeps recall and reads only probed partitions (PartitionFilters)."""
    from streamchange_spark.operators import (
        cosine_topk_gemm,
        ivf_pq_index_write,
        ivf_pq_topk,
    )

    path = str(tmp_path / "ivfpq")
    ivf_pq_index_write(embs, path, n_centroids=16, m=8, n_codes=256, seed=7)
    queries = embs.where(F.col("vec_id") < 4).withColumnRenamed("vec_id", "query_id")

    exact = (
        cosine_topk_gemm(embs, queries, "vec_id", "embedding", "query_id", k=5)
        .toPandas().groupby("query_id")["vec_id"].apply(set)
    )
    # all probes + corpus-covering rerank -> exact
    full = ivf_pq_topk(
        spark, path, queries, k=5, nprobe=16, rerank_factor=1000, round_digits=4
    ).toPandas().groupby("query_id")["vec_id"].apply(set)
    assert all(full[q] == exact[q] for q in exact.index)

    pruned = ivf_pq_topk(spark, path, queries, k=5, nprobe=4, rerank_factor=8)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    got = pruned.toPandas().groupby("query_id")["vec_id"].apply(set)
    recall = np.mean([len(exact[q] & got.get(q, set())) / 5 for q in exact.index])
    assert recall >= 0.5, recall


def test_normalize_text_matches_python_mirror(spark):
    """NFC + cleanup normalization agrees exactly with a unicodedata
    mirror on adversarial unicode (decomposed accents, ligatures,
    fullwidth digits, control bytes, whitespace runs), NULLs pass
    through, and the all-JVM path (nfc=False) plans no Python stage."""
    import unicodedata

    from streamchange_spark.operators import normalize_text

    texts = [
        "café du   monde",          # decomposed accent + ws run
        "ﬁle  with\tligature",        # fi ligature
        "１２３ fullwidth",    # fullwidth digits (NFC keeps)
        "ctrl\x00\x07bytes\x7fhere",       # control chars
        "  MiXeD Case NBSP  ",        # NBSP: not ASCII \s, preserved
        None,
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r.i: r.text_norm
        for r in normalize_text(
            df, nfc=True, lowercase=True, collapse_whitespace=True,
            strip_controls=True,
        ).collect()
    }

    import re
    def mirror(t):
        if t is None:
            return None
        t = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", t)
        t = unicodedata.normalize("NFC", t)
        t = t.lower()
        # ASCII \s: Java regex and DuckDB's RE2 both treat \s as ASCII
        # whitespace (NBSP preserved); Python needs the explicit flag.
        t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
        return t

    for i, t in enumerate(texts):
        want = mirror(t)
        assert got[i] == want, (i, repr(got[i]), repr(want))

    # idempotence: normalizing the output is a no-op
    ndf = normalize_text(
        df, nfc=True, lowercase=True, collapse_whitespace=True,
        strip_controls=True,
    ).select("i", F.col("text_norm").alias("text"))
    again = {
        r.i: r.text_norm
        for r in normalize_text(
            ndf, nfc=True, lowercase=True, collapse_whitespace=True,
            strip_controls=True,
        ).collect()
    }
    assert again == got

    # all-JVM path: no Python evaluation node when nfc is off
    plan = (
        normalize_text(df, nfc=False, lowercase=True, collapse_whitespace=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "MapInPandas" not in plan
