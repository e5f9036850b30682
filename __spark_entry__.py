"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the inverted index over the sf0.001
documents corpus and answer a top-k BM25 query through the full
build -> salted merge -> block-max pruned query pipeline.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2), each checked rank- and value-identical against DuckDB
at sf0.01. Scores are rounded to 4 decimals on BOTH sides (ranking
happens on raw float64 before rounding in both engines).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensearch_jvector_spark import oracle_sql as osql
from opensearch_jvector_spark import oracle_sql_ops as osops
from opensearch_jvector_spark.config import EngineConfig

# entry-point index config: small segments so sf0.001/sf0.01 corpora
# exercise multi-segment, multi-chunk, multi-bucket code paths
ENTRY_CONFIG = EngineConfig(
    block_size=32,
    docs_per_segment=256,
    segments_per_chunk=2,
    term_buckets=8,
    max_row_postings=1 << 16,
)

_STORES: dict[str, object] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _ensure_store(root: str):
    """IndexStore at root, wiped when absent or from an older store
    format (cross-round /tmp caches must never leak stale layouts)."""
    import shutil

    from opensearch_jvector_spark.sources.index_store import IndexStore

    store = IndexStore(root)
    if os.path.exists(store.stats_path) and not store.format_ok():
        shutil.rmtree(root, ignore_errors=True)
    return store, not os.path.exists(store.stats_path)


def _index_for(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir per process) the documents index."""
    from opensearch_jvector_spark.operators.segment_build import build_index

    key = os.path.abspath(sf_dir)
    if key not in _STORES:
        root = os.path.join(
            "/tmp/ojs_index", key.strip("/").replace("/", "_")
        )
        store, needs_build = _ensure_store(root)
        if needs_build:
            build_index(
                spark, _docs(spark, sf_dir).select("doc_id", "text"), root,
                ENTRY_CONFIG,
            )
        # warm => the correctness gate also exercises the driver-side
        # small-query fast path (must stay rank-identical)
        _STORES[key] = store.warm(spark)
    return _STORES[key]


def _round_topk(df: DataFrame) -> DataFrame:
    return df.select("doc_id", F.round("score", 4).alias("score"), "rank")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from opensearch_jvector_spark.operators.wand import bm25_topk

    store = _index_for(spark, "/root/testdata/sf0.001")
    return _round_topk(bm25_topk(spark, store, ["spark", "merge", "join"], 10))


# ---------------------------------------------------------------- queries

def _q_topk(terms: list[str], k: int) -> Callable:
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        from opensearch_jvector_spark.operators.wand import bm25_topk

        return _round_topk(bm25_topk(spark, _index_for(spark, sf_dir), terms, k))

    return f


def _q_topk_filtered(terms: list[str], k: int, lang: str) -> Callable:
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        from opensearch_jvector_spark.operators.wand import bm25_topk

        allowed = _docs(spark, sf_dir).filter(F.col("lang") == lang).select("doc_id")
        return _round_topk(
            bm25_topk(spark, _index_for(spark, sf_dir), terms, k, allowed)
        )

    return f


def _q_topk_after_delete(terms: list[str], k: int, modulus: int) -> Callable:
    """Tombstone-masked search (M5 delete path): docs with
    doc_id % modulus == 0 are deleted, queries exclude them while
    corpus stats keep counting them (Lucene deleted-docs semantics —
    the oracle filters results but scores over the full corpus)."""

    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        from opensearch_jvector_spark.operators.delete import delete_docs
        from opensearch_jvector_spark.operators.segment_build import build_index
        from opensearch_jvector_spark.operators.wand import bm25_topk

        key = "del::" + os.path.abspath(sf_dir)
        if key not in _STORES:
            root = os.path.join(
                "/tmp/ojs_index_del",
                os.path.abspath(sf_dir).strip("/").replace("/", "_"),
            )
            store, needs_build = _ensure_store(root)
            if needs_build:
                build_index(
                    spark, _docs(spark, sf_dir).select("doc_id", "text"),
                    root, ENTRY_CONFIG,
                )
            stats, _ = store.read_stats()
            if not stats.get("tombstone_batches"):
                ids = (
                    _docs(spark, sf_dir)
                    .filter(F.col("doc_id") % modulus == 0)
                    .select("doc_id")
                )
                delete_docs(spark, store, ids, batch_tag="entry-del")
            _STORES[key] = store.warm(spark)
        return _round_topk(bm25_topk(spark, _STORES[key], terms, k))

    return f


def _q_radial(terms: list[str], min_score: float) -> Callable:
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        from opensearch_jvector_spark.operators.wand import bm25_radial

        return _round_topk(
            bm25_radial(spark, _index_for(spark, sf_dir), terms, min_score)
        )

    return f


def _q_bruteforce(terms: list[str], k: int) -> Callable:
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        from opensearch_jvector_spark.operators.bruteforce import (
            bm25_topk_bruteforce,
        )

        return _round_topk(bm25_topk_bruteforce(_docs(spark, sf_dir), terms, k))

    return f


def _q_diversified(terms: list[str], k: int) -> Callable:
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        from opensearch_jvector_spark.operators.bruteforce import (
            bm25_topk_diversified,
        )

        out = bm25_topk_diversified(_docs(spark, sf_dir), terms, k)
        return out.select(
            "group", "doc_id", F.round("score", 4).alias("score"), "rank"
        )

    return f


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.functions.tokenize import tokens_col

    return (
        _docs(spark, sf_dir)
        .select(F.size(tokens_col("text")).alias("dl"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("dl"), 6).alias("avgdl"),
            F.sum("dl").alias("sum_dl"),
        )
    )


def _q_term_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.bruteforce import doc_terms, term_dfs

    return (
        term_dfs(doc_terms(_docs(spark, sf_dir)))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


def _q_docid_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense docID assignment operator (GraphNodeIdToDocMap analog)
    applied to documents keyed by (source, doc_id)."""
    from opensearch_jvector_spark.operators.docid import assign_doc_ids

    d = _docs(spark, sf_dir).select(
        F.col("source").alias("conv_id"), F.col("doc_id").alias("turn_idx")
    )
    out = assign_doc_ids(d, num_partitions=4)
    return out.select(
        "conv_id",
        F.col("turn_idx").alias("turn_key"),
        F.col("doc_id").alias("global_doc_id"),
    )


def _q_segment_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _index_for(spark, sf_dir)
    return store.read_manifest(spark).select(
        "seg_group", "n_docs", "n_terms", "sum_dl"
    )


def _q_index_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone integrity check (S6 / JVectorReader.checkIntegrity):
    recompute every segment's canonical digest + df/norms accounting.
    The oracle pins the expected clean-report shape (segment count from
    the corpus size; zero mismatches)."""
    from opensearch_jvector_spark.operators.integrity import verify_index

    r = verify_index(spark, _index_for(spark, sf_dir), strict=True)
    return spark.createDataFrame(
        [(r["checked_segments"], r["checksum_mismatches"],
          r["df_mismatched_chunks"], r["ok"])],
        "checked_segments long, checksum_mismatches long, "
        "df_mismatched_chunks long, ok boolean",
    )


# ------------------------------------------- dedup / similarity / text


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a duplicate-injected derivation (the raw corpus
    has no exact dups; the derivation is mirrored in the oracle SQL)."""
    from opensearch_jvector_spark.operators.dedup import dedup_exact

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return dedup_exact(docs.unionByName(dup))


def _q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.dedup import dedup_ngram_jaccard

    return dedup_ngram_jaccard(_docs(spark, sf_dir), n=3, threshold=0.4)


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.dedup import dedup_minhash_lsh

    return dedup_minhash_lsh(
        _docs(spark, sf_dir), num_hashes=16, bands=4, shingle_n=2, threshold=0.5
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir))


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.dedup import dedup_simhash

    # h=3 => 4-band exact blocking; the oracle is BRUTE FORCE over all
    # pairs (semantic contract), not a replica of the banding
    return dedup_simhash(_docs(spark, sf_dir), max_hamming=3)


def _q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.dedup import dedup_embedding_cosine

    return dedup_embedding_cosine(_embs(spark, sf_dir), threshold=0.4)


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list:
    row = (
        _embs(spark, sf_dir).filter(F.col("vec_id") == vec_id)
        .select("embedding").first()
    )
    return [float(x) for x in row[0]]


def _q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    return cosine_topk_bruteforce(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=10
    )


#: fixed child fanout for the nested entries — 500 sf0.01 vectors
#: become 100 parents of 5 child vectors each (Lucene block-join's
#: contiguous-children invariant on vec_id)
_NESTED_CPP = 5


def _q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the reference serves the knn clause of
    OpenSearch's ``hybrid`` compound query and the enclosing pipeline
    fuses it with the lexical clause; here both halves are ours, so
    the entry fuses the BM25 top-20 with the cosine top-20 by
    Reciprocal Rank Fusion (vec_id == doc_id in the testdata)."""
    from opensearch_jvector_spark.operators.hybrid import rrf_fuse
    from opensearch_jvector_spark.operators.similarity import (
        topk_bruteforce,
    )
    from opensearch_jvector_spark.operators.wand import bm25_topk

    bm = bm25_topk(spark, _index_for(spark, sf_dir), ["spark", "merge"], 20)
    ann = topk_bruteforce(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), 20, "cosine",
        score_name="cos",
    ).withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse({"bm25": bm, "ann": ann}, k=10)


def _q_hybrid_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max weighted linear fusion of the same two lists. Emits
    (doc_id, rank) only: the fused float carries each engine's last-ulp
    BM25 drift, so the oracle-stable surface is the ranking."""
    from opensearch_jvector_spark.operators.hybrid import linear_fuse
    from opensearch_jvector_spark.operators.similarity import (
        topk_bruteforce,
    )
    from opensearch_jvector_spark.operators.wand import bm25_topk

    bm = bm25_topk(spark, _index_for(spark, sf_dir), ["spark", "merge"], 20)
    ann = topk_bruteforce(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), 20, "cosine",
    ).withColumnRenamed("vec_id", "doc_id")
    return linear_fuse(
        {"bm25": bm, "ann": ann}, k=10,
        weights={"bm25": 0.3, "ann": 0.7},
    ).select("doc_id", "rank")


#: ids tombstoned by the ann_after_delete entry (vec 0 is the query
#: vector itself — rank 1 before the delete, so the mask visibly
#: reshapes the result)
_DELETED_VEC_IDS = (0, 1, 2)


def _q_ann_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN after deletes: tombstoned ids are masked out of every query
    path immediately (Lucene liveDocs model — deletes are metadata
    until ivf_compact_deletes rewrites the affected cells). Runs the
    PQ path so the deny provably applies BEFORE the overquery budget.
    Own index dir (the shared one must stay immutable); the
    content-addressed tombstone makes re-runs idempotent."""
    from opensearch_jvector_spark.operators.similarity import (
        ivf_build,
        ivf_delete,
        ivf_query,
    )

    d = _ivf_dir(sf_dir) + "_del"
    if not os.path.isdir(os.path.join(d, "centroids")):
        ivf_build(
            _embs(spark, sf_dir), d, n_centroids=16, kmeans_iters=1,
            pq_m=8, sq=True, bq=True, msq_bits=2,
        )
    ivf_delete(d, _DELETED_VEC_IDS)
    return ivf_query(
        spark, d, _query_vec(spark, sf_dir), k=10, n_probe=4,
        use_pq=True, overquery=50, approximate_threshold=0,
    )


def _q_ann_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.nested import nested_topk

    return nested_topk(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
        children_per_parent=_NESTED_CPP, score_name="cos",
    )


def _q_ann_nested_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.nested import nested_expand

    return nested_expand(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=5,
        children_per_parent=_NESTED_CPP, score_name="cos",
    )


def _ivf_dir(sf_dir: str) -> str:
    # v6: adds msq_code column + threshold planes (2-bit multi-bit
    # scalar quantization); v5 was packed-sign 1-bit bq
    return os.path.join(
        "/tmp/ojs_ivf6", os.path.abspath(sf_dir).strip("/").replace("/", "_")
    )


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via the PERSISTED IVF index: built once (cell-partitioned
    inverted lists + k-means-refined centroid table + PQ codes), then
    the query only probes its n_probe cell directories — no corpus-wide
    job at query time. kmeans_iters=1: the shipped path exercises
    refined centroids (round-2 verdict: the entry only ever used
    data-order seeds)."""
    from opensearch_jvector_spark.operators.similarity import cosine_topk_ivf

    return cosine_topk_ivf(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
        n_centroids=16, n_probe=4, index_dir=_ivf_dir(sf_dir),
        kmeans_iters=1, pq_m=8, sq=True, bq=True, msq_bits=2,
        approximate_threshold=0,
    )


def _q_ann_ivf_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF behind the TWO-LEVEL coarse probe (hierarchy analog,
    JVectorDiskANNMethod.java:37-89): the index persists a
    ~sqrt(n_cells) coarse quantizer over its centroids and the query
    scores the coarse table first, opening only the winning groups'
    fine-centroid files — probe work sublinear in cell count. At this
    SF the default coarse fan-out covers every group, so the probe
    decision coincides exactly with flat probing and the exact-IVF SQL
    stays the oracle; the sublinear regime (>=4096 cells, fraction-of-
    table probe cost) is pinned by tests/test_coarse_probe.py."""
    from opensearch_jvector_spark.operators.similarity import cosine_topk_ivf

    return cosine_topk_ivf(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
        n_centroids=16, n_probe=4, index_dir=_ivf_dir(sf_dir) + "_coarse",
        kmeans_iters=1, coarse=True, approximate_threshold=0,
    )


def _q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ-compressed path over the same index: ADC-score the M-byte
    codes of the probed cells (column pruning never reads vectors),
    keep k*overquery candidates, rerank them exactly — must be
    rank-identical to the exact IVF result at this scale (the oracle is
    the exact-IVF SQL: rerank recovers exactness, JVectorReader
    .java:154-182)."""
    from opensearch_jvector_spark.operators.similarity import cosine_topk_ivf

    return cosine_topk_ivf(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
        n_centroids=16, n_probe=4, index_dir=_ivf_dir(sf_dir),
        kmeans_iters=1, pq_m=8, sq=True, bq=True, msq_bits=2, use_pq=True, overquery=50,
        approximate_threshold=0,
    )


def _q_ann_ivf_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The int8 scalar-quantized path (reference C3 scalar quantizers,
    OneBitScalarQuantizer.java:25-88 family): 8x fewer vector bytes in
    the approximate pass, exact rerank after — rank-identical to the
    exact IVF result at this scale (same oracle)."""
    from opensearch_jvector_spark.operators.similarity import cosine_topk_ivf

    return cosine_topk_ivf(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
        n_centroids=16, n_probe=4, index_dir=_ivf_dir(sf_dir),
        kmeans_iters=1, pq_m=8, sq=True, bq=True, msq_bits=2, use_sq=True, overquery=50,
        approximate_threshold=0,
    )


def _q_ann_ivf_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1-bit binary-quantized path (OneBitScalarQuantizer.java:
    25-88 + hamming candidate ranking, KNNScoringUtil
    .calculateHammingBit:179-202): the approximate pass reads ONLY the
    packed sign bits (64x fewer vector bytes than the stored float64),
    ranks by hamming distance to the packed query, and the exact
    rerank restores true cosine order — rank-identical to the exact
    IVF result at this scale (same oracle)."""
    from opensearch_jvector_spark.operators.similarity import cosine_topk_ivf

    return cosine_topk_ivf(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
        n_centroids=16, n_probe=4, index_dir=_ivf_dir(sf_dir),
        kmeans_iters=1, pq_m=8, sq=True, bq=True, msq_bits=2, use_bq=True, overquery=50,
        approximate_threshold=0,
    )


def _q_ann_ivf_sq2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2-bit MULTI-BIT scalar-quantized path
    (MultiBitScalarQuantizer.java + BitPacker.java): two threshold
    planes per dimension at mean +/- sigma/3, packed plane-major, the
    approximate pass ranks by hamming over both planes' bits (16x
    compression — the point between 1-bit BQ's 32x and int8 SQ's 8x,
    CompressionLevel.java:24-31), exact rerank restores true cosine
    order — rank-identical to the exact IVF result at this scale (same
    oracle)."""
    from opensearch_jvector_spark.operators.similarity import cosine_topk_ivf

    return cosine_topk_ivf(
        _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
        n_centroids=16, n_probe=4, index_dir=_ivf_dir(sf_dir),
        kmeans_iters=1, pq_m=8, sq=True, bq=True, msq_bits=2,
        use_msq=True, overquery=50, approximate_threshold=0,
    )


def _ensure_ivf(spark: SparkSession, sf_dir: str) -> str:
    from opensearch_jvector_spark.operators.similarity import cosine_topk_ivf

    index_dir = _ivf_dir(sf_dir)
    if not os.path.isdir(os.path.join(index_dir, "centroids")):
        cosine_topk_ivf(  # build via the shared path
            _embs(spark, sf_dir), _query_vec(spark, sf_dir), k=1,
            n_centroids=16, n_probe=1, index_dir=index_dir,
            kmeans_iters=1, pq_m=8, sq=True, bq=True, msq_bits=2,
            approximate_threshold=0,
        ).collect()
    return index_dir


def _q_ann_ivf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-job multi-query IVF through the QUANTIZED path (round-3
    verdict: batch read full vectors): ADC-score the PQ codes of the
    unioned probed cells — one gather per cell group for all of its
    queries — then one exact rerank read of the per-query candidate
    unions. overquery=50 makes the rerank exact at this scale, so the
    oracle is the exact batch-IVF SQL."""
    from opensearch_jvector_spark.operators.similarity import ivf_query_batch

    index_dir = _ensure_ivf(spark, sf_dir)
    queries = [
        (f"q{i}", _query_vec(spark, sf_dir, vec_id=v))
        for i, v in enumerate(_BATCH_QUERY_IDS)
    ]
    return ivf_query_batch(
        spark, index_dir, queries, k=5, n_probe=4, use_pq=True, overquery=50,
        approximate_threshold=0,
    )


def _q_ann_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search (Q4 on the embedding side): nearest
    neighbors among an allow-listed subset — the filter DataFrame
    semi-joins INSIDE the probed-cell scan (acceptDocs analog,
    JVectorReader.java:167-182); cell pruning stays on."""
    from opensearch_jvector_spark.operators.similarity import ivf_query

    index_dir = _ensure_ivf(spark, sf_dir)
    allow = _embs(spark, sf_dir).filter(
        F.col("vec_id") % 3 == 0
    ).select("vec_id")
    # threshold=0 pins the probed-mask path (the IVF-shaped oracle);
    # the small-filter exact fallback has its own entry below
    return ivf_query(
        spark, index_dir, _query_vec(spark, sf_dir), k=10, n_probe=4,
        filter_ids=allow, filtered_exact_threshold=0,
        approximate_threshold=0,
    )


def _q_ann_filtered_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-filter EXACT fallback (the reference's filtered_exact_
    search_threshold switch, KNNSettings.java:87 + the exact iterators,
    VectorIdsKNNIterator.java:23-112): the allow-list is 10 ids, far
    under the threshold, so the query bypasses IVF probing and
    exact-scores exactly the allowed ids — perfect recall regardless
    of which cells n_probe would have covered. The oracle is brute
    force OVER THE ALLOW-LIST (not IVF-shaped)."""
    from opensearch_jvector_spark.operators.similarity import ivf_query

    index_dir = _ensure_ivf(spark, sf_dir)
    allow = _embs(spark, sf_dir).filter(
        F.col("vec_id") % 50 == 7
    ).select("vec_id")
    # n_probe=1 would miss most of these ids on the probed path — the
    # fallback makes the probe budget irrelevant
    return ivf_query(
        spark, index_dir, _query_vec(spark, sf_dir), k=10, n_probe=1,
        filter_ids=allow,
    )


def _q_ann_auto_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-INDEX exact bypass (the reference's approximate_threshold
    switch, KNNSettings.java:70, default 15_000 at :104): this corpus
    is a few hundred vectors — far below the threshold — so the engine
    ignores the (deliberately starved) n_probe=1 budget and
    exact-scores the WHOLE index. The oracle is corpus brute force
    (NOT IVF-shaped): perfect recall is the contract; probed IVF at
    n_probe=1/16 cells would provably miss most of the true top-10
    (pinned by tests/test_approx_threshold.py)."""
    from opensearch_jvector_spark.operators.similarity import ivf_query

    index_dir = _ensure_ivf(spark, sf_dir)
    return ivf_query(
        spark, index_dir, _query_vec(spark, sf_dir), k=10, n_probe=1,
        approximate_threshold=15_000,
    )


_RADIAL_MIN_COS = 0.15


def _q_ann_radial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radial vector search: every probed-cell vector with cos >=
    threshold, best-first (reference maxDistance/minScore radial,
    KNNQueryBuilder.java:438-472 / RNNQueryFactory.java)."""
    from opensearch_jvector_spark.operators.similarity import ivf_query_radial

    index_dir = _ensure_ivf(spark, sf_dir)
    return ivf_query_radial(
        spark, index_dir, _query_vec(spark, sf_dir), n_probe=4,
        min_score=_RADIAL_MIN_COS, approximate_threshold=0,
    )


def _q_ann_ivf_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver-side ANN fast path (pyarrow probed-cell read + numpy
    matmul, zero Spark jobs — the exact-search-threshold switch,
    KNNSettings.java:70, applied to job dispatch): must stay
    rank-identical to the distributed exact IVF query (same oracle)."""
    from opensearch_jvector_spark.operators.similarity import ivf_query_local

    index_dir = _ensure_ivf(spark, sf_dir)
    pdf = ivf_query_local(
        index_dir, _query_vec(spark, sf_dir), k=10, n_probe=4,
        approximate_threshold=0,
    )
    return spark.createDataFrame(pdf, "vec_id long, cos double, rank int")


def _q_ann_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-space top-k over packed simhash fingerprints
    (KNNScoringUtil.calculateHammingBit:179-202): the binary-vector
    similarity surface, composed with the simhash dedup column."""
    from opensearch_jvector_spark.operators.dedup import simhash
    from opensearch_jvector_spark.operators.similarity import hamming_topk

    s = simhash(_docs(spark, sf_dir))
    qfp = int(s.filter(F.col("doc_id") == 0).first()["simhash"])
    return hamming_topk(s, qfp, k=10)


_BATCH_QUERY_IDS = [0, 7, 21]


def _q_ann_space(space: str, k: int) -> Callable:
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        from opensearch_jvector_spark.operators.similarity import (
            topk_bruteforce,
        )

        return topk_bruteforce(
            _embs(spark, sf_dir), _query_vec(spark, sf_dir), k, space
        )

    return f


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.textstats import language_id

    return language_id(_docs(spark, sf_dir))


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir))


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.textstats import token_counts

    return token_counts(_docs(spark, sf_dir))


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.textstats import doc_fingerprint

    return doc_fingerprint(_docs(spark, sf_dir))


def _q_topk_ranged(terms: list[str], k: int) -> Callable:
    """Same top-k through an index built with the shuffle-free ranged
    layout — must be rank-identical to the grouped-build oracle."""

    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        from opensearch_jvector_spark.operators.segment_build import build_index
        from opensearch_jvector_spark.operators.wand import bm25_topk
        from opensearch_jvector_spark.sources.index_store import IndexStore

        key = "ranged::" + os.path.abspath(sf_dir)
        if key not in _STORES:
            root = os.path.join(
                "/tmp/ojs_index_ranged",
                os.path.abspath(sf_dir).strip("/").replace("/", "_"),
            )
            store, needs_build = _ensure_store(root)
            if needs_build:
                build_index(
                    spark, _docs(spark, sf_dir).select("doc_id", "text"),
                    root, ENTRY_CONFIG, layout="ranged",
                )
            _STORES[key] = store.warm(spark)
        return _round_topk(bm25_topk(spark, _STORES[key], terms, k))

    return f


_N_MEDIA = 60


def _media(spark: SparkSession) -> DataFrame:
    from opensearch_jvector_spark.operators.multimodal import synthetic_media

    return synthetic_media(spark, _N_MEDIA)


def _q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column -> typed metadata struct (blob header parse;
    oracle recomputes the generator's size formulas without blobs)."""
    from opensearch_jvector_spark.operators.multimodal import media_metadata

    return media_metadata(_media(spark))


def _q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opensearch_jvector_spark.operators.multimodal import sample_frames

    return sample_frames(_media(spark), every=2).select("media_id", "frame_idx")


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract (no SQL-expressible oracle: requires
    parsing binary payloads; driver records the rows-only check)."""
    from opensearch_jvector_spark.operators.multimodal import media_features

    return media_features(_media(spark)).select(
        "media_id", "modality", "mean_val"
    )


_APPEND_SPLIT = 250
_APPEND_TERMS = ["spark", "stream", "merge"]


def _q_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance e2e: build a base index over
    doc_id < split, then append the rest through the streaming append
    path (chunk-aligned re-ID), then query the combined index."""
    from opensearch_jvector_spark.operators.segment_build import build_index
    from opensearch_jvector_spark.operators.wand import bm25_topk
    from opensearch_jvector_spark.sources.index_store import IndexStore
    from opensearch_jvector_spark.streaming.incremental import append_index

    key = "append::" + os.path.abspath(sf_dir)
    if key not in _STORES:
        root = os.path.join(
            "/tmp/ojs_index_append",
            os.path.abspath(sf_dir).strip("/").replace("/", "_"),
        )
        store, needs_build = _ensure_store(root)
        docs = _docs(spark, sf_dir)
        if needs_build:
            build_index(
                spark,
                docs.filter(F.col("doc_id") < _APPEND_SPLIT)
                .select("doc_id", "text"),
                root,
                ENTRY_CONFIG,
            )
        tail = docs.filter(F.col("doc_id") >= _APPEND_SPLIT).select(
            F.col("source").alias("conv_id"),
            F.col("doc_id").alias("turn_idx"),
            "text",
        )
        append_index(spark, store, tail, batch_tag="entry-append")
        _STORES[key] = store
    return _round_topk(
        bm25_topk(spark, _STORES[key], _APPEND_TERMS, 10)
    )


def _append_base(sf_dir: str) -> int:
    dpc = ENTRY_CONFIG.docs_per_chunk
    return (-(-_APPEND_SPLIT // dpc)) * dpc


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk_single": _q_topk(["spark"], 10),
        "bm25_topk_multi": _q_topk(["merge", "join", "stream"], 10),
        "bm25_topk_hot_term": _q_topk(["the"], 20),
        "bm25_topk_filtered": _q_topk_filtered(["spark", "merge"], 10, "en"),
        "bm25_topk_filtered_hot": _q_topk_filtered(["the", "data"], 20, "en"),
        "bm25_topk_after_delete": _q_topk_after_delete(["spark", "merge"], 10, 7),
        "bm25_radial": _q_radial(["spark", "merge"], 0.4),
        "bm25_bruteforce": _q_bruteforce(["batch", "window"], 10),
        "bm25_diversified": _q_diversified(["spark", "merge"], 8),
        "bm25_topk_ranged_build": _q_topk_ranged(["filter", "scan"], 10),
        "corpus_stats": _q_corpus_stats,
        "term_dictionary": _q_term_dict,
        "docid_dense_rank": _q_docid_dense_rank,
        "segment_manifest": _q_segment_manifest,
        "index_verify": _q_index_verify,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "simhash_fingerprint": _q_simhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding_cosine": _q_dedup_embedding,
        "ann_cosine_topk": _q_ann_bruteforce,
        "ann_cosine_ivf": _q_ann_ivf,
        "ann_cosine_ivf_coarse": _q_ann_ivf_coarse,
        "ann_cosine_ivf_pq": _q_ann_ivf_pq,
        "ann_cosine_ivf_sq": _q_ann_ivf_sq,
        "ann_cosine_ivf_bq": _q_ann_ivf_bq,
        "ann_cosine_ivf_sq2": _q_ann_ivf_sq2,
        "ann_ivf_batch": _q_ann_ivf_batch,
        "ann_cosine_ivf_filtered": _q_ann_ivf_filtered,
        "ann_filtered_exact": _q_ann_filtered_exact,
        "ann_auto_exact": _q_ann_auto_exact,
        "ann_cosine_ivf_local": _q_ann_ivf_local,
        "ann_radial": _q_ann_radial,
        "ann_hamming_topk": _q_ann_hamming,
        "ann_l2_topk": _q_ann_space("l2", 10),
        "ann_ip_topk": _q_ann_space("innerproduct", 10),
        "ann_nested_topk": _q_ann_nested,
        "ann_nested_expand": _q_ann_nested_expand,
        "ann_after_delete": _q_ann_after_delete,
        "hybrid_rrf": _q_hybrid_rrf,
        "hybrid_linear": _q_hybrid_linear,
        "language_id": _q_language_id,
        "quality_score": _q_quality,
        "token_counts": _q_token_counts,
        "doc_fingerprint": _q_fingerprint,
        "incremental_append_topk": _q_incremental_append,
        "media_metadata": _q_media_metadata,
        "media_frame_sample": _q_media_frames,
        "media_features": _q_media_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk_single": osql.bm25_topk_sql(["spark"], 10),
        "bm25_topk_multi": osql.bm25_topk_sql(["merge", "join", "stream"], 10),
        "bm25_topk_hot_term": osql.bm25_topk_sql(["the"], 20),
        "bm25_topk_filtered": osql.bm25_topk_sql(
            ["spark", "merge"], 10, filter_where="d.lang = 'en'"
        ),
        "bm25_topk_filtered_hot": osql.bm25_topk_sql(
            ["the", "data"], 20, filter_where="d.lang = 'en'"
        ),
        "bm25_topk_after_delete": osql.bm25_topk_sql(
            ["spark", "merge"], 10, filter_where="d.doc_id % 7 <> 0"
        ),
        "bm25_radial": osql.bm25_radial_sql(["spark", "merge"], 0.4),
        "bm25_bruteforce": osql.bm25_topk_sql(["batch", "window"], 10),
        "bm25_diversified": osql.bm25_diversified_sql(["spark", "merge"], 8),
        "bm25_topk_ranged_build": osql.bm25_topk_sql(["filter", "scan"], 10),
        "corpus_stats": osql.corpus_stats_sql(),
        "term_dictionary": osql.term_dict_sql(20),
        "docid_dense_rank": osql.docid_dense_rank_sql(),
        "segment_manifest": osql.segment_manifest_sql(
            ENTRY_CONFIG.docs_per_segment
        ),
        "index_verify": (
            "SELECT CAST((count(*) + {dps} - 1) // {dps} AS BIGINT)"
            " AS checked_segments, CAST(0 AS BIGINT) AS checksum_mismatches,"
            " CAST(0 AS BIGINT) AS df_mismatched_chunks, true AS ok"
            " FROM documents".format(dps=ENTRY_CONFIG.docs_per_segment)
        ),
        "dedup_exact": osops.dedup_exact_sql(),
        "dedup_ngram_jaccard": osops.dedup_ngram_jaccard_sql(n=3, threshold=0.4),
        "dedup_minhash_lsh": osops.dedup_minhash_lsh_sql(
            num_hashes=16, bands=4, shingle_n=2, threshold=0.5
        ),
        "simhash_fingerprint": osops.simhash_sql(),
        "dedup_simhash": osops.dedup_simhash_sql(max_hamming=3),
        "dedup_embedding_cosine": osops.dedup_embedding_cosine_sql(threshold=0.4),
        "ann_cosine_topk": osops.cosine_topk_sql(query_vec_id=0, k=10),
        "ann_cosine_ivf": osops.cosine_topk_ivf_sql(
            query_vec_id=0, k=10, n_centroids=16, n_probe=4, kmeans_iters=1
        ),
        # two-level probe covers every coarse group at this SF, so the
        # probe decision equals flat probing -> exact-IVF SQL oracle
        "ann_cosine_ivf_coarse": osops.cosine_topk_ivf_sql(
            query_vec_id=0, k=10, n_centroids=16, n_probe=4, kmeans_iters=1
        ),
        # PQ path reranks to exactness at this scale -> same oracle
        "ann_cosine_ivf_pq": osops.cosine_topk_ivf_sql(
            query_vec_id=0, k=10, n_centroids=16, n_probe=4, kmeans_iters=1
        ),
        "ann_cosine_ivf_sq": osops.cosine_topk_ivf_sql(
            query_vec_id=0, k=10, n_centroids=16, n_probe=4, kmeans_iters=1
        ),
        "ann_cosine_ivf_bq": osops.cosine_topk_ivf_sql(
            query_vec_id=0, k=10, n_centroids=16, n_probe=4, kmeans_iters=1
        ),
        "ann_cosine_ivf_sq2": osops.cosine_topk_ivf_sql(
            query_vec_id=0, k=10, n_centroids=16, n_probe=4, kmeans_iters=1
        ),
        "ann_ivf_batch": osops.cosine_topk_ivf_batch_sql(
            _BATCH_QUERY_IDS, k=5, n_centroids=16, n_probe=4, kmeans_iters=1
        ),
        "ann_cosine_ivf_filtered": osops.cosine_topk_ivf_sql(
            query_vec_id=0, k=10, n_centroids=16, n_probe=4, kmeans_iters=1,
            filter_where="vec_id % 3 = 0",
        ),
        # exact fallback: brute force over the allow-list, NOT
        # IVF-shaped — perfect recall is the contract
        "ann_filtered_exact": osops.cosine_topk_sql(
            query_vec_id=0, k=10, filter_where="vec_id % 50 = 7"
        ),
        # small-index bypass: corpus brute force, NOT IVF-shaped —
        # below approximate_threshold the engine IS exact search
        "ann_auto_exact": osops.cosine_topk_sql(query_vec_id=0, k=10),
        "ann_cosine_ivf_local": osops.cosine_topk_ivf_sql(
            query_vec_id=0, k=10, n_centroids=16, n_probe=4, kmeans_iters=1
        ),
        "ann_radial": osops.cosine_radial_ivf_sql(
            query_vec_id=0, min_score=_RADIAL_MIN_COS, n_centroids=16,
            n_probe=4, kmeans_iters=1,
        ),
        "ann_hamming_topk": osops.hamming_topk_sql(query_doc_id=0, k=10),
        "ann_l2_topk": osops.topk_space_sql(query_vec_id=0, k=10, space="l2"),
        "ann_ip_topk": osops.topk_space_sql(
            query_vec_id=0, k=10, space="innerproduct"
        ),
        "ann_nested_topk": osops.nested_topk_sql(
            query_vec_id=0, k=10, cpp=_NESTED_CPP
        ),
        "ann_nested_expand": osops.nested_expand_sql(
            query_vec_id=0, k=5, cpp=_NESTED_CPP
        ),
        # deletes == an allow-filter of the live set over the same
        # probed cells (the PQ rerank recovers exactness at this scale)
        "ann_after_delete": osops.cosine_topk_ivf_sql(
            query_vec_id=0, k=10, n_centroids=16, n_probe=4,
            kmeans_iters=1,
            filter_where="vec_id NOT IN ({})".format(
                ", ".join(map(str, _DELETED_VEC_IDS))
            ),
        ),
        "hybrid_rrf": osops.hybrid_rrf_sql(
            ["spark", "merge"], query_vec_id=0, n_each=20, k=10
        ),
        "hybrid_linear": osops.hybrid_linear_sql(
            ["spark", "merge"], query_vec_id=0, n_each=20, k=10,
            w_bm=0.3, w_ann=0.7,
        ),
        "language_id": osops.language_id_sql(),
        "quality_score": osops.quality_score_sql(),
        "token_counts": osops.token_counts_sql(),
        "doc_fingerprint": osops.doc_fingerprint_sql(),
        "incremental_append_topk": osops.incremental_append_topk_sql(
            _APPEND_SPLIT, _append_base(""), _APPEND_TERMS, 10
        ),
        "media_metadata": osops.media_metadata_sql(_N_MEDIA),
        "media_frame_sample": osops.media_frame_sample_sql(_N_MEDIA, every=2),
        # the OJSM generator is deterministic -> the expected means are
        # recomputed independently (pure-python splitmix64) and pinned;
        # round 2 left this entry rows-only
        "media_features": osops.media_features_sql(_N_MEDIA),
    }
