"""Top-k BM25 query engine — block-max pruned, exact.

Reference trace (JVectorKnnFloatVectorQuery.approximateSearch ->
JVectorReader.search, JVectorReader.java:131-212): per-segment ("leaf")
search with an approximate score provider bounding an exact reranker,
filtered by an acceptDocs bitmap, then per-leaf TopDocs merged globally.

Our plan (SURVEY.md §3.1 Spark trace):
  1. tokenize query -> global idf from the dictionary (pruned tiny read,
     broadcast into the kernel closure);
  2. scan ONLY the term_bucket partitions of the query terms with the
     term filter pushed to parquet row groups;
  3. cogroup postings with chunk norms by chunk_id -> one Arrow kernel
     per (chunk) doc range runs MaxScore with block-max skipping:
       - terms processed in descending score-upper-bound order
         (term ub = max over blocks of score(max_tf, min_dl));
       - while the suffix upper-bound sum can still beat the running
         k-th score, terms are "essential": fully decoded, scored
         vectorized into a dense accumulator;
       - once suffix_ub < theta, no unseen doc can enter the top-k:
         remaining terms decode ONLY blocks whose [first_doc, last_doc]
         range intersects the candidate set (block-max skipping), and
         update candidates only. Exact by the standard MaxScore
         argument — theta never decreases.
  4. per-chunk top-k unioned -> global orderBy(score desc, doc_id
     asc).limit(k) (TakeOrderedAndProject — partial + final top-k,
     the Lucene per-leaf + global merge analog).

Filtered search (reference acceptDocs, JVectorReader.java:167-182)
pushes the allow-bitmap INSIDE the MaxScore loop — the mask only
removes candidates, so theta / suffix bounds stay valid and block
skipping keeps working (the reference likewise hands acceptDocs into
the graph search rather than post-filtering). Deleted docs (tombstones)
arrive as a per-chunk DENY bitmap combined the same way; corpus stats
keep counting deleted docs until compaction, exactly like Lucene.
Radial search (min_score, KNNQueryBuilder.java:438-472) takes the exact
full-TAAT path.

Per-query pruning metrics (reference: KNNCounter.java:13-37,
KNNGraphValue.java:17-23 — visited/reranked/expanded counters): pass a
``QueryMetrics`` and the kernels report terms seen, blocks decoded vs
skipped and candidate counts through Spark accumulators — the evidence
that block-max pruning actually prunes (bench.py records them).

All kernels are numpy-vectorized over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.bm25 import block_upper_bound, idf_np, score_np
from ..functions.codec import decode_blocks
from ..plans.query import Query
from ..sources.index_store import IndexStore

_RESULT_SCHEMA = "query_id string, doc_id long, score double"

_POST_COLS = (
    "term", "slice", "doc_bytes", "tf_bytes", "block_first", "block_last",
    "block_count", "block_doc_off", "block_tf_off", "block_max_tf",
    "block_min_dl",
)


class QueryMetrics:
    """Per-batch search counters (Spark accumulators — aggregated across
    every chunk task; also updated in-place by the driver fast path).
    Reference analog: KNNCounter / KNNGraphValue node-level stats."""

    FIELDS = (
        "chunks", "terms_seen", "blocks_total", "blocks_decoded",
        "blocks_skipped", "candidates",
    )

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        for f in self.FIELDS:
            setattr(self, f, sc.accumulator(0))

    def snapshot(self) -> dict:
        return {f: int(getattr(self, f).value) for f in self.FIELDS}


def _decode_term_rows(rows: list[dict]) -> tuple[np.ndarray, np.ndarray, int]:
    """Decode all slices of one term within one chunk -> (docs, tfs,
    n_blocks_decoded)."""
    rows = sorted(rows, key=lambda r: r["slice"])
    ds, ts, nb = [], [], 0
    for r in rows:
        d, t = decode_blocks(
            r["doc_bytes"], r["tf_bytes"],
            np.asarray(r["block_first"], dtype=np.int64),
            np.asarray(r["block_count"], dtype=np.int32),
        )
        ds.append(d)
        ts.append(t)
        nb += len(r["block_first"])
    return np.concatenate(ds), np.concatenate(ts), nb


def _decode_term_rows_pruned(
    rows: list[dict], cand_global: np.ndarray
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Decode only blocks whose doc range intersects the sorted global
    candidate ids (block-max skipping) -> (docs, tfs, decoded, total)."""
    ds, ts = [], []
    decoded = total = 0
    for r in sorted(rows, key=lambda r: r["slice"]):
        first = np.asarray(r["block_first"], dtype=np.int64)
        last = np.asarray(r["block_last"], dtype=np.int64)
        total += len(first)
        lo = np.searchsorted(cand_global, first, side="left")
        hi = np.searchsorted(cand_global, last, side="right")
        sel = hi > lo
        if not sel.any():
            continue
        decoded += int(sel.sum())
        d, t = decode_blocks(
            r["doc_bytes"], r["tf_bytes"],
            first, np.asarray(r["block_count"], dtype=np.int32),
            block_sel=sel,
            doc_off=np.asarray(r["block_doc_off"], dtype=np.int64),
            tf_off=np.asarray(r["block_tf_off"], dtype=np.int64),
        )
        ds.append(d)
        ts.append(t)
    if not ds:
        return np.empty(0, np.int64), np.empty(0, np.int64), decoded, total
    return np.concatenate(ds), np.concatenate(ts), decoded, total


def _term_upper_bound(rows: list[dict], idf: float, avgdl: float, k1, b) -> float:
    ub = 0.0
    for r in rows:
        u = block_upper_bound(
            np.asarray(r["block_max_tf"], dtype=np.float64),
            np.asarray(r["block_min_dl"], dtype=np.float64),
            idf, avgdl, k1, b,
        )
        if len(u):
            ub = max(ub, float(u.max()))
    return ub


def _chunk_mask(nrow, n_slots: int, has_filter: bool):
    """allowed-slot boolean mask from the optional allow (filtered
    search) and deny (tombstone) bitmaps of one norms row; None means
    "all allowed". Returns (mask, empty) — empty=True when a filter is
    present but admits nothing in this chunk."""
    mask = None
    allow_raw = nrow.get("mask_bytes") if hasattr(nrow, "get") else nrow["mask_bytes"]
    deny_raw = nrow.get("deny_bytes") if hasattr(nrow, "get") else nrow["deny_bytes"]
    if has_filter:
        if allow_raw is None:
            return None, True
        mask = np.unpackbits(np.frombuffer(allow_raw, dtype=np.uint8))[
            :n_slots
        ].astype(bool)
    if deny_raw is not None:
        deny = np.unpackbits(np.frombuffer(deny_raw, dtype=np.uint8))[
            :n_slots
        ].astype(bool)
        mask = ~deny if mask is None else (mask & ~deny)
    return mask, False


def _query_kernel(
    queries: list[tuple[str, tuple[str, ...], int | None, float | None]],
    idfs: dict[str, float],
    avgdl: float,
    config_vals: tuple[float, float],
    has_filter: bool,
    metrics: QueryMetrics | None = None,
):
    """Per-chunk kernel body, shared by all queries in the batch."""
    k1, b = config_vals

    def kernel(key, post_pdf: pd.DataFrame, norms_pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.runtime import limit_worker_threads

        limit_worker_threads()
        if len(post_pdf) == 0 or len(norms_pdf) == 0:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        # plain-dict row views over numpy columns: pandas
        # to_dict("records") / .iloc chains were ~half the kernel wall
        # for small chunks (profiled), and this kernel runs once per
        # chunk on BOTH the executor and driver fast paths
        nrow = {
            c: norms_pdf[c].to_numpy()[0] for c in norms_pdf.columns
        }
        base = int(nrow["base_doc"])
        dls = np.frombuffer(nrow["dl_bytes"], dtype=np.int32)
        n_slots = len(dls)
        mask, empty = _chunk_mask(nrow, n_slots, has_filter)
        if empty:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})

        cols = {c: post_pdf[c].to_numpy() for c in _POST_COLS}
        by_term: dict[str, list[dict]] = {}
        for i in range(len(post_pdf)):
            by_term.setdefault(cols["term"][i], []).append(
                {c: cols[c][i] for c in _POST_COLS}
            )
        decode_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        m_terms = m_total = m_decoded = m_skipped = m_cand = 0

        def full_decode(t: str):
            nonlocal m_decoded
            if t not in decode_cache:
                d, tf, nb = _decode_term_rows(by_term[t])
                m_decoded += nb
                decode_cache[t] = (d, tf)
            return decode_cache[t]

        def n_blocks(t: str) -> int:
            return sum(len(r["block_first"]) for r in by_term[t])

        out_q, out_d, out_s = [], [], []

        for qid, qterms, k, min_score in queries:
            terms = [t for t in qterms if t in by_term and t in idfs]
            if not terms:
                continue
            m_terms += len(terms)
            m_total += sum(n_blocks(t) for t in terms)
            ubs = np.array(
                [_term_upper_bound(by_term[t], idfs[t], avgdl, k1, b) for t in terms]
            )
            order = np.argsort(-ubs, kind="stable")
            terms = [terms[i] for i in order]
            ubs = ubs[order]
            suffix = np.concatenate((np.cumsum(ubs[::-1])[::-1], [0.0]))

            acc = np.zeros(n_slots, dtype=np.float64)
            touched = np.zeros(n_slots, dtype=bool)
            # the mask does NOT disable pruning: it only removes
            # candidates, so theta (k-th best allowed score) and the
            # suffix bound (max any unseen doc could still gain) remain
            # a valid MaxScore pair. min_score (radial) needs every
            # qualifying doc, so it takes the exact path.
            use_pruning = min_score is None and k is not None
            theta = -np.inf
            i = 0
            n_terms = len(terms)
            while i < n_terms:
                if use_pruning and suffix[i] < theta:
                    break
                docs, tfs = full_decode(terms[i])
                loc = docs - base
                if mask is not None:
                    keep = mask[loc]
                    loc = loc[keep]
                    tfs = tfs[keep]
                acc[loc] += score_np(tfs, dls[loc], idfs[terms[i]], avgdl, k1, b)
                touched[loc] = True
                i += 1
                if use_pruning:
                    tv = acc[touched]
                    if len(tv) >= k:
                        theta = np.partition(tv, len(tv) - k)[len(tv) - k]
            if i < n_terms:
                # non-essential phase: candidates only
                cand = np.nonzero(touched & (acc + suffix[i] >= theta))[0]
                m_cand += len(cand)
                cand_g = cand + base
                for j in range(i, n_terms if len(cand_g) else i):
                    docs, tfs, dec, tot = _decode_term_rows_pruned(
                        by_term[terms[j]], cand_g
                    )
                    m_decoded += dec
                    m_skipped += tot - dec
                    if not len(docs):
                        continue
                    pos = np.searchsorted(cand_g, docs)
                    pos = np.minimum(pos, len(cand_g) - 1)
                    # no extra mask step here: cand is mask-filtered
                    # already, so masked docs miss this hit test
                    hit = cand_g[pos] == docs
                    loc = docs[hit] - base
                    acc[loc] += score_np(
                        tfs[hit], dls[loc], idfs[terms[j]], avgdl, k1, b
                    )
                if not len(cand_g):
                    # every remaining term's blocks were skipped outright
                    m_skipped += sum(n_blocks(terms[j]) for j in range(i, n_terms))
                sel = cand
            else:
                sel = np.nonzero(touched)[0]
                m_cand += len(sel)

            if min_score is not None:
                keep = sel[acc[sel] >= min_score]
                out_q.extend([qid] * len(keep))
                out_d.extend((keep + base).tolist())
                out_s.extend(acc[keep].tolist())
            else:
                scores = acc[sel]
                if len(sel) > k:
                    part = np.argpartition(-scores, k - 1)[:k]
                    # exact tie handling: take everything >= kth score,
                    # final global sort breaks ties by doc_id
                    kth = scores[part].min()
                    keep_idx = np.nonzero(scores >= kth)[0]
                else:
                    keep_idx = np.arange(len(sel))
                ordr = np.lexsort((sel[keep_idx], -scores[keep_idx]))[: k]
                keep = keep_idx[ordr]
                out_q.extend([qid] * len(keep))
                out_d.extend((sel[keep] + base).tolist())
                out_s.extend(scores[keep].tolist())

        if metrics is not None:
            metrics.chunks.add(1)
            metrics.terms_seen.add(m_terms)
            metrics.blocks_total.add(m_total)
            metrics.blocks_decoded.add(m_decoded)
            metrics.blocks_skipped.add(m_skipped)
            metrics.candidates.add(m_cand)
        return pd.DataFrame(
            {"query_id": out_q, "doc_id": out_d, "score": out_s}
        )

    return kernel


def _deny_pdf_for_chunk(
    tombstones: np.ndarray, base: int, n_slots: int
) -> bytes | None:
    ids = tombstones[
        (tombstones >= base) & (tombstones < base + n_slots)
    ]
    if not len(ids):
        return None
    bits = np.zeros(n_slots, dtype=np.uint8)
    bits[ids - base] = 1
    return np.packbits(bits).tobytes()


def _local_topk(
    spark: SparkSession,
    store: IndexStore,
    queries: list[Query],
    idfs: dict[str, float],
    avgdl: float,
    config,
    stats: dict,
    metrics: QueryMetrics | None = None,
) -> DataFrame:
    """Driver-side exact path for small queries: pruned pyarrow read of
    the matching posting slices, the SAME per-chunk kernel run locally
    over the warmed driver norms, then the same global tie-break.
    Rank-identical to the distributed path by construction (shared
    kernel + shared final ordering); no Spark job is dispatched until
    the (tiny) result DataFrame is created. Tombstones become per-chunk
    deny bitmaps exactly as in the distributed path."""
    tbl = store.read_postings_arrow(list(idfs), config, stats)
    tombs = store._driver_tombstones
    qspec = [(q.query_id, q.terms, q.k, q.min_score) for q in queries]
    kernel = _query_kernel(
        qspec, idfs, avgdl, (config.k1, config.b), False, metrics
    )
    parts = []
    if tbl is not None and tbl.num_rows:
        pdf = tbl.to_pandas()
        for chunk_id, grp in pdf.groupby("chunk_id"):
            entry = store._driver_norms.get(int(chunk_id))
            if entry is None:
                continue
            base, dls = entry
            deny = (
                _deny_pdf_for_chunk(tombs, base, len(dls))
                if tombs is not None
                else None
            )
            norms_pdf = pd.DataFrame(
                {
                    "chunk_id": [int(chunk_id)],
                    "base_doc": [base],
                    "n_slots": [len(dls)],
                    "dl_bytes": [dls.tobytes()],
                    "mask_bytes": [None],
                    "deny_bytes": [deny],
                }
            )
            parts.append(kernel((int(chunk_id),), grp, norms_pdf))
    if parts:
        res = pd.concat(parts, ignore_index=True)
    else:
        res = pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
    # global per-query rank: (score desc, doc_id asc) — identical to
    # the distributed window
    out_rows = {"query_id": [], "doc_id": [], "score": [], "rank": []}
    kmap = {q.query_id: q.k for q in queries}
    for qid, grp in res.groupby("query_id"):
        scores = grp["score"].to_numpy()
        docs = grp["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((docs, -scores))
        k = kmap.get(qid)
        if k is not None and k >= 0 and k < len(order):
            order = order[:k]
        out_rows["query_id"].extend([qid] * len(order))
        out_rows["doc_id"].extend(docs[order].tolist())
        out_rows["score"].extend(scores[order].tolist())
        out_rows["rank"].extend(range(1, len(order) + 1))
    return spark.createDataFrame(
        pd.DataFrame(out_rows), schema=_RESULT_SCHEMA + ", rank int"
    )


def _bitmap_kernel_factory(dpc: int, out_col: str):
    def bitmap_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (chunk_id,) = key
        base = int(chunk_id) * dpc
        bits = np.zeros(dpc, dtype=np.uint8)
        loc = pdf["doc_id"].to_numpy().astype(np.int64) - base
        bits[loc] = 1
        return pd.DataFrame(
            {
                "chunk_id": [int(chunk_id)],
                out_col: [np.packbits(bits).tobytes()],
            }
        )

    return bitmap_kernel


def bm25_topk_batch(
    spark: SparkSession,
    store: IndexStore,
    queries: list[Query],
    filter_docs: DataFrame | None = None,
    metrics: QueryMetrics | None = None,
) -> DataFrame:
    """Answer a batch of queries against a built index.

    Returns (query_id, doc_id, score, rank) with rank 1..k per query
    (radial queries return all hits >= min_score, rank by score).
    Deleted docs (tombstones) are masked out; scores keep using the
    full-corpus stats until compaction, mirroring Lucene's
    deleted-docs-still-count semantics.
    """
    stats, config = store.read_stats()
    avgdl = float(stats["avgdl"])
    all_terms = sorted({t for q in queries for t in q.terms})
    if not all_terms:
        return spark.createDataFrame([], _RESULT_SCHEMA + ", rank int")

    # global idf from the dictionary (pruned tiny read, or the warm
    # driver-side cache after store.warm())
    dfs = store.term_dfs_for(spark, all_terms)
    n_docs = float(stats["n_docs"])
    idfs = {
        t: float(idf_np(np.array([dfs[t]], dtype=np.float64), n_docs)[0])
        for t in dfs
    }

    has_tombs = bool(stats.get("tombstone_batches"))

    # small-query fast path (reference exact-search-threshold analog):
    # warmed driver norms + bounded postings volume -> no Spark job
    if (
        filter_docs is None
        and store._driver_norms is not None
        and (not has_tombs or store._driver_tombstones is not None)
        and sum(dfs.values()) <= config.driver_topk_max_postings
    ):
        return _local_topk(
            spark, store, queries, idfs, avgdl, config, stats, metrics
        )

    postings = store.read_postings_for_terms(spark, all_terms, config, stats)
    norms = store.read_norms(spark, stats)
    has_filter = filter_docs is not None
    dpc = config.docs_per_chunk
    if has_filter:
        bitmaps = (
            filter_docs.select(
                F.col("doc_id"),
                (F.col("doc_id") / dpc).cast("long").alias("chunk_id"),
            )
            .groupBy("chunk_id")
            .applyInPandas(
                _bitmap_kernel_factory(dpc, "mask_bytes"),
                schema="chunk_id long, mask_bytes binary",
            )
        )
        norms = norms.join(bitmaps, "chunk_id", "left")
    else:
        norms = norms.withColumn("mask_bytes", F.lit(None).cast("binary"))
    if has_tombs:
        tombs = store.read_tombstones(spark, stats)
        deny = (
            tombs.select(
                F.col("doc_id"),
                (F.col("doc_id") / dpc).cast("long").alias("chunk_id"),
            )
            .groupBy("chunk_id")
            .applyInPandas(
                _bitmap_kernel_factory(dpc, "deny_bytes"),
                schema="chunk_id long, deny_bytes binary",
            )
        )
        norms = norms.join(deny, "chunk_id", "left")
    else:
        norms = norms.withColumn("deny_bytes", F.lit(None).cast("binary"))

    qspec = [(q.query_id, q.terms, q.k, q.min_score) for q in queries]
    kernel = _query_kernel(
        qspec, idfs, avgdl, (config.k1, config.b), has_filter, metrics
    )
    results = (
        postings.groupBy("chunk_id")
        .cogroup(norms.groupBy("chunk_id"))
        .applyInPandas(kernel, schema=_RESULT_SCHEMA)
    )

    # global top-k per query
    kmap = spark.createDataFrame(
        [(q.query_id, q.k if q.k is not None else -1) for q in queries],
        "query_id string, k int",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        results.join(F.broadcast(kmap), "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter((F.col("k") < 0) | (F.col("rank") <= F.col("k")))
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_topk(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    k: int,
    filter_docs: DataFrame | None = None,
    metrics: QueryMetrics | None = None,
) -> DataFrame:
    """Single-query convenience: (doc_id, score, rank)."""
    q = Query("q", tuple(sorted(set(terms))), k)
    return bm25_topk_batch(spark, store, [q], filter_docs, metrics).select(
        "doc_id", "score", "rank"
    )


def bm25_radial(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    min_score: float,
    filter_docs: DataFrame | None = None,
) -> DataFrame:
    """Radial search (reference Q5): all docs with score >= min_score."""
    q = Query("q", tuple(sorted(set(terms))), k=None, min_score=min_score)
    return bm25_topk_batch(spark, store, [q], filter_docs).select(
        "doc_id", "score", "rank"
    )
