"""Segment merge — N build segments -> the global inverted index.

Reference: `JVectorWriter.mergeOneField` merges per-segment graphs,
preferring INCREMENTAL expansion of the leading segment's graph over a
full rebuild (JVectorWriter.java:174-195, incremental branch :922-941 —
the plugin's flagship feature, README.md:137-148). Our codec makes the
analogous property structural: posting blocks store absolute first_doc
and deltas never cross block boundaries, so merging segments over
disjoint ascending doc ranges is PURE CONCATENATION — no re-encode,
ever (functions/codec.py; tests/test_codec.py::test_merge_is_concat).

Shuffle shape (north_rule: partitioning/shuffle/skew explicit):
  * shuffle key is (term, chunk_id) — NOT bare term. chunk_id (a range
    of segments_per_chunk build segments) is the built-in salt: a hot
    stopword term present in every doc fans out across ALL chunks, so
    no reducer ever receives more than docs_per_chunk postings for one
    key. Skew is bounded BY CONSTRUCTION, and logged (term_skew_ratio
    in stats).
  * physical plan: ONE hash repartition on (term, chunk_id) + in-
    partition sort, then a STREAMING mapInPandas that merges thousands
    of groups per Arrow batch (an applyInPandas per (term, chunk) would
    pay per-group pandas overhead on millions of tiny groups — measured
    ~50x slower at sf0.01).
  * the global df dictionary is a two-stage aggregation: per-segment
    partial dfs (map-side combine) summed by term — the reference's
    codebook-refinement analog (corpus stats refreshed from partials,
    JVectorWriter.java:886-913).
  * output partitioned by term_bucket (crc32(term) % B) and sorted by
    term within files => query-term partition pruning + parquet
    row-group min/max skipping.

Chunks are also the query-time parallelism unit: one WAND task per
(query, chunk) doc range (reference analog: per-leaf concurrent segment
search, KNNConcurrentSearchRequestDecider.java).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..sources.index_store import POSTINGS_SCHEMA, IndexStore, term_bucket_col

_MERGE_IN_COLS = [
    "term", "chunk_id", "term_bucket", "seg_group", "df",
    "doc_bytes", "tf_bytes", "block_first", "block_last", "block_count",
    "block_doc_off", "block_tf_off", "block_max_tf", "block_min_dl",
]


def _merge_group(
    g: dict[str, list], term: str, chunk_id: int, term_bucket: int, cap: int
) -> list[dict]:
    """Merge one (term, chunk) group (rows sorted by seg_group) by pure
    concatenation; split into `slice`s of <= cap postings."""
    doc_bytes = g["doc_bytes"]
    tf_bytes = g["tf_bytes"]
    firsts = np.concatenate([np.asarray(a, dtype=np.int64) for a in g["block_first"]])
    lasts = np.concatenate([np.asarray(a, dtype=np.int64) for a in g["block_last"]])
    counts = np.concatenate([np.asarray(a, dtype=np.int64) for a in g["block_count"]])
    doc_lens = np.fromiter((len(b) for b in doc_bytes), dtype=np.int64)
    tf_lens = np.fromiter((len(b) for b in tf_bytes), dtype=np.int64)
    doc_base = np.concatenate(([0], np.cumsum(doc_lens)))[:-1]
    tf_base = np.concatenate(([0], np.cumsum(tf_lens)))[:-1]
    doc_off = np.concatenate(
        [np.asarray(a, dtype=np.int64) + doc_base[i] for i, a in enumerate(g["block_doc_off"])]
    )
    tf_off = np.concatenate(
        [np.asarray(a, dtype=np.int64) + tf_base[i] for i, a in enumerate(g["block_tf_off"])]
    )
    max_tf = np.concatenate([np.asarray(a, dtype=np.int32) for a in g["block_max_tf"]])
    min_dl = np.concatenate([np.asarray(a, dtype=np.int32) for a in g["block_min_dl"]])

    nb = len(counts)
    total = int(counts.sum())
    if total <= cap or nb <= 1:
        slices = [(0, nb)]
    else:
        cum = np.cumsum(counts)
        slices, start, acc0 = [], 0, 0
        for i, c in enumerate(cum):
            if c - acc0 >= cap:
                slices.append((start, i + 1))
                start, acc0 = i + 1, int(c)
        if start < nb:
            slices.append((start, nb))

    all_doc = b"".join(doc_bytes)
    all_tf = b"".join(tf_bytes)
    dmv, tmv = memoryview(all_doc), memoryview(all_tf)
    doc_end = np.concatenate((doc_off[1:], [len(all_doc)]))
    tf_end = np.concatenate((tf_off[1:], [len(all_tf)]))
    out = []
    for si, (b0, b1) in enumerate(slices):
        if b0 >= b1:
            continue
        d_lo, d_hi = int(doc_off[b0]), int(doc_end[b1 - 1])
        t_lo, t_hi = int(tf_off[b0]), int(tf_end[b1 - 1])
        out.append(
            {
                "term_bucket": term_bucket,
                "term": term,
                "chunk_id": chunk_id,
                "slice": si,
                "df": int(counts[b0:b1].sum()),
                "doc_bytes": bytes(dmv[d_lo:d_hi]),
                "tf_bytes": bytes(tmv[t_lo:t_hi]),
                "block_first": firsts[b0:b1],
                "block_last": lasts[b0:b1],
                "block_count": counts[b0:b1].astype(np.int32),
                "block_doc_off": doc_off[b0:b1] - d_lo,
                "block_tf_off": tf_off[b0:b1] - t_lo,
                "block_max_tf": max_tf[b0:b1],
                "block_min_dl": min_dl[b0:b1],
            }
        )
    return out


def _merge_batch(pdf: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Merge every complete (term, chunk_id) group inside one pandas
    batch (input sorted by term, chunk_id, seg_group)."""
    terms = pdf["term"].to_numpy()
    chunks = pdf["chunk_id"].to_numpy()
    n = len(pdf)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (terms[1:] != terms[:-1]) | (chunks[1:] != chunks[:-1])
    starts = np.nonzero(change)[0]
    ends = np.concatenate((starts[1:], [n]))
    cols = {c: pdf[c].to_numpy() for c in _MERGE_IN_COLS}
    rows: list[dict] = []
    for s, e in zip(starts, ends):
        g = {c: list(cols[c][s:e]) for c in (
            "doc_bytes", "tf_bytes", "block_first", "block_last",
            "block_count", "block_doc_off", "block_tf_off",
            "block_max_tf", "block_min_dl",
        )}
        rows.extend(
            _merge_group(
                g, str(terms[s]), int(chunks[s]), int(cols["term_bucket"][s]), cap
            )
        )
    return pd.DataFrame(rows)


def _merge_iter_factory(config: EngineConfig):
    cap = config.max_row_postings

    def merge_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the (possibly incomplete) final group
            last_term = pdf["term"].iloc[-1]
            last_chunk = pdf["chunk_id"].iloc[-1]
            in_last = (
                (pdf["term"].to_numpy() == last_term)
                & (pdf["chunk_id"].to_numpy() == last_chunk)
            )
            # groups are contiguous (sorted), so in_last is a suffix
            split = int(np.argmax(in_last)) if in_last.any() else len(pdf)
            head, carry = pdf.iloc[:split], pdf.iloc[split:]
            if len(head):
                yield _merge_batch(head, cap)
        if carry is not None and len(carry):
            yield _merge_batch(carry, cap)

    return merge_iter


def _merge_norms_kernel(config: EngineConfig):
    dpc = config.docs_per_chunk

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (chunk_id,) = key
        base = int(chunk_id) * dpc
        pdf = pdf.sort_values("base_doc", kind="stable")
        hi = int((pdf["base_doc"] + pdf["n_slots"]).max())
        arr = np.zeros(max(hi - base, 0), dtype=np.int32)
        for b, n, raw in zip(pdf["base_doc"], pdf["n_slots"], pdf["dl_bytes"]):
            if n:
                arr[int(b) - base : int(b) - base + int(n)] = np.frombuffer(
                    raw, dtype=np.int32
                )
        return pd.DataFrame(
            {
                "chunk_id": [int(chunk_id)],
                "base_doc": [base],
                "n_slots": [len(arr)],
                "dl_bytes": [arr.tobytes()],
            }
        )

    return kernel


def merge_segments(
    spark: SparkSession, store: IndexStore, config: EngineConfig = DEFAULT_CONFIG
) -> dict:
    """Merge the build layer into the global query index + dictionary +
    stats. Returns the merge report (also persisted in stats.json)."""
    segs = store.read_build_postings(spark)
    spc = config.segments_per_chunk

    pre = (
        segs.withColumn("chunk_id", (F.col("seg_group") / spc).cast("long"))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), config.term_buckets))
        .select(_MERGE_IN_COLS)
    )
    merged = (
        pre.repartition("term", "chunk_id")
        .sortWithinPartitions("term", "chunk_id", "seg_group")
        .mapInPandas(_merge_iter_factory(config), schema=POSTINGS_SCHEMA)
    )
    (
        merged.repartition("term_bucket")
        .sortWithinPartitions("term", "chunk_id", "slice")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(store.postings_path)
    )

    # global dictionary: two-stage exact df aggregation from partials
    dictionary = segs.groupBy("term").agg(F.sum("df").alias("df"))
    dictionary.repartition(1).sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(store.dictionary_path)

    # chunk norms
    norms = store.read_build_norms(spark)
    (
        norms.withColumn("chunk_id", (F.col("seg_group") / spc).cast("long"))
        .groupBy("chunk_id")
        .applyInPandas(
            _merge_norms_kernel(config),
            schema="chunk_id long, base_doc long, n_slots int, dl_bytes binary",
        )
        .write.mode("overwrite")
        .parquet(store.norms_path)
    )

    # corpus stats from manifest partials (additive — the reference's
    # "refine, don't retrain" analog) + skew report
    man = store.read_manifest(spark)
    agg = man.agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("sum_dl").alias("sum_dl"),
        F.sum("n_postings").alias("n_postings"),
        F.sum("postings_bytes").alias("postings_bytes"),
        F.count("*").alias("n_segments"),
    ).collect()[0]
    skew = (
        spark.read.parquet(store.dictionary_path)
        .agg(
            F.max("df").alias("max_df"),
            F.avg("df").alias("mean_df"),
            F.count("*").alias("n_terms"),
        )
        .collect()[0]
    )
    n_docs = int(agg["n_docs"] or 0)
    stats = {
        "n_docs": n_docs,
        "sum_dl": int(agg["sum_dl"] or 0),
        "avgdl": (int(agg["sum_dl"] or 0) / n_docs) if n_docs else 0.0,
        "n_postings": int(agg["n_postings"] or 0),
        "postings_bytes": int(agg["postings_bytes"] or 0),
        "n_segments": int(agg["n_segments"]),
        "n_terms": int(skew["n_terms"] or 0),
        "max_df": int(skew["max_df"] or 0),
        "term_skew_ratio": (
            float(skew["max_df"]) / float(skew["mean_df"])
            if skew["mean_df"]
            else 1.0
        ),
    }
    store.write_stats(stats, config)
    return stats
