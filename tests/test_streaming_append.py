"""Incremental index maintenance tests — batch append + Structured
Streaming foreachBatch sink.

Reference analog: incremental merge correctness (KNNJVectorTests
multi-segment + merge ordering suites, :250,593-670) and the
restart-upgrade idempotence suites (qa/restart-upgrade). The invariant
throughout: after ANY sequence of appends, a top-k query over the index
is rank- and score-identical to brute-force BM25 over the union corpus
with the same doc_ids.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.config import EngineConfig
from opensearch_jvector_spark.operators.bruteforce import bm25_topk_bruteforce
from opensearch_jvector_spark.operators.docid import assign_doc_ids
from opensearch_jvector_spark.operators.segment_build import build_index
from opensearch_jvector_spark.operators.wand import bm25_topk
from opensearch_jvector_spark.sources.transcripts import transcripts
from opensearch_jvector_spark.streaming.incremental import (
    append_index,
    stream_append,
)

CFG = EngineConfig(
    block_size=4,
    docs_per_segment=32,
    segments_per_chunk=2,
    term_buckets=4,
    max_row_postings=64,
)

TERMS = ["w00000", "w00003", "w00017"]


def _batch(spark, n_convs, seed):
    return transcripts(spark, n_convs, 5, seed=seed, vocab_size=300)


def _check_vs_bruteforce(spark, store, combined_docs, k=12):
    got = [
        (r.doc_id, round(r.score, 6))
        for r in bm25_topk(spark, store, TERMS, k).collect()
    ]
    exp = [
        (r.doc_id, round(r.score, 6))
        for r in bm25_topk_bruteforce(combined_docs, TERMS, k).collect()
    ]
    assert got == exp


def test_append_then_query_matches_bruteforce(spark, tmp_path):
    root = str(tmp_path / "idx")
    base_raw = _batch(spark, 30, seed=1)
    base = assign_doc_ids(base_raw).select("doc_id", "text")
    build_index(spark, base, root, CFG)

    from opensearch_jvector_spark.sources.index_store import IndexStore

    store = IndexStore(root)
    add_raw = _batch(spark, 11, seed=2)
    stats = append_index(spark, store, add_raw, batch_tag="b1")
    assert stats["n_docs"] == 30 * 5 + 11 * 5

    # expected corpus: appended docs start at the next chunk boundary
    n_base_chunks = -(-30 * 5 // CFG.docs_per_chunk)
    base2 = n_base_chunks * CFG.docs_per_chunk
    add = assign_doc_ids(add_raw).select(
        (F.col("doc_id") + base2).alias("doc_id"), "text"
    )
    combined = base.unionByName(add)
    _check_vs_bruteforce(spark, store, combined)

    # second append stacks on the first
    add2_raw = _batch(spark, 7, seed=3)
    stats = append_index(spark, store, add2_raw, batch_tag="b2")
    assert stats["n_docs"] == (30 + 11 + 7) * 5
    base3 = stats["n_chunks"] * CFG.docs_per_chunk  # watermark AFTER b2
    n_chunks_after_b1 = -(-int(
        (base2 + 11 * 5)
    ) // CFG.docs_per_chunk)
    add2 = assign_doc_ids(add2_raw).select(
        (F.col("doc_id") + n_chunks_after_b1 * CFG.docs_per_chunk).alias("doc_id"),
        "text",
    )
    combined = combined.unionByName(add2)
    _check_vs_bruteforce(spark, store, combined)


def test_append_is_idempotent_per_batch_tag(spark, tmp_path):
    root = str(tmp_path / "idx")
    base = assign_doc_ids(_batch(spark, 20, seed=1)).select("doc_id", "text")
    build_index(spark, base, root, CFG)
    from opensearch_jvector_spark.sources.index_store import IndexStore

    store = IndexStore(root)
    add_raw = _batch(spark, 6, seed=5)
    s1 = append_index(spark, store, add_raw, batch_tag="replay-me")
    r1 = [tuple(r) for r in bm25_topk(spark, store, TERMS, 10).collect()]
    # replay the exact same batch tag -> no-op
    s2 = append_index(spark, store, add_raw, batch_tag="replay-me")
    r2 = [tuple(r) for r in bm25_topk(spark, store, TERMS, 10).collect()]
    assert s1["n_docs"] == s2["n_docs"]
    assert s1["n_chunks"] == s2["n_chunks"]
    assert r1 == r2
    assert "replay-me" in s2["applied_batches"]


def _no_duplicate_posting_rows(spark, store):
    """(term, chunk_id, slice) must be unique across the visible index —
    the invariant a replayed half-committed append used to break."""
    dup = (
        store.read_postings(spark)
        .groupBy("term", "chunk_id", "slice")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def _expected_after_append(spark, base, add_raw, n_base_docs):
    n_chunks = -(-n_base_docs // CFG.docs_per_chunk)
    add = assign_doc_ids(add_raw).select(
        (F.col("doc_id") + n_chunks * CFG.docs_per_chunk).alias("doc_id"),
        "text",
    )
    return base.unionByName(add)


def test_crash_between_wave_and_delta_publish(spark, tmp_path):
    """Crash window 1: the build wave committed but no delta/dictionary/
    stats. The replay must recover the orphan wave, not rebuild it, and
    produce exactly one copy of every (term, chunk) row."""
    from opensearch_jvector_spark.sources.index_store import IndexStore
    from opensearch_jvector_spark.streaming import incremental as inc

    root = str(tmp_path / "idx")
    base = assign_doc_ids(_batch(spark, 20, seed=1)).select("doc_id", "text")
    build_index(spark, base, root, CFG)
    store = IndexStore(root)
    add_raw = _batch(spark, 6, seed=7)

    # front half of append_index only: wave write, then "crash"
    stats, config = store.read_stats()
    watermark = int(stats["n_chunks"])
    docs = assign_doc_ids(add_raw).select(
        (F.col("doc_id") + watermark * CFG.docs_per_chunk).alias("doc_id"),
        "text",
    )
    wave = inc._existing_waves(store)
    out = __import__(
        "opensearch_jvector_spark.operators.segment_build",
        fromlist=["build_segments_df"],
    ).build_segments_df(docs, config, lineage=f"crashy/wave={wave}")
    store.write_build_wave(out, wave=wave)

    # replay with the SAME tag -> recovery commits the orphan and stops
    s = append_index(spark, store, add_raw, batch_tag="crashy")
    assert s["n_docs"] == (20 + 6) * 5
    assert "crashy" in s["applied_batches"]
    _no_duplicate_posting_rows(spark, store)
    _check_vs_bruteforce(
        spark, store, _expected_after_append(spark, base, add_raw, 20 * 5)
    )


def test_crash_between_delta_publish_and_stats(spark, tmp_path):
    """Crash window 2 (the ADVICE finding): delta published and
    dictionary written, but stats.json never swapped. The pre-delta
    design re-appended the merged rows into the live dir on replay,
    double-scoring those chunks; the snapshot design re-links the SAME
    delta idempotently."""
    from opensearch_jvector_spark.sources.index_store import IndexStore
    from opensearch_jvector_spark.streaming import incremental as inc

    root = str(tmp_path / "idx")
    base = assign_doc_ids(_batch(spark, 20, seed=1)).select("doc_id", "text")
    build_index(spark, base, root, CFG)
    store = IndexStore(root)
    add_raw = _batch(spark, 6, seed=9)

    stats, config = store.read_stats()
    watermark = int(stats["n_chunks"])
    docs = assign_doc_ids(add_raw).select(
        (F.col("doc_id") + watermark * CFG.docs_per_chunk).alias("doc_id"),
        "text",
    )
    wave = inc._existing_waves(store)
    from opensearch_jvector_spark.operators.segment_build import (
        build_segments_df,
    )

    out = build_segments_df(docs, config, lineage=f"crashy2/wave={wave}")
    store.write_build_wave(out, wave=wave)
    _, max_chunk, waves = inc._orphan_lineages(spark, store, config, watermark)
    name = inc._delta_name(watermark, max_chunk)
    inc._publish_delta(spark, store, config, watermark, name, waves)
    inc._merge_dictionary(
        spark, store, stats, config, watermark, covers=name, waves=waves
    )
    pre_crash_seq = store._dict_versions()[-1][0]
    # "crash" here: stats.json still references the pre-append snapshot

    s = append_index(spark, store, add_raw, batch_tag="crashy2")
    assert s["n_docs"] == (20 + 6) * 5
    # recovery reused the published delta + dictionary version verbatim
    # (no new version was computed — the covers tag matched)
    assert store._dict_versions()[-1][0] == pre_crash_seq
    assert s["dict_version"] == pre_crash_seq
    assert s["deltas"].count(name) == 1
    _no_duplicate_posting_rows(spark, store)
    _check_vs_bruteforce(
        spark, store, _expected_after_append(spark, base, add_raw, 20 * 5)
    )


def test_append_reads_only_new_waves(spark, tmp_path):
    """The append's merge + dictionary jobs must not read historical
    build postings: physically remove every pre-append wave's postings
    and norms files — only manifests stay — and append anyway."""
    import shutil

    from opensearch_jvector_spark.sources.index_store import IndexStore

    root = str(tmp_path / "idx")
    base = assign_doc_ids(_batch(spark, 20, seed=1)).select("doc_id", "text")
    build_index(spark, base, root, CFG)
    store = IndexStore(root)
    for d in os.listdir(store.build_path):
        if d.startswith("wave="):
            for kind in ("kind=postings", "kind=norms"):
                shutil.rmtree(
                    os.path.join(store.build_path, d, kind), ignore_errors=True
                )

    add_raw = _batch(spark, 6, seed=13)
    s = append_index(spark, store, add_raw, batch_tag="pruned")
    assert s["n_docs"] == (20 + 6) * 5
    _check_vs_bruteforce(
        spark, store, _expected_after_append(spark, base, add_raw, 20 * 5)
    )


def test_fold_deltas_force_merge(spark, tmp_path):
    """Force-merge analog (M6): after several appends (and a delete),
    fold_deltas collapses base + deltas into one layer; queries,
    integrity and FURTHER appends are unaffected."""
    from opensearch_jvector_spark.operators.delete import delete_docs
    from opensearch_jvector_spark.operators.integrity import verify_index
    from opensearch_jvector_spark.operators.merge import fold_deltas
    from opensearch_jvector_spark.sources.index_store import IndexStore

    root = str(tmp_path / "idx")
    base = assign_doc_ids(_batch(spark, 20, seed=1)).select("doc_id", "text")
    build_index(spark, base, root, CFG)
    store = IndexStore(root)
    a1, a2 = _batch(spark, 6, seed=21), _batch(spark, 5, seed=22)
    append_index(spark, store, a1, batch_tag="f1")
    append_index(spark, store, a2, batch_tag="f2")
    delete_docs(spark, store, [2, 3], batch_tag="fd")

    before = [tuple(r) for r in bm25_topk(spark, store, TERMS, 10).collect()]
    stats = fold_deltas(spark, store)
    assert stats["base_retired"] and len(stats["deltas"]) == 1
    assert not os.path.exists(store.postings_path)
    after = [tuple(r) for r in bm25_topk(spark, store, TERMS, 10).collect()]
    assert after == before
    assert verify_index(spark, store)["ok"]
    # folding is idempotent / cheap no-op when already folded
    stats2 = fold_deltas(spark, store)
    assert stats2["deltas"] == stats["deltas"]

    # appends keep working on the folded store
    s3 = append_index(spark, store, _batch(spark, 4, seed=23), batch_tag="f3")
    assert s3["n_docs"] == (20 + 6 + 5 + 4) * 5
    assert len(s3["deltas"]) == 2
    got = bm25_topk(spark, store, TERMS, 10).collect()
    assert len(got) == 10
    assert verify_index(spark, store)["ok"]


def test_stream_append_foreachbatch(spark, tmp_path):
    """Structured Streaming file source -> foreachBatch incremental
    appends; final index answers match brute force over everything."""
    root = str(tmp_path / "idx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    base_raw = _batch(spark, 25, seed=1)
    base = assign_doc_ids(base_raw).select("doc_id", "text")
    build_index(spark, base, root, CFG)
    from opensearch_jvector_spark.sources.index_store import IndexStore

    store = IndexStore(root)

    s1_raw = _batch(spark, 8, seed=11)
    # one part file => exactly one micro-batch (each micro-batch is
    # chunk-aligned, so the expected-corpus reconstruction below needs
    # to know the batch boundaries)
    s1_raw.coalesce(1).write.parquet(os.path.join(src, "f1"))

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream_append(spark, store, stream, ckpt)
    q.awaitTermination(300)

    stats, _ = store.read_stats()
    assert stats["n_docs"] == (25 + 8) * 5
    assert any(t.startswith("stream-") for t in stats["applied_batches"])

    n_base_chunks = -(-25 * 5 // CFG.docs_per_chunk)
    s1 = assign_doc_ids(s1_raw).select(
        (F.col("doc_id") + n_base_chunks * CFG.docs_per_chunk).alias("doc_id"),
        "text",
    )
    _check_vs_bruteforce(spark, store, base.unionByName(s1))
