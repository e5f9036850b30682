"""Standalone integrity verification (S6) — reference analog:
JVectorReader.checkIntegrity re-checksums every file at open
(JVectorReader.java:84-96)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.config import EngineConfig
from opensearch_jvector_spark.operators.docid import assign_doc_ids
from opensearch_jvector_spark.operators.integrity import verify_index
from opensearch_jvector_spark.operators.segment_build import build_index
from opensearch_jvector_spark.sources.index_store import IndexStore
from opensearch_jvector_spark.sources.transcripts import transcripts

CFG = EngineConfig(
    block_size=4,
    docs_per_segment=32,
    segments_per_chunk=2,
    term_buckets=4,
    max_row_postings=64,
)


def _build(spark, tmp_path, layout="grouped"):
    docs = assign_doc_ids(transcripts(spark, 24, 5, seed=2, vocab_size=200)).select(
        "doc_id", "text"
    )
    root = str(tmp_path / f"idx_{layout}")
    build_index(spark, docs, root, CFG, layout=layout)
    return IndexStore(root)


def test_verify_clean_index_both_layouts(spark, tmp_path):
    for layout in ("grouped", "ranged"):
        store = _build(spark, tmp_path, layout)
        report = verify_index(spark, store)
        assert report["ok"], report
        assert report["checked_segments"] > 0
        assert report["checksum_mismatches"] == 0
        assert report["df_mismatched_chunks"] == 0


def test_verify_after_append_and_compact(spark, tmp_path):
    from opensearch_jvector_spark.operators.delete import (
        compact_deletes,
        delete_docs,
    )
    from opensearch_jvector_spark.streaming.incremental import append_index

    docs_raw = transcripts(spark, 24, 5, seed=2, vocab_size=200)
    docs = assign_doc_ids(docs_raw).select("doc_id", "text")
    root = str(tmp_path / "idx")
    build_index(spark, docs, root, CFG)
    store = IndexStore(root)
    append_index(
        spark, store, transcripts(spark, 7, 5, seed=9, vocab_size=200),
        batch_tag="a1",
    )
    assert verify_index(spark, store)["ok"]

    delete_docs(spark, store, [0, 1, 40], batch_tag="d")
    stats, _ = store.read_stats()
    base = int(stats["n_chunks"]) * CFG.docs_per_chunk  # not used; clarity
    full_docs = docs.unionByName(
        assign_doc_ids(transcripts(spark, 7, 5, seed=9, vocab_size=200))
        .select(
            (F.col("doc_id") + (24 * 5 + CFG.docs_per_chunk - 1)
             // CFG.docs_per_chunk * CFG.docs_per_chunk).alias("doc_id"),
            "text",
        )
    )
    compact_deletes(spark, store, full_docs)
    # overridden chunks are excluded from V2 by design; V1/V3 still hold
    report = verify_index(spark, store)
    assert report["ok"], report


def test_verify_detects_corruption(spark, tmp_path):
    store = _build(spark, tmp_path)
    # flip bytes in one build posting file
    files = sorted(
        glob.glob(
            os.path.join(store.build_path, "wave=*", "kind=postings", "*.parquet")
        )
    )
    assert files
    with open(files[0], "r+b") as f:
        f.seek(200)
        f.write(b"\x00" * 8)
    with pytest.raises(Exception):
        # either the parquet read fails (page checksum) or our digest
        # check flags the segment — both are detection
        report = verify_index(spark, store, strict=True)
        assert not report["ok"]
