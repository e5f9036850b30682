"""Ranged (shuffle-free) build layout: query results must be identical
to the grouped layout and the brute-force oracle, for any input
partitioning — slices are stitched by (seg_group, sub=first_doc) and
posting blocks are self-contained."""

from __future__ import annotations

import pytest

from opensearch_jvector_spark.config import EngineConfig
from opensearch_jvector_spark.operators.bruteforce import bm25_topk_bruteforce
from opensearch_jvector_spark.operators.docid import assign_doc_ids
from opensearch_jvector_spark.operators.segment_build import build_index
from opensearch_jvector_spark.operators.wand import bm25_topk
from opensearch_jvector_spark.sources.transcripts import transcripts

CFG = EngineConfig(
    block_size=4,
    docs_per_segment=32,
    segments_per_chunk=2,
    term_buckets=4,
    max_row_postings=64,
)

TERMS = [["w00000"], ["w00001", "w00007"], ["w00003", "w00011", "w00042"]]


@pytest.fixture(scope="module")
def docs(spark):
    raw = transcripts(spark, 40, 5, seed=3, vocab_size=400)
    d = assign_doc_ids(raw).select("doc_id", "text").cache()
    d.count()
    return d


def _topk(spark, store, terms, k=12):
    return [
        (r.doc_id, round(r.score, 6))
        for r in bm25_topk(spark, store, terms, k).collect()
    ]


def test_ranged_equals_grouped_and_oracle(spark, tmp_path, docs):
    g = build_index(spark, docs, str(tmp_path / "g"), CFG, layout="grouped")
    r = build_index(spark, docs, str(tmp_path / "r"), CFG, layout="ranged")
    for terms in TERMS:
        exp = [
            (row.doc_id, round(row.score, 6))
            for row in bm25_topk_bruteforce(docs, terms, 12).collect()
        ]
        assert _topk(spark, g, terms) == exp
        assert _topk(spark, r, terms) == exp


def test_ranged_handles_arbitrary_partitioning(spark, tmp_path, docs):
    """Even adversarial (hash) partitioning — slices of one segment
    arriving from many partitions in any order — must produce correct
    results, because blocks are self-contained and (term, doc) pairs
    are unique across slices."""
    shuffled = docs.repartition(7)  # round-robin: doc ranges interleaved
    store = build_index(
        spark, shuffled, str(tmp_path / "s"), CFG, layout="ranged"
    )
    for terms in TERMS:
        exp = [
            (row.doc_id, round(row.score, 6))
            for row in bm25_topk_bruteforce(docs, terms, 12).collect()
        ]
        assert _topk(spark, store, terms) == exp


def test_ranged_stats_match_grouped(spark, tmp_path, docs):
    g = build_index(spark, docs, str(tmp_path / "g2"), CFG, layout="grouped")
    r = build_index(spark, docs, str(tmp_path / "r2"), CFG, layout="ranged")
    sg, _ = g.read_stats()
    sr, _ = r.read_stats()
    for key in ("n_docs", "sum_dl", "avgdl", "n_postings", "n_terms", "max_df"):
        assert sg[key] == sr[key], key


def test_ranged_resume_after_crash(spark, tmp_path, docs):
    """Wave-checkpointed resume works for the ranged layout too: crash
    after wave 0, resume, and the final index answers identically to an
    uninterrupted build (reference analog: restart-upgrade suites)."""
    root = str(tmp_path / "rr")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, docs, root, CFG, waves=3, layout="ranged",
            fail_after_wave=0,
        )
    store = build_index(spark, docs, root, CFG, waves=3, layout="ranged")
    clean = build_index(
        spark, docs, str(tmp_path / "rc"), CFG, waves=3, layout="ranged"
    )
    for terms in TERMS:
        assert _topk(spark, store, terms) == _topk(spark, clean, terms)
    sg, _ = store.read_stats()
    sc, _ = clean.read_stats()
    assert sg["n_docs"] == sc["n_docs"] and sg["n_postings"] == sc["n_postings"]
