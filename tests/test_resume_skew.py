"""Resume-from-checkpoint + skew handling (FIXTURES.md §6; north_rule:
resumable from per-partition checkpoints, skew handled explicitly).

Reference analogs: restart-upgrade suite (qa/restart-upgrade/.../
IndexingIT.java:46-358 — an index built by an interrupted/old process
must answer identically) and checksum footers
(JVectorReader.checkIntegrity:84-96)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.config import TEST_CONFIG
from opensearch_jvector_spark.operators.bruteforce import bm25_topk_bruteforce
from opensearch_jvector_spark.operators.docid import assign_doc_ids
from opensearch_jvector_spark.operators.segment_build import build_index
from opensearch_jvector_spark.operators.wand import bm25_topk
from opensearch_jvector_spark.sources.transcripts import transcripts


@pytest.fixture(scope="module")
def corpus(spark):
    t = transcripts(spark, n_convs=64, turns_per_conv=8, vocab_size=300)
    docs = assign_doc_ids(t).select("doc_id", "text").cache()
    docs.count()
    return docs


def _manifest_checksums(spark, store):
    return {
        r["seg_group"]: r["checksum"]
        for r in store.read_manifest(spark).collect()
    }


def test_resume_produces_identical_index(spark, corpus, tmp_path):
    # uninterrupted build
    full = build_index(spark, corpus, str(tmp_path / "full"), TEST_CONFIG, waves=4)
    # interrupted build: crash after wave 1, then resume
    broken_root = str(tmp_path / "broken")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, corpus, broken_root, TEST_CONFIG, waves=4, fail_after_wave=1
        )
    resumed = build_index(spark, corpus, broken_root, TEST_CONFIG, waves=4)
    # identical segment checksums (content-identical index)
    a = _manifest_checksums(spark, full)
    b = _manifest_checksums(spark, resumed)
    assert a == b and len(a) == 16  # 512 docs / 32 per segment
    # resume skipped completed segments: wave 0+1 manifests predate resume
    waves = {
        r["lineage"] for r in resumed.read_manifest(spark).collect()
    }
    assert any("wave=0" in w for w in waves) and any("wave=2" in w for w in waves)
    # identical query answers
    ga = bm25_topk(spark, full, ["w00001", "w00002"], 10).collect()
    gb = bm25_topk(spark, resumed, ["w00001", "w00002"], 10).collect()
    assert [(r["doc_id"], r["score"]) for r in ga] == [
        (r["doc_id"], r["score"]) for r in gb
    ]
    sa, _ = full.read_stats()
    sb, _ = resumed.read_stats()
    # wall-clock stage timings are lineage metadata, not index identity
    sa.pop("merge_timings", None)
    sb.pop("merge_timings", None)
    assert sa == sb


def test_skewed_terms_bounded_and_correct(spark, tmp_path):
    """Hot stopword terms (df > 90% of docs) must (a) still score
    rank-identically, (b) fan out across chunks so no merged row
    exceeds the salting cap, (c) be visible in the skew metrics."""
    t = transcripts(
        spark, n_convs=60, turns_per_conv=8, vocab_size=200,
        hot_terms=3, hot_prob=0.95,
    )
    docs = assign_doc_ids(t).select("doc_id", "text").cache()
    docs.count()
    store = build_index(spark, docs, str(tmp_path / "skew"), TEST_CONFIG)
    # (a) correctness on a stopword-heavy query
    got = bm25_topk(spark, store, ["hot0", "hot1"], 10).collect()
    exp = bm25_topk_bruteforce(docs, ["hot0", "hot1"], 10).collect()
    assert sorted(((r["doc_id"], round(r["score"], 9)) for r in got),
                  key=lambda x: (-x[1], x[0])) == sorted(
        ((r["doc_id"], round(r["score"], 9)) for r in exp),
        key=lambda x: (-x[1], x[0]))
    # (b) hot term fans out across chunks; rows bounded by the cap
    rows = (
        store.read_postings(spark)
        .filter(F.col("term") == "hot0")
        .select("chunk_id", "df")
        .collect()
    )
    assert len({r["chunk_id"] for r in rows}) > 1
    assert all(r["df"] <= TEST_CONFIG.max_row_postings for r in rows)
    # (c) skew metrics logged
    stats, _ = store.read_stats()
    assert stats["term_skew_ratio"] > 10
    docs.unpersist()
