"""End-to-end engine tests: build -> merge -> query, rank-identical vs
the brute-force oracle (the reference's correctness contract:
KNNJVectorTests.java:510-562 — randomized corpus vs ground truth;
:593-670 — ordering invariant across merges)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.config import TEST_CONFIG
from opensearch_jvector_spark.operators.bruteforce import bm25_topk_bruteforce
from opensearch_jvector_spark.operators.docid import assign_doc_ids
from opensearch_jvector_spark.operators.segment_build import build_index
from opensearch_jvector_spark.operators.wand import (
    bm25_radial,
    bm25_topk,
    bm25_topk_batch,
)
from opensearch_jvector_spark.plans.query import Query
from opensearch_jvector_spark.sources.transcripts import query_set, transcripts


def canonical(rows):
    """(doc_id, score) ranking robust to sub-ulp summation-order diffs:
    re-rank by (round(score, 9) desc, doc_id asc)."""
    return sorted(((r["doc_id"], round(r["score"], 9)) for r in rows),
                  key=lambda x: (-x[1], x[0]))


@pytest.fixture(scope="module")
def doc_index(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    root = str(tmp_path_factory.mktemp("idx_docs"))
    store = build_index(spark, docs.select("doc_id", "text"), root, TEST_CONFIG)
    return docs, store


@pytest.fixture(scope="module")
def transcript_index(spark, tmp_path_factory):
    t = transcripts(spark, n_convs=100, turns_per_conv=8, vocab_size=500)
    docs = assign_doc_ids(t).select("doc_id", "text").cache()
    docs.count()
    root = str(tmp_path_factory.mktemp("idx_tr"))
    store = build_index(spark, docs, root, TEST_CONFIG)
    return docs, store


@pytest.mark.parametrize(
    "terms,k",
    [(["spark"], 5), (["merge", "join"], 10), (["the"], 7),
     (["spark", "zzznohit"], 5), (["window", "batch", "stream"], 12)],
)
def test_topk_matches_oracle_documents(spark, doc_index, terms, k):
    docs, store = doc_index
    got = bm25_topk(spark, store, terms, k).collect()
    exp = bm25_topk_bruteforce(docs, terms, k).collect()
    assert canonical(got) == canonical(exp)
    gs = {r["doc_id"]: r["score"] for r in got}
    for r in exp:
        assert gs[r["doc_id"]] == pytest.approx(r["score"], abs=1e-9)


def test_batch_queries_match_oracle_transcripts(spark, transcript_index):
    docs, store = transcript_index
    qs = []
    for spec in query_set(30, vocab_size=500, k=8):
        qs.append(Query(spec["query_id"], tuple(spec["terms"]), spec["k"]))
    got = bm25_topk_batch(spark, store, qs).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    n_nonempty = 0
    for q in qs:
        exp = bm25_topk_bruteforce(docs, list(q.terms), q.k).collect()
        g = by_q.get(q.query_id, [])
        assert canonical(g) == canonical(exp), q
        if exp:
            n_nonempty += 1
    assert n_nonempty >= 20  # the fixture actually exercises matches


def test_filtered_search_matches_oracle(spark, transcript_index):
    docs, store = transcript_index
    # filter to doc_id % 3 == 0 (arbitrary pushed-down predicate)
    allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    terms = ["w00001", "w00004"]
    got = bm25_topk(spark, store, terms, 10, filter_docs=allowed).collect()
    exp = bm25_topk_bruteforce(
        docs, terms, 10, filter_cond=F.col("doc_id") % 3 == 0
    ).collect()
    assert canonical(got) == canonical(exp)
    assert all(r["doc_id"] % 3 == 0 for r in got)


def test_radial_matches_oracle(spark, transcript_index):
    docs, store = transcript_index
    terms = ["w00002", "w00010"]
    full = {
        r["doc_id"]: r["score"]
        for r in bm25_topk_bruteforce(docs, terms, 10**6).collect()
    }
    if not full:
        pytest.skip("no hits for radial fixture")
    thresh = float(np.median(list(full.values())))
    got = bm25_radial(spark, store, terms, thresh).collect()
    exp = {d: s for d, s in full.items() if s >= thresh}
    assert {r["doc_id"] for r in got} == set(exp)
    for r in got:
        assert r["score"] == pytest.approx(exp[r["doc_id"]], abs=1e-9)


def test_zero_hit_and_validation(spark, doc_index):
    _, store = doc_index
    assert bm25_topk(spark, store, ["zzznohit"], 5).count() == 0
    with pytest.raises(ValueError):
        Query("bad", ())
    with pytest.raises(ValueError):
        Query("bad", ("a",), k=None, min_score=None)
    with pytest.raises(ValueError):
        Query("bad", ("a",), k=5, min_score=1.0)


def test_manifest_metrics(spark, transcript_index):
    """FIXTURES.md §6 metrics fixture: every manifest row carries
    positive build metrics (reference: KNNCounter.java:30-37)."""
    _, store = transcript_index
    man = store.read_manifest(spark).collect()
    assert len(man) > 1  # multiple segments
    for r in man:
        assert r["terms_per_sec"] > 0
        assert r["postings_bytes"] > 0
        assert r["skew_ratio"] >= 1.0
        assert len(r["checksum"]) == 64
    stats, cfg = store.read_stats()
    assert stats["n_docs"] == 800
    assert stats["term_skew_ratio"] >= 1.0
