"""Nested (parent-child) vector search: best-child parent ranking,
expand-nested sibling scoring, IVF-backed variant, pushable sibling
ranges.

Reference anchors: nested knn = per-parent best child
(InternalNestedKnnVectorQuery.java); expand_nested_docs = exact-score
all siblings of the top-k parents (ExpandNestedDocsQuery.java:40-47);
contiguous child layout = Lucene block-join invariant
(ParentChildHelper.java).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.operators.nested import (
    ivf_query_nested,
    nested_expand,
    nested_topk,
    sibling_range_pred,
)
from opensearch_jvector_spark.operators.similarity import ivf_build

SF01 = "/root/testdata/sf0.01/embeddings.parquet"
CPP = 5  # 500 vectors -> 100 parents


def _emb(spark):
    return spark.read.parquet(SF01)


def _qvec(spark, vid=0):
    row = _emb(spark).filter(F.col("vec_id") == vid).first()
    return [float(x) for x in row["embedding"]]


def _np_nested(spark, qvec, k, cpp=CPP, allow=None):
    """Pure-numpy oracle: per-parent best cosine child, top-k parents."""
    pdf = _emb(spark).toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    M = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(
        np.float64
    )
    q = np.asarray(qvec, dtype=np.float64)
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    if allow is not None:
        keep = np.isin(ids, list(allow))
        ids, cos = ids[keep], cos[keep]
    best: dict[int, tuple[float, int]] = {}
    for i, c in zip(ids, cos):
        p = int(i) // cpp
        cur = best.get(p)
        # highest score, tie -> lowest vec_id
        if cur is None or (-c, i) < (-cur[0], cur[1]):
            best[p] = (float(c), int(i))
    order = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return [
        (p, vid, round(c, 6), r + 1)
        for r, (p, (c, vid)) in enumerate(order)
    ]


def test_nested_topk_matches_numpy_oracle(spark):
    q = _qvec(spark)
    got = [
        (r.parent_id, r.vec_id, round(r.cos, 6), r.rank)
        for r in nested_topk(
            _emb(spark), q, k=10, children_per_parent=CPP,
            score_name="cos",
        ).collect()
    ]
    assert got == _np_nested(spark, q, 10)
    # the query's own parent must win with cos 1.0 on its own vector
    assert got[0][0] == 0 and got[0][1] == 0 and got[0][2] == 1.0


def test_nested_topk_filtered(spark):
    """acceptDocs on children: masking the best child promotes the
    parent's next child (or drops the parent)."""
    q = _qvec(spark)
    allow = set(range(1, 500))  # exclude vec 0 == the query itself
    got = [
        (r.parent_id, r.vec_id, round(r.cos, 6), r.rank)
        for r in nested_topk(
            _emb(spark), q, k=10, children_per_parent=CPP,
            score_name="cos", filter_ids=allow,
        ).collect()
    ]
    assert got == _np_nested(spark, q, 10, allow=allow)
    assert all(vid != 0 for _, vid, _, _ in got)


def test_nested_expand_scores_all_siblings(spark):
    """Expand returns EVERY child of each winning parent with its exact
    score (k*cpp rows here: no partial parents in the fixture), and the
    parent's child_rank=1 row is exactly the nested_topk inner hit."""
    q = _qvec(spark)
    k = 5
    top = {
        r.parent_id: (r.vec_id, r.cos, r.rank)
        for r in nested_topk(
            _emb(spark), q, k=k, children_per_parent=CPP,
            score_name="cos",
        ).collect()
    }
    rows = nested_expand(
        _emb(spark), q, k=k, children_per_parent=CPP, score_name="cos"
    ).collect()
    assert len(rows) == k * CPP
    assert {r.parent_id for r in rows} == set(top)
    for r in rows:
        assert r.parent_id == r.vec_id // CPP
        if r.child_rank == 1:
            vid, cos, rank = top[r.parent_id]
            assert (r.vec_id, r.cos, r.parent_rank) == (vid, cos, rank)
    # child scores are the flat exact scores
    pdf = _emb(spark).toPandas().set_index("vec_id")
    qn = np.linalg.norm(q)
    for r in rows[:10]:
        v = np.asarray(pdf.loc[r.vec_id, "embedding"], dtype=np.float64)
        exact = float(v @ np.asarray(q)) / (np.linalg.norm(v) * qn)
        assert r.cos == pytest.approx(round(exact, 6), abs=1e-6)


def test_ivf_nested_probe_all_equals_bruteforce(spark, tmp_path):
    d = str(tmp_path / "idx")
    ivf_build(_emb(spark), d, n_centroids=8, kmeans_iters=1)
    q = _qvec(spark, vid=3)
    brute = [
        tuple(r)
        for r in nested_topk(
            _emb(spark), q, k=10, children_per_parent=CPP,
            score_name="cos",
        ).collect()
    ]
    got = [
        tuple(r)
        for r in ivf_query_nested(
            spark, d, q, k=10, children_per_parent=CPP, n_probe=8
        ).collect()
    ]
    assert got == brute


def test_ivf_nested_expand_finds_unprobed_siblings(spark, tmp_path):
    """A winner's siblings may live in cells the query never probed;
    the expand pass must still score them (the reference's exact
    sibling search after ANN). With probe=all the result equals the
    brute-force expand."""
    d = str(tmp_path / "idx")
    ivf_build(_emb(spark), d, n_centroids=8, kmeans_iters=1)
    q = _qvec(spark, vid=7)
    brute = sorted(
        tuple(r)
        for r in nested_expand(
            _emb(spark), q, k=4, children_per_parent=CPP,
            score_name="cos",
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in ivf_query_nested(
            spark, d, q, k=4, children_per_parent=CPP, n_probe=8,
            expand=True,
        ).collect()
    )
    assert got == brute
    # and with a single probed cell, every returned winner still has
    # its FULL sibling set scored
    got1 = ivf_query_nested(
        spark, d, q, k=4, children_per_parent=CPP, n_probe=1, expand=True
    ).collect()
    per_parent: dict[int, int] = {}
    for r in got1:
        per_parent[r.parent_id] = per_parent.get(r.parent_id, 0) + 1
    assert per_parent and all(n == CPP for n in per_parent.values())


def test_sibling_range_pred_pushes_down_and_coalesces(spark, tmp_path):
    """The expand read must reach parquet as PushedFilters (range
    predicates on the stored id, not a computed-column isin), and
    adjacent parents coalesce into one range."""
    src = str(tmp_path / "emb")
    _emb(spark).write.parquet(src)
    pred = sibling_range_pred([3, 4, 9], CPP)
    plan = (
        spark.read.parquet(src)
        .filter(pred)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the PushedFilters render elides long lists, so assert the first
    # range there and the coalesced/second range on the Filter line
    assert "PushedFilters: [Or(And(GreaterThanOrEqual(vec_id,15)" in plan
    assert "<= 24)" in plan  # parents 3,4 coalesced into [15, 24]
    assert ">= 45)" in plan and "<= 49)" in plan
    n = (
        spark.read.parquet(src)
        .filter(pred)
        .count()
    )
    assert n == 3 * CPP


def test_best_child_aggregates_with_partial_combine(spark):
    """The per-parent argmax must plan as an AGGREGATE with a map-side
    partial_max (one surviving row per parent per task crosses the
    shuffle), not a window sort over every child row. struct max is
    sort-aggregated by Spark, which still carries the partial combine."""
    q = _qvec(spark)
    df = nested_topk(
        _emb(spark), q, k=10, children_per_parent=CPP, score_name="cos"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max(struct(" in plan
    # the only Window is the final rank over <= k rows; the child-level
    # argmax itself is aggregate-shaped
    assert plan.count("Window") <= 1, plan
