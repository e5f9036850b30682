"""Hybrid fusion of lexical + vector result lists (the search
pipeline's normalization processor around the reference's knn clause):
RRF and min-max weighted linear combination."""

from __future__ import annotations

import pytest

from opensearch_jvector_spark.operators.hybrid import linear_fuse, rrf_fuse


def _lists(spark):
    bm = spark.createDataFrame(
        [(1, 9.0, 1), (2, 7.0, 2), (3, 5.0, 3), (4, 1.0, 4)],
        "doc_id long, score double, rank int",
    )
    ann = spark.createDataFrame(
        [(3, 0.9, 1), (1, 0.8, 2), (5, 0.7, 3)],
        "doc_id long, score double, rank int",
    )
    return bm, ann


def test_rrf_matches_hand_computation(spark):
    bm, ann = _lists(spark)
    got = {
        r.doc_id: (r.score, r.rank)
        for r in rrf_fuse({"bm25": bm, "ann": ann}, k=10).collect()
    }
    exp = {
        1: 1 / 61 + 1 / 62,  # both lists
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 64,
        5: 1 / 63,
    }
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert got[d][0] == pytest.approx(round(s, 6), abs=1e-9)
    order = sorted(got.items(), key=lambda kv: kv[1][1])
    assert [d for d, _ in order] == [1, 3, 2, 5, 4]


def test_rrf_tie_breaks_on_id(spark):
    a = spark.createDataFrame(
        [(7, 1), (2, 2)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(2, 1), (7, 2)], "doc_id long, rank int"
    )
    got = [r.doc_id for r in rrf_fuse({"a": a, "b": b}, k=2).collect()]
    assert got == [2, 7]  # symmetric scores -> lower id first


def test_rrf_k_limit_and_validation(spark):
    bm, ann = _lists(spark)
    assert rrf_fuse({"b": bm, "a": ann}, k=2).count() == 2
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse({}, k=5)
    with pytest.raises(ValueError, match="lacks column"):
        rrf_fuse({"b": bm.drop("rank")}, k=5)


def test_linear_fuse_min_max_weighted(spark):
    bm, ann = _lists(spark)
    got = {
        r.doc_id: r.score
        for r in linear_fuse(
            {"bm25": bm, "ann": ann}, k=10,
            weights={"bm25": 0.3, "ann": 0.7},
        ).collect()
    }
    # bm: (s-1)/8 -> 1:1.0, 2:0.75, 3:0.5, 4:0.0
    # ann: (s-0.7)/0.2 -> 3:1.0, 1:0.5, 5:0.0
    exp = {
        1: 0.3 * 1.0 + 0.7 * 0.5,
        2: 0.3 * 0.75,
        3: 0.3 * 0.5 + 0.7 * 1.0,
        4: 0.0,
        5: 0.0,
    }
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert got[d] == pytest.approx(round(s, 6), abs=1e-9)


def test_linear_fuse_constant_list_normalizes_to_one(spark):
    const = spark.createDataFrame(
        [(1, 3.0), (2, 3.0)], "doc_id long, score double"
    )
    got = {
        r.doc_id: r.score
        for r in linear_fuse({"c": const}, k=5).collect()
    }
    assert got == {1: 1.0, 2: 1.0}
    with pytest.raises(ValueError, match="weights keys"):
        linear_fuse({"c": const}, k=5, weights={"x": 1.0})


def test_fusion_plan_has_no_join(spark):
    """List fusion must stay union + one aggregate — no join of the
    source lists (a join would shuffle both sides; the union
    aggregates in one pass)."""
    bm, ann = _lists(spark)
    plan = (
        rrf_fuse({"b": bm, "a": ann}, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Union" in plan
