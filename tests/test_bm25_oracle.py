"""Golden analytic corpus (FIXTURES.md §2) + DuckDB cross-check.

The tiny corpus is scored by a self-contained pure-Python BM25 in this
file (independent of all engine code), mirroring the reference's
hand-computable analytic test (KNNJVectorTests.java:56-108: vectors
(0,1/i) with exact expected docIDs+scores)."""

import math

import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.operators.bruteforce import (
    bm25_topk_bruteforce,
    corpus_stats,
)

K1, B = 1.2, 0.75


def tiny_corpus():
    docs = []
    for d in range(10):
        toks = ["alpha"] * ((d % 3) + 1)
        if d % 2 == 0:
            toks.append("beta")
        if d in (0, 9):
            toks.append("gamma")
        if d == 7:
            toks.append("delta")
        docs.append((d, " ".join(toks)))
    return docs


def python_bm25_topk(docs, terms, k):
    tokenized = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in tokenized.values()) / n
    dfs = {
        t: sum(1 for toks in tokenized.values() if t in toks) for t in terms
    }
    scores = {}
    for d, toks in tokenized.items():
        s = 0.0
        hit = False
        for t in sorted(set(terms)):
            tf = toks.count(t)
            if tf == 0 or dfs[t] == 0:
                continue
            hit = True
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            dl = len(toks)
            s += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl))
        if hit:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]


@pytest.mark.parametrize(
    "terms,k",
    [(["alpha"], 3), (["beta", "gamma"], 3), (["delta"], 3), (["zzznohit"], 3)],
)
def test_oracle_matches_analytic(spark, terms, k):
    docs = spark.createDataFrame(tiny_corpus(), "doc_id long, text string")
    got = [
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk_bruteforce(docs, terms, k).collect()
    ]
    exp = python_bm25_topk(tiny_corpus(), terms, k)
    assert [(g[0], g[2]) for g in got] == [(e[0], e[2]) for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], abs=1e-9)


def test_corpus_stats(spark):
    docs = spark.createDataFrame(tiny_corpus(), "doc_id long, text string")
    n, avgdl = corpus_stats(docs)
    toks = {d: t.split() for d, t in tiny_corpus()}
    assert n == 10
    assert avgdl == pytest.approx(sum(map(len, toks.values())) / 10)


def test_oracle_matches_duckdb(spark):
    """Spark oracle vs an independent DuckDB SQL BM25 on real testdata."""
    import duckdb

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path)
    terms = ["spark", "merge"]
    got = bm25_topk_bruteforce(docs, terms, 10).collect()
    sql = f"""
    WITH docs AS (SELECT doc_id, text FROM '{path}'),
    toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS ts
      FROM docs),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(len(ts))::DOUBLE AS avgdl FROM toks),
    flat AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks),
    tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM flat
           WHERE term IN ('spark','merge') GROUP BY ALL),
    dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (s.n - dfs.df + 0.5) / (dfs.df + 0.5))
                 * (tf.tf * (1.2 + 1.0))
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (tf.dl / s.avgdl)))) AS score
      FROM tf JOIN dfs USING (term) CROSS JOIN stats s
      GROUP BY tf.doc_id)
    SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
    """
    exp = duckdb.sql(sql).fetchall()
    assert [r["doc_id"] for r in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert g["score"] == pytest.approx(e[1], abs=1e-9)
