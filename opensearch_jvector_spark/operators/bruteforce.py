"""Brute-force exact BM25 — pure declarative DataFrame plan.

Dual role, mirroring the reference exactly:
  * correctness ORACLE — the reference asserts exact top-k agreement of
    its index against brute-force scoring
    (TestUtils.computeGroundTruthValues, TestUtils.java:131-158;
    KNNJVectorTests.java:510-562). Every engine result must be
    rank-identical to this plan's output.
  * exact-search FALLBACK — when the (filtered) candidate set is small
    the reference skips the graph and scores candidates directly
    (VectorIdsKNNIterator.java:23-112; thresholds KNNSettings.java:70,87).

The whole plan is Catalyst-visible (tokenize = codegen'd split/filter,
explode, hash aggregates with map-side partial combine, broadcast join
of the tiny query-term df map, TakeOrderedAndProject for top-k), so at
100 TB it is a well-shaped 3-shuffle job — but it reads the full corpus
per query set, which is exactly what the index avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1
from ..functions.bm25 import idf_col, score_col
from ..functions.tokenize import tokens_col


def doc_terms(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf, dl) — one row per distinct (doc, term)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).withColumn("dl", F.size("toks"))
    return (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )


def corpus_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> tuple[int, float]:
    """(N, avgdl) over ALL docs (including zero-token docs)."""
    row = (
        docs.select(F.size(tokens_col(text_col)).alias("dl"))
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
        .collect()[0]
    )
    return int(row["n"]), float(row["avgdl"] or 0.0)


def term_dfs(terms_df: DataFrame) -> DataFrame:
    """(term, df) document frequencies from a doc_terms() output."""
    return terms_df.groupBy("term").agg(F.count("*").alias("df"))


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    filter_cond=None,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, score) for every doc matching >=1 query term.

    Corpus stats (N, avgdl, df) are computed over the FULL corpus;
    ``filter_cond`` only restricts which docs are scored (Lucene
    semantics — the reference's acceptDocs bitmap never changes
    statistics, JVectorReader.java:167-182).
    """
    terms = sorted(set(query_terms))
    n_docs, avgdl = corpus_stats(docs, text_col, id_col)
    all_terms = doc_terms(docs, text_col, id_col)
    dfs = term_dfs(all_terms.filter(F.col("term").isin(terms))).withColumn(
        "idf", idf_col(F.col("df").cast("double"), float(n_docs))
    )
    matched = all_terms.filter(F.col("term").isin(terms)).join(
        F.broadcast(dfs), "term"
    )
    if filter_cond is not None:
        allowed = docs.filter(filter_cond).select(F.col(id_col).alias("doc_id"))
        matched = matched.join(allowed, "doc_id", "left_semi")
    scored = matched.withColumn(
        "term_score",
        score_col(F.col("tf"), F.col("dl"), F.col("idf"), F.lit(float(avgdl)), k1, b),
    )
    return scored.groupBy("doc_id").agg(F.sum("term_score").alias("score"))


def bm25_topk_bruteforce(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    filter_cond=None,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Exact top-k: (doc_id, score, rank); ties broken by ascending
    doc_id (deterministic, same rule as the engine)."""
    scores = bm25_scores(docs, query_terms, text_col, id_col, filter_cond, k1, b)
    # orderBy().limit(k) compiles to TakeOrderedAndProject (per-partition
    # heap + driver merge — no global sort); the rank window then runs
    # over only k rows.
    topk = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", "rank"
    )


def bm25_topk_diversified(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(group, doc_id, score, rank) — top-k with at most ONE hit per
    group (best turn per conversation / best doc per source).

    Reference analog: nested-field parent-child diversification —
    NestedVectorIdsKNNIterator.java:77 and
    GroupedNestedDocIdSetIterator.java:133 keep only the best child hit
    per parent document. Spark-first: a partitioned window rank inside
    each group, then the global top-k — two narrow shuffles, both on
    uniform keys (group, then the k-row result)."""
    scores = bm25_scores(docs, query_terms, text_col, id_col, None, k1, b)
    with_grp = scores.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("grp")),
        "doc_id",
    )
    wg = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("doc_id"))
    best = (
        with_grp.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    topk = best.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("grp").alias("group"), "doc_id", "score", "rank"
    )
