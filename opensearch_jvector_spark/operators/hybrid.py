"""Hybrid retrieval: fuse lexical (BM25) and vector (ANN) result
lists.

The reference engine serves the kNN clause of OpenSearch's hybrid
search (a ``knn`` query inside a ``hybrid`` compound query); score
normalization and combination happen in the enclosing search
pipeline's normalization processor. This engine owns both halves, so
the fusion step lives here, Spark-first:

  * ``rrf_fuse`` — Reciprocal Rank Fusion:
    score(d) = sum over sources of 1 / (rrf_k + rank_s(d)).
    Rank-based, so fully deterministic across engines.
  * ``linear_fuse`` — min-max normalize each source's scores onto
    [0, 1], then a weighted sum (the normalization processor's
    ``min_max`` + weighted ``arithmetic_mean`` defaults); a doc
    missing from a source contributes 0 there.

Scale shape: the inputs are already per-source top-N result lists (k
rows each), so fusion is a union of tiny frames + one aggregate — no
join, no corpus-scale shuffle. Fusing full corpus-sized score tables
also works (one hash aggregate on the id), but the intended use is
list fusion, same as the search pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _rank_topk


def _check_sources(results: dict[str, DataFrame], id_col: str, need: str):
    if not results:
        raise ValueError("need at least one result list to fuse")
    for name, df in results.items():
        missing = {id_col, need} - set(df.columns)
        if missing:
            raise ValueError(
                f"source {name!r} lacks column(s) {sorted(missing)}"
            )


def rrf_fuse(
    results: dict[str, DataFrame],
    k: int,
    rrf_k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score, rank) — Reciprocal Rank Fusion of named result
    lists, each carrying (id_col, rank). The classic rrf_k=60 damps the
    head so no single source dominates. Ties break on the id
    ascending."""
    _check_sources(results, id_col, "rank")
    contribs = None
    for name, df in results.items():
        c = df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("rank"))).alias("c"),
        )
        contribs = c if contribs is None else contribs.unionAll(c)
    fused = contribs.groupBy(id_col).agg(F.sum("c").alias("score"))
    return _rank_topk(fused, k, "score", id_col=id_col)


def linear_fuse(
    results: dict[str, DataFrame],
    k: int,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """(doc_id, score, rank) — min-max normalize each source's scores
    onto [0, 1] over ITS OWN list, then sum with per-source weights
    (default: equal weights summing to 1). A single-score (or
    constant-score) list normalizes to 1.0 for every member; a doc
    absent from a source contributes 0 for it — the normalization
    processor's conventions."""
    _check_sources(results, id_col, score_col)
    if weights is None:
        weights = {n: 1.0 / len(results) for n in results}
    if set(weights) != set(results):
        raise ValueError("weights keys must match result keys")
    contribs = None
    for name, df in results.items():
        # per-list min/max as window aggregates over one constant
        # partition: the list is top-N sized by contract, and unlike a
        # separate .agg() + crossJoin this keeps ONE occurrence of the
        # source lineage in the plan (an agg branch would re-execute
        # the whole upstream scoring pipeline a second time)
        w = Window.partitionBy(F.lit(0))
        lo, hi = F.min(score_col).over(w), F.max(score_col).over(w)
        c = df.select(
            F.col(id_col),
            (
                F.lit(float(weights[name]))
                * F.when(hi == lo, F.lit(1.0)).otherwise(
                    (F.col(score_col) - lo) / (hi - lo)
                )
            ).alias("c"),
        )
        contribs = c if contribs is None else contribs.unionAll(c)
    fused = contribs.groupBy(id_col).agg(F.sum("c").alias("score"))
    return _rank_topk(fused, k, "score", id_col=id_col)
