"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (the reference's exact
script-score path: KNNScoringUtil.cosinesimil, KNNScoringSpace.java:131-235);
the IVF-bucketed variant is the scale path (the reference's DiskANN
approximate search + rerank analog: JVectorReader.search,
JVectorReader.java:131-212 — prune candidates cheaply, score survivors
exactly).

All math in float64 via Catalyst expressions (zip_with/aggregate), so
DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cos, rank) exact cosine top-k for one query vector.
    One scan, no shuffle until the TakeOrderedAndProject top-k."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    scored = e.select(
        "vec_id", (_dot(F.col("v"), q) / (_norm(F.col("v")) * _norm(q))).alias("cos")
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", F.round("cos", 6).alias("cos"), "rank"
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell) IVF cell assignment. Centroids are the first
    ``n_centroids`` vectors by id (deterministic; a k-means refinement
    would iterate this same assignment join). Broadcast join — the
    centroid table never shuffles the corpus."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("c")
    )
    scored = (
        e.crossJoin(F.broadcast(cents))
        .withColumn(
            "sim", _dot(F.col("v"), F.col("c")) / (_norm(F.col("v")) * _norm(F.col("c")))
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cos, rank) IVF-pruned cosine top-k: probe the n_probe
    cells whose centroids are nearest the query, exact-score only those
    cells' members (the approximate-then-exact-rerank shape of the
    reference). Deterministic; recall < 1 by design — the exact
    baseline above is the oracle for recall tests."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("c")
    )
    probe = (
        cents.withColumn(
            "sim", _dot(F.col("c"), q) / (_norm(F.col("c")) * _norm(q))
        )
        .orderBy(F.desc("sim"), F.asc("cell"))
        .limit(n_probe)
        .select("cell")
    )
    assign = ivf_assign(embeddings, n_centroids, id_col, vec_col)
    cand = assign.join(F.broadcast(probe), "cell").select("vec_id")
    scored = (
        e.join(cand, "vec_id", "left_semi")
        .select(
            "vec_id",
            (_dot(F.col("v"), q) / (_norm(F.col("v")) * _norm(q))).alias("cos"),
        )
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", F.round("cos", 6).alias("cos"), "rank"
    )
