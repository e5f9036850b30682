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
    centroids: DataFrame | None = None,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell) IVF cell assignment against the given centroid
    table (cell, c) — or, when None, the deterministic first-N-by-id
    seed centroids. Broadcast join — the centroid table never shuffles
    the corpus. This is the BUILD-time kernel: queries never run it
    (they probe the persisted assignment written by ``ivf_build``)."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    if centroids is None:
        centroids = e.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("c")
        )
    scored = (
        e.crossJoin(F.broadcast(centroids))
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


def ivf_build(
    embeddings: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    n_probe_default: int = 4,
    kmeans_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Build a PERSISTED IVF index — the ANN analog of the posting
    index build (reference: JVectorWriter.flush builds the graph once
    at index time; JVectorReader.search only probes it,
    JVectorReader.java:131-212). Layout:

      <index_dir>/cells/cell=C/   inverted lists: (vec_id, v, norm) —
                                  vectors CO-LOCATED with their cell,
                                  so a query reads only its probed
                                  cell directories (partition pruning,
                                  never a corpus scan);
      <index_dir>/centroids/      (cell, c) — tiny, read driver-side.

    Centroids: deterministic first-N seeds, optionally refined by
    ``kmeans_iters`` Lloyd iterations (assign via broadcast argmax
    cosine, re-center on the spherical mean; empty cells keep their
    previous centroid) — deterministic, so rebuilds are idempotent.
    Round 1 re-ran the assignment crossJoin inside EVERY query; now it
    runs kmeans_iters + 1 times at build, zero times at query."""
    import os

    e = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("c")
    )
    for _ in range(kmeans_iters):
        assign = ivf_assign(embeddings, cents, n_centroids, id_col, vec_col)
        dim = len(cents.select("c").first()["c"])
        means = (
            e.join(assign, "vec_id")
            .withColumn(
                "u",
                F.transform(
                    F.col("v"), lambda x: x / _norm(F.col("v"))
                ),
            )
            .groupBy("cell")
            .agg(
                F.array(
                    *[F.avg(F.col("u")[i]).alias(f"m{i}") for i in range(dim)]
                ).alias("m")
            )
        )
        cents = (
            cents.join(means, "cell", "left")
            .select("cell", F.coalesce(F.col("m"), F.col("c")).alias("c"))
        )
    assign = ivf_assign(embeddings, cents, n_centroids, id_col, vec_col)
    lists = e.join(assign, "vec_id").select(
        "cell", "vec_id", "v", _norm(F.col("v")).alias("norm")
    )
    (
        lists.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "cells"))
    )
    cents.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids")
    )
    return index_dir


def ivf_query(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int,
    n_probe: int = 4,
) -> DataFrame:
    """(vec_id, cos, rank) — probe the ``n_probe`` nearest cells of a
    persisted IVF index, exact-score ONLY those cells' co-located
    vectors (approximate-candidates-then-exact shape of
    JVectorReader.search). The probe decision is a driver-side read of
    the tiny centroid table; the Spark job scans only the probed
    cell=... directories — query cost is O(probed lists), independent
    of corpus size."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    cent = pq.read_table(os.path.join(index_dir, "centroids"))
    cells = np.asarray(cent["cell"].to_pylist(), dtype=np.int64)
    C = np.array(cent["c"].to_pylist(), dtype=np.float64)
    qv = np.asarray(query_vec, dtype=np.float64)
    sims = (C @ qv) / (np.linalg.norm(C, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((cells, -sims))[:n_probe]
    probe = sorted(int(cells[i]) for i in order)

    paths = [
        os.path.join(index_dir, "cells", f"cell={c}")
        for c in probe
    ]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        return spark.createDataFrame([], "vec_id long, cos double, rank int")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = F.sqrt(F.aggregate(q, F.lit(0.0), lambda a, x: a + x * x))
    scored = (
        spark.read.schema("vec_id long, v array<double>, norm double")
        .parquet(*paths)
        .select(
            "vec_id", (_dot(F.col("v"), q) / (F.col("norm") * qn)).alias("cos")
        )
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", F.round("cos", 6).alias("cos"), "rank"
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_dir: str | None = None,
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF cosine top-k. With ``index_dir`` (the production path) the
    persisted index is built once if missing and every query just
    probes it. Without, a transient one-shot assignment runs in-line —
    ONLY for ad-hoc exploration; never per-query at scale."""
    spark = embeddings.sparkSession
    if index_dir is not None:
        import os

        if not os.path.isdir(os.path.join(index_dir, "centroids")):
            ivf_build(
                embeddings, index_dir, n_centroids,
                kmeans_iters=kmeans_iters, id_col=id_col, vec_col=vec_col,
            )
        return ivf_query(spark, index_dir, query_vec, k, n_probe)

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
    assign = ivf_assign(embeddings, None, n_centroids, id_col, vec_col)
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
