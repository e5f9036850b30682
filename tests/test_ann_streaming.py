"""Streaming ANN ingestion: exactly-once tagged ivf_append + the
Structured Streaming sink (the ANN analog of the BM25 stream_append;
centroid/codebook reuse per micro-batch, replay-safe deterministic
file names)."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from opensearch_jvector_spark.operators.similarity import (
    ivf_append,
    ivf_build,
    ivf_delete,
    ivf_query,
    topk_bruteforce,
)
from opensearch_jvector_spark.streaming.incremental import (
    stream_append_vectors,
)

SF01 = "/root/testdata/sf0.01/embeddings.parquet"
N_CELLS = 8


def _emb(spark):
    return spark.read.parquet(SF01)


def _qvec(spark, vid=0):
    row = _emb(spark).filter(F.col("vec_id") == vid).first()
    return [float(x) for x in row["embedding"]]


def _count_rows(spark, d):
    return (
        spark.read.schema("vec_id long")
        .option("basePath", os.path.join(d, "cells"))
        .parquet(os.path.join(d, "cells"))
        .count()
    )


def test_tagged_append_is_idempotent(spark, tmp_path):
    d = str(tmp_path / "idx")
    base = _emb(spark).filter(F.col("vec_id") < 400)
    extra = _emb(spark).filter(F.col("vec_id") >= 400)
    ivf_build(base, d, n_centroids=N_CELLS, kmeans_iters=1)
    assert _count_rows(spark, d) == 400

    r1 = ivf_append(spark, d, extra, batch_tag="b-0")
    assert r1["appended"] == 100 and r1["files_moved"] > 0
    n_after = _count_rows(spark, d)
    assert n_after == 500
    # replay of the SAME batch: every file name already exists -> no-op
    r2 = ivf_append(spark, d, extra, batch_tag="b-0")
    assert r2["files_moved"] == 0 and r2["files_skipped"] == r1["files_moved"]
    assert _count_rows(spark, d) == 500
    # a different tag is a genuine new batch
    r3 = ivf_append(
        spark, d,
        extra.select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
        ),
        batch_tag="b-1",
    )
    assert r3["files_moved"] > 0
    assert _count_rows(spark, d) == 600


def test_stream_append_vectors_end_to_end(spark, tmp_path):
    """File-source stream of two embedding batches -> IVF sink; a
    probe-all query over the final index matches brute force over the
    full corpus (appended vectors are real, queryable index members)."""
    d = str(tmp_path / "idx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    base = _emb(spark).filter(F.col("vec_id") < 300)
    ivf_build(base, d, n_centroids=N_CELLS, kmeans_iters=1)
    _emb(spark).filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
    ).coalesce(1).write.parquet(os.path.join(src, "f1"))
    _emb(spark).filter(F.col("vec_id") >= 400).coalesce(1).write.parquet(
        os.path.join(src, "f2")
    )

    stream = (
        spark.readStream.schema(
            "vec_id long, embedding array<float>, label int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream_append_vectors(spark, d, stream, ckpt)
    q.awaitTermination(300)

    assert _count_rows(spark, d) == 500
    qv = _qvec(spark, vid=450)  # only present via the stream
    got = [
        (r["vec_id"], r["rank"])
        for r in ivf_query(spark, d, qv, k=10, n_probe=N_CELLS).collect()
    ]
    exp = [
        (r["vec_id"], r["rank"])
        for r in topk_bruteforce(
            _emb(spark), qv, 10, score_name="cos"
        ).collect()
    ]
    assert got == exp and got[0][0] == 450


def test_append_under_standing_tombstone_stays_masked(spark, tmp_path):
    """liveDocs semantics: while a tombstone stands, re-appending the
    same vec_id does NOT resurrect it — ids only return after
    compaction clears the ledger (documented in ivf_delete)."""
    d = str(tmp_path / "idx")
    base = _emb(spark).filter(F.col("vec_id") < 400)
    ivf_build(base, d, n_centroids=N_CELLS, kmeans_iters=1)
    ivf_delete(d, [7])
    ivf_append(
        spark, d,
        _emb(spark).filter(F.col("vec_id") == 7),
        batch_tag="re-add",
    )
    qv = _qvec(spark, vid=7)
    got = ivf_query(spark, d, qv, k=5, n_probe=N_CELLS).collect()
    assert all(r["vec_id"] != 7 for r in got)
