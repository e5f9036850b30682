"""1-bit binary quantization (OneBitScalarQuantizer.java:25-88 analog):
per-dim mean thresholds, packed sign bits, hamming first pass +
exact rerank, 64x compression through the approximate scan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.operators.quantize import (
    bq_encode,
    bq_hamming,
    bq_train,
    load_bq,
)
from opensearch_jvector_spark.operators.similarity import (
    ivf_append,
    ivf_build,
    ivf_query,
)

SF01 = "/root/testdata/sf0.01/embeddings.parquet"


def _emb(spark):
    return spark.read.parquet(SF01)


def _qvec(spark, vid=0):
    row = _emb(spark).filter(F.col("vec_id") == vid).first()
    return [float(x) for x in row["embedding"]]


def test_bq_pack_and_hamming():
    rng = np.random.default_rng(7)
    M = rng.normal(size=(32, 20))
    th = bq_train(M)
    assert th.shape == (20,)
    codes = bq_encode(M, th)
    assert codes.shape == (32, 3) and codes.dtype == np.uint8  # ceil(20/8)
    # hamming to itself is 0; to the bit-flipped row it is the number
    # of data bits (packbits pads the 4 trailing bits with zeros on
    # both sides, so they never differ)
    assert bq_hamming(codes, codes[0])[0] == 0
    flipped = bq_encode(-(M - th[None, :]) + th[None, :], th)
    d = bq_hamming(flipped, codes[0])[0]
    assert d == 20 - (M[0] == th).sum()
    with pytest.raises(ValueError, match="dim"):
        bq_encode(M[:, :10], th)


def test_ivf_bq_rank_identical_with_rerank(spark, tmp_path):
    d = str(tmp_path / "idx")
    ivf_build(_emb(spark), d, n_centroids=8, kmeans_iters=1, bq=True)
    assert load_bq(d) is not None
    q = _qvec(spark, vid=5)
    exact = [
        tuple(r)
        for r in ivf_query(spark, d, q, k=10, n_probe=8).collect()
    ]
    m: dict = {}
    got = [
        tuple(r)
        for r in ivf_query(
            spark, d, q, k=10, n_probe=8, use_bq=True, overquery=50,
            metrics=m,
        ).collect()
    ]
    assert got == exact
    # the approximate pass reads ONLY the packed bits: far fewer bytes
    # than even the int8 codes would (dim 64 -> 8 packed bytes vs 64).
    # (overquery=50 reranks the whole 500-doc corpus, so the END-TO-END
    # ratio is ~1 here by design; the tight-budget ratio is asserted in
    # the clustered-recall test below.)
    assert m["approx_bytes"] < m["unquantized_bytes"] / 8


def test_bq_hamming_proxy_recall_on_clustered_data(spark, tmp_path):
    """The hamming proxy resolves at SIGN-CELL granularity: cluster
    members share a sign pattern (noise sigma 0.3 against +-1 centers
    flips almost no bits), so same-cluster candidates tie at hamming ~0
    and the budget must cover the tie set for the rerank to recover the
    fine ranking — the documented contract of a 1-bit proxy (the
    reference pairs its OneBit quantizer with exactly this
    overquery-then-rerank loop, RescoreContext.java)."""
    rng = np.random.default_rng(3)
    dim, n_clusters, per = 64, 20, 100
    centers = rng.choice([-1.0, 1.0], size=(n_clusters, dim))
    rows = []
    for c in range(n_clusters):
        pts = centers[c][None, :] + rng.normal(0, 0.3, size=(per, dim))
        for i, p in enumerate(pts):
            rows.append((c * per + i, [float(x) for x in p]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    d = str(tmp_path / "idx")
    ivf_build(df, d, n_centroids=4, kmeans_iters=1, bq=True)
    q = rows[50][1]  # a member of cluster 0
    exact = {
        r["vec_id"]
        for r in ivf_query(spark, d, q, k=10, n_probe=4).collect()
    }
    m: dict = {}
    got = {
        r["vec_id"]
        for r in ivf_query(
            spark, d, q, k=10, n_probe=4, use_bq=True, overquery=10,
            metrics=m,
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, (recall, exact, got)
    # budget 100 of 2000 rows -> the rerank reads ~5% of the vectors;
    # packed bits are 8 bytes vs 512+8 full-precision per row
    assert m["compression_ratio"] > 4, m


def test_bq_rejects_non_cosine_and_unbuilt(spark, tmp_path):
    d = str(tmp_path / "idx")
    ivf_build(_emb(spark), d, n_centroids=8, bq=True)
    with pytest.raises(ValueError, match="cosine only"):
        ivf_query(spark, d, _qvec(spark), k=5, space="l2", use_bq=True)
    d2 = str(tmp_path / "idx2")
    ivf_build(_emb(spark), d2, n_centroids=8)  # no bq
    with pytest.raises(ValueError, match="without bq"):
        ivf_query(spark, d2, _qvec(spark), k=5, use_bq=True)


def test_ivf_append_encodes_bq_for_new_vectors(spark, tmp_path):
    d = str(tmp_path / "idx")
    base = _emb(spark).filter(F.col("vec_id") < 400)
    extra = _emb(spark).filter(F.col("vec_id") >= 400)
    ivf_build(base, d, n_centroids=8, kmeans_iters=1, bq=True)
    ivf_append(spark, d, extra)
    q = _qvec(spark, vid=450)
    got = ivf_query(
        spark, d, q, k=5, n_probe=8, use_bq=True, overquery=100
    ).collect()
    assert got[0]["vec_id"] == 450  # appended vector found via bq path