"""Round-5 driver-side search surface: the pre-bound LocalIvfSearcher
(open-once-query-many, the reference's JMH regime — the IndexReader is
opened outside the timed loop, FormatBenchmarkQueryWithKnownDatasets
.java:39-44) and the byte-bounded LRU caches that keep a long-lived
multi-index driver from growing without bound (round-4 verdict item).

Covers: numpy-path result parity with the distributed exact path,
staleness pickup (appends and deletes observed without rebinding),
allow-list + radial semantics through the searcher, and _LRUBytes
eviction accounting.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.operators.similarity import (
    LocalIvfSearcher,
    _LRUBytes,
    ivf_build,
    ivf_delete,
    ivf_query,
    ivf_query_local,
)

SF01 = "/root/testdata/sf0.01/embeddings.parquet"


def _emb(spark):
    return spark.read.parquet(SF01)


def _qvec(spark, vid=0):
    row = _emb(spark).filter(F.col("vec_id") == vid).first()
    return [float(x) for x in row["embedding"]]


@pytest.fixture(scope="module")
def ivf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf_local") / "idx")
    ivf_build(_emb(spark), d, n_centroids=16, kmeans_iters=1)
    return d


# ------------------------------------------------------------ parity


@pytest.mark.parametrize("space", ["cosine", "l2", "innerproduct"])
def test_searcher_matches_distributed_exact(spark, ivf_dir, space):
    """The searcher's numpy kernels produce the SAME ids and scores
    (to the engine's 6-decimal rounding) as the distributed ivf_query
    over the same probed cells — same probe rule, same tie-break."""
    q = _qvec(spark, 0)
    dist = ivf_query(spark, ivf_dir, q, 10, n_probe=4, space=space)
    dist_rows = [(r[0], r[1]) for r in dist.collect()]

    s = LocalIvfSearcher(ivf_dir, space=space)
    ids, scores = s.query(np.asarray(q, dtype=np.float64), 10, n_probe=4)
    loc_rows = list(zip(ids.tolist(), np.round(scores, 6).tolist()))
    assert loc_rows == dist_rows


def test_searcher_matches_wrapper_and_is_reused(spark, ivf_dir):
    """ivf_query_local delegates to a process-cached searcher; results
    agree and repeated calls reuse the same instance."""
    q = _qvec(spark, 3)
    pdf = ivf_query_local(ivf_dir, q, 10, n_probe=4)
    s = LocalIvfSearcher(ivf_dir)
    ids, scores = s.query(np.asarray(q, dtype=np.float64), 10, n_probe=4)
    assert pdf["vec_id"].tolist() == ids.tolist()
    assert pdf["cos"].tolist() == np.round(scores, 6).tolist()

    from opensearch_jvector_spark.operators import similarity as sim

    a = sim._LOCAL_SEARCHERS.get((ivf_dir, "cosine"))
    ivf_query_local(ivf_dir, q, 10, n_probe=4)
    assert sim._LOCAL_SEARCHERS.get((ivf_dir, "cosine")) is a


def test_searcher_radial_and_allow(spark, ivf_dir):
    q = np.asarray(_qvec(spark, 1), dtype=np.float64)
    s = LocalIvfSearcher(ivf_dir)
    ids_all, scores_all = s.query(q, 50, n_probe=16)
    thr = float(scores_all[len(scores_all) // 2])
    ids_rad, scores_rad = s.query(q, 50, n_probe=16, min_score=thr)
    assert set(ids_rad.tolist()) == {
        int(i) for i, sc in zip(ids_all, scores_all) if sc >= thr
    }
    assert (scores_rad >= thr).all()

    allow = np.asarray(sorted(ids_all.tolist())[:5], dtype=np.int64)
    ids_f, _ = s.query(q, 50, n_probe=16, allow=allow)
    assert set(ids_f.tolist()) <= set(allow.tolist())


# --------------------------------------------------------- staleness


def test_searcher_sees_deletes_without_rebinding(spark, tmp_path):
    d = str(tmp_path / "idx")
    ivf_build(_emb(spark).limit(400), d, n_centroids=4, kmeans_iters=1)
    q = _qvec(spark, 0)
    s = LocalIvfSearcher(d)
    ids0, _ = s.query(np.asarray(q, dtype=np.float64), 5, n_probe=4)
    victim = int(ids0[0])
    ivf_delete(d, [victim])
    ids1, _ = s.query(np.asarray(q, dtype=np.float64), 5, n_probe=4)
    assert victim not in ids1.tolist()
    # frozen mode skips the staleness sweep — the stale answer is the
    # documented contract there (pure benchmark loops)
    ids2, _ = s.query(
        np.asarray(q, dtype=np.float64), 5, n_probe=4, check_stale=False
    )
    assert len(ids2) == 5


# --------------------------------------------------------------- LRU


def test_lru_bytes_eviction_and_accounting():
    lru = _LRUBytes(100)
    lru.put("a", 1, 40)
    lru.put("b", 2, 40)
    assert lru.get("a") == 1  # refresh a → b is now LRU
    lru.put("c", 3, 40)  # 120 > 100 → evict b
    assert lru.get("b") is None
    assert lru.get("a") == 1 and lru.get("c") == 3
    assert lru.bytes == 80
    lru.put("a", 9, 10)  # replace resizes accounting
    assert lru.bytes == 50 and lru.get("a") == 9
    assert lru.pop("zzz", "dflt") == "dflt"
    assert lru.pop("c") == 3 and lru.bytes == 10


def test_local_cell_cache_evicts_across_indexes(spark, tmp_path):
    """Two indexes through a tiny cache budget: the cache never holds
    more than the budget and queries stay correct after eviction."""
    from opensearch_jvector_spark.operators import similarity as sim

    d1 = str(tmp_path / "i1")
    d2 = str(tmp_path / "i2")
    ivf_build(_emb(spark).limit(300), d1, n_centroids=2, kmeans_iters=1)
    ivf_build(_emb(spark).limit(300), d2, n_centroids=2, kmeans_iters=1)
    q = _qvec(spark, 0)
    old = sim._LOCAL_IVF_CACHE
    sim._LOCAL_IVF_CACHE = _LRUBytes(1)  # everything but 1 entry evicts
    try:
        r1 = ivf_query_local(d1, q, 5, n_probe=2)
        r2 = ivf_query_local(d2, q, 5, n_probe=2)
        assert len(sim._LOCAL_IVF_CACHE) == 1  # floor: keeps newest
        r1b = ivf_query_local(d1, q, 5, n_probe=2)  # re-read after evict
        assert r1b["vec_id"].tolist() == r1["vec_id"].tolist()
        assert r2["vec_id"].tolist()  # sanity
    finally:
        sim._LOCAL_IVF_CACHE = old
