"""IVF maintenance: re-center + recluster after append drift — the ANN
analog of fold_deltas (reference: the graph is rebuilt/extended on
merge, GraphIndexBuilder.buildAndMergeNewNodes, JVectorWriter.java:
922-965, so incremental ingestion never degrades search forever).

The headline scenario is the round-4 verdict's item 3: a NEW data
cluster appended between two frozen centroids splits across their
cells; probe recall at low n_probe drops and stays dropped until
`ivf_maintain` rebuilds local structure (recall restored to 1.0).
Crash windows of the recluster swap are driven through the split
journal both directions (roll forward / roll back).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_spark.operators.ivf_maintenance import (
    ivf_maintain,
    ivf_probe_recall,
    ivf_recenter,
    ivf_recluster_cells,
)
from opensearch_jvector_spark.operators.similarity import (
    _SWAP_JOURNAL,
    _load_centroids,
    _recover_cell_swaps,
    ivf_append,
    ivf_build,
    ivf_query,
)

DIM = 16


def _hubs():
    rng = np.random.default_rng(31)
    H = rng.standard_normal((4, DIM)) * 10.0
    return H


def _vec_rows(hub, n, id_base, spread=0.3, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (id_base + i, (hub + rng.standard_normal(DIM) * spread).tolist())
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def drifted(spark, tmp_path):
    """Index over 4 tight far-apart clusters (cells == clusters), then
    an appended FIFTH cluster ON THE COSINE DECISION BOUNDARY between
    hubs 0 and 1 (the normalized angular bisector): member noise flips
    sides ~50/50, so the frozen-centroid assignment scatters the new
    cluster across cells 0 and 1."""
    H = _hubs()
    # seeds are vec_id < n_centroids: ids 0..3 hit 4 different hubs
    rows = [
        (h + 4 * i, v)
        for h in range(4)
        for i, (_, v) in enumerate(_vec_rows(H[h], 200, 0, seed=h))
    ]
    base = _df(spark, rows)
    d = str(tmp_path / "idx")
    ivf_build(base, d, n_centroids=4, kmeans_iters=2)
    u0 = H[0] / np.linalg.norm(H[0])
    u1 = H[1] / np.linalg.norm(H[1])
    bis = u0 + u1
    newhub = bis / np.linalg.norm(bis) * 10.0
    drift_rows = _vec_rows(newhub, 300, id_base=10_000, spread=0.5, seed=9)
    ivf_append(spark, d, _df(spark, drift_rows))
    all_df = _df(spark, rows + drift_rows)
    qs = [
        (newhub + np.random.default_rng(50 + i).standard_normal(DIM) * 0.1)
        .tolist()
        for i in range(4)
    ]
    return d, all_df, qs, H


def test_maintain_restores_drift_recall(spark, drifted):
    d, all_df, qs, H = drifted
    before = ivf_probe_recall(spark, d, all_df, qs, k=10, n_probe=1)
    # frozen centroids: the new cluster straddles cells 0/1, so a
    # 1-cell probe must lose a chunk of the true top-10
    assert before < 0.9
    st = ivf_maintain(spark, d, oversize_factor=1.2)
    assert st["reclustered_cells"] >= 2 and st["new_cells"]
    after = ivf_probe_recall(spark, d, all_df, qs, k=10, n_probe=1)
    assert after == 1.0
    # old clusters still answer perfectly
    q_old = [float(x) for x in H[2]]
    got = ivf_query(spark, d, q_old, 5, n_probe=1).collect()
    assert len(got) == 5
    # idempotent at a sane factor: the post-maintenance cells are
    # ~200/200/200/200/300 rows — nothing exceeds 1.5x the mean, so a
    # second pass is a decision-scan no-op (the aggressive 1.2 factor
    # above exists to catch the 1.27x-mean drift cells)
    st2 = ivf_maintain(spark, d, oversize_factor=1.5)
    assert st2["reclustered_cells"] == 0 and not st2["oversized"]


def test_maintain_preserves_rows_and_ids(spark, drifted):
    d, all_df, _, _ = drifted
    cells_dir = os.path.join(d, "cells")
    scan = lambda: (  # noqa: E731
        spark.read.option("basePath", cells_dir).parquet(cells_dir)
    )
    n0 = scan().count()
    ids0 = {r["vec_id"] for r in scan().select("vec_id").collect()}
    ivf_maintain(spark, d, oversize_factor=1.2)
    assert scan().count() == n0
    ids1 = [r["vec_id"] for r in scan().select("vec_id").collect()]
    assert len(ids1) == len(set(ids1)) and set(ids1) == ids0
    # centroid table and live dirs agree
    cells, _ = _load_centroids(d)
    dirs = {
        int(p.split("=")[1])
        for p in os.listdir(cells_dir)
        if p.startswith("cell=")
    }
    assert set(int(c) for c in cells) == dirs


def test_maintain_rebuilds_coarse_layer(spark, tmp_path):
    H = _hubs()
    rows = [
        (h + 4 * i, v)
        for h in range(4)
        for i, (_, v) in enumerate(_vec_rows(H[h], 100, 0, seed=h))
    ]
    d = str(tmp_path / "idx")
    ivf_build(_df(spark, rows), d, n_centroids=4, kmeans_iters=2,
              coarse=True)
    newhub = (H[2] + H[3]) / 2.0
    ivf_append(spark, d, _df(spark, _vec_rows(newhub, 200, 20_000, seed=8)))
    st = ivf_maintain(spark, d, oversize_factor=1.2)
    assert st["new_cells"]
    # coarse table regenerated over the NEW cell set
    from opensearch_jvector_spark.operators.similarity import (
        _load_coarse,
        _load_group_centroids,
    )

    groups, _ = _load_coarse(d)
    covered = set()
    for g in groups:
        cells_g, _ = _load_group_centroids(d, int(g))
        covered |= {int(c) for c in cells_g}
    cells, _ = _load_centroids(d)
    assert covered == {int(c) for c in cells}
    q = [float(x) for x in newhub]
    assert len(ivf_query(spark, d, q, 5, n_probe=1).collect()) == 5


def test_recenter_moves_centroids_to_live_means(spark, tmp_path):
    H = _hubs()
    rows = [
        (h + 4 * i, v)
        for h in range(4)
        for i, (_, v) in enumerate(_vec_rows(H[h], 50, 0, seed=h))
    ]
    d = str(tmp_path / "idx")
    ivf_build(_df(spark, rows), d, n_centroids=4, kmeans_iters=1)
    # drift WITHIN cells: shifted copies of hub 0 land in cell 0
    shift_rows = _vec_rows(H[0] * 1.0 + 1.5, 50, 30_000, seed=7)
    ivf_append(spark, d, _df(spark, shift_rows))
    _, C_before = _load_centroids(d)
    st = ivf_recenter(spark, d)
    assert st["recentered"] == 4
    cells, C_after = _load_centroids(d)
    assert not np.allclose(C_before, C_after)
    # spherical-mean check for one cell against raw data
    cells_dir = os.path.join(d, "cells")
    pdf = (
        spark.read.option("basePath", cells_dir)
        .parquet(os.path.join(cells_dir, "cell=0"))
        .select("v")
        .toPandas()
    )
    M = np.array(pdf["v"].tolist(), dtype=np.float64)
    U = M / np.linalg.norm(M, axis=1)[:, None]
    want = U.mean(axis=0)
    got = C_after[list(cells).index(0)]
    np.testing.assert_allclose(got, want, rtol=1e-9)


# ----------------------------------------------------- crash recovery


def _mk_index(spark, tmp_path, coarse=False):
    H = _hubs()
    rows = [
        (h + 4 * i, v)
        for h in range(4)
        for i, (_, v) in enumerate(_vec_rows(H[h], 40, 0, seed=h))
    ]
    d = str(tmp_path / "idx")
    ivf_build(_df(spark, rows), d, n_centroids=4, kmeans_iters=1,
              coarse=coarse)
    return d


def _dead_journal(cells_dir, splits):
    with open(os.path.join(cells_dir, _SWAP_JOURNAL), "w") as f:
        json.dump({"pid": 999_999_999, "start": 1, "splits": splits}, f)


def test_split_recovery_rolls_forward_when_staged(spark, tmp_path):
    """Crash after staging all children and demoting the old cell:
    recovery must promote the children, rewrite the centroid table
    from the journal, and drop the backup."""
    d = _mk_index(spark, tmp_path)
    cells_dir = os.path.join(d, "cells")
    # fake a split of cell 0 into children 100/101 using cell 0's rows
    pdf = (
        spark.read.option("basePath", cells_dir)
        .parquet(os.path.join(cells_dir, "cell=0"))
        .toPandas()
    )
    half = len(pdf) // 2
    for cid, part in ((100, pdf.iloc[:half]), (101, pdf.iloc[half:])):
        stage = os.path.join(cells_dir, f"cell={cid}.compact")
        os.makedirs(stage)
        part.drop(columns=["cell"]).to_parquet(
            os.path.join(stage, "part0.parquet")
        )
    os.rename(
        os.path.join(cells_dir, "cell=0"),
        os.path.join(cells_dir, "cell=0.trash"),
    )
    c100 = np.array(pdf["v"].tolist()[:half]).mean(axis=0)
    c101 = np.array(pdf["v"].tolist()[half:]).mean(axis=0)
    _dead_journal(cells_dir, [{
        "old": [0], "new": [100, 101],
        "new_centroids": [c100.tolist(), c101.tolist()],
    }])

    _recover_cell_swaps(cells_dir)

    assert os.path.isdir(os.path.join(cells_dir, "cell=100"))
    assert os.path.isdir(os.path.join(cells_dir, "cell=101"))
    assert not os.path.exists(os.path.join(cells_dir, "cell=0"))
    assert not os.path.exists(os.path.join(cells_dir, "cell=0.trash"))
    assert not os.path.exists(os.path.join(cells_dir, _SWAP_JOURNAL))
    cells, C = _load_centroids(d)
    assert 0 not in cells and {100, 101} <= set(int(c) for c in cells)
    # every original row still reachable through a full probe
    got = spark.read.option("basePath", cells_dir).parquet(cells_dir)
    assert got.filter(F.col("cell").isin([100, 101])).count() == len(pdf)


def test_split_recovery_rolls_back_when_staging_incomplete(spark, tmp_path):
    """Crash mid-staging (one child missing): recovery must delete the
    staged child, keep the old cell, and leave centroids untouched."""
    d = _mk_index(spark, tmp_path)
    cells_dir = os.path.join(d, "cells")
    cents_before = _load_centroids(d)[0].tolist()
    stage = os.path.join(cells_dir, "cell=100.compact")
    os.makedirs(stage)
    with open(os.path.join(stage, "junk"), "w") as f:
        f.write("partial")
    _dead_journal(cells_dir, [{
        "old": [0], "new": [100, 101],
        "new_centroids": [[0.0] * DIM, [0.0] * DIM],
    }])

    _recover_cell_swaps(cells_dir)

    assert os.path.isdir(os.path.join(cells_dir, "cell=0"))
    assert not os.path.exists(stage)
    assert not os.path.exists(os.path.join(cells_dir, "cell=100"))
    assert not os.path.exists(os.path.join(cells_dir, _SWAP_JOURNAL))
    assert _load_centroids(d)[0].tolist() == cents_before


def test_recluster_rejects_unknown_cells(spark, tmp_path):
    d = _mk_index(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown cells"):
        ivf_recluster_cells(spark, d, [0, 77], k_out=3)
