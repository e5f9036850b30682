"""BM25 scoring — one formula, three implementations that must agree.

score(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))        (Lucene BM25 idf)

All three paths evaluate the SAME expression tree in IEEE float64 so the
per-term scores are bit-identical across the numpy kernel (index engine),
the Catalyst expression (brute-force Spark oracle) and the DuckDB oracle
SQL. Multi-term doc scores are sums of per-term scores; summation order
can differ between engines at ~1 ulp, so comparisons use rank identity
with atol 1e-9 (reference analog: exact top-k agreement with scores
asserted to 1e-3/1e-4 — KNNJVectorTests.java:85-103,
JVectorEngineIT.java:426-433).

Reference analog of the scalar-function surface: the script-score
functions (KNNScoringUtil.l2Squared:98 / cosinesimil:137 / ...) exposed
for ad-hoc exact scoring; ours are usable directly in selectExpr /
DataFrame code via ``bm25_score_col``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1


def idf_np(df: np.ndarray, n_docs: float) -> np.ndarray:
    df = df.astype(np.float64, copy=False)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def score_np(
    tf: np.ndarray,
    dl: np.ndarray,
    idf: np.ndarray | float,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    tf = tf.astype(np.float64, copy=False)
    dl = dl.astype(np.float64, copy=False)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def idf_col(df: Column, n_docs: Column | float) -> Column:
    return F.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def score_col(
    tf: Column,
    dl: Column,
    idf: Column,
    avgdl: Column,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    tf = tf.cast("double")
    dl = dl.cast("double")
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def idf_sql(df_expr: str, n_expr: str) -> str:
    return f"ln(1.0 + ({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"


def score_sql(
    tf_expr: str,
    dl_expr: str,
    idf_expr: str,
    avgdl_expr: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    return (
        f"({idf_expr}) * (CAST({tf_expr} AS DOUBLE) * ({k1!r} + 1.0)) / "
        f"(CAST({tf_expr} AS DOUBLE) + {k1!r} * (1.0 - {b!r} + {b!r} * "
        f"(CAST({dl_expr} AS DOUBLE) / ({avgdl_expr}))))"
    )


def block_upper_bound(
    max_tf: np.ndarray,
    min_dl: np.ndarray,
    idf: np.ndarray | float,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    """Per-block score upper bound: tf-norm is increasing in tf and
    decreasing in dl, so (max_tf, min_dl) bounds every posting in the
    block. Used for block-max pruning (reference analog: approximate PQ
    scores bounding exact rerank, JVectorReader.java:154-182)."""
    return score_np(max_tf, min_dl, idf, avgdl, k1, b)
