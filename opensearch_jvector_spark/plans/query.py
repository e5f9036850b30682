"""Query IR + validation — the KNNQueryBuilder analog.

Reference: the `knn` query clause is parsed into a builder holding
(field, vector, k, maxDistance, minScore, filter, methodParameters,
rescore) and validated — exactly one of k/maxDistance/minScore, engine
capability gates, parameter registry checks
(KNNQueryBuilder.java:88-105,380-609; parser KNNQueryBuilderParser.java).

Ours: a plain dataclass over query text; ``k`` (top-k) and
``min_score`` (radial search, Q5) are mutually exclusive like the
reference's k vs maxDistance/minScore. The reference's approximate-
search knobs (overquery_factor, rescore oversampling) are deliberately
absent: MaxScore over BM25 is exact, so they cannot change results —
carrying them would be dead API (see config.py for the full note).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.tokenize import tokenize_arrow


def tokenize_query(text: str) -> list[str]:
    """Tokenize query text with THE SAME analyzer as documents."""
    import pyarrow as pa

    _, flat, _ = tokenize_arrow(pa.array([text], type=pa.string()))
    return flat.to_pylist()


@dataclass(frozen=True)
class Query:
    query_id: str
    terms: tuple[str, ...]
    k: int | None = 10
    min_score: float | None = None  # radial search (reference Q5)

    @staticmethod
    def from_text(
        query_id: str,
        text: str,
        k: int | None = 10,
        min_score: float | None = None,
    ) -> "Query":
        return Query(query_id, tuple(sorted(set(tokenize_query(text)))), k, min_score)

    def __post_init__(self) -> None:
        if not self.terms:
            raise ValueError(f"query {self.query_id}: no terms after analysis")
        if (self.k is None) == (self.min_score is None):
            raise ValueError(
                f"query {self.query_id}: exactly one of k / min_score required "
                "(reference: KNNQueryBuilder.java:438-472)"
            )
        if self.k is not None and self.k <= 0:
            raise ValueError(f"query {self.query_id}: k must be > 0")
        object.__setattr__(self, "terms", tuple(sorted(set(self.terms))))
