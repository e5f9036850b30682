"""DuckDB oracle SQL generators for the driver's correctness gate.

Each generator emits ANSI SQL (DuckDB dialect) computing the SAME
result as the corresponding engine query, over the pre-registered
testdata views. The tokenizer and BM25 expressions mirror
functions/tokenize.py and functions/bm25.py exactly (same float64
expression tree), so values agree to rounding.
"""

from __future__ import annotations

from .config import BM25_B, BM25_K1

TOKS_CTE = (
    "toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),"
    " '[^a-z0-9]+'), t -> t <> '') AS ts FROM documents)"
)


def _terms_in(terms: list[str]) -> str:
    inner = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"({inner})"


def bm25_cte(terms: list[str], k1: float = BM25_K1, b: float = BM25_B) -> str:
    """CTE chain ending in `scored(doc_id, s)` — exact BM25 over the
    `documents` view for the given query terms."""
    return f"""WITH {TOKS_CTE},
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(ts))::DOUBLE AS avgdl FROM toks),
flat AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks),
tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM flat
       WHERE term IN {_terms_in(terms)} GROUP BY ALL),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * ({k1!r} + 1.0))
             / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * (tf.dl / st.avgdl)))) AS s
  FROM tf JOIN dfs USING (term) CROSS JOIN stats st
  GROUP BY tf.doc_id)"""


def bm25_topk_sql(terms: list[str], k: int, filter_where: str | None = None) -> str:
    """Top-k with rank; optional doc-level filter (corpus stats stay
    corpus-level, matching engine semantics)."""
    src = "scored"
    if filter_where:
        src = (
            "(SELECT scored.* FROM scored JOIN documents d USING (doc_id) "
            f"WHERE {filter_where})"
        )
    return f"""{bm25_cte(terms)}
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC)::INTEGER AS rank
  FROM {src} t) WHERE rank <= {k}"""


def bm25_radial_sql(terms: list[str], min_score: float) -> str:
    return f"""{bm25_cte(terms)}
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC)::INTEGER AS rank
  FROM scored WHERE s >= {min_score!r}) t"""


def bm25_diversified_sql(terms: list[str], k: int, group_col: str = "source") -> str:
    """One best hit per group (conversation/source), then global top-k —
    oracle for the nested parent-child diversification analog."""
    return f"""{bm25_cte(terms)},
grouped AS (
  SELECT d.{group_col} AS grp, s.doc_id, s.s,
         row_number() OVER (PARTITION BY d.{group_col}
                            ORDER BY s.s DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN documents d USING (doc_id))
SELECT grp AS "group", doc_id, round(s, 4) AS score, rank FROM (
  SELECT grp, doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC)::INTEGER AS rank
  FROM grouped WHERE rn = 1) WHERE rank <= {k}"""


def corpus_stats_sql() -> str:
    return f"""WITH {TOKS_CTE}
SELECT count(*)::BIGINT AS n_docs,
       round(avg(len(ts))::DOUBLE, 6) AS avgdl,
       sum(len(ts))::BIGINT AS sum_dl
FROM toks"""


def term_dict_sql(limit: int = 20) -> str:
    return f"""WITH {TOKS_CTE},
flat AS (SELECT doc_id, unnest(ts) AS term FROM toks),
dfs AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM flat GROUP BY term)
SELECT term, df FROM dfs ORDER BY df DESC, term ASC LIMIT {limit}"""


def docid_dense_rank_sql() -> str:
    """Oracle for the dense docID assignment operator, applied to the
    documents table keyed by (source, doc_id)."""
    return """SELECT source AS conv_id, doc_id AS turn_key,
       (row_number() OVER (ORDER BY source ASC, doc_id ASC) - 1)::BIGINT AS global_doc_id
FROM documents"""


def segment_manifest_sql(docs_per_segment: int) -> str:
    return f"""WITH {TOKS_CTE},
per_doc AS (
  SELECT (doc_id // {docs_per_segment})::BIGINT AS seg_group, len(ts) AS dl
  FROM toks),
seg_terms AS (
  SELECT (doc_id // {docs_per_segment})::BIGINT AS seg_group,
         count(DISTINCT term)::BIGINT AS n_terms
  FROM (SELECT doc_id, unnest(ts) AS term FROM toks) GROUP BY 1),
seg_docs AS (
  SELECT seg_group, count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
  FROM per_doc GROUP BY 1)
SELECT d.seg_group, d.n_docs, coalesce(t.n_terms, 0) AS n_terms, d.sum_dl
FROM seg_docs d LEFT JOIN seg_terms t USING (seg_group)"""
