"""DuckDB oracle SQL for the dedup / similarity / text-analysis
operators (operators/dedup.py, operators/similarity.py,
operators/textstats.py).

Every generator mirrors its Spark operator expression-for-expression:
the same h32 (md5-substring) hash, the same minhash (a,b) parameters,
the same float64 expression tree, the same rounding — so the driver's
value-hash comparison agrees.
"""

from __future__ import annotations

from .functions.hashing import MERSENNE31, minhash_params
from .operators.textstats import (
    BPE_PATTERN,
    FP_BASE,
    FP_MOD,
    LANG_PROFILES,
    STOPWORDS,
)

H32 = "(('0x' || substr(md5({e}), 1, 8))::BIGINT)"

TOKS = (
    "toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),"
    " '[^a-z0-9]+'), t -> t <> '') AS ts FROM documents)"
)

# duplicate-injected derivation shared by the exact-dedup query pair
DUP_DOCS = (
    "d2 AS (SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 50)"
)


def _shingles_cte(n: int, src: str = "toks") -> str:
    return (
        f"sh AS (SELECT DISTINCT doc_id, unnest(list_transform("
        f"range(1, len(ts) - {n} + 2), "
        f"i -> array_to_string(list_slice(ts, i, i + {n} - 1), ' '))) AS shingle "
        f"FROM {src} WHERE len(ts) >= {n})"
    )


def dedup_exact_sql() -> str:
    return f"""WITH {DUP_DOCS}
SELECT doc_id, keep_id FROM (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM d2)
WHERE doc_id <> keep_id"""


_JACCARD_TAIL = """
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS c
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, round(c::DOUBLE / (sa.n_sh + sb.n_sh - c)::DOUBLE, 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c::DOUBLE / (sa.n_sh + sb.n_sh - c)::DOUBLE >= {t!r}"""


def dedup_ngram_jaccard_sql(n: int = 3, threshold: float = 0.4) -> str:
    return (
        f"WITH {TOKS},\n{_shingles_cte(n)},"
        + _JACCARD_TAIL.format(t=threshold)
    )


def _minhash_cte(num_hashes: int, shingle_n: int) -> str:
    params = minhash_params(num_hashes)
    vals = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(params))
    x = H32.format(e="shingle")
    return f"""{TOKS},
{_shingles_cte(shingle_n)},
hp(hash_id, a, b) AS (VALUES {vals}),
sig AS (
  SELECT doc_id, hash_id,
         min((a * {x} + b) % {MERSENNE31}) AS minhash
  FROM sh CROSS JOIN hp GROUP BY doc_id, hash_id)"""


def dedup_minhash_lsh_sql(
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    threshold: float = 0.5,
) -> str:
    rpb = num_hashes // bands
    return f"""WITH {_minhash_cte(num_hashes, shingle_n)},
band AS (
  SELECT doc_id, (hash_id // {rpb})::INTEGER AS band,
         string_agg(minhash::VARCHAR, ',' ORDER BY hash_id) AS band_key
  FROM sig GROUP BY doc_id, band),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band a JOIN band b USING (band, band_key)
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS c
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2)
SELECT doc_a, doc_b, round(c::DOUBLE / (sa.n_sh + sb.n_sh - c)::DOUBLE, 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c::DOUBLE / (sa.n_sh + sb.n_sh - c)::DOUBLE >= {threshold!r}"""


def _simhash_cte(bits: int = 32) -> str:
    h = H32.format(e="term")
    return f"""{TOKS},
flat AS (SELECT doc_id, unnest(ts) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf, {h} AS h
       FROM flat GROUP BY doc_id, term),
bits AS (SELECT unnest(range({bits}))::BIGINT AS bit),
per_bit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tf CROSS JOIN bits GROUP BY doc_id, bit),
sim AS (
  SELECT doc_id,
         sum(CASE WHEN s >= 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
  FROM per_bit GROUP BY doc_id)"""


def simhash_sql(bits: int = 32) -> str:
    return f"WITH {_simhash_cte(bits)}\nSELECT doc_id, simhash FROM sim"


def dedup_simhash_sql(max_hamming: int = 8, bits: int = 32) -> str:
    """BRUTE-FORCE oracle over all pairs — the semantic contract ("every
    pair within hamming <= h"), NOT a replica of the engine's banded
    blocking. The round-1 oracle replicated the (incomplete) top-half
    blocking, which made the check circular; the engine's h+1-band
    scheme is exact by pigeonhole, so it must match this."""
    return f"""WITH {_simhash_cte(bits)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


_EMB = """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ne AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e)"""


def dedup_embedding_cosine_sql(threshold: float = 0.4) -> str:
    return f"""WITH {_EMB}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cos
FROM ne a, ne b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.v, b.v) / (a.norm * b.norm) >= {threshold!r}"""


def cosine_topk_sql(
    query_vec_id: int, k: int, filter_where: str | None = None
) -> str:
    """Brute-force cosine top-k; with ``filter_where`` the ranked set
    is EXACTLY the allowed ids (the oracle shape for the small-filter
    exact fallback — allow-list brute force, NOT IVF-shaped)."""
    where = f"WHERE {filter_where}" if filter_where else ""
    return f"""WITH {_EMB},
q AS (SELECT v AS qv, norm AS qn FROM ne WHERE vec_id = {query_vec_id})
SELECT vec_id, round(cos, 6) AS cos, rank FROM (
  SELECT vec_id, list_dot_product(v, qv) / (norm * qn) AS cos,
         row_number() OVER (ORDER BY list_dot_product(v, qv) / (norm * qn) DESC,
                            vec_id ASC)::INTEGER AS rank
  FROM ne CROSS JOIN q {where}) WHERE rank <= {k}"""


def topk_space_sql(query_vec_id: int, k: int, space: str) -> str:
    """Brute-force top-k under a non-cosine similarity space, with the
    reference's score translation (SpaceType.java:43-161:
    l2/l1/linf -> 1/(1+distance); innerproduct -> ip>=0 ? ip+1 :
    1/(1-ip))."""
    if space == "l2":
        expr = (
            "1.0 / (1.0 + list_sum(list_transform(list_zip(v, qv), "
            "p -> (p[1] - p[2]) * (p[1] - p[2]))))"
        )
    elif space == "l1":
        expr = (
            "1.0 / (1.0 + list_sum(list_transform(list_zip(v, qv), "
            "p -> abs(p[1] - p[2]))))"
        )
    elif space == "linf":
        expr = (
            "1.0 / (1.0 + list_max(list_transform(list_zip(v, qv), "
            "p -> abs(p[1] - p[2]))))"
        )
    elif space == "innerproduct":
        expr = (
            "CASE WHEN list_dot_product(v, qv) >= 0 "
            "THEN list_dot_product(v, qv) + 1 "
            "ELSE 1.0 / (1.0 - list_dot_product(v, qv)) END"
        )
    else:
        raise ValueError(f"unsupported oracle space {space!r}")
    return f"""WITH {_EMB},
q AS (SELECT v AS qv FROM ne WHERE vec_id = {query_vec_id})
SELECT vec_id, round(score, 6) AS score, rank FROM (
  SELECT vec_id, {expr} AS score,
         row_number() OVER (ORDER BY {expr} DESC, vec_id ASC)::INTEGER AS rank
  FROM ne CROSS JOIN q) WHERE rank <= {k}"""


def _nested_best_cte(query_vec_id: int, cpp: int) -> str:
    """Shared CTEs for nested search: exact cosine per child, each
    parent's best child (highest cos, tie -> lowest vec_id) — the
    diversifying-children semantics of the nested knn query."""
    return f"""{_EMB},
q AS (SELECT v AS qv, norm AS qn FROM ne WHERE vec_id = {query_vec_id}),
scored AS (SELECT vec_id, CAST(FLOOR(vec_id / {cpp}) AS BIGINT) AS parent_id,
                  list_dot_product(v, qv) / (norm * qn) AS cos
           FROM ne CROSS JOIN q),
best AS (SELECT parent_id, vec_id, cos,
                row_number() OVER (PARTITION BY parent_id
                                   ORDER BY cos DESC, vec_id ASC) AS rn
         FROM scored)"""


def nested_topk_sql(query_vec_id: int, k: int, cpp: int) -> str:
    """Top-k parents by best-child cosine (nested knn,
    InternalNestedKnnVectorQuery): (parent_id, vec_id=best child,
    cos, rank)."""
    return f"""WITH {_nested_best_cte(query_vec_id, cpp)}
SELECT parent_id, vec_id, round(cos, 6) AS cos, rank FROM (
  SELECT parent_id, vec_id, cos,
         row_number() OVER (ORDER BY cos DESC, parent_id ASC)::INTEGER AS rank
  FROM best WHERE rn = 1) WHERE rank <= {k}"""


def nested_expand_sql(query_vec_id: int, k: int, cpp: int) -> str:
    """All children of the top-k parents, each exactly scored
    (ExpandNestedDocsQuery.java:40-47): (parent_id, vec_id, cos,
    parent_rank, child_rank)."""
    return f"""WITH {_nested_best_cte(query_vec_id, cpp)},
winners AS (SELECT parent_id, parent_rank FROM (
  SELECT parent_id,
         row_number() OVER (ORDER BY cos DESC, parent_id ASC)::INTEGER
           AS parent_rank
  FROM best WHERE rn = 1) WHERE parent_rank <= {k})
SELECT s.parent_id, s.vec_id, round(s.cos, 6) AS cos, w.parent_rank,
       row_number() OVER (PARTITION BY s.parent_id
                          ORDER BY s.cos DESC, s.vec_id ASC)::INTEGER
         AS child_rank
FROM scored s JOIN winners w USING (parent_id)"""


def _hybrid_lists_cte(
    terms: list[str], query_vec_id: int, n_each: int
) -> str:
    """CTE chain ending in bm(doc_id, rank) + ann(doc_id, rank): the
    two top-n_each source lists a hybrid query fuses (BM25 over
    documents, cosine over embeddings; vec_id == doc_id in the
    testdata)."""
    from .oracle_sql import bm25_cte

    return f"""{bm25_cte(terms)},
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nemb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM emb),
qv AS (SELECT v AS qv, norm AS qn FROM nemb WHERE vec_id = {query_vec_id}),
bm AS (SELECT doc_id, rank, s FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM scored) WHERE rank <= {n_each}),
ann AS (SELECT vec_id AS doc_id, rank, cos FROM (
  SELECT vec_id, list_dot_product(v, qv) / (norm * qn) AS cos,
         row_number() OVER (
           ORDER BY list_dot_product(v, qv) / (norm * qn) DESC,
                    vec_id ASC) AS rank
  FROM nemb CROSS JOIN qv) WHERE rank <= {n_each})"""


def hybrid_rrf_sql(
    terms: list[str], query_vec_id: int, n_each: int, k: int,
    rrf_k: int = 60,
) -> str:
    """Reciprocal Rank Fusion of the BM25 and cosine top-n_each lists:
    score = sum 1/(rrf_k + rank) over the sources holding the doc.
    Rank-based, so bit-identical across engines."""
    return f"""{_hybrid_lists_cte(terms, query_vec_id, n_each)},
contrib AS (
  SELECT doc_id, 1.0 / ({rrf_k} + rank) AS c FROM bm
  UNION ALL
  SELECT doc_id, 1.0 / ({rrf_k} + rank) AS c FROM ann)
SELECT doc_id, round(score, 6) AS score, rank FROM (
  SELECT doc_id, sum(c) AS score,
         row_number() OVER (ORDER BY sum(c) DESC, doc_id ASC)::INTEGER
           AS rank
  FROM contrib GROUP BY doc_id) WHERE rank <= {k}"""


def hybrid_linear_sql(
    terms: list[str], query_vec_id: int, n_each: int, k: int,
    w_bm: float, w_ann: float,
) -> str:
    """Min-max weighted linear fusion of the two lists (normalization
    processor's min_max + weighted combination). Emits (doc_id, rank)
    ONLY: normalized scores carry each engine's last-ulp BM25 drift, so
    the oracle-stable surface is the ranking, not the fused float."""
    return f"""{_hybrid_lists_cte(terms, query_vec_id, n_each)},
bmn AS (SELECT doc_id,
               {w_bm!r} * (CASE WHEN mx = mn THEN 1.0
                           ELSE (s - mn) / (mx - mn) END) AS c
        FROM bm CROSS JOIN (SELECT min(s) AS mn, max(s) AS mx FROM bm)),
annn AS (SELECT doc_id,
                {w_ann!r} * (CASE WHEN mx = mn THEN 1.0
                             ELSE (cos - mn) / (mx - mn) END) AS c
         FROM ann CROSS JOIN
              (SELECT min(cos) AS mn, max(cos) AS mx FROM ann)),
contrib AS (SELECT * FROM bmn UNION ALL SELECT * FROM annn)
SELECT doc_id, rank FROM (
  SELECT doc_id,
         row_number() OVER (ORDER BY sum(c) DESC, doc_id ASC)::INTEGER
           AS rank
  FROM contrib GROUP BY doc_id) WHERE rank <= {k}"""


# one Lloyd iteration on the first-N seed centroids: assign by argmax
# cosine, re-center on the mean of unit vectors, empty cells keep their
# seed — mirrors similarity._kmeans_refine exactly (zero-norm vectors
# contribute a zero unit vector and still count)
def _ivf_cents_cte(n_centroids: int, kmeans_iters: int) -> str:
    if kmeans_iters == 0:
        return (
            f"nc AS (SELECT vec_id AS cell, v AS c, norm AS cn FROM ne "
            f"WHERE vec_id < {n_centroids})"
        )
    if kmeans_iters != 1:
        raise ValueError("oracle supports kmeans_iters in (0, 1)")
    return f"""c0 AS (SELECT vec_id AS cell, v AS c, norm AS cn FROM ne
      WHERE vec_id < {n_centroids}),
a0 AS (SELECT vec_id, cell FROM (
    SELECT ne.vec_id, c0.cell,
           row_number() OVER (PARTITION BY ne.vec_id
             ORDER BY list_dot_product(ne.v, c0.c) / (ne.norm * c0.cn) DESC,
                      c0.cell ASC) AS rn
    FROM ne CROSS JOIN c0) WHERE rn = 1),
u AS (SELECT vec_id,
             CASE WHEN norm = 0 THEN list_transform(v, x -> 0.0)
                  ELSE list_transform(v, x -> x / norm) END AS uv FROM ne),
flat AS (SELECT a0.cell AS cell, unnest(u.uv) AS val,
                generate_subscripts(u.uv, 1) AS i
         FROM a0 JOIN u USING (vec_id)),
m AS (SELECT cell, i, sum(val) / count(*) AS mv FROM flat GROUP BY cell, i),
mc AS (SELECT cell, list(mv ORDER BY i) AS c FROM m GROUP BY cell),
cents AS (SELECT c0.cell, COALESCE(mc.c, c0.c) AS c
          FROM c0 LEFT JOIN mc USING (cell)),
nc AS (SELECT cell, c, sqrt(list_dot_product(c, c)) AS cn FROM cents)"""


def _ivf_probe_cand_cte(n_centroids: int, n_probe: int, kmeans_iters: int,
                        filter_where: str | None = None) -> str:
    """Shared probe + assignment + candidate CTEs for the single-query
    IVF oracles. ``filter_where`` (filtered vector search, Q4 embedding
    side) restricts the CANDIDATE set — the probe and the assignment
    are unfiltered, exactly like the engine's acceptDocs mask inside
    the probed-cell scan."""
    fw = f" WHERE {filter_where}" if filter_where else ""
    return f"""{_ivf_cents_cte(n_centroids, kmeans_iters)},
probe AS (
  SELECT cell FROM nc CROSS JOIN q
  ORDER BY list_dot_product(c, qv) / (cn * qn) DESC, cell ASC
  LIMIT {n_probe}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT ne.vec_id, nc.cell,
           row_number() OVER (
             PARTITION BY ne.vec_id
             ORDER BY list_dot_product(ne.v, nc.c) / (ne.norm * nc.cn) DESC,
                      nc.cell ASC) AS rn
    FROM ne CROSS JOIN nc) WHERE rn = 1),
cand AS (SELECT vec_id FROM assign JOIN probe USING (cell){fw})"""


def cosine_topk_ivf_sql(
    query_vec_id: int,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 1,
    filter_where: str | None = None,
) -> str:
    return f"""WITH {_EMB},
q AS (SELECT v AS qv, norm AS qn FROM ne WHERE vec_id = {query_vec_id}),
{_ivf_probe_cand_cte(n_centroids, n_probe, kmeans_iters, filter_where)}
SELECT vec_id, round(cos, 6) AS cos, rank FROM (
  SELECT ne.vec_id, list_dot_product(v, qv) / (norm * qn) AS cos,
         row_number() OVER (ORDER BY list_dot_product(v, qv) / (norm * qn) DESC,
                            ne.vec_id ASC)::INTEGER AS rank
  FROM ne JOIN cand USING (vec_id) CROSS JOIN q) WHERE rank <= {k}"""


def cosine_radial_ivf_sql(
    query_vec_id: int,
    min_score: float,
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 1,
) -> str:
    """Oracle for RADIAL vector search over the probed cells: every
    candidate with cos >= min_score, best-first — the `score >=
    threshold` filter replacing the top-k limit (reference
    maxDistance/minScore radial, KNNQueryBuilder.java:438-472)."""
    return f"""WITH {_EMB},
q AS (SELECT v AS qv, norm AS qn FROM ne WHERE vec_id = {query_vec_id}),
{_ivf_probe_cand_cte(n_centroids, n_probe, kmeans_iters)}
SELECT vec_id, round(cos, 6) AS cos, rank FROM (
  SELECT ne.vec_id, list_dot_product(v, qv) / (norm * qn) AS cos,
         row_number() OVER (ORDER BY list_dot_product(v, qv) / (norm * qn) DESC,
                            ne.vec_id ASC)::INTEGER AS rank
  FROM ne JOIN cand USING (vec_id) CROSS JOIN q)
WHERE cos >= {min_score!r}"""


def hamming_topk_sql(query_doc_id: int, k: int, bits: int = 32) -> str:
    """Oracle for hamming-space top-k over packed simhash fingerprints
    (KNNScoringUtil.calculateHammingBit analog): distance =
    bit_count(xor), score = 1/(1+distance), ties by doc_id."""
    return f"""WITH {_simhash_cte(bits)},
q AS (SELECT simhash AS qfp FROM sim WHERE doc_id = {query_doc_id})
SELECT doc_id, hamming, round(1.0 / (1.0 + hamming), 6) AS score, rank FROM (
  SELECT doc_id,
         bit_count(xor(simhash, qfp))::INTEGER AS hamming,
         row_number() OVER (ORDER BY bit_count(xor(simhash, qfp)) ASC,
                            doc_id ASC)::INTEGER AS rank
  FROM sim CROSS JOIN q) WHERE rank <= {k}"""


def cosine_topk_ivf_batch_sql(
    query_vec_ids: list[int],
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 1,
) -> str:
    """Oracle for the one-job BATCH IVF query: per-query probe over the
    same refined centroids, per-query top-k — the engine must be
    rank-identical per query_id."""
    vals = ", ".join(f"('q{i}', {v})" for i, v in enumerate(query_vec_ids))
    return f"""WITH {_EMB},
qs(query_id, qid) AS (VALUES {vals}),
q AS (SELECT qs.query_id, ne.v AS qv, ne.norm AS qn
      FROM qs JOIN ne ON ne.vec_id = qs.qid),
{_ivf_cents_cte(n_centroids, kmeans_iters)},
probe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, nc.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(nc.c, q.qv) / (nc.cn * q.qn) DESC,
                      nc.cell ASC) AS rn
    FROM nc CROSS JOIN q) WHERE rn <= {n_probe}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT ne.vec_id, nc.cell,
           row_number() OVER (
             PARTITION BY ne.vec_id
             ORDER BY list_dot_product(ne.v, nc.c) / (ne.norm * nc.cn) DESC,
                      nc.cell ASC) AS rn
    FROM ne CROSS JOIN nc) WHERE rn = 1),
cand AS (SELECT probe.query_id, assign.vec_id
         FROM assign JOIN probe USING (cell))
SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM (
  SELECT cand.query_id, ne.vec_id,
         list_dot_product(ne.v, q.qv) / (ne.norm * q.qn) AS cos,
         row_number() OVER (PARTITION BY cand.query_id
           ORDER BY list_dot_product(ne.v, q.qv) / (ne.norm * q.qn) DESC,
                    ne.vec_id ASC)::INTEGER AS rank
  FROM cand JOIN ne USING (vec_id) JOIN q ON q.query_id = cand.query_id)
WHERE rank <= {k}"""


def _in_list(words) -> str:
    return "(" + ", ".join("'" + w + "'" for w in words) + ")"


def language_id_sql() -> str:
    langs = sorted(LANG_PROFILES)
    hits = ",\n  ".join(
        f"len(list_filter(ts, t -> t IN {_in_list(LANG_PROFILES[lang])}))"
        f"::DOUBLE / greatest(len(ts), 1)::DOUBLE AS r_{lang}"
        for lang in langs
    )
    all_r = ", ".join(f"r_{lang}" for lang in langs)
    ladder = " ".join(
        f"WHEN r_{lang} >= greatest({all_r}) THEN '{lang}'" for lang in langs
    )
    return f"""WITH {TOKS},
scored AS (SELECT doc_id, len(ts) AS n,
  {hits}
FROM toks)
SELECT doc_id,
       CASE WHEN n = 0 OR greatest({all_r}) = 0.0 THEN 'und'
            {ladder} END AS pred_lang,
       round(greatest({all_r}), 6) AS lang_score
FROM scored"""


def quality_score_sql() -> str:
    return f"""WITH {TOKS},
feat AS (
  SELECT doc_id,
         len(ts)::INTEGER AS n_tokens,
         len(list_filter(ts, t -> t IN {_in_list(STOPWORDS)}))::BIGINT AS n_stop,
         len(list_distinct(ts))::BIGINT AS n_uniq,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(ts, t -> length(t)::BIGINT)), (a, b) -> a + b) AS sum_len
  FROM toks)
SELECT doc_id, n_tokens,
       round(n_stop::DOUBLE / greatest(n_tokens, 1)::DOUBLE, 6) AS stop_ratio,
       round(n_uniq::DOUBLE / greatest(n_tokens, 1)::DOUBLE, 6) AS uniq_ratio,
       round(sum_len::DOUBLE / greatest(n_tokens, 1)::DOUBLE, 6) AS mean_tok_len,
       round((least(n_tokens::DOUBLE / 20.0, 1.0)
              + (1.0 - abs(n_stop::DOUBLE / greatest(n_tokens, 1)::DOUBLE - 0.3) / 0.7)
              + n_uniq::DOUBLE / greatest(n_tokens, 1)::DOUBLE) / 3.0, 6) AS quality
FROM feat"""


def token_counts_sql() -> str:
    return f"""SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))::INTEGER
         AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}'))::INTEGER AS bpe_tokens,
       length(text)::INTEGER AS n_chars
FROM documents"""


def incremental_append_topk_sql(
    split_id: int, append_base: int, terms: list[str], k: int,
    k1: float = 1.2, b: float = 0.75,
) -> str:
    """Oracle for the incremental-append engine path: documents with
    doc_id < split_id are the base index; the rest are appended with
    doc_ids ``append_base + rank(source, doc_id)`` (the chunk-aligned
    re-ID the streaming layer performs). BM25 top-k over the union must
    match the engine's post-append answer exactly."""
    inner = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"""WITH d2 AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {split_id}
  UNION ALL
  SELECT {append_base} + row_number() OVER (ORDER BY source ASC, doc_id ASC) - 1
           AS doc_id, text
  FROM documents WHERE doc_id >= {split_id}),
toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
         '[^a-z0-9]+'), t -> t <> '') AS ts FROM d2),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(ts))::DOUBLE AS avgdl FROM toks),
flat AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks),
tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM flat
       WHERE term IN ({inner}) GROUP BY ALL),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * ({k1!r} + 1.0))
             / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * (tf.dl / st.avgdl)))) AS s
  FROM tf JOIN dfs USING (term) CROSS JOIN stats st
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY s DESC, doc_id ASC)::INTEGER AS rank
  FROM scored) WHERE rank <= {k}"""


def media_metadata_sql(n: int, seed: int = 0) -> str:
    """Independent oracle for the OJSM blob metadata parse: the
    synthetic generator's size formulas recomputed in SQL — the engine
    path synthesizes real binary blobs and parses their headers; this
    never touches a blob."""
    return f"""SELECT i::BIGINT AS media_id,
       CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
         AS modality,
       (8 + (i * 7 + {seed}) % 24)::INTEGER AS width,
       (8 + (i * 5 + {seed}) % 16)::INTEGER AS height,
       (CASE WHEN i % 3 = 1 THEN 1 ELSE 3 END)::INTEGER AS channels,
       (CASE WHEN i % 3 = 0 THEN 1 ELSE 2 + i % 4 END)::INTEGER AS n_frames,
       ((8 + (i * 7 + {seed}) % 24) * (8 + (i * 5 + {seed}) % 16)
        * CASE WHEN i % 3 = 1 THEN 1 ELSE 3 END
        * CASE WHEN i % 3 = 0 THEN 1 ELSE 2 + i % 4 END)::BIGINT
         AS payload_bytes
FROM generate_series(0, {n - 1}) t(i)"""


def media_frame_sample_sql(n: int, every: int = 2) -> str:
    """Oracle for video frame sampling: ids i % 3 = 2 emit frames
    0, every, ... < (2 + i % 4)."""
    return f"""SELECT i::BIGINT AS media_id,
       unnest(range(0, 2 + i % 4, {every}))::INTEGER AS frame_idx
FROM generate_series(0, {n - 1}) t(i)
WHERE i % 3 = 2"""


def media_features_sql(n: int, seed: int = 0) -> str:
    """Oracle for media_features (round-2 gap: the entry was rows-only).
    The OJSM generator is deterministic, so the expected per-blob mean
    is computable WITHOUT the engine: this recomputes every pixel with
    an INDEPENDENT pure-python splitmix64 (an int loop — not the
    engine's vectorized numpy kernel, so a numpy-kernel bug cannot
    self-confirm) and pins the result as a VALUES table."""
    M64 = (1 << 64) - 1

    def mix64(x: int) -> int:
        x &= M64
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
        return (x ^ (x >> 31)) & M64

    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        w = 8 + (i * 7 + seed) % 24
        h = 8 + (i * 5 + seed) % 16
        c = 1 if i % 3 == 1 else 3
        fr = 1 if i % 3 == 0 else 2 + i % 4
        total = w * h * c * fr
        base = (i * 0x9E3779B9) & M64
        acc = sum(mix64((base + j) & M64) & 0xFF for j in range(total))
        # no rounding: both sides sum exact integer pixel values (far
        # below 2^53), so the IEEE double of acc/total is bit-identical
        # between this int loop and the engine's float64 numpy mean —
        # rounding only introduces HALF_UP-vs-half-even tie mismatches
        rows.append((i, modality, acc / total))
    # the 'e0' suffix forces DuckDB to LEX the literal as DOUBLE:
    # a bare decimal literal parses as DECIMAL first and the
    # DECIMAL->DOUBLE cast drops the 17th significant digit
    # (observed on duckdb 1.0: 127.03348325837081 -> ...708)
    vals = ", ".join(f"({i}, '{m}', {v!r}e0)" for i, m, v in rows)
    return (
        "SELECT media_id::BIGINT AS media_id, modality, "
        "mean_val::DOUBLE AS mean_val "
        f"FROM (VALUES {vals}) AS t(media_id, modality, mean_val)"
    )


def doc_fingerprint_sql() -> str:
    h = H32.format(e="t")
    return f"""WITH {TOKS}
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, list_transform(ts, t -> {h})),
                   (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) AS fingerprint
FROM toks"""
