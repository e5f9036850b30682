"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-profile heuristic), quality scoring
(length/stopword/diversity ratios), token counting (whitespace + a
BPE-ish regex), and order-sensitive document fingerprinting (rolling
polynomial hash).

Reference analog: the script-score surface (KNNScoringSpace.java:131-235)
— per-doc scalar functions over stored values. Here every function is a
pure Catalyst expression (whole-stage codegen, zero Python in the hot
path, trivially partition-parallel at 100 TB: one scan, no shuffle),
and each has a bit-identical DuckDB oracle in oracle_sql.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h32_col
from ..functions.tokenize import tokens_col

# Per-language marker-token profiles for the n-gram/stopword heuristic.
# Deterministic and shared verbatim with the DuckDB oracle; iteration
# order (sorted keys) is the tie-break order.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "it"),
    "es": ("el", "la", "de", "y", "es", "no", "un", "con"),
    "fr": ("le", "la", "de", "et", "est", "pas", "un", "dans"),
    "zh": ("de5", "shi4", "le5", "bu4", "zai4", "you3", "he2", "wo3"),
}

# English stopword list for the quality score (shared with the oracle).
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "or", "is", "are", "to", "in",
    "it", "on", "for", "with", "as", "at", "by", "be", "this", "that",
)

# BPE-ish pre-tokenizer: word pieces OR single non-word-non-space marks
# (the GPT-2-style pretoken split, simplified to what both regex
# engines (Java in Spark, RE2-ish in DuckDB) treat identically).
BPE_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"

FP_BASE = 131
FP_MOD = 1 << 32


def _profile_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """count of tokens that appear in the profile word list."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, lang_score) — argmax over per-language
    marker-token hit ratios; ties break to the lexicographically first
    language; empty docs -> 'und'. One scan, no shuffle."""
    toks = tokens_col(text_col)
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    scored = d.select(
        "doc_id",
        F.size("toks").alias("n"),
        *[
            _profile_hits(F.col("toks"), words).alias(f"hit_{lang}")
            for lang, words in sorted(LANG_PROFILES.items())
        ],
    )
    # best = struct-max over (ratio, -lang_rank); encode tie-break by
    # comparing (hits, reverse-lexicographic lang) with greatest()
    pairs = [
        F.struct(
            (F.col(f"hit_{lang}").cast("double")
             / F.greatest(F.col("n"), F.lit(1)).cast("double")).alias("r"),
            F.lit(idx).alias("neg_rank"),
            F.lit(lang).alias("lang"),
        )
        for idx, lang in enumerate(
            sorted(LANG_PROFILES, reverse=True)
        )
    ]
    best = F.greatest(*pairs)
    return scored.select(
        "doc_id",
        F.when((F.col("n") == 0) | (best["r"] == 0.0), F.lit("und"))
        .otherwise(best["lang"]).alias("pred_lang"),
        F.round(best["r"], 6).alias("lang_score"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, uniq_ratio, mean_tok_len, quality)
    — heuristic document-quality features + composite in [0,1].
    Composite: harmonic blend rewarding length in [20,400] tokens,
    stopword ratio near 0.1..0.5, and lexical diversity."""
    toks = tokens_col(text_col)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    feat = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.filter(F.col("toks"), lambda t: F.array_contains(stop_arr, t)))
        .alias("n_stop"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.aggregate(
            F.col("toks"), F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t)
        ).alias("sum_len"),
    )
    n = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    stop_ratio = F.col("n_stop").cast("double") / n
    uniq_ratio = F.col("n_uniq").cast("double") / n
    mean_len = F.col("sum_len").cast("double") / n
    len_term = F.least(F.col("n_tokens").cast("double") / F.lit(20.0), F.lit(1.0))
    stop_term = F.lit(1.0) - F.abs(stop_ratio - F.lit(0.3)) / F.lit(0.7)
    quality = F.round(
        (len_term + stop_term + uniq_ratio) / F.lit(3.0), 6
    )
    return feat.select(
        "doc_id",
        "n_tokens",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(mean_len, 6).alias("mean_tok_len"),
        quality.alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens, n_chars) — whitespace token
    count, BPE-ish regex pretoken count, character count."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
    ws = F.size(
        F.filter(F.split(F.col("t"), "\\s+"), lambda x: x != F.lit(""))
    )
    bpe = F.size(F.regexp_extract_all(F.col("t"), F.lit(BPE_PATTERN), 0))
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length("t").alias("n_chars"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint) — ORDER-SENSITIVE rolling polynomial hash
    over token h32s: h = (h*131 + h32(tok)) mod 2^32. Distinguishes
    permuted token sequences (unlike minhash/simhash); the exact-dup
    key for streaming dedup. One scan, zero shuffle."""
    toks = tokens_col(text_col)
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    fp = F.aggregate(
        F.transform(F.col("toks"), lambda t: h32_col(t)),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(FP_BASE) + x) % F.lit(FP_MOD),
    )
    return d.select("doc_id", fp.alias("fingerprint"))
