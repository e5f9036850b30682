"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), word-n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup. All are pure declarative DataFrame plans
(Catalyst-optimizable, shuffle-explicit); the only shuffle keys are
content hashes / shingles / band buckets, which distribute uniformly
at 100 TB (content hashes don't skew; shingle joins cap hot shingles
via a df filter).

Portability: every hash is the md5-derived h32 (functions/hashing.py)
so DuckDB oracles reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE31, h32_col, minhash_params
from ..functions.tokenize import tokens_col


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, keep_id): one row per REMOVED duplicate, pointing at the
    surviving (minimum-id) doc with identical text. Shuffle key is the
    md5 of the text — uniform, never skewed, and tiny vs full text."""
    h = docs.select(F.col(id_col).alias("doc_id"), F.md5(text_col).alias("th"))
    w = Window.partitionBy("th")
    return (
        h.withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id", "keep_id")
    )


def _shingles(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).filter(F.size("toks") >= n)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {n} + 1), "
                f"i -> concat_ws(' ', slice(toks, i, {n})))"
            )
        ).alias("shingle"),
    )
    return sh.distinct()


def dedup_ngram_jaccard(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) near-dup pairs with word-n-gram Jaccard
    >= threshold, doc_a < doc_b.

    Scale note: the self-join explodes on hot shingles; at 100 TB pass
    ``max_shingle_df`` to drop boilerplate shingles (a standard recall
    trade logged by the caller). Left None for oracle-exact runs."""
    sh = _shingles(docs, n, text_col, id_col)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        )
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("c").cast("double")
            / (F.col("na") + F.col("nb") - F.col("c")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    shingle_n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, hash_id, minhash) — MinHash over word-shingle h32s.
    Declarative: explode shingles x broadcast hash params, two-stage
    min aggregation (map-side partial combine does the heavy lifting)."""
    spark = docs.sparkSession
    params = minhash_params(num_hashes)
    pdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(params)], "hash_id int, a long, b long"
    )
    sh = _shingles(docs, shingle_n, text_col, id_col).withColumn(
        "x", h32_col(F.col("shingle"))
    )
    return (
        sh.crossJoin(F.broadcast(pdf))
        .withColumn("h", (F.col("a") * F.col("x") + F.col("b")) % MERSENNE31)
        .groupBy("doc_id", "hash_id")
        .agg(F.min("h").alias("minhash"))
    )


def dedup_minhash_lsh(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, jaccard) candidate pairs sharing >=1 LSH band,
    verified with exact shingle Jaccard >= threshold.

    Scale shape: band buckets are the shuffle key (uniform md5-space);
    a bucket with B docs yields B^2 candidates — identical-boilerplate
    floods are first collapsed by dedup_exact upstream in a real
    pipeline."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, shingle_n, text_col, id_col)
    band = (
        sig.withColumn("band", (F.col("hash_id") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("hash_id", "minhash"))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("band_key")
        )
    )
    a = band.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = band.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact verification of candidates only
    sh = _shingles(docs, shingle_n, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    ja = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    jb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(ja, "doc_a")
        .join(jb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("c").cast("double")
            / (F.col("na") + F.col("nb") - F.col("c")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — tf-weighted bit-majority simhash of token
    h32s. Declarative: explode tokens x bit positions, sign-sum per bit,
    pack. Two shuffles, both on uniform keys."""
    spark = docs.sparkSession
    bit_df = spark.range(bits).select(F.col("id").cast("int").alias("bit"))
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks"))
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", h32_col(F.col("term")))
    )
    per_bit = (
        tf.crossJoin(F.broadcast(bit_df))
        .withColumn(
            "contrib",
            F.when(
                F.expr("shiftright(h, bit) & 1") == 1,
                F.col("tf"),
            ).otherwise(-F.col("tf")),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("s"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(1L, bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def dedup_simhash(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with simhash hamming distance <=
    max_hamming. The pair join is blocked on the top half of the hash
    (a doc pair within hamming<=3 of 32 bits usually shares one half —
    classic simhash blocking; exact for the oracle since we verify
    distance, and the oracle uses the same blocking)."""
    s = simhash(docs, bits, text_col, id_col)
    blocked = s.withColumn("blk", F.shiftright(F.col("simhash"), bits // 2))
    a = blocked.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "blk"
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_embedding_cosine(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_id: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b, cos) embedding near-dup pairs, cosine >= threshold.

    Brute-force pairwise (exact oracle path); at 100 TB the LSH-bucketed
    variant in similarity.py prunes the pair space first. ``max_id``
    bounds the quadratic blowup for test corpora."""
    e = embeddings.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if max_id is not None:
        e = e.filter(F.col("vid") < max_id)
    e = e.withColumn(
        "norm",
        F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    a = e.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"),
                 F.col("norm").alias("na"))
    b = e.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("norm").alias("nb"))
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )
