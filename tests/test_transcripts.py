import numpy as np
from pyspark.sql import functions as F

from opensearch_jvector_spark.operators.docid import assign_doc_ids
from opensearch_jvector_spark.sources.transcripts import query_set, transcripts


def test_transcripts_shape_and_determinism(spark):
    df = transcripts(spark, n_convs=20, turns_per_conv=5, num_partitions=4)
    assert df.count() == 100
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    # deterministic across partition counts
    a = df.orderBy("conv_id", "turn_idx").collect()
    b = (
        transcripts(spark, n_convs=20, turns_per_conv=5, num_partitions=9)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert a == b
    # roles cycle; tool only on tool turns; ts strictly increasing
    for r in a:
        assert r["role"] == ["user", "assistant", "tool"][r["turn_idx"] % 3]
        assert (r["tool"] is not None) == (r["role"] == "tool")
        assert len(r["text"].split()) >= 1
    ts = [r["ts"] for r in a]
    assert ts == sorted(ts) and len(set(ts)) == len(ts)


def test_transcripts_skew(spark):
    df = transcripts(
        spark, n_convs=50, turns_per_conv=4, hot_terms=2, hot_prob=0.95
    )
    n = df.count()
    hot_hits = df.filter(F.col("text").contains("hot0")).count()
    assert hot_hits > 0.85 * n


def test_assign_doc_ids_dense_rank(spark):
    df = transcripts(spark, n_convs=30, turns_per_conv=4, num_partitions=5)
    out = assign_doc_ids(df, num_partitions=3)
    rows = out.orderBy("conv_id", "turn_idx").collect()
    assert [r["doc_id"] for r in rows] == list(range(120))
    # per-turn text equality invariant (FIXTURES.md §6): the doc table
    # joined back on (conv_id, turn_idx) preserves text exactly
    joined = df.join(
        out.select("conv_id", "turn_idx", F.col("text").alias("t2"), "doc_id"),
        ["conv_id", "turn_idx"],
    )
    assert joined.filter(F.col("text") != F.col("t2")).count() == 0


def test_query_set_deterministic():
    a = query_set(50)
    b = query_set(50)
    assert a == b
    assert any("zzznohit" in q["terms"] for q in a)
    assert all(1 <= len(q["terms"]) <= 4 for q in a)
