import numpy as np
import pyarrow as pa

from opensearch_jvector_spark.functions.tokenize import (
    tokenize_arrow,
    tokens_col,
    tokens_sql,
)

TEXTS = [
    "Hello, World! 42",
    "  leading and trailing  ",
    "",
    "UPPER lower MiXeD",
    "a--b__c..d",
    "éé accents stay-out",  # non-ascii chars act as separators
    None,
    "123 456 one2three",
]
EXPECTED = [
    ["hello", "world", "42"],
    ["leading", "and", "trailing"],
    [],
    ["upper", "lower", "mixed"],
    ["a", "b", "c", "d"],
    ["accents", "stay", "out"],
    [],
    ["123", "456", "one2three"],
]


def test_tokenize_arrow():
    row_idx, flat, dl = tokenize_arrow(pa.array(TEXTS, type=pa.string()))
    toks = flat.to_pylist()
    got = [[] for _ in TEXTS]
    for r, t in zip(row_idx, toks):
        got[r].append(t)
    assert got == EXPECTED
    assert dl.tolist() == [len(e) for e in EXPECTED]


def test_tokenize_catalyst_matches_arrow(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "i int, text string")
    rows = df.select("i", tokens_col("text").alias("toks")).orderBy("i").collect()
    got = [r["toks"] if r["toks"] is not None else [] for r in rows]
    assert got == EXPECTED


def test_tokenize_duckdb_matches(spark):
    import duckdb

    con = duckdb.connect()
    got = []
    for t in TEXTS:
        if t is None:
            got.append([])
            continue
        (res,) = con.execute(
            f"select {tokens_sql('?::VARCHAR')}", [t]
        ).fetchone()
        got.append(list(res))
    assert got == EXPECTED
