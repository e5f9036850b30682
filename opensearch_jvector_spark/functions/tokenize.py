"""Tokenization — the analyzer of the engine.

One spec, two implementations that MUST agree token-for-token
(tested in tests/test_tokenize.py):

* ``tokens_col`` — Catalyst expression (JVM-side, whole-stage codegen).
  Used by the brute-force oracle and all relational-side text ops, so
  Catalyst keeps predicate pushdown / codegen.
* ``tokenize_arrow`` — pyarrow.compute kernel (C++-vectorized, zero
  per-row Python). Used inside the segment-build Arrow kernels
  (north_star: "tokenize transcript turns with vectorized pandas UDFs
  (no per-row Python)").

Spec (FIXTURES.md §5): lowercase -> split on [^a-z0-9]+ -> drop empties.
No stemming, no stopword removal — skew is handled by the index
(salted merge), not the analyzer.

Reference analog: the `knn_vector` field mapper parses the document
field into the indexable value (KNNVectorFieldMapper.java:71); our
analyzer turns `text` into the indexable term stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import TOKEN_SPLIT_PATTERN


def tokens_col(text: Column | str) -> Column:
    """array<string> of tokens, as a Catalyst expression (codegen'd)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_PATTERN),
        lambda t: t != F.lit(""),
    )


# The same tokenizer as ANSI SQL, for DuckDB oracle strings.
def tokens_sql(text_expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({text_expr}), "
        f"'[^a-z0-9]+'), t -> t <> '')"
    )


def tokenize_arrow(text: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Vectorized tokenize of a string array.

    Returns ``(row_idx, flat_tokens, doc_len)``:
      row_idx    int64[n_tokens] — index of the source row per token
      flat_tokens pa.StringArray[n_tokens] — the tokens, flattened
      doc_len    int64[n_rows]   — token count per row (BM25 dl)

    Entirely pyarrow/numpy — no per-row Python.
    """
    from .runtime import limit_worker_threads
    limit_worker_threads()
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lowered = pc.utf8_lower(pc.coalesce(text, pa.scalar("")))
    toks = pc.split_pattern_regex(lowered, TOKEN_SPLIT_PATTERN)
    # ListArray -> flat values + per-row counts
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values  # includes empty strings from leading/trailing seps
    n_rows = len(toks)
    lens = np.diff(offsets)
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    nonempty = pc.greater(pc.utf8_length(values), 0)
    mask = nonempty.to_numpy(zero_copy_only=False)
    flat = values.filter(nonempty)
    row_idx = row_idx[mask]
    doc_len = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
    return row_idx, flat, doc_len
