import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_jvector_spark.functions.codec import (
    decode_blocks,
    encode_blocks,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**35, 2**63 - 1], dtype=np.uint64)
    buf, nb = varint_encode(vals)
    assert nb.tolist() == [1, 1, 1, 2, 2, 3, 6, 9]
    out = varint_decode(buf, count=len(vals))
    np.testing.assert_array_equal(out, vals)


def test_varint_empty():
    buf, nb = varint_encode(np.empty(0, dtype=np.uint64))
    assert buf == b""
    assert len(varint_decode(buf)) == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip_hypothesis(xs):
    vals = np.array(xs, dtype=np.uint64)
    buf, _ = varint_encode(vals)
    np.testing.assert_array_equal(varint_decode(buf), vals)


@pytest.mark.parametrize("block_size", [2, 4, 128])
@pytest.mark.parametrize("n", [0, 1, 3, 4, 5, 127, 128, 129, 1000])
def test_block_roundtrip(block_size, n):
    rng = np.random.default_rng(7)
    doc_ids = np.sort(rng.choice(10 * n + 10, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(1, 200, size=n).astype(np.int64)
    enc = encode_blocks(doc_ids, tfs, dls, block_size)
    d, t = decode_blocks(enc.doc_bytes, enc.tf_bytes, enc.first_doc, enc.count)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)
    # block meta invariants
    if n:
        assert enc.first_doc[0] == doc_ids[0]
        assert enc.last_doc[-1] == doc_ids[-1]
        assert enc.count.sum() == n
        # per-block max_tf / min_dl are true bounds
        starts = np.concatenate(([0], np.cumsum(enc.count)))[:-1]
        for i, s in enumerate(starts):
            e = s + enc.count[i]
            assert enc.max_tf[i] == tfs[s:e].max()
            assert enc.min_dl[i] == dls[s:e].min()


def test_partial_block_decode():
    n, bs = 1000, 16
    doc_ids = np.arange(0, 3 * n, 3, dtype=np.int64)
    tfs = (doc_ids % 7 + 1).astype(np.int64)
    dls = (doc_ids % 31 + 1).astype(np.int64)
    enc = encode_blocks(doc_ids, tfs, dls, bs)
    sel = np.zeros(len(enc.count), dtype=bool)
    sel[1::2] = True
    d, t = decode_blocks(
        enc.doc_bytes, enc.tf_bytes, enc.first_doc, enc.count,
        block_sel=sel, doc_off=enc.doc_off, tf_off=enc.tf_off,
    )
    starts = np.concatenate(([0], np.cumsum(enc.count)))[:-1]
    keep = np.concatenate(
        [np.arange(s, s + c) for s, c, m in zip(starts, enc.count, sel) if m]
    )
    np.testing.assert_array_equal(d, doc_ids[keep])
    np.testing.assert_array_equal(t, tfs[keep])


def test_merge_is_concat():
    """Blocks store absolute first_doc => merging disjoint ascending
    doc ranges is pure concatenation (the incremental-merge invariant,
    reference README.md:137-148)."""
    a_docs = np.arange(0, 100, 2, dtype=np.int64)
    b_docs = np.arange(101, 200, 3, dtype=np.int64)
    tf_a = np.ones(len(a_docs), dtype=np.int64)
    tf_b = np.full(len(b_docs), 2, dtype=np.int64)
    dl = lambda d: (d % 13 + 1).astype(np.int64)
    ea = encode_blocks(a_docs, tf_a, dl(a_docs), 8)
    eb = encode_blocks(b_docs, tf_b, dl(b_docs), 8)
    # concat streams + meta (offsets rebased)
    doc_bytes = ea.doc_bytes + eb.doc_bytes
    tf_bytes = ea.tf_bytes + eb.tf_bytes
    first = np.concatenate((ea.first_doc, eb.first_doc))
    count = np.concatenate((ea.count, eb.count))
    d, t = decode_blocks(doc_bytes, tf_bytes, first, count)
    np.testing.assert_array_equal(d, np.concatenate((a_docs, b_docs)))
    np.testing.assert_array_equal(t, np.concatenate((tf_a, tf_b)))
