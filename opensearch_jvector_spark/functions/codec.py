"""Posting-block codec: delta + varint compressed docID/TF blocks with
per-block max-score metadata.

This is our analog of the reference's vector compression layer
(product quantization: JVectorWriter.getPQVectors, JVectorWriter.java:381-414;
codebook sizing JVectorFormat.java:147-178) and of its on-disk graph
serialization with varint metadata (VectorIndexFieldMetadata.toOutput,
JVectorWriter.java:416-457 — writeVInt/writeVLong).

Layout per posting list (one term within one doc-range):
  * postings are (doc_id, tf) pairs sorted by doc_id, cut into blocks of
    ``block_size``;
  * each block stores: first_doc (absolute, in block meta), then varint
    deltas of doc_ids (first delta == 0), and varint tfs, in two
    separate byte streams;
  * block meta arrays: first_doc, last_doc, count, byte offsets into
    both streams, max_tf and min_dl (the block-max score bound inputs:
    BM25 tf-norm is increasing in tf and decreasing in dl, so
    (max_tf, min_dl) yields a valid per-block score upper bound —
    reference analog: neighbors-score-cache + PQ approximate scores used
    to prune before exact rerank, JVectorReader.java:154-182).

Because every block's first_doc is absolute and deltas never cross block
boundaries, MERGING two posting lists over disjoint ascending doc ranges
is pure concatenation — no re-encode. That is what makes the reference's
flagship incremental merge (JVectorWriter.java:922-941,
README.md:137-148) cheap in our design.

Everything is numpy-vectorized; no Python loop over postings.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def varint_byte_len(values: np.ndarray) -> np.ndarray:
    """Number of varint bytes per value (uint64 in, int64 out)."""
    v = values.astype(np.uint64, copy=False)
    n = np.ones(len(v), dtype=np.int64)
    for t in _THRESHOLDS[:-1]:
        n += (v >= t).astype(np.int64)
    return n


def varint_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array. Returns (bytes, per-value byte length).

    Vectorized: one pass per possible byte position (<= 9 passes).
    """
    v = values.astype(np.uint64, copy=False)
    nb = varint_byte_len(v)
    ends = np.cumsum(nb)
    starts = ends - nb
    total = int(ends[-1]) if len(v) else 0
    out = np.zeros(total, dtype=np.uint8)
    shifted = v.copy()
    for byte_pos in range(9):
        alive = nb > byte_pos
        if not alive.any():
            break
        idx = starts[alive] + byte_pos
        chunk = (shifted[alive] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[alive] > byte_pos + 1).astype(np.uint8) << 7
        out[idx] = chunk | cont
        shifted = shifted >> np.uint64(7)
    return out.tobytes(), nb


def varint_decode(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte stream back to uint64. Fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.nonzero(is_end)[0]
    starts = np.concatenate(([0], ends[:-1] + 1)).astype(np.int64)
    lens = ends - starts + 1
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    vals = np.add.reduceat(contrib, starts)
    if count is not None and len(vals) != count:
        raise ValueError(f"varint stream corrupt: {len(vals)} != {count}")
    return vals


@dataclass
class EncodedPostings:
    """One term's encoded posting list (within one doc range)."""

    doc_bytes: bytes
    tf_bytes: bytes
    first_doc: np.ndarray  # int64 per block
    last_doc: np.ndarray  # int64 per block
    count: np.ndarray  # int32 per block
    doc_off: np.ndarray  # int64 byte offset of each block in doc_bytes
    tf_off: np.ndarray  # int64 byte offset of each block in tf_bytes
    max_tf: np.ndarray  # int32 per block
    min_dl: np.ndarray  # int32 per block


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
) -> EncodedPostings:
    """Encode one sorted posting list into delta+varint blocks.

    doc_ids: strictly ascending int64; tfs/dls: per-posting int.
    """
    n = len(doc_ids)
    if n == 0:
        z8 = np.empty(0, np.int64)
        z4 = np.empty(0, np.int32)
        return EncodedPostings(b"", b"", z8, z8, z4, z8, z8, z4, z4)
    pos = np.arange(n, dtype=np.int64)
    block_first = (pos % block_size) == 0
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    deltas[block_first] = 0  # block-first doc stored absolutely in meta
    doc_bytes, doc_nb = varint_encode(deltas.astype(np.uint64))
    tf_bytes, tf_nb = varint_encode(tfs.astype(np.uint64))
    starts = np.nonzero(block_first)[0]
    ends = np.concatenate((starts[1:], [n])) - 1
    doc_cum = np.concatenate(([0], np.cumsum(doc_nb)))
    tf_cum = np.concatenate(([0], np.cumsum(tf_nb)))
    return EncodedPostings(
        doc_bytes=doc_bytes,
        tf_bytes=tf_bytes,
        first_doc=doc_ids[starts].astype(np.int64),
        last_doc=doc_ids[ends].astype(np.int64),
        count=(ends - starts + 1).astype(np.int32),
        doc_off=doc_cum[starts].astype(np.int64),
        tf_off=tf_cum[starts].astype(np.int64),
        max_tf=np.maximum.reduceat(tfs.astype(np.int32), starts),
        min_dl=np.minimum.reduceat(dls.astype(np.int32), starts),
    )


def decode_blocks(
    doc_bytes: bytes | memoryview,
    tf_bytes: bytes | memoryview,
    first_doc: np.ndarray,
    count: np.ndarray,
    block_sel: np.ndarray | None = None,
    doc_off: np.ndarray | None = None,
    tf_off: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode (all, or a selected subset of) blocks -> (doc_ids, tfs).

    ``block_sel``: optional bool mask over blocks (block-max pruning —
    skipped blocks are never even decoded; requires doc_off/tf_off).
    """
    if block_sel is not None and not block_sel.all():
        # gather only surviving blocks' byte ranges (few slices: per block)
        idx = np.nonzero(block_sel)[0]
        if len(idx) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        doc_end = np.concatenate((doc_off[1:], [len(doc_bytes)]))
        tf_end = np.concatenate((tf_off[1:], [len(tf_bytes)]))
        dmv, tmv = memoryview(doc_bytes), memoryview(tf_bytes)
        doc_buf = b"".join(dmv[doc_off[i] : doc_end[i]] for i in idx)
        tf_buf = b"".join(tmv[tf_off[i] : tf_end[i]] for i in idx)
        first_doc = first_doc[idx]
        count = count[idx]
        doc_bytes, tf_bytes = doc_buf, tf_buf
    deltas = varint_decode(doc_bytes).astype(np.int64)
    tfs = varint_decode(tf_bytes).astype(np.int64)
    n = len(deltas)
    if n == 0:
        return deltas, tfs
    # segmented cumsum: within each block, doc = first_doc + cumsum(deltas)
    # (delta at each block start is 0, so raw - raw[start] restarts the sum)
    starts = np.concatenate(([0], np.cumsum(count)))[:-1].astype(np.int64)
    raw = np.cumsum(deltas)
    block_of = np.repeat(np.arange(len(starts)), count.astype(np.int64))
    raw_at_start = raw[starts]
    doc_ids = raw - raw_at_start[block_of] + first_doc.astype(np.int64)[block_of]
    return doc_ids, tfs
