"""Per-partition posting-list segment build — the flush() analog.

Reference: `JVectorWriter.flush(maxDoc, sortMap)` buffers one field's
vectors and builds an immutable per-segment DiskANN graph + metadata
(JVectorWriter.java:197-250, writeGraph :311-379). Ours: one
`applyInPandas` task per ``seg_group`` (a contiguous doc_id range)
tokenizes its turns with pyarrow compute kernels and emits delta+varint
posting blocks, doc-length norms, and a manifest row with build metrics
(reference stats analog: KNNCounter.java:13-37, KNNGraphValue.java:17-23).

Scale shape: one shuffle (repartition by seg_group), then embarrassingly
parallel Arrow kernels; doc ranges are contiguous per segment so the
postings delta-compress well and merge by concatenation. Resumable in
waves: each wave is one atomic Spark write whose manifest rows
checkpoint its seg_groups (SURVEY.md §7.1 step 7).

Everything inside the kernel is numpy/pyarrow-vectorized: no Python
loop over postings (north_star: "no per-row Python").
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.codec import varint_encode
from ..functions.tokenize import tokenize_arrow
from ..sources.index_store import BUILD_SCHEMA, IndexStore

_BUILD_KERNEL_SCHEMA = ", ".join(BUILD_SCHEMA.split(", ")[1:])  # minus `wave`
_KERNEL_COLS = [f.split(" ")[0] for f in _BUILD_KERNEL_SCHEMA.split(", ")]


def _with_all_cols(df: pd.DataFrame) -> pd.DataFrame:
    """Align a partial row set to the full kernel schema; missing cells
    are None (NOT NaN — Spark's Arrow converter rejects NaN for
    array/binary columns)."""
    for c in _KERNEL_COLS:
        if c not in df.columns:
            df[c] = None
    return df[_KERNEL_COLS]


def _encode_slice(
    doc_ids: np.ndarray,
    text: "pa.Array",
    seg: int,
    sub: int,
    config: EngineConfig,
    lineage: str,
) -> pd.DataFrame:
    """Encode one contiguous ascending-doc_id slice of one segment into
    posting rows + a norms row + a manifest row. ``sub`` is the slice's
    first doc_id — the merge orders same-(term,chunk) rows by
    (seg_group, sub), and blocks are self-contained (absolute
    block_first; deltas never cross blocks), so slices from ANY
    partitioning merge correctly."""
    bs = config.block_size
    if True:  # keep the original body's indentation
        t0 = time.perf_counter()
        row_idx, flat, dl = tokenize_arrow(text)

        # postings: sort token stream by (term_code, row) — rows are in
        # ascending doc order, so a stable sort by code keeps doc order
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        terms_in_batch = enc.dictionary
        ordr = np.argsort(codes, kind="stable")
        c_s, r_s = codes[ordr], row_idx[ordr]
        # collapse duplicates -> tf per (term, doc)
        key_change = np.empty(len(c_s), dtype=bool)
        if len(c_s):
            key_change[0] = True
            key_change[1:] = (c_s[1:] != c_s[:-1]) | (r_s[1:] != r_s[:-1])
        uniq_pos = np.nonzero(key_change)[0]
        tf = np.diff(np.concatenate((uniq_pos, [len(c_s)]))).astype(np.int64)
        p_code = c_s[uniq_pos]
        p_row = r_s[uniq_pos]
        p_doc = doc_ids[p_row]
        p_dl = dl[p_row]
        n_post = len(p_code)

        # term boundaries within the posting stream
        t_change = np.empty(n_post, dtype=bool)
        if n_post:
            t_change[0] = True
            t_change[1:] = p_code[1:] != p_code[:-1]
        t_starts = np.nonzero(t_change)[0]
        t_counts = np.diff(np.concatenate((t_starts, [n_post]))).astype(np.int64)

        # block layout: blocks restart at every term boundary
        pos_in_term = np.arange(n_post, dtype=np.int64) - np.repeat(
            t_starts, t_counts
        )
        is_block_first = (pos_in_term % bs) == 0
        deltas = np.empty(n_post, dtype=np.int64)
        if n_post:
            deltas[0] = 0
            deltas[1:] = p_doc[1:] - p_doc[:-1]
            deltas[is_block_first] = 0
        doc_bytes_all, doc_nb = varint_encode(deltas.astype(np.uint64))
        tf_bytes_all, tf_nb = varint_encode(tf.astype(np.uint64))
        doc_cum = np.concatenate(([0], np.cumsum(doc_nb)))
        tf_cum = np.concatenate(([0], np.cumsum(tf_nb)))

        b_starts = np.nonzero(is_block_first)[0]
        b_counts = np.diff(np.concatenate((b_starts, [n_post]))).astype(np.int64)
        b_ends = b_starts + b_counts - 1
        b_first = p_doc[b_starts]
        b_last = p_doc[b_ends]
        b_max_tf = (
            np.maximum.reduceat(tf, b_starts).astype(np.int32)
            if n_post
            else np.empty(0, np.int32)
        )
        b_min_dl = (
            np.minimum.reduceat(p_dl, b_starts).astype(np.int32)
            if n_post
            else np.empty(0, np.int32)
        )
        b_doc_off = doc_cum[b_starts]
        b_tf_off = tf_cum[b_starts]
        # which term does each block belong to
        b_term = np.searchsorted(t_starts, b_starts, side="right") - 1

        # per-term slices
        n_terms = len(t_starts)
        term_doc_lo = doc_cum[t_starts]
        term_doc_hi = doc_cum[np.concatenate((t_starts[1:], [n_post]))]
        term_tf_lo = tf_cum[t_starts]
        term_tf_hi = tf_cum[np.concatenate((t_starts[1:], [n_post]))]
        # blocks per term boundaries (blocks are sorted by term)
        tb_starts = np.searchsorted(b_term, np.arange(n_terms), side="left")
        tb_ends = np.searchsorted(b_term, np.arange(n_terms), side="right")

        dmv = memoryview(doc_bytes_all)
        tmv = memoryview(tf_bytes_all)
        term_strs = terms_in_batch.take(
            pa.array(p_code[t_starts], type=pa.int64())
        ).to_pylist()

        rows = {
            "kind": ["postings"] * n_terms,
            "seg_group": np.full(n_terms, seg, dtype=np.int64),
            "sub": np.full(n_terms, sub, dtype=np.int64),
            "term": term_strs,
            "df": t_counts.astype(np.int32),
            "doc_bytes": [
                bytes(dmv[term_doc_lo[i] : term_doc_hi[i]]) for i in range(n_terms)
            ],
            "tf_bytes": [
                bytes(tmv[term_tf_lo[i] : term_tf_hi[i]]) for i in range(n_terms)
            ],
            "block_first": [
                b_first[tb_starts[i] : tb_ends[i]] for i in range(n_terms)
            ],
            "block_last": [b_last[tb_starts[i] : tb_ends[i]] for i in range(n_terms)],
            "block_count": [
                b_counts[tb_starts[i] : tb_ends[i]].astype(np.int32)
                for i in range(n_terms)
            ],
            "block_doc_off": [
                (b_doc_off[tb_starts[i] : tb_ends[i]] - term_doc_lo[i])
                for i in range(n_terms)
            ],
            "block_tf_off": [
                (b_tf_off[tb_starts[i] : tb_ends[i]] - term_tf_lo[i])
                for i in range(n_terms)
            ],
            "block_max_tf": [
                b_max_tf[tb_starts[i] : tb_ends[i]] for i in range(n_terms)
            ],
            "block_min_dl": [
                b_min_dl[tb_starts[i] : tb_ends[i]] for i in range(n_terms)
            ],
        }
        out = pd.DataFrame(rows)

        # norms row: int32 dl per slot over [first_doc, last_doc] of
        # THIS slice — slices of one segment cover disjoint doc ranges,
        # so the chunk-norms merge fills them independently
        base = int(doc_ids[0]) if len(doc_ids) else 0
        n_slots = int(doc_ids[-1] - base + 1) if len(doc_ids) else 0
        dl_arr = np.zeros(n_slots, dtype=np.int32)
        dl_arr[doc_ids - base] = dl
        norms = pd.DataFrame(
            {
                "kind": ["norms"],
                "seg_group": [seg],
                "base_doc": [base],
                "n_slots": [n_slots],
                "dl_bytes": [dl_arr.tobytes()],
                # exact doc counts per slice (disjoint doc sets => the
                # chunk-norms merge can sum them; empty-text docs count
                # here even though their dl is 0)
                "n_docs": [len(doc_ids)],
                "sum_dl": [int(dl.sum())],
            }
        )

        # manifest row: checkpoint + build metrics. The digest is the
        # CANONICAL per-term form (ascending term order) shared with
        # operators/integrity.py::verify_index, so a standalone check
        # can recompute it from the stored rows after any shuffle —
        # the raw encoder-stream hash used before was ordered by
        # dictionary code (first appearance) and unreproducible.
        from .integrity import slice_digest

        digest = slice_digest(term_strs, rows["doc_bytes"], rows["tf_bytes"])
        build_ms = (time.perf_counter() - t0) * 1000.0
        mean_df = float(t_counts.mean()) if n_terms else 0.0
        manifest = pd.DataFrame(
            {
                "kind": ["manifest"],
                "seg_group": [seg],
                "n_docs": [len(doc_ids)],
                "n_terms": [n_terms],
                "n_postings": [n_post],
                "postings_bytes": [len(doc_bytes_all) + len(tf_bytes_all)],
                "sum_dl": [int(dl.sum())],
                "checksum": [digest],
                "build_ms": [build_ms],
                "terms_per_sec": [
                    (len(row_idx) / (build_ms / 1000.0)) if build_ms > 0 else 0.0
                ],
                "skew_ratio": [
                    float(t_counts.max()) / mean_df if n_terms else 1.0
                ],
                "lineage": [lineage],
            }
        )
        return pd.concat(
            [_with_all_cols(out), _with_all_cols(norms), _with_all_cols(manifest)],
            ignore_index=True,
        )


def _build_segment_kernel(config: EngineConfig, lineage: str):
    """applyInPandas kernel (grouped layout): one whole seg_group in,
    posting rows + one norms row + one manifest row out."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg_group"].iloc[0])
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
        text = pa.array(pdf["text"].to_numpy()[order], type=pa.string())
        return _encode_slice(
            doc_ids, text, seg, int(doc_ids[0]), config, lineage
        )

    return kernel


def _direct_build_iter(config: EngineConfig, lineage: str):
    """mapInPandas iterator (ranged layout): NO shuffle. Each Arrow
    batch is split at segment boundaries and every slice encoded
    independently; the merge stitches slices via (seg_group, sub).
    Right when the input is already partitioned/sorted by key range
    (e.g. an Iceberg table sorted by (conv_id, turn_idx)) — the 100TB
    path, where a groupBy shuffle of the full text would be the
    dominant cost of the whole build."""
    dps = config.docs_per_segment

    def it(batches):
        from ..functions.runtime import limit_worker_threads

        limit_worker_threads()
        for pdf in batches:
            if not len(pdf):
                continue
            order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
            doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
            texts = pdf["text"].to_numpy()[order]
            segs = doc_ids // dps
            cut = np.nonzero(np.diff(segs))[0] + 1
            bounds = np.concatenate(([0], cut, [len(doc_ids)]))
            parts = []
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                ids = doc_ids[lo:hi]
                parts.append(
                    _encode_slice(
                        ids,
                        pa.array(texts[lo:hi], type=pa.string()),
                        int(segs[lo]),
                        int(ids[0]),
                        config,
                        lineage,
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    return it


def build_segments_df(
    docs: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
    lineage: str = "build",
    layout: str = "grouped",
) -> DataFrame:
    """docs(doc_id long, text string) -> combined build rows (lazy).

    layout="grouped": one shuffle (groupBy seg_group), whole segments
    per task — any input partitioning.
    layout="ranged": NO shuffle — each input partition encodes its
    doc-range slices in place (mapInPandas); the merge stitches slices
    by (seg_group, sub=first_doc). Use when the input is already
    range-partitioned by key (sorted Iceberg table / staged docid
    output) — at 100TB this removes the full-text shuffle, the
    single largest byte-mover of the whole build."""
    if layout == "ranged":
        return docs.select("doc_id", "text").mapInPandas(
            _direct_build_iter(config, lineage), schema=_BUILD_KERNEL_SCHEMA
        )
    with_seg = docs.select(
        "doc_id", "text",
        (F.col("doc_id") / config.docs_per_segment).cast("long").alias("seg_group"),
    )
    return with_seg.groupBy("seg_group").applyInPandas(
        _build_segment_kernel(config, lineage), schema=_BUILD_KERNEL_SCHEMA
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    config: EngineConfig = DEFAULT_CONFIG,
    waves: int = 1,
    resume: bool = True,
    lineage: str = "build",
    fail_after_wave: int | None = None,
    layout: str = "grouped",
    doc_bounds: tuple[int, int] | None = None,
) -> IndexStore:
    """Build (or resume) the segment layer, then merge into the global
    index. ``waves`` splits the doc space into that many sequential
    atomic commits — the resume checkpoint granularity.

    ``doc_bounds`` = (min_doc_id, max_doc_id) when the caller already
    knows them (e.g. doc_ids are dense 0..n-1 from assign_doc_ids):
    skips the min/max aggregation job, which otherwise forces a full
    evaluation of ``docs`` BEFORE the build pass — with an unpersisted
    input that would compute the whole upstream pipeline twice.

    ``fail_after_wave`` injects a crash between waves (resume tests —
    reference analog: restart-upgrade suite qa/.../IndexingIT.java).
    """
    from .merge import merge_segments  # local import to avoid cycle

    t_start = time.perf_counter()
    store = IndexStore(root)
    done = store.completed_seg_groups(spark) if resume else set()
    if doc_bounds is not None:
        lo, hi = doc_bounds
    else:
        bounds = docs.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:
        raise ValueError("build_index: empty docs DataFrame")
    seg_lo = lo // config.docs_per_segment
    seg_hi = hi // config.docs_per_segment
    n_segs = seg_hi - seg_lo + 1
    per_wave = max(1, -(-n_segs // waves))
    existing_waves = 0
    import os

    if os.path.exists(store.build_path):
        existing_waves = len(
            [d for d in os.listdir(store.build_path) if d.startswith("wave=")]
        )
    for w in range(waves):
        w_lo = seg_lo + w * per_wave
        w_hi = min(seg_hi, w_lo + per_wave - 1)
        if w_lo > seg_hi:
            break
        done_in_wave = [s for s in range(w_lo, w_hi + 1) if s in done]
        if len(done_in_wave) == w_hi - w_lo + 1:
            continue
        # range predicate, NOT a literal id list: at 10^12 turns a wave
        # spans millions of seg ids and an isin() would bloat the plan;
        # resume excludes the (bounded, usually empty) done subset only
        seg_col = (F.col("doc_id") / config.docs_per_segment).cast("long")
        wave_docs = docs.filter((seg_col >= w_lo) & (seg_col <= w_hi))
        if done_in_wave:
            wave_docs = wave_docs.filter(~seg_col.isin(done_in_wave))
        out = build_segments_df(
            wave_docs, config, lineage=f"{lineage}/wave={w}", layout=layout
        )
        store.write_build_wave(out, wave=existing_waves + w)
        if fail_after_wave is not None and w >= fail_after_wave:
            raise RuntimeError(f"injected failure after wave {w}")
    wave_sec = time.perf_counter() - t_start
    stats = merge_segments(spark, store, config)
    # stage attribution for the scaling bench (persisted with the rest
    # of the merge report)
    stats.setdefault("merge_timings", {})["wave_build_sec"] = round(
        wave_sec, 3
    )
    store.write_stats(stats, config)
    return store
