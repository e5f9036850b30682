"""Delete support — tombstones at query time, compact-and-rebuild (M5).

Reference: deletes force ordinal compaction and a from-scratch rebuild
of the affected segments (`JVectorWriter.java:715-748` — compaction of
the merged ordinal space over live docs; `:942-951` — the
rebuild-on-deletes merge branch; exercised by the delete+filter cases
in `KNNJVectorTests.java:1003`). Lucene semantics carry over exactly:

  * ``delete_docs`` only records tombstones — queries mask the deleted
    docs out of results, but corpus stats (df, avgdl, N) keep counting
    them until a compaction, precisely as Lucene scores against
    deleted-docs-inclusive stats between merges;
  * ``compact_deletes`` rebuilds ONLY the affected chunks (the chunks
    containing tombstoned doc_ids) from the source-of-truth text table
    — the derived-source design (S9) stores text once outside the
    index, so a rebuild is a pruned re-encode, never an index decode —
    and corrects the dictionary + corpus stats so the index becomes
    indistinguishable from one built without the deleted docs.

Scale shape (10^12 turns): tombstones are tiny parquet batches;
query-time masking is a per-chunk deny bitmap folded into the MaxScore
kernel (bounds stay valid — a mask only removes candidates). Compaction
cost is O(affected chunks), not O(index): the rebuilt postings/norms
publish as one atomic override delta; readers drop the stale chunks via
a chunk_id filter (a short isin over the overridden set) and read the
override directories instead. Stats corrections come from the per-chunk
n_docs/sum_dl carried in the norms rows and the df column of the
visible posting rows of ONLY the affected chunks — no full-index scan.

Crash safety follows the append protocol: override delta (atomic
rename, deterministic name) -> dictionary version (covers-tagged,
idempotent) -> stats swap (single visibility point) -> GC of
tombstones, superseded override deltas and old dictionary versions.
Re-running a crashed compaction regenerates byte-identical artifacts
under the same name and re-links them.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.index_store import IndexStore


def _as_id_df(spark: SparkSession, doc_ids) -> DataFrame:
    if isinstance(doc_ids, DataFrame):
        return doc_ids.select(F.col("doc_id").cast("long")).distinct()
    return spark.createDataFrame(
        [(int(i),) for i in doc_ids], "doc_id long"
    ).distinct()


def delete_docs(
    spark: SparkSession,
    store: IndexStore,
    doc_ids,
    batch_tag: str | None = None,
) -> dict:
    """Tombstone a set of doc_ids (DataFrame with a doc_id column, or an
    iterable of ints). Queries exclude them immediately; stats stay
    untouched until ``compact_deletes`` (Lucene semantics). Idempotent
    per batch_tag."""
    stats, config = store.read_stats()
    name = batch_tag or f"tomb_{len(stats['tombstone_batches'])}"
    path = store.tombstone_path(name)
    if os.path.isdir(path) and name not in stats["tombstone_batches"]:
        # stale leftover: a crashed compact_deletes GC can leave an
        # auto-named dir with the OLD batch's doc_ids — reusing it would
        # silently delete the wrong documents (round-2 ADVICE)
        shutil.rmtree(path, ignore_errors=True)
    if not os.path.isdir(path):
        _as_id_df(spark, doc_ids).write.mode("errorifexists").parquet(path)
    if name not in stats["tombstone_batches"]:
        stats["tombstone_batches"].append(name)
        store.write_stats(stats, config)
    store.invalidate()
    return stats


def _chunk_range_pred(affected: list[int], dpc: int):
    """PUSHABLE source filter for the affected chunks: an OR of
    ``doc_id BETWEEN chunk*dpc AND (chunk+1)*dpc - 1`` ranges (adjacent
    chunks coalesced). Round 3 filtered on ``(doc_id / dpc).isin(...)``
    — an expression on a COMPUTED column no parquet reader can push, so
    compacting one chunk of 32 still read every source row-group. Plain
    BETWEEN on the stored doc_id column reaches the scan as
    PushedFilters (min/max row-group pruning applies), making the
    compaction SCAN O(affected chunks) like the rebuild already was."""
    ranges: list[list[int]] = []
    for c in sorted(affected):
        if ranges and c == ranges[-1][1] + 1:
            ranges[-1][1] = c
        else:
            ranges.append([c, c])
    pred = None
    for lo, hi in ranges:
        p = F.col("doc_id").between(lo * dpc, (hi + 1) * dpc - 1)
        pred = p if pred is None else (pred | p)
    return pred


def compact_deletes(
    spark: SparkSession, store: IndexStore, docs: DataFrame
) -> dict:
    """Purge all tombstoned docs by rebuilding only the chunks that
    contain them. ``docs`` is the source-of-truth (doc_id, text) table
    the index was built from — the S9 derived-source design keeps text
    outside the index, so compaction re-encodes from source instead of
    decoding postings. After compaction the index is exactly what a
    fresh build over the remaining docs would produce (same doc_ids —
    they are stable ranks of (conv_id, turn_idx) and never renumber;
    deleted ids simply become norm gaps)."""
    from .merge import write_merged_delta
    from .segment_build import build_segments_df

    stats, config = store.read_stats()
    tombs = store.read_tombstones(spark, stats)
    if tombs is None:
        return stats
    dpc = config.docs_per_chunk
    affected = sorted(
        r["chunk_id"]
        for r in tombs.select(
            (F.col("doc_id") / dpc).cast("long").alias("chunk_id")
        )
        .distinct()
        .collect()
    )
    if not affected:
        return stats
    # name = monotonic per-store compaction sequence (persisted in
    # stats, bumped only at the stats swap) + a chunk digest. Sequence,
    # not tombstone NAMES: auto-generated names recycle ("tomb_0" again
    # once tombstone_batches clears), so a second delete+compact cycle
    # over the same chunks would reproduce the old name — the existing
    # delta dir would early-return, the purged-ledger write would be
    # skipped, and the newly deleted docs would silently resurrect
    # (round-3 ADVICE; same class as the fold_deltas content-name fix).
    # Crash retry stays deterministic: a crash before the stats swap
    # leaves the sequence unbumped, so the retry recomputes the SAME
    # name and re-links the already-published artifacts.
    seq = int(stats.get("compact_seq", 0))
    digest = hashlib.sha256(
        ",".join(map(str, affected)).encode()
    ).hexdigest()[:8]
    name = f"compact_{seq:04d}_{digest}"

    # ---- old state of the affected chunks (for stats/dictionary
    # corrections) — pruned reads, O(affected), no decode
    old_norms = (
        store.read_norms(spark, stats)
        .filter(F.col("chunk_id").isin(affected))
        .agg(
            F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl")
        )
        .collect()[0]
    )
    old_rows = store.read_postings(spark, stats).filter(
        F.col("chunk_id").isin(affected)
    )
    old_post = old_rows.agg(
        F.sum("df").alias("n_postings"),
        F.sum(F.length("doc_bytes") + F.length("tf_bytes")).alias("bytes"),
    ).collect()[0]
    old_partials = old_rows.groupBy("term").agg(
        F.sum("df").cast("long").alias("df")
    )

    # ---- rebuild the affected chunks from source, minus tombstones AND
    # minus docs purged by EARLIER compactions of these chunks (Lucene
    # liveDocs semantics: a doc deleted in a past merge round must not
    # resurrect when its chunk rebuilds again — the ledger read is
    # pruned to the affected chunks)
    sub = (
        docs.select("doc_id", "text")
        .filter(_chunk_range_pred(affected, dpc))
        .join(tombs, "doc_id", "left_anti")
    )
    prior_purged = store.read_purged(spark, stats, affected)
    if prior_purged is not None:
        sub = sub.join(prior_purged, "doc_id", "left_anti")
    build = build_segments_df(
        sub, config, lineage=name, layout="ranged"
    ).persist()
    segs = build.filter(F.col("kind") == "postings").select(
        "seg_group", "sub", "term", "df", "doc_bytes", "tf_bytes",
        "block_first", "block_last", "block_count", "block_doc_off",
        "block_tf_off", "block_max_tf", "block_min_dl",
    )
    norms = build.filter(F.col("kind") == "norms").select(
        "seg_group", "base_doc", "n_slots", "dl_bytes", "n_docs", "sum_dl"
    )
    new_man = (
        build.filter(F.col("kind") == "manifest")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_dl").alias("sum_dl"),
            F.sum("n_postings").alias("n_postings"),
            F.sum("postings_bytes").alias("bytes"),
        )
        .collect()[0]
    )

    # 1) override delta (atomic publish)
    write_merged_delta(spark, store, config, segs, norms, name)

    # 2) corrected dictionary: old - affected-chunk partials + rebuilt
    #    partials (exact df; drops terms whose last postings died)
    new_partials = segs.groupBy("term").agg(
        F.sum("df").cast("long").alias("df")
    )
    merged_dict = (
        store.read_dictionary(spark, stats)
        .unionByName(new_partials)
        .unionByName(old_partials.select("term", (-F.col("df")).alias("df")))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") > 0)
    )
    dict_seq, _ = store.write_dictionary(merged_dict, config, covers=name)
    build.unpersist()

    # 2b) purged-ledger batch: the ids this compaction removes, keyed by
    #     chunk — future compactions of these chunks must keep excluding
    #     them (content is deterministic from the tombstones, so a crash
    #     retry reuses the directory)
    if not os.path.isdir(store.purged_batch_path(name)):
        (
            tombs.select(
                (F.col("doc_id") / dpc).cast("long").alias("chunk_id"),
                "doc_id",
            )
            .write.mode("errorifexists")
            .parquet(store.purged_batch_path(name))
        )

    # 3) stats swap — the single visibility point
    overrides = dict(stats.get("chunk_overrides", {}))
    superseded = {
        overrides[str(c)] for c in affected if str(c) in overrides
    }
    for c in affected:
        overrides[str(c)] = name
    still_referenced = set(overrides.values())
    stats["chunk_overrides"] = overrides
    stats["n_docs"] = int(stats["n_docs"]) - int(old_norms["n_docs"] or 0) + int(
        new_man["n_docs"] or 0
    )
    stats["sum_dl"] = int(stats["sum_dl"]) - int(old_norms["sum_dl"] or 0) + int(
        new_man["sum_dl"] or 0
    )
    stats["avgdl"] = (
        stats["sum_dl"] / stats["n_docs"] if stats["n_docs"] else 0.0
    )
    stats["n_postings"] = (
        int(stats.get("n_postings", 0))
        - int(old_post["n_postings"] or 0)
        + int(new_man["n_postings"] or 0)
    )
    stats["postings_bytes"] = (
        int(stats.get("postings_bytes", 0))
        - int(old_post["bytes"] or 0)
        + int(new_man["bytes"] or 0)
    )
    dict_agg = (
        store.read_dictionary(spark, {**stats, "dict_version": dict_seq})
        .agg(
            F.max("df").alias("max_df"),
            F.avg("df").alias("mean_df"),
            F.count("*").alias("n_terms"),
        )
        .collect()[0]
    )
    stats["n_terms"] = int(dict_agg["n_terms"] or 0)
    stats["max_df"] = int(dict_agg["max_df"] or 0)
    stats["term_skew_ratio"] = (
        float(dict_agg["max_df"]) / float(dict_agg["mean_df"])
        if dict_agg["mean_df"]
        else 1.0
    )
    stats["dict_version"] = dict_seq
    cleared = stats["tombstone_batches"]
    stats["tombstone_batches"] = []
    stats["compact_seq"] = seq + 1
    if name not in stats.setdefault("purged_batches", []):
        stats["purged_batches"].append(name)
    store.write_stats(stats, config)

    # 4) GC: tombstones are folded in; superseded override deltas and
    #    old dictionary versions are unreachable from the new snapshot
    for t in cleared:
        shutil.rmtree(store.tombstone_path(t), ignore_errors=True)
    for d in superseded - still_referenced:
        shutil.rmtree(store.delta_path(d), ignore_errors=True)
    store.gc_dictionaries(dict_seq)
    store.invalidate()
    return stats
