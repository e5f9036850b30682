"""Incremental index maintenance — batch append + Structured Streaming.

Reference: the plugin's flagship feature is INCREMENTAL merge — when a
new segment arrives with no deletes, the leading segment's graph is
expanded in place instead of rebuilt (JVectorWriter.merge incremental
branch, JVectorWriter.java:922-941; README.md:137-148). Our codec makes
the analogous property structural and stronger:

  * every append batch is assigned doc_ids starting at a FRESH chunk
    boundary (next_chunk * docs_per_chunk). doc_id gaps are free — norm
    slots for absent ids hold dl=0 and no posting ever references them;
  * therefore the new batch's merged postings rows (keyed by chunk_id)
    and chunk-norms rows are DISJOINT from every existing row: the
    append publishes them as ONE immutable DELTA directory (the Lucene
    "new segment" analog) that readers union with the base index.
    Nothing existing is rewritten — O(batch), not O(index);
  * the term dictionary (exact global df — BM25 needs exact df) is
    refreshed by a DELTA MERGE: previous dictionary version UNION the
    new waves' partials, summed, written as the next immutable
    bucket-partitioned version — O(vocab + batch), never a rescan of
    the build layer, never a single-partition write (the reference's
    "refine codebooks, don't retrain" analog, JVectorWriter.java:886-913).

At 100 TB this is the shape you want: appending a day of transcripts
touches only that day's chunks + a vocab-sized dictionary job; query
tasks fan out per (term_bucket, chunk) exactly as before.

Crash safety (single writer): the commit order is
  1. build wave        — one atomic Spark write under build/wave=W/
  2. delta publish     — stage postings+norms under deltas/.tmp_<name>,
                         then ONE atomic directory rename
  3. dictionary        — next immutable version, tagged with the delta
                         name it covers (idempotent: recovery reuses a
                         version whose tag matches instead of
                         re-folding the delta — no double counting)
  4. stats.json swap   — the SNAPSHOT POINTER: only now do readers see
                         the delta, the new dictionary and the new
                         watermark, all at once
A crash between any two steps leaves published-but-unreferenced
directories; ``append_index`` re-derives the same deterministic delta
name from the orphan waves and re-runs exactly the missing steps.
Because visibility is the stats swap, a half-finished append can never
double-score a chunk (the pre-ADVICE design appended into the live
postings dir, where a replay DID duplicate (term, chunk) rows).

Structured Streaming: ``stream_append`` wires ``append_index`` into
``foreachBatch`` — micro-batch appends with Spark's own checkpointing
providing exactly-once batch replay on top of our idempotent merge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import EngineConfig
from ..operators.docid import assign_doc_ids
from ..operators.merge import write_merged_delta
from ..sources.index_store import IndexStore


def _existing_waves(store: IndexStore) -> int:
    if not os.path.exists(store.build_path):
        return 0
    return len([d for d in os.listdir(store.build_path) if d.startswith("wave=")])


def _delta_name(min_chunk: int, max_chunk: int) -> str:
    return f"delta_c{min_chunk}_{max_chunk}"


def _new_chunk_segs(
    spark,
    store: IndexStore,
    config: EngineConfig,
    min_chunk: int,
    waves: list[int],
):
    """Build postings of the appended chunks — scans ONLY the given wave
    directories (O(batch) input, never the whole build layer)."""
    spc = config.segments_per_chunk
    return store.read_build_postings(spark, waves).filter(
        (F.col("seg_group") / spc).cast("long") >= min_chunk
    )


def _publish_delta(
    spark: SparkSession,
    store: IndexStore,
    config: EngineConfig,
    min_chunk: int,
    name: str,
    waves: list[int],
) -> None:
    """Merge every build segment in chunk >= min_chunk (disjoint from
    all merged data by construction) into ONE atomically-published
    delta directory. Idempotent: an already-published delta is reused.
    Same single-shuffle layout as merge_segments: (term_bucket,
    chunk_id) keys co-locate merge groups and match the output
    partitioning."""
    spc = config.segments_per_chunk
    segs = _new_chunk_segs(spark, store, config, min_chunk, waves)
    norms = store.read_build_norms(spark, waves).filter(
        (F.col("seg_group") / spc).cast("long") >= min_chunk
    )
    write_merged_delta(spark, store, config, segs, norms, name)


def _merge_dictionary(
    spark: SparkSession,
    store: IndexStore,
    stats: dict,
    config: EngineConfig,
    min_chunk: int,
    covers: str,
    waves: list[int],
) -> int:
    """Delta dictionary merge: previous referenced version UNION the new
    waves' partials, summed by term — input is O(vocab + batch), NOT the
    whole build layer (the round-1 implementation re-aggregated every
    wave ever built on each append). Returns the new version seq."""
    existing = store.find_dictionary_version(covers)
    if existing is not None:
        return existing
    delta = (
        _new_chunk_segs(spark, store, config, min_chunk, waves)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .select("term", F.col("df").cast("long").alias("df"))
    )
    old = store.read_dictionary(spark, stats)
    merged = (
        old.unionByName(delta).groupBy("term").agg(F.sum("df").alias("df"))
    )
    seq, _ = store.write_dictionary(merged, config, covers)
    return seq


def _apply_merged_stats(
    spark: SparkSession,
    store: IndexStore,
    stats: dict,
    config: EngineConfig,
    lineages: set[str],
    delta: str,
    dict_seq: int,
) -> dict:
    """Fold the manifest partials of freshly-merged waves into the
    corpus stats (additive — the reference's refine-not-retrain analog),
    link the delta + dictionary version into the snapshot, and mark the
    batch tags applied. THE stats swap at the end is the single commit
    point readers observe."""
    man = store.read_manifest(spark).filter(F.col("lineage").isin(list(lineages)))
    agg = man.agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("sum_dl").alias("sum_dl"),
        F.sum("n_postings").alias("n_postings"),
        F.sum("postings_bytes").alias("postings_bytes"),
        F.count("*").alias("n_segments"),
        F.max("seg_group").alias("max_seg"),
    ).collect()[0]
    if agg["n_docs"] is None:
        return stats
    stats["n_docs"] = int(stats["n_docs"]) + int(agg["n_docs"])
    stats["sum_dl"] = int(stats["sum_dl"]) + int(agg["sum_dl"])
    stats["avgdl"] = stats["sum_dl"] / stats["n_docs"] if stats["n_docs"] else 0.0
    stats["n_postings"] = int(stats.get("n_postings", 0)) + int(agg["n_postings"])
    stats["postings_bytes"] = int(stats.get("postings_bytes", 0)) + int(
        agg["postings_bytes"]
    )
    stats["n_segments"] = int(stats.get("n_segments", 0)) + int(agg["n_segments"])
    stats["n_chunks"] = max(
        int(stats.get("n_chunks", 0)),
        int(agg["max_seg"]) // config.segments_per_chunk + 1,
    )
    stats["dict_version"] = int(dict_seq)
    if delta not in stats.get("deltas", []):
        stats.setdefault("deltas", []).append(delta)
    dict_agg = (
        spark.read.schema("term_bucket int, term string, df long")
        .option(
            "basePath",
            os.path.join(store.dictionary_root, f"v{dict_seq:06d}"),
        )
        .parquet(os.path.join(store.dictionary_root, f"v{dict_seq:06d}"))
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
    applied = set(stats.get("applied_batches", []))
    applied.update(lin.split("/wave=")[0] for lin in lineages)
    stats["applied_batches"] = sorted(applied)
    store.write_stats(stats, config)
    store.gc_dictionaries(int(dict_seq))
    return stats


def _orphan_lineages(spark, store: IndexStore, config: EngineConfig, watermark: int):
    """(lineages, max_chunk, wave_ids) of built-but-unreferenced waves.
    The manifest scan is cheap (tiny rows); the heavy posting/norm reads
    that follow are pruned to exactly these wave directories."""
    man = store.read_manifest(spark)
    if man is None:
        return set(), None, []
    spc = config.segments_per_chunk
    rows = (
        man.filter((F.col("seg_group") / spc).cast("long") >= watermark)
        .groupBy("lineage")
        .agg(F.max("seg_group").alias("max_seg"))
        .collect()
    )
    if not rows:
        return set(), None, []
    max_chunk = max(int(r["max_seg"]) for r in rows) // spc
    lineages = {r["lineage"] for r in rows}
    waves = sorted(
        int(lin.rsplit("/wave=", 1)[1])
        for lin in lineages
        if "/wave=" in lin
    )
    return lineages, max_chunk, waves


def _merge_and_commit(
    spark: SparkSession,
    store: IndexStore,
    stats: dict,
    config: EngineConfig,
    watermark: int,
    max_chunk: int,
    lineages: set[str],
    waves: list[int],
) -> dict:
    name = _delta_name(watermark, max_chunk)
    _publish_delta(spark, store, config, watermark, name, waves)
    dict_seq = _merge_dictionary(
        spark, store, stats, config, watermark, covers=name, waves=waves
    )
    return _apply_merged_stats(
        spark, store, stats, config, lineages, name, dict_seq
    )


def append_index(
    spark: SparkSession,
    store: IndexStore,
    new_docs: DataFrame,
    batch_tag: str = "append",
    legacy_tags: tuple = (),
) -> dict:
    """Append a batch of transcript turns (conv_id, turn_idx, text, ...)
    to an existing index. Returns the updated corpus stats.

    New turns receive doc_ids ``chunk_base + rank(conv_id, turn_idx)``
    within the batch — stable within every batch; batches are ordered
    by arrival (the streaming analog of segment flush order, which is
    also how the reference orders concurrently-flushed segments).

    Idempotent per batch_tag (single writer): a replayed batch whose
    tag is already in the applied ledger is a no-op; a crash anywhere
    in the commit sequence (see module docstring) leaves orphan
    waves/deltas/dictionary versions that the next call re-links
    without re-merging or double-counting.
    """
    from ..operators.segment_build import build_segments_df

    ensure_chunk_watermark(spark, store)
    store.clean_stale_stages()
    stats, config = store.read_stats()
    applied = set(stats.get("applied_batches", []))
    # legacy_tags: the same batch may already sit in the ledger under
    # an older tag spelling (pre-checkpoint-scoped stream tags) — a
    # replay after upgrading must not double-append it
    if batch_tag in applied or any(t in applied for t in legacy_tags):
        return stats

    watermark = int(stats.get("n_chunks", 0))

    # orphan recovery: built-but-unreferenced waves from a crashed append
    orphans, orphan_max_chunk, orphan_waves = _orphan_lineages(
        spark, store, config, watermark
    )
    if orphans:
        stats = _merge_and_commit(
            spark, store, stats, config, watermark, orphan_max_chunk,
            orphans, orphan_waves,
        )
        store.invalidate()
        recovered = set(stats.get("applied_batches", []))
        if batch_tag in recovered or any(t in recovered for t in legacy_tags):
            return stats  # the crashed batch WAS this batch
        watermark = int(stats["n_chunks"])

    base = watermark * config.docs_per_chunk
    docs = (
        assign_doc_ids(new_docs)
        .select((F.col("doc_id") + base).alias("doc_id"), "text")
    )
    if docs.isEmpty():
        return stats
    wave = _existing_waves(store)
    lineage = f"{batch_tag}/wave={wave}"
    out = build_segments_df(docs, config, lineage=lineage)
    store.write_build_wave(out, wave=wave)
    _, max_chunk, _ = _orphan_lineages(spark, store, config, watermark)
    stats = _merge_and_commit(
        spark, store, stats, config, watermark, max_chunk, {lineage}, [wave]
    )
    store.invalidate()  # warm query caches are stale after an append
    return stats


def ensure_chunk_watermark(spark: SparkSession, store: IndexStore) -> None:
    """Backfill the n_chunks watermark for stores created by a full
    batch build (whose merge covered every chunk in the manifest)."""
    stats, config = store.read_stats()
    if "n_chunks" not in stats:
        man = store.read_manifest(spark)
        max_seg = (
            man.agg(F.max("seg_group").alias("m")).collect()[0]["m"]
            if man is not None
            else None
        )
        stats["n_chunks"] = (
            int(max_seg) // config.segments_per_chunk + 1
            if max_seg is not None
            else 0
        )
        store.write_stats(stats, config)


def stream_append(
    spark: SparkSession,
    store: IndexStore,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Attach an incremental index-append sink to a streaming DataFrame
    of transcript turns. Each micro-batch runs ``append_index`` — the
    Structured Streaming checkpoint gives exactly-once batch replay on
    top of our idempotent delta-publish commit sequence.
    """
    ensure_chunk_watermark(spark, store)
    qtag = _query_tag(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # legacy_tags: a checkpoint created before tags were
        # checkpoint-scoped may replay a batch it already published
        # under the old ``stream-{batch_id}`` spelling — treat that
        # spelling as published too (round-4 ADVICE)
        append_index(
            spark, store, batch_df, batch_tag=f"stream-{qtag}-{batch_id}",
            legacy_tags=(f"stream-{batch_id}",),
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _query_tag(checkpoint_dir: str) -> str:
    """Checkpoint-scoped component of batch tags. Structured Streaming
    batch_ids restart at 0 for every NEW checkpoint, so a tag of only
    ``stream-{batch_id}`` would collide across distinct queries against
    the same index and silently skip the second query's batches; the
    checkpoint path is the identity that makes replays (same
    checkpoint, same batch_id) and new queries (new checkpoint)
    distinguishable."""
    import hashlib

    return hashlib.sha1(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:8]


def stream_append_vectors(
    spark: SparkSession,
    index_dir: str,
    stream_df: DataFrame,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    space: str = "cosine",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Attach an IVF-append sink to a streaming DataFrame of
    embeddings: each micro-batch assigns new vectors to the EXISTING
    centroids and appends cell files (``ivf_append`` — centroid and
    codebook reuse, no rebuild). The per-batch tag makes replays
    exactly-once: a restarted query regenerates the same batch and its
    deterministic file names are skipped, never double-appended. The
    ANN analog of ``stream_append`` above."""
    from ..operators.similarity import ivf_append

    qtag = _query_tag(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ivf_append(
            spark, index_dir, batch_df, id_col=id_col, vec_col=vec_col,
            space=space, batch_tag=f"stream-{qtag}-{batch_id}",
            legacy_tags=(f"stream-{batch_id}",),
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
