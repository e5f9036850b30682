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
    merge is a pure parquet APPEND into the same term_bucket partition
    layout. Nothing existing is rewritten — O(batch), not O(index);
  * only the term dictionary (exact global df — BM25 needs exact df)
    and corpus stats are refreshed, additively from the new wave's
    partials (the reference's "refine codebooks, don't retrain" analog,
    JVectorWriter.java:886-913). The dictionary rewrite is O(vocab),
    not O(postings), and swaps in atomically via directory rename.

At 100 TB this is the shape you want: appending a day of transcripts
touches only that day's chunks + a vocab-sized dictionary job; query
tasks fan out per (term_bucket, chunk) exactly as before.

Idempotence / resume: the wave write is one atomic Spark commit; the
merged-chunk watermark lives in stats.json ("n_chunks"). A crash
between wave-write and merge leaves a wave whose chunk_id > watermark;
``append_index`` re-merges exactly those waves (reference analog:
restart-upgrade suite, qa/restart-upgrade/.../IndexingIT.java:46-358).

Structured Streaming: ``stream_append`` wires ``append_index`` into
``foreachBatch`` — micro-batch appends with Spark's own checkpointing
providing exactly-once batch replay on top of our idempotent merge.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import EngineConfig
from ..operators.docid import assign_doc_ids
from ..operators.merge import _merge_iter_factory, _merge_norms_kernel
from ..sources.index_store import (
    POSTINGS_SCHEMA,
    IndexStore,
    term_bucket_col,
)

_MERGE_IN_COLS = [
    "term", "chunk_id", "term_bucket", "seg_group", "sub", "df",
    "doc_bytes", "tf_bytes", "block_first", "block_last", "block_count",
    "block_doc_off", "block_tf_off", "block_max_tf", "block_min_dl",
]


def _existing_waves(store: IndexStore) -> int:
    if not os.path.exists(store.build_path):
        return 0
    return len([d for d in os.listdir(store.build_path) if d.startswith("wave=")])


def _merge_new_chunks(
    spark: SparkSession,
    store: IndexStore,
    config: EngineConfig,
    min_chunk: int,
) -> None:
    """Append-merge every build segment in chunk >= min_chunk (disjoint
    from all merged data by construction)."""
    spc = config.segments_per_chunk
    segs = store.read_build_postings(spark).filter(
        (F.col("seg_group") / spc).cast("long") >= min_chunk
    )
    pre = (
        segs.withColumn("chunk_id", (F.col("seg_group") / spc).cast("long"))
        .withColumn(
            "term_bucket", term_bucket_col(F.col("term"), config.term_buckets)
        )
        .select(_MERGE_IN_COLS)
    )
    # same single-shuffle layout as merge_segments: (term_bucket,
    # chunk_id) keys co-locate merge groups and match the output
    # partitioning
    merged = (
        pre.repartition("term_bucket", "chunk_id")
        .sortWithinPartitions("term", "chunk_id", "seg_group", "sub")
        .mapInPandas(_merge_iter_factory(config), schema=POSTINGS_SCHEMA)
    )
    (
        merged.write.mode("append")
        .partitionBy("term_bucket")
        .parquet(store.postings_path)
    )

    norms = store.read_build_norms(spark).filter(
        (F.col("seg_group") / spc).cast("long") >= min_chunk
    )
    (
        norms.withColumn("chunk_id", (F.col("seg_group") / spc).cast("long"))
        .groupBy("chunk_id")
        .applyInPandas(
            _merge_norms_kernel(config),
            schema="chunk_id long, base_doc long, n_slots int, dl_bytes binary",
        )
        .write.mode("append")
        .parquet(store.norms_path)
    )

    # dictionary: full exact rebuild from ALL build partials — O(vocab),
    # atomic swap so concurrent readers never see a half state
    dictionary = (
        store.read_build_postings(spark)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    tmp = store.dictionary_path + ".tmp"
    dictionary.repartition(1).sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(tmp)
    old = store.dictionary_path + ".old"
    if os.path.exists(store.dictionary_path):
        os.rename(store.dictionary_path, old)
    os.rename(tmp, store.dictionary_path)
    shutil.rmtree(old, ignore_errors=True)


def _apply_merged_stats(
    spark: SparkSession,
    store: IndexStore,
    stats: dict,
    config: EngineConfig,
    lineages: set[str],
) -> dict:
    """Fold the manifest partials of freshly-merged waves into the
    corpus stats (additive — the reference's refine-not-retrain analog)
    and mark their batch tags applied."""
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
    dict_agg = (
        spark.read.parquet(store.dictionary_path)
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
    return stats


def append_index(
    spark: SparkSession,
    store: IndexStore,
    new_docs: DataFrame,
    batch_tag: str = "append",
) -> dict:
    """Append a batch of transcript turns (conv_id, turn_idx, text, ...)
    to an existing index. Returns the updated corpus stats.

    New turns receive doc_ids ``chunk_base + rank(conv_id, turn_idx)``
    within the batch — stable within every batch; batches are ordered
    by arrival (the streaming analog of segment flush order, which is
    also how the reference orders concurrently-flushed segments).

    Idempotent per batch_tag (single writer): a replayed batch whose
    tag is already in the applied ledger is a no-op; a crash between
    the wave write and the merge leaves orphan waves that are merged
    and credited on the next call before anything new is built.
    """
    from ..operators.segment_build import build_segments_df

    ensure_chunk_watermark(spark, store)
    stats, config = store.read_stats()
    applied = set(stats.get("applied_batches", []))
    if batch_tag in applied:
        return stats

    watermark = int(stats.get("n_chunks", 0))
    spc = config.segments_per_chunk

    # orphan recovery: built-but-unmerged waves from a crashed append
    man = store.read_manifest(spark)
    orphans: set[str] = set()
    if man is not None:
        orphans = {
            r["lineage"]
            for r in man.filter(
                (F.col("seg_group") / spc).cast("long") >= watermark
            )
            .select("lineage")
            .distinct()
            .collect()
        }
    if orphans:
        _merge_new_chunks(spark, store, config, min_chunk=watermark)
        stats = _apply_merged_stats(spark, store, stats, config, orphans)
        if batch_tag in set(stats.get("applied_batches", [])):
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
    _merge_new_chunks(spark, store, config, min_chunk=watermark)
    store.invalidate()  # warm query caches are stale after an append
    return _apply_merged_stats(spark, store, stats, config, {lineage})


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
    top of our idempotent chunk-aligned merge.
    """
    ensure_chunk_watermark(spark, store)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_index(spark, store, batch_df, batch_tag=f"stream-{batch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
