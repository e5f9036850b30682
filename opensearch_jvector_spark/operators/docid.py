"""Dense global docID assignment — the Spark-native GraphNodeIdToDocMap.

The reference maintains a per-segment bidirectional ordinal<->docID map,
remapped on every sort and merge (GraphNodeIdToDocMap.java:25-150;
rationale JVectorWriter.java:63-74). We instead make docIDs *stable by
construction*: ``doc_id`` = rank of ``(conv_id, turn_idx)`` under
ascending order — a pure function of the data, never renumbered by
merges (SURVEY.md §2.2 M7).

Scale design (10^12 turns): NO global sort of turns. Two-phase prefix
sum over conversations:
  1. per-conv turn counts (groupBy — map-side combine, one shuffle of
     n_convs rows, not n_turns);
  2. range-partition convs by conv_id, local cumsum per partition,
     driver-side prefix sum of the P partition totals (P rows collected,
     not data);
  3. conv_offset joined back (shuffle on conv_id), doc_id = conv_offset
     + row_number within the conversation (Window.partitionBy(conv_id)
     — per-conv groups are tiny, no skew).

The result is deterministic regardless of partition count or sampled
range boundaries, because offsets are cumulative counts over the sorted
conv space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_offsets(
    df: DataFrame,
    num_partitions: int | None = None,
    driver_limit: int = 4_000_000,
) -> DataFrame:
    """(conv_id, conv_offset, n_turns): global turn-rank offset per conv.

    Driver fast path: when there are at most ``driver_limit``
    conversations, the per-conv counts (tiny rows) are collected, the
    prefix sum runs in numpy, and the offsets return as a local
    DataFrame — ONE Spark job instead of three (range-sampling, local
    cumsum, totals collect). At 10^12 turns / >driver_limit convs the
    distributed two-phase scheme below applies unchanged; both are
    deterministic and agree exactly (ascending conv_id cumsum)."""
    spark = df.sparkSession
    counts = df.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_convs = counts.count()
        if n_convs <= driver_limit:
            pdf = counts.toPandas()  # Arrow-batched, cached input
            pdf = pdf.sort_values("conv_id", kind="stable", ignore_index=True)
            nt = pdf["n_turns"].to_numpy(dtype=np.int64)
            pdf["conv_offset"] = np.concatenate(([0], np.cumsum(nt)[:-1]))
            return spark.createDataFrame(
                pdf[["conv_id", "conv_offset", "n_turns"]],
                schema="conv_id string, conv_offset long, n_turns long",
            )
        return _distributed_offsets(spark, counts, num_partitions)
    finally:
        counts.unpersist()


def _distributed_offsets(
    spark, counts: DataFrame, num_partitions: int | None
) -> DataFrame:
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = counts.repartitionByRange(p, "conv_id").sortWithinPartitions("conv_id")

    def local_cumsum(batches):
        from pyspark import TaskContext

        from ..functions.runtime import limit_worker_threads

        limit_worker_threads()

        pid = TaskContext.get().partitionId()
        run = 0
        for pdf in batches:
            c = pdf["n_turns"].to_numpy()
            local = run + np.concatenate(([0], np.cumsum(c)[:-1]))
            run += int(c.sum())
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "pid": np.full(len(pdf), pid, dtype=np.int64),
                    "local_off": local,
                    "n_turns": c,
                }
            )

    local = ranged.mapInPandas(
        local_cumsum, schema="conv_id string, pid long, local_off long, n_turns long"
    )
    # persist so the totals aggregation and the join read the SAME
    # materialization (range boundaries are sampled => recomputation
    # could repartition differently). On a real cluster this would be a
    # staging table write; MEMORY_AND_DISK is the local equivalent.
    local = local.persist(StorageLevel.MEMORY_AND_DISK)
    totals = (
        local.groupBy("pid").agg(F.sum("n_turns").alias("t")).orderBy("pid").collect()
    )
    rows, acc = [], 0
    for row in totals:
        rows.append((row["pid"], acc))
        acc += row["t"]
    off_df = spark.createDataFrame(rows or [(0, 0)], "pid long, part_off long")
    return (
        local.join(F.broadcast(off_df), "pid")
        .select(
            "conv_id",
            (F.col("part_off") + F.col("local_off")).alias("conv_offset"),
            "n_turns",
        )
    )


def assign_doc_ids(
    df: DataFrame,
    num_partitions: int | None = None,
    dense_turn_idx: bool | None = None,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Add dense ``doc_id`` = rank of (conv_id, turn_idx) to a
    transcripts DataFrame. Deterministic, no global sort.

    Fast path (``dense_turn_idx``): when turn_idx is already dense
    0..n-1 within every conversation — the transcripts-table contract —
    rank-within-conv IS turn_idx, so ``doc_id = conv_offset + turn_idx``
    needs only a broadcast join: ZERO shuffles of the turn table and no
    window sort (at 10^12 turns the window shuffle is the single
    biggest cost of the slow path). Auto-detected when None via one
    cheap aggregate over the per-conv counts already computed for the
    offsets; falls back to the general window path if any conversation
    has sparse/duplicated turn_idx.

    ``broadcast_offsets``: hint the offsets side of the join as
    broadcast (right for up to ~10M conversations). Set False at
    extreme conversation counts — the join becomes a shuffle hash join
    on conv_id but the plan stays window-free.
    """
    offs = conversation_offsets(df, num_partitions)
    if dense_turn_idx is None:
        probe = (
            df.groupBy("conv_id")
            .agg(
                F.count("*").alias("n"),
                F.max("turn_idx").alias("mx"),
                F.min("turn_idx").alias("mn"),
                F.countDistinct("turn_idx").alias("nd"),
            )
            .filter(
                (F.col("mx") != F.col("n") - 1)
                | (F.col("mn") != 0)
                | (F.col("nd") != F.col("n"))
            )
        )
        dense_turn_idx = probe.isEmpty()
    if dense_turn_idx:
        o = offs.select("conv_id", "conv_offset")
        if broadcast_offsets:
            o = F.broadcast(o)
        return (
            df.join(o, "conv_id")
            .withColumn("doc_id", F.col("conv_offset") + F.col("turn_idx"))
            .drop("conv_offset")
        )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        df.join(offs.select("conv_id", "conv_offset"), "conv_id")
        .withColumn(
            "doc_id", F.col("conv_offset") + F.row_number().over(w) - F.lit(1)
        )
        .drop("conv_offset")
    )
