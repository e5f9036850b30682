"""Standalone index integrity verification — the checkIntegrity analog.

Reference: `JVectorReader.checkIntegrity` re-checksums every index and
score-cache file at open (JVectorReader.java:84-96); checksum footers
are written at flush (CodecUtil.writeFooter, JVectorWriter.java:299,374).

Ours: every build segment's manifest row carries a sha256 over its
posting bytes + terms (segment_build.py). ``verify_index`` re-derives
those digests FROM THE BUILD LAYER and cross-checks three invariants of
the merged, visible index:

  V1 checksum   — per-segment sha256 recomputed from build postings
                  equals the manifest value (bit-rot / partial-write
                  detection on the build layer);
  V2 accounting — visible merged postings conserve the build layer's
                  per-chunk (n_rows is layout-dependent, but total df
                  per chunk is invariant under concat-merge), for every
                  chunk NOT rebuilt by a compaction;
  V3 norms      — per-chunk n_docs/sum_dl in the visible norms rows
                  match the corpus stats totals.

The job is fully distributed (one kernel per segment, aggregations per
chunk) and read-only. Returns a report dict; raises on failure when
``strict``.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.index_store import IndexStore


def slice_digest(terms, doc_bytes, tf_bytes) -> str:
    """CANONICAL slice digest: per-term (term, doc_bytes, tf_bytes)
    records hashed in ascending term order — independent of the
    encoder's internal dictionary-code ordering, so it is reproducible
    from the stored posting rows after any shuffle. Shared by the build
    (_encode_slice manifest) and this verifier."""
    order = sorted(range(len(terms)), key=lambda i: terms[i])
    h = hashlib.sha256()
    for i in order:
        t = terms[i]
        h.update(t.encode("utf-8") if isinstance(t, str) else bytes(t))
        h.update(doc_bytes[i])
        h.update(tf_bytes[i])
    return h.hexdigest()


def _segment_digest_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Recompute each (seg_group, sub) slice's canonical digest from
    its stored posting rows."""
    from ..functions.runtime import limit_worker_threads

    limit_worker_threads()
    out = {"seg_group": [], "sub": [], "checksum": []}
    for (seg, sub), grp in pdf.groupby(["seg_group", "sub"], sort=True):
        out["seg_group"].append(int(seg))
        out["sub"].append(int(sub))
        out["checksum"].append(
            slice_digest(
                list(grp["term"]), list(grp["doc_bytes"]), list(grp["tf_bytes"])
            )
        )
    return pd.DataFrame(out)


def verify_index(
    spark: SparkSession, store: IndexStore, strict: bool = True
) -> dict:
    """Distributed integrity check of a store. See module docstring for
    the three invariants; returns
    {checked_segments, checksum_mismatches, df_mismatched_chunks,
     norms_docs, stats_docs, ok}."""
    stats, config = store.read_stats()
    spc = config.segments_per_chunk

    # V1: per-slice digests vs manifest. Manifest rows are written one
    # per seg_group with the digest of the FULL segment in build order;
    # grouped-layout segments are a single slice, ranged-layout slices
    # each carry their own manifest row keyed by lineage — group by
    # (seg_group) and compare the sorted multiset of digests.
    segs = store.read_build_postings(spark)
    digests = (
        segs.select("seg_group", "sub", "term", "doc_bytes", "tf_bytes")
        .groupBy("seg_group", "sub")
        .applyInPandas(
            lambda pdf: _segment_digest_kernel(pdf),
            schema="seg_group long, sub long, checksum string",
        )
    )
    man = store.read_manifest(spark).select("seg_group", "checksum")
    recomputed = (
        digests.groupBy("seg_group")
        .agg(F.sort_array(F.collect_list("checksum")).alias("got"))
    )
    expected = (
        man.groupBy("seg_group")
        .agg(F.sort_array(F.collect_list("checksum")).alias("want"))
    )
    joined = recomputed.join(expected, "seg_group", "full")
    bad = joined.filter(
        F.col("got").isNull()
        | F.col("want").isNull()
        | (F.col("got") != F.col("want"))
    )
    n_bad = bad.count()
    n_segments = expected.count()

    # V2: df conservation per chunk (merge is pure concat — postings
    # counts are invariant), skipping compaction-rebuilt chunks whose
    # build-layer history intentionally no longer matches (tracked in
    # chunk_overrides while live, rebuilt_chunks after a fold).
    overridden = set(store._overridden_chunks(stats)) | {
        int(c) for c in stats.get("rebuilt_chunks", [])
    }
    build_df = (
        segs.withColumn("chunk_id", (F.col("seg_group") / spc).cast("long"))
        .groupBy("chunk_id")
        .agg(F.sum("df").alias("want_df"))
    )
    merged_df = (
        store.read_postings(spark, stats)
        .groupBy("chunk_id")
        .agg(F.sum("df").alias("got_df"))
    )
    cmp = build_df.join(merged_df, "chunk_id", "full")
    if overridden:
        cmp = cmp.filter(~F.col("chunk_id").isin(sorted(overridden)))
    df_bad = cmp.filter(
        F.coalesce(F.col("want_df"), F.lit(-1))
        != F.coalesce(F.col("got_df"), F.lit(-2))
    ).count()

    # V3: norms accounting vs corpus stats
    norms_tot = (
        store.read_norms(spark, stats)
        .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
        .collect()[0]
    )
    norms_ok = (
        int(norms_tot["n"] or 0) == int(stats["n_docs"])
        and int(norms_tot["s"] or 0) == int(stats["sum_dl"])
    )

    report = {
        "checked_segments": int(n_segments),
        "checksum_mismatches": int(n_bad),
        "df_mismatched_chunks": int(df_bad),
        "norms_docs": int(norms_tot["n"] or 0),
        "stats_docs": int(stats["n_docs"]),
        "ok": n_bad == 0 and df_bad == 0 and norms_ok,
    }
    if strict and not report["ok"]:
        raise ValueError(f"index integrity check failed: {report}")
    return report
