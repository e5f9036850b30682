#!/usr/bin/env python
"""spark-submit entry point: index maintenance — append, delete,
compact, verify.

    spark-submit --py-files ojs.zip scripts/maintain.py append \
        --index /path/to/index --input /path/to/new_transcripts \
        --batch-tag day-2026-08-17
    spark-submit --py-files ojs.zip scripts/maintain.py delete \
        --index /path/to/index --doc-ids 17 42 1003
    spark-submit --py-files ojs.zip scripts/maintain.py delete \
        --index /path/to/index --doc-ids-parquet /path/to/ids
    spark-submit --py-files ojs.zip scripts/maintain.py compact \
        --index /path/to/index --docs /path/to/source_docs
    spark-submit --py-files ojs.zip scripts/maintain.py verify \
        --index /path/to/index

`append` takes raw transcript rows (conv_id, turn_idx, ..., text) and
publishes them as an atomic delta (idempotent per --batch-tag).
`delete` tombstones doc_ids (masked from queries immediately, Lucene
deleted-docs stats semantics). `compact` purges tombstones by
rebuilding only the affected chunks from the source-of-truth docs
table (doc_id, text). `verify` runs the distributed integrity check.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# allow `python scripts/x.py` from the repo root without --py-files:
# the package sits one directory above this script
import os as _os

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cmd", choices=["append", "delete", "compact", "verify"])
    ap.add_argument("--index", required=True)
    ap.add_argument("--input", help="append: parquet of transcript rows")
    ap.add_argument("--batch-tag", default=None)
    ap.add_argument("--doc-ids", nargs="*", type=int)
    ap.add_argument("--doc-ids-parquet",
                    help="delete: parquet with a doc_id column")
    ap.add_argument("--docs",
                    help="compact: parquet of the full (doc_id, text) corpus")
    ap.add_argument("--no-strict", action="store_true",
                    help="verify: report instead of raising on failure")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from opensearch_jvector_spark.sources.index_store import IndexStore

    spark = SparkSession.builder.appName(f"ojs-{args.cmd}").getOrCreate()
    store = IndexStore(args.index)
    t0 = time.perf_counter()

    if args.cmd == "append":
        if not args.input:
            ap.error("append requires --input")
        from opensearch_jvector_spark.streaming.incremental import append_index

        stats = append_index(
            spark, store, spark.read.parquet(args.input),
            batch_tag=args.batch_tag or "append",
        )
        out = {"n_docs": stats["n_docs"], "n_chunks": stats["n_chunks"],
               "deltas": stats["deltas"]}
    elif args.cmd == "delete":
        from opensearch_jvector_spark.operators.delete import delete_docs

        if args.doc_ids_parquet:
            ids = spark.read.parquet(args.doc_ids_parquet)
        elif args.doc_ids:
            ids = args.doc_ids
        else:
            ap.error("delete requires --doc-ids or --doc-ids-parquet")
        stats = delete_docs(spark, store, ids, batch_tag=args.batch_tag)
        out = {"tombstone_batches": stats["tombstone_batches"]}
    elif args.cmd == "compact":
        if not args.docs:
            ap.error("compact requires --docs")
        from opensearch_jvector_spark.operators.delete import compact_deletes

        stats = compact_deletes(spark, store, spark.read.parquet(args.docs))
        out = {"n_docs": stats["n_docs"],
               "chunk_overrides": stats["chunk_overrides"],
               "tombstone_batches": stats["tombstone_batches"]}
    else:  # verify
        from opensearch_jvector_spark.operators.integrity import verify_index

        out = verify_index(spark, store, strict=not args.no_strict)

    out["cmd"] = args.cmd
    out["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
