#!/usr/bin/env python
"""spark-submit entry point: build (or resume) the inverted index.

Cluster usage (north_star: spark-submit --py-files on multi-executor
clusters):

    zip -r ojs.zip opensearch_jvector_spark
    spark-submit --py-files ojs.zip scripts/build_index.py \
        --input /path/to/transcripts_parquet --output /path/to/index \
        --layout ranged --waves 8

Local sandbox usage:

    python scripts/build_index.py --synthetic-convs 1000 \
        --output /tmp/idx

The input table must have the transcript schema (conv_id string,
turn_idx int, role string, text string, tool string, ts timestamp) or
already carry (doc_id long, text string) with --pre-assigned.
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
    ap.add_argument("--input", help="parquet path of the transcripts table")
    ap.add_argument("--synthetic-convs", type=int,
                    help="generate N synthetic conversations instead")
    ap.add_argument("--output", required=True, help="index root directory")
    ap.add_argument("--layout", choices=["grouped", "ranged"],
                    default="grouped")
    ap.add_argument("--waves", type=int, default=1,
                    help="resume-checkpoint granularity (atomic commits)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--pre-assigned", action="store_true",
                    help="input already has doc_id; skip docid assignment")
    ap.add_argument("--docs-per-segment", type=int, default=1 << 16)
    ap.add_argument("--segments-per-chunk", type=int, default=8)
    ap.add_argument("--term-buckets", type=int, default=32)
    ap.add_argument("--block-size", type=int, default=128)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from opensearch_jvector_spark.config import EngineConfig
    from opensearch_jvector_spark.operators.docid import assign_doc_ids
    from opensearch_jvector_spark.operators.segment_build import build_index

    spark = SparkSession.builder.appName("ojs-build-index").getOrCreate()
    if args.synthetic_convs:
        from opensearch_jvector_spark.sources.transcripts import transcripts

        raw = transcripts(spark, args.synthetic_convs, 25)
    elif args.input:
        raw = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic-convs is required")

    docs = (
        raw.select("doc_id", "text")
        if args.pre_assigned
        else assign_doc_ids(raw).select("doc_id", "text")
    )
    config = EngineConfig(
        block_size=args.block_size,
        docs_per_segment=args.docs_per_segment,
        segments_per_chunk=args.segments_per_chunk,
        term_buckets=args.term_buckets,
    )
    t0 = time.perf_counter()
    store = build_index(
        spark, docs, args.output, config,
        waves=args.waves, resume=not args.no_resume, layout=args.layout,
    )
    stats, _ = store.read_stats()
    stats["build_wall_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
