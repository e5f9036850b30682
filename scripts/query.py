#!/usr/bin/env python
"""spark-submit entry point: top-k / radial BM25 queries against a
built index.

    spark-submit --py-files ojs.zip scripts/query.py \
        --index /path/to/index --terms spark merge --k 10
    python scripts/query.py --index /tmp/idx --terms w00001 --min-score 0.5
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
    ap.add_argument("--index", required=True)
    ap.add_argument("--terms", nargs="+", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--min-score", type=float,
                    help="radial search instead of top-k")
    ap.add_argument("--warm", action="store_true",
                    help="warm store caches first (repeated-query mode)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from opensearch_jvector_spark.operators.wand import bm25_radial, bm25_topk
    from opensearch_jvector_spark.sources.index_store import IndexStore

    spark = SparkSession.builder.appName("ojs-query").getOrCreate()
    store = IndexStore(args.index)
    if args.warm:
        store.warm(spark)
    t0 = time.perf_counter()
    if args.min_score is not None:
        df = bm25_radial(spark, store, args.terms, args.min_score)
    else:
        df = bm25_topk(spark, store, args.terms, args.k)
    rows = [
        {"doc_id": r.doc_id, "score": round(r.score, 6), "rank": r.rank}
        for r in df.collect()
    ]
    print(json.dumps({
        "terms": args.terms,
        "latency_sec": round(time.perf_counter() - t0, 4),
        "hits": rows,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
