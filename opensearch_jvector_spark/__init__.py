"""opensearch_jvector_spark — a PySpark-native full-text inverted-index
build + BM25 top-k query engine.

Brand-new implementation (NOT a port) with the capabilities of the
reference engine sam-herman/opensearch-jvector (a Lucene codec extension
building per-segment DiskANN vector indexes): per-partition segment build,
incremental skew-aware merge, compressed posting storage, filtered top-k
queries with pruning + exact scoring, brute-force oracle verification,
per-segment metrics, and resumable builds.

Reference analogy map (see SURVEY.md §0 table):
  - segment flush      (JVectorWriter.flush,       reference JVectorWriter.java:197-250)
      -> operators/segment_build.py (applyInPandas posting-block build)
  - segment merge      (JVectorWriter.mergeOneField, JVectorWriter.java:174-195)
      -> operators/merge.py (salted groupBy(term) shuffle merge)
  - ordinal<->docID map (GraphNodeIdToDocMap.java:25-150)
      -> operators/docid.py (dense rank of (conv_id, turn_idx))
  - PQ compression     (JVectorWriter.getPQVectors, JVectorWriter.java:381-414)
      -> functions/codec.py (delta + varint posting blocks, block-max metadata)
  - top-k search       (JVectorReader.search, JVectorReader.java:131-212)
      -> operators/wand.py (block-max / MaxScore pruned exact BM25 top-k)
  - brute-force oracle (TestUtils.computeGroundTruthValues, TestUtils.java:131-158)
      -> operators/bruteforce.py (pure-DataFrame exact BM25)
"""

__version__ = "0.1.0"
