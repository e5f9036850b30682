"""Engine configuration.

Mirrors the reference's method-parameter registry
(reference: JVectorDiskANNMethod.java:37-89 — m/ef_construction/alpha/...)
as a plain dataclass: every knob the build + query pipeline reads lives
here, validated once at construction (reference analog:
KNNQueryBuilder.doToQuery validation, KNNQueryBuilder.java:380-609).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

# BM25 constants (fixed by BASELINE.json north_star: k1=1.2, b=0.75).
BM25_K1 = 1.2
BM25_B = 0.75

# Tokenizer spec shared by generator, engine and oracle (FIXTURES.md §5):
# lowercase -> split on [^a-z0-9]+ -> drop empty tokens.
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"


@dataclass(frozen=True)
class EngineConfig:
    """All build/query knobs.

    Scale notes (100 TB / 10^12 turns): ``docs_per_segment`` bounds the
    Arrow batch a single build task materializes; ``segments_per_chunk``
    sets query-time parallelism (one chunk = one WAND task's doc range);
    ``term_buckets`` is the partition count of the global index for
    partition pruning on query terms; ``max_row_postings`` caps a single
    merged posting row (the salting unit for skewed/stopword terms).
    """

    k1: float = BM25_K1
    b: float = BM25_B

    # posting-block codec (reference analog: PQ block encoding,
    # JVectorFormat.getDefaultNumberOfSubspacesPerVector:147-178)
    block_size: int = 128

    # build-time segmentation (reference analog: Lucene segment = flush unit)
    docs_per_segment: int = 1 << 16

    # merge-time chunking: query-parallel doc ranges
    segments_per_chunk: int = 8

    # global index layout
    term_buckets: int = 32

    # salting cap: a merged row never exceeds this many postings; hot
    # (stopword) terms split into multiple rows (north_rule: explicit skew)
    max_row_postings: int = 1 << 18

    # NOTE on reference knobs deliberately ABSENT here: the reference's
    # overquery_factor + rescore oversampling (KNNConstants.java:119,
    # RescoreContext.java:20-60) trade recall for latency in an
    # approximate engine; MaxScore over BM25 is exact, so the knobs
    # would be dead weight for TEXT queries (round-1 carried an unused
    # overquery_factor stub — deleted). On the embedding ANN side the
    # trade is real and the knobs DO exist, where they belong:
    # similarity.ivf_query(use_pq=..., overquery=...) is the literal
    # overquery+rerank mechanism (quantize.py trains the codebooks),
    # and with overquery=None the budget follows the reference's
    # dimension-based policy (similarity.rescore_first_pass_k —
    # RescoreContext.getFirstPassK, RescoreContext.java:82-97).
    # The exact-search-threshold switch (KNNSettings.java:70,87)
    # survives as driver_topk_max_postings.

    # small-query fast path: when a warmed store holds driver-side
    # norms and the query terms' total postings fit under this cap, the
    # query runs entirely driver-side on the pruned parquet slices (no
    # Spark job — the reference's exact-search-threshold switch,
    # KNNSettings.java:70, applied to job-dispatch overhead). Large or
    # filtered queries always take the distributed path.
    driver_topk_max_postings: int = 5_000_000

    def __post_init__(self) -> None:
        if self.block_size < 2:
            raise ValueError("block_size must be >= 2")
        if self.docs_per_segment < self.block_size:
            raise ValueError("docs_per_segment must be >= block_size")
        if self.segments_per_chunk < 1:
            raise ValueError("segments_per_chunk must be >= 1")
        if self.term_buckets < 1:
            raise ValueError("term_buckets must be >= 1")
        if self.max_row_postings < self.block_size:
            raise ValueError("max_row_postings must be >= block_size")

    @property
    def docs_per_chunk(self) -> int:
        return self.docs_per_segment * self.segments_per_chunk

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = EngineConfig()

# Small config for unit tests: tiny segments so multi-segment /
# multi-chunk code paths are exercised on hundreds of rows.
TEST_CONFIG = EngineConfig(
    block_size=4,
    docs_per_segment=32,
    segments_per_chunk=2,
    term_buckets=4,
    max_row_postings=64,
)
