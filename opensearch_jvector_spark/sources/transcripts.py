"""Deterministic synthetic transcripts generator (FIXTURES.md §1, §5).

Input table per BASELINE.json input_hint:
  (conv_id:string, turn_idx:int, role:string, text:string,
   tool:string, ts:timestamp)

Generated DISTRIBUTED (spark.range -> mapInPandas) with a counter-based
hash RNG (splitmix64 over the global turn id), so the content of every
row is a pure function of (seed, global_turn_id) — independent of
partition count and parallelism. That is what makes benchmark inputs at
local[8] and local[32] byte-identical, and resume tests reproducible.

Vocabulary: ``w00000..w{V-1}`` with Zipf(s) frequencies — realistic term
skew so the salted merge path is actually exercised (north_rule:
partitioning/shuffle/skew handled explicitly).

Reference analog of the fixture style: deterministic analytic vectors
(0, 1/i) with hand-computable expected scores
(KNNJVectorTests.java:56-108) and seeded random corpora checked against
brute-force ground truth (KNNJVectorTests.java:510-562).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession

EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z
ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(
    ["search", "browser", "python", "bash", "calculator", "sql", "files", "editor"]
)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_U64 = np.uint64


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized counter-based hash.

    uint64 wraparound is the algorithm; suppress numpy's scalar-overflow
    warning (arrays wrap silently, 0-d scalars warn)."""
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
        return x ^ (x >> _U64(31))


def _uniform(*keys: np.ndarray | int) -> np.ndarray:
    """U(0,1) as a pure function of the keys (vectorized)."""
    acc = _U64(0)
    for i, k in enumerate(keys):
        kk = np.asarray(k, dtype=_U64)
        acc = _mix(acc ^ _mix(kk + _U64(0x9E37 + 1000003 * i)))
    return acc.astype(np.float64) / 18446744073709551616.0


def zipf_cdf(vocab_size: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, vocab_size + 1, dtype=np.float64), s)
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


def poisson_cdf(lam: float, max_k: int = 64) -> np.ndarray:
    from math import exp, lgamma, log

    logs = [k * log(lam) - lam - lgamma(k + 1) for k in range(max_k)]
    p = np.exp(np.array(logs))
    cdf = np.cumsum(p)
    return np.clip(cdf / max(cdf[-1], 1.0), 0, 1)


def vocab_terms(vocab_size: int) -> np.ndarray:
    return np.char.add("w", np.char.zfill(np.arange(vocab_size).astype(str), 5))


def transcripts(
    spark: SparkSession,
    n_convs: int,
    turns_per_conv: int,
    seed: int = 42,
    vocab_size: int = 10_000,
    zipf_s: float = 1.1,
    mean_len: float = 12.0,
    hot_terms: int = 0,
    hot_prob: float = 0.9,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate the transcripts table, distributed + deterministic."""
    n_rows = n_convs * turns_per_conv
    cdf = zipf_cdf(vocab_size, zipf_s)
    pcdf = poisson_cdf(mean_len)
    vocab = vocab_terms(vocab_size)
    vocab_pa = pa.array(vocab.tolist(), type=pa.string())
    hot = np.array([f"hot{i}" for i in range(hot_terms)]) if hot_terms else None
    hot_pa = pa.array(hot.tolist(), type=pa.string()) if hot_terms else None
    tpc = turns_per_conv
    sd = _U64(seed)

    def gen(batches):
        from ..functions.runtime import limit_worker_threads

        limit_worker_threads()
        for pdf in batches:
            g = pdf["id"].to_numpy().astype(np.uint64)
            n = len(g)
            conv_num = (g // _U64(tpc)).astype(np.int64)
            turn_idx = (g % _U64(tpc)).astype(np.int32)
            conv_id = np.char.add(
                "conv-", np.char.zfill(conv_num.astype(str), 8)
            )
            role = ROLES[turn_idx % 3]
            tool = np.where(
                role == "tool",
                TOOLS[(_mix(g ^ sd ^ _U64(7777)) % _U64(len(TOOLS))).astype(np.int64)],
                None,
            )
            # token count per turn: Poisson(mean_len), min 1
            L = np.searchsorted(pcdf, _uniform(g, sd, 11)).astype(np.int64)
            L = np.maximum(L, 1)
            offsets = np.concatenate(([0], np.cumsum(L)))
            total = int(offsets[-1])
            parent = np.repeat(g, L)
            slot = np.arange(total, dtype=np.uint64) - np.repeat(
                offsets[:-1].astype(np.uint64), L
            )
            ranks = np.searchsorted(
                cdf, _uniform(parent, slot, sd, 23), side="right"
            )
            ranks = np.minimum(ranks, vocab_size - 1)
            flat = pc.take(vocab_pa, pa.array(ranks, type=pa.int64()))
            if hot_terms:
                # append each hot term w.p. hot_prob, deterministically
                pieces_toks = [flat]
                pieces_parent = [np.repeat(np.arange(n, dtype=np.int64), L)]
                base_parent = pieces_parent[0]
                for h in range(hot_terms):
                    m = _uniform(g, sd, 1000 + h) < hot_prob
                    idx = np.nonzero(m)[0]
                    pieces_toks.append(
                        pc.take(hot_pa, pa.array(np.full(len(idx), h), type=pa.int64()))
                    )
                    pieces_parent.append(idx.astype(np.int64))
                all_parent = np.concatenate(pieces_parent)
                order = np.argsort(all_parent, kind="stable")
                flat_all = pa.concat_arrays(
                    [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in pieces_toks]
                )
                flat = pc.take(flat_all, pa.array(order, type=pa.int64()))
                L2 = np.bincount(all_parent, minlength=n)
                offs = np.concatenate(([0], np.cumsum(L2))).astype(np.int32)
            else:
                offs = offsets.astype(np.int32)
            lst = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), flat)
            text = pc.binary_join(lst, pa.scalar(" ")).to_pandas()
            ts = pd.to_datetime(
                EPOCH_2026 + g.astype(np.int64), unit="s"
            )
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                }
            )

    parts = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_rows, numPartitions=parts)
    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def query_set(
    n_queries: int = 100,
    seed: int = 42,
    vocab_size: int = 10_000,
    zipf_s: float = 1.1,
    k: int = 10,
) -> list[dict]:
    """Deterministic reference query set (FIXTURES.md §3): mix of 1-3
    term queries; some with a high-df (hot) term, some with a zero-hit
    term (`zzznohit`)."""
    cdf = zipf_cdf(vocab_size, zipf_s)
    vocab = vocab_terms(vocab_size)
    out = []
    for q in range(n_queries):
        qid = np.uint64(q)
        n_terms = 1 + int(_uniform(qid, seed, 501)[()] * 3) % 3
        terms = []
        for j in range(n_terms):
            if q % 10 == 3 and j == 0:
                # skewed/high-df term: top zipf rank
                terms.append(str(vocab[int(_uniform(qid, seed, 601)[()] * 5)]))
            else:
                r = int(
                    np.searchsorted(cdf, _uniform(qid, np.uint64(j), seed, 701)[()])
                )
                terms.append(str(vocab[min(r, vocab_size - 1)]))
        if q % 20 == 7:
            terms.append("zzznohit")
        out.append({"query_id": f"q-{q:03d}", "terms": sorted(set(terms)), "k": k})
    return out
