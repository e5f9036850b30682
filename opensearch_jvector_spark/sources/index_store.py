"""On-disk index layout + manifests — the segment/metadata file analog.

Reference: each flush/merge writes a metadata file, an index data file
and a score-cache file per segment (JVectorFormat.java:24-30), with
offsets recorded in per-field metadata (JVectorWriter.java:416-457) and
checksums verified at open (JVectorReader.checkIntegrity:84-96).

Ours (all parquet; Iceberg is the cluster deployment target — its jars
are not in this sandbox, so the store is a directory layout with the
same append/snapshot semantics):

  <root>/
    build/                  per-wave build output, appended per wave;
      wave=W/kind=postings/ (seg_group, term, df, blocks...)
      wave=W/kind=norms/    (seg_group, base_doc, n_slots, dl_bytes, ...)
      wave=W/kind=manifest/ per-segment manifest rows
    postings/               merged base index, partitioned by term_bucket
    norms/                  merged per-chunk doc-length arrays + counts
    deltas/<name>/          one atomic incremental-append unit:
      postings/term_bucket=*/   chunk-disjoint merged postings
      norms/                    the new chunks' norms rows
    dictionary/vNNNNNN/     immutable (term, df) versions, bucketed by
                            term_bucket; highest committed version wins
    tombstones/<name>/      deleted doc_ids, one atomic batch per dir
    stats.json              THE SNAPSHOT POINTER: corpus stats + config
                            + the visible delta names, chunk overrides
                            and tombstone batches. Readers see exactly
                            the state stats.json references — a crashed
                            append leaves published-but-unreferenced
                            dirs that recovery re-links idempotently.

Atomicity protocol (reference analog: checksum footers + BWC
restart-upgrade suites, JVectorReader.java:84-96, qa/restart-upgrade/
.../IndexingIT.java:46-358; the snapshot-pointer design is Iceberg's
metadata-file model re-expressed on a filesystem):

  * a build wave commits in ONE Spark write (postings+norms+manifest
    under wave=W/ — either all visible or none);
  * a delta is STAGED at deltas/.tmp_<name> (two Spark writes) and
    PUBLISHED by a single atomic directory rename;
  * a dictionary version directory is immutable once its _covers.json
    marker exists; the marker names the merge step that produced it,
    so crash recovery can tell "already computed" from "recompute";
  * stats.json is swapped with os.replace — the only mutation readers
    ever observe.

Scale notes (10^12 turns): the dictionary is partitioned by term_bucket
(same pruning as postings — a query touches only its terms' buckets;
NO single-partition write, NO unconditional driver collect). Norms are
one row per chunk (~2M rows at 10^12 turns) carrying exact per-chunk
n_docs/sum_dl so stats updates after compaction never rescan postings.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig

# 2: snapshot-pointer store (deltas, versioned dictionary, tombstones)
# 3: canonical term-ordered manifest digests (operators/integrity.py)
STORE_FORMAT = 3

# one combined schema for the per-wave build write; each `kind` uses the
# columns relevant to it, the rest are null (parquet nulls cost ~0)
BLOCK_COLS = (
    "doc_bytes binary, tf_bytes binary, "
    "block_first array<long>, block_last array<long>, block_count array<int>, "
    "block_doc_off array<long>, block_tf_off array<long>, "
    "block_max_tf array<int>, block_min_dl array<int>"
)

BUILD_SCHEMA = (
    "wave int, kind string, seg_group long, sub long, term string, df int, "
    + BLOCK_COLS
    + ", base_doc long, n_slots int, dl_bytes binary"
    + ", n_docs long, n_terms long, n_postings long, postings_bytes long,"
    " sum_dl long, checksum string, build_ms double, terms_per_sec double,"
    " skew_ratio double, lineage string"
)

SEGMENT_COLS = [
    "seg_group", "sub", "term", "df", "doc_bytes", "tf_bytes", "block_first",
    "block_last", "block_count", "block_doc_off", "block_tf_off",
    "block_max_tf", "block_min_dl",
]
NORMS_COLS = ["seg_group", "base_doc", "n_slots", "dl_bytes", "n_docs", "sum_dl"]
MANIFEST_COLS = [
    "seg_group", "n_docs", "n_terms", "n_postings", "postings_bytes",
    "sum_dl", "checksum", "build_ms", "terms_per_sec", "skew_ratio", "lineage",
]

POSTINGS_SCHEMA = (
    "term_bucket int, term string, chunk_id long, slice int, df int, " + BLOCK_COLS
)
# what query-side readers see: leaf files only, no partition column
QUERY_POSTINGS_SCHEMA = POSTINGS_SCHEMA.split(", ", 1)[1]

CHUNK_NORMS_SCHEMA = (
    "chunk_id long, base_doc long, n_slots int, dl_bytes binary, "
    "n_docs long, sum_dl long"
)

DICTIONARY_SCHEMA = "term string, df long"


def term_bucket_py(term: str, n_buckets: int) -> int:
    """Portable term -> partition bucket (crc32; same as term_bucket_col)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(term_col, n_buckets: int):
    return (F.crc32(F.encode(term_col, "UTF-8")) % n_buckets).cast("int")


def _bucket_dirs(prefix: str, buckets: list[int]) -> list[str]:
    out = []
    for b in buckets:
        p = os.path.join(prefix, f"term_bucket={b}")
        if os.path.isdir(p):
            out.append(p)
    return out


class IndexStore:
    def __init__(self, root: str):
        self.root = root

    @property
    def build_path(self) -> str:
        return os.path.join(self.root, "build")

    @property
    def postings_path(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def norms_path(self) -> str:
        return os.path.join(self.root, "norms")

    @property
    def deltas_path(self) -> str:
        return os.path.join(self.root, "deltas")

    @property
    def dictionary_root(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def tombstones_path(self) -> str:
        return os.path.join(self.root, "tombstones")

    @property
    def stats_path(self) -> str:
        return os.path.join(self.root, "stats.json")

    # ---- stats + config (the snapshot pointer) ----
    def write_stats(self, stats: dict, config: EngineConfig) -> None:
        os.makedirs(self.root, exist_ok=True)
        stats.setdefault("deltas", [])
        stats.setdefault("chunk_overrides", {})
        stats.setdefault("tombstone_batches", [])
        stats.setdefault("purged_batches", [])
        payload = {
            "format": STORE_FORMAT,
            "stats": stats,
            "config": asdict(config),
        }
        tmp = self.stats_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2)
        os.replace(tmp, self.stats_path)

    def read_stats(self) -> tuple[dict, EngineConfig]:
        with open(self.stats_path) as f:
            payload = json.load(f)
        if payload.get("format") != STORE_FORMAT:
            raise ValueError(
                f"index store at {self.root} has format "
                f"{payload.get('format')}, expected {STORE_FORMAT}; rebuild"
            )
        stats = payload["stats"]
        stats.setdefault("deltas", [])
        stats.setdefault("chunk_overrides", {})
        stats.setdefault("tombstone_batches", [])
        stats.setdefault("purged_batches", [])
        return stats, EngineConfig(**payload["config"])

    def format_ok(self) -> bool:
        """True iff stats.json exists and is the current store format."""
        try:
            self.read_stats()
            return True
        except (OSError, ValueError, TypeError):
            return False

    # ---- build-side tables ----
    def _read_build(
        self, spark: SparkSession, waves: list[int] | None = None
    ) -> DataFrame | None:
        """Build-layer read. ``waves`` prunes the scan to those wave
        DIRECTORIES — incremental appends pass their own wave ids so the
        job's input is O(batch), not O(every wave ever built) (a row
        filter alone would still LIST AND OPEN all historical files)."""
        if not os.path.exists(self.build_path):
            return None
        if waves is None:
            paths = [self.build_path]
        else:
            paths = [
                os.path.join(self.build_path, f"wave={w}") for w in waves
            ]
            paths = [p for p in paths if os.path.isdir(p)]
            if not paths:
                return spark.createDataFrame([], BUILD_SCHEMA)
        return (
            spark.read.schema(BUILD_SCHEMA)
            .option("basePath", self.build_path)
            .parquet(*paths)
        )

    def write_build_wave(self, df: DataFrame, wave: int) -> None:
        """One atomic wave commit: postings + norms + manifest together."""
        df.write.mode("errorifexists").partitionBy("kind").parquet(
            os.path.join(self.build_path, f"wave={wave}")
        )

    def read_build_postings(
        self, spark: SparkSession, waves: list[int] | None = None
    ) -> DataFrame:
        b = self._read_build(spark, waves)
        return b.filter(F.col("kind") == "postings").select(SEGMENT_COLS)

    def read_build_norms(
        self, spark: SparkSession, waves: list[int] | None = None
    ) -> DataFrame:
        b = self._read_build(spark, waves)
        return b.filter(F.col("kind") == "norms").select(NORMS_COLS)

    def read_manifest(self, spark: SparkSession) -> DataFrame | None:
        b = self._read_build(spark)
        if b is None:
            return None
        return b.filter(F.col("kind") == "manifest").select(MANIFEST_COLS)

    def completed_seg_groups(self, spark: SparkSession) -> set[int]:
        m = self.read_manifest(spark)
        if m is None:
            return set()
        return {r["seg_group"] for r in m.select("seg_group").distinct().collect()}

    # ---- delta publication (atomic rename protocol) ----
    def delta_stage_path(self, name: str) -> str:
        return os.path.join(self.deltas_path, f".tmp_{name}")

    def delta_path(self, name: str) -> str:
        return os.path.join(self.deltas_path, name)

    def publish_delta(self, name: str) -> None:
        """Atomically promote a staged delta. Idempotent: a no-op when
        the delta is already published (crash-after-rename replay)."""
        if os.path.isdir(self.delta_path(name)):
            shutil.rmtree(self.delta_stage_path(name), ignore_errors=True)
            return
        os.rename(self.delta_stage_path(name), self.delta_path(name))

    def clean_stale_stages(self) -> None:
        if not os.path.isdir(self.deltas_path):
            return
        for d in os.listdir(self.deltas_path):
            if d.startswith(".tmp_"):
                shutil.rmtree(os.path.join(self.deltas_path, d),
                              ignore_errors=True)

    # ---- visibility: which directories a reader scans ----
    @staticmethod
    def _override_owners(stats: dict) -> dict[str, list[int]]:
        """delta name -> the chunk_ids the CURRENT snapshot maps to it.
        A compaction delta can be partially superseded by a later
        compaction of an overlapping chunk set (compact_A rebuilds
        {1,2}, compact_B rebuilds {2} -> overrides {1:A, 2:B}); A's
        chunk-2 rows are then STALE and must never be read, so every
        override source is scoped to its owned chunks."""
        owned: dict[str, list[int]] = {}
        for chunk, name in stats.get("chunk_overrides", {}).items():
            owned.setdefault(name, []).append(int(chunk))
        return {n: sorted(cs) for n, cs in owned.items()}

    def _posting_sources(
        self, stats: dict
    ) -> tuple[list[str], list[tuple[str, list[int]]]]:
        """(normal_prefixes, [(override_prefix, owned_chunk_ids), ...]):
        normal rows must drop overridden chunk_ids; each override source
        contributes ONLY the chunks the snapshot currently maps to it.
        ``base_retired`` (set by fold_deltas, the force-merge analog)
        removes the original base directories from the read set — their
        rows live on in the folded delta."""
        normal = [] if stats.get("base_retired") else [self.postings_path]
        for name in stats.get("deltas", []):
            normal.append(os.path.join(self.delta_path(name), "postings"))
        override = [
            (os.path.join(self.delta_path(name), "postings"), chunks)
            for name, chunks in sorted(self._override_owners(stats).items())
        ]
        return normal, override

    def _norms_sources(
        self, stats: dict
    ) -> tuple[list[str], list[tuple[str, list[int]]]]:
        normal = [] if stats.get("base_retired") else [self.norms_path]
        for name in stats.get("deltas", []):
            normal.append(os.path.join(self.delta_path(name), "norms"))
        override = [
            (os.path.join(self.delta_path(name), "norms"), chunks)
            for name, chunks in sorted(self._override_owners(stats).items())
        ]
        return normal, override

    @staticmethod
    def _overridden_chunks(stats: dict) -> list[int]:
        return sorted(int(c) for c in stats.get("chunk_overrides", {}))

    # ---- merged (query-side) tables ----
    @staticmethod
    def _leaf_bucket_dirs(prefixes: list[str]) -> list[str]:
        """All term_bucket=* leaf dirs under the given prefixes — passed
        directly to the reader so no partition discovery runs (leaf dirs
        hold only data files)."""
        out = []
        for p in prefixes:
            if not os.path.isdir(p):
                continue
            for d in sorted(os.listdir(p)):
                fp = os.path.join(p, d)
                if d.startswith("term_bucket=") and os.path.isdir(fp):
                    out.append(fp)
        return out

    def _read_override_union(
        self,
        spark: SparkSession,
        override: list[tuple[str, list[int]]],
        schema: str,
        buckets: list[int] | None = None,
    ) -> DataFrame | None:
        """Union of all override sources, each scoped to its OWNED
        chunks (a later compaction may have superseded part of an older
        override delta — its stale rows must not be read)."""
        parts = []
        for prefix, owned in override:
            if schema is CHUNK_NORMS_SCHEMA:  # norms: flat parquet dir
                paths = [prefix] if os.path.isdir(prefix) else []
            elif buckets is None:  # postings, all buckets
                paths = self._leaf_bucket_dirs([prefix])
            else:  # postings, pruned to the query terms' buckets
                paths = _bucket_dirs(prefix, buckets)
            if not paths:
                continue
            parts.append(
                spark.read.schema(schema)
                .parquet(*paths)
                .filter(F.col("chunk_id").isin(owned))
            )
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def read_postings(self, spark: SparkSession, stats: dict | None = None) -> DataFrame:
        """Every visible posting row (all terms) — compaction/audit use."""
        if stats is None:
            stats, _ = self.read_stats()
        normal, override = self._posting_sources(stats)
        n_paths = self._leaf_bucket_dirs(normal)
        if n_paths:
            df = spark.read.schema(QUERY_POSTINGS_SCHEMA).parquet(*n_paths)
        else:
            df = spark.createDataFrame([], QUERY_POSTINGS_SCHEMA)
        dead = self._overridden_chunks(stats)
        if dead:
            df = df.filter(~F.col("chunk_id").isin(dead))
            ov = self._read_override_union(
                spark, override, QUERY_POSTINGS_SCHEMA
            )
            if ov is not None:
                df = df.unionByName(ov)
        return df

    def read_postings_for_terms(
        self,
        spark: SparkSession,
        terms: list[str],
        config: EngineConfig,
        stats: dict | None = None,
    ) -> DataFrame:
        """Partition-pruned read: only the term_bucket directories that
        can contain the query terms are listed/scanned (across the base
        index and every visible delta), and the term equality filter is
        pushed to parquet row groups (files are sorted by term within
        each bucket)."""
        if stats is None:
            stats, _ = self.read_stats()
        buckets = sorted({term_bucket_py(t, config.term_buckets) for t in terms})
        normal, override = self._posting_sources(stats)
        n_paths = [d for p in normal for d in _bucket_dirs(p, buckets)]
        dead = self._overridden_chunks(stats)
        parts = []
        if n_paths:
            df = spark.read.schema(QUERY_POSTINGS_SCHEMA).parquet(*n_paths)
            if dead:
                df = df.filter(~F.col("chunk_id").isin(dead))
            parts.append(df)
        ov = self._read_override_union(
            spark, override, QUERY_POSTINGS_SCHEMA, buckets
        )
        if ov is not None:
            parts.append(ov)
        if not parts:
            return spark.createDataFrame([], QUERY_POSTINGS_SCHEMA)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.filter(F.col("term").isin(terms))

    def read_norms(self, spark: SparkSession, stats: dict | None = None) -> DataFrame:
        if stats is None:
            stats, _ = self.read_stats()
        # the warm cache is keyed on the snapshot it was built from: a
        # stats.json updated by another process (or an explicit snapshot
        # passed by compaction/fold/verify) must never be served stale
        # norms (round-2 ADVICE)
        if (
            self._norms_cache is not None
            and self._cache_key == self._snapshot_key(stats)
        ):
            return self._norms_cache
        normal, override = self._norms_sources(stats)
        normal = [p for p in normal if os.path.isdir(p)]
        if normal:
            df = spark.read.schema(CHUNK_NORMS_SCHEMA).parquet(*normal)
        else:
            df = spark.createDataFrame([], CHUNK_NORMS_SCHEMA)
        dead = self._overridden_chunks(stats)
        if dead:
            df = df.filter(~F.col("chunk_id").isin(dead))
            ov = self._read_override_union(spark, override, CHUNK_NORMS_SCHEMA)
            if ov is not None:
                df = df.unionByName(ov)
        return df

    # ---- dictionary: immutable bucketed versions ----
    def _dict_versions(self) -> list[tuple[int, str]]:
        """Committed versions (seq, path), ascending. A version counts
        only once its _covers.json marker exists (written after the
        Spark job commits), so half-written versions are invisible."""
        if not os.path.isdir(self.dictionary_root):
            return []
        out = []
        for d in sorted(os.listdir(self.dictionary_root)):
            if not d.startswith("v"):
                continue
            p = os.path.join(self.dictionary_root, d)
            if os.path.exists(os.path.join(p, "_covers.json")):
                out.append((int(d[1:]), p))
        return out

    def current_dictionary_path(self) -> str | None:
        vs = self._dict_versions()
        return vs[-1][1] if vs else None

    def _resolve_dict_path(self, stats: dict | None) -> str | None:
        """The dictionary version THIS SNAPSHOT references (stats is the
        pointer); falls back to the newest committed version for stores
        mid-initial-build."""
        if stats is not None and "dict_version" in stats:
            p = os.path.join(
                self.dictionary_root, f"v{int(stats['dict_version']):06d}"
            )
            if os.path.exists(os.path.join(p, "_covers.json")):
                return p
        return self.current_dictionary_path()

    def find_dictionary_version(self, covers: str) -> int | None:
        for seq, p in self._dict_versions():
            with open(os.path.join(p, "_covers.json")) as f:
                if json.load(f)["covers"] == covers:
                    return seq
        return None

    def write_dictionary(
        self, dictionary: DataFrame, config: EngineConfig, covers: str
    ) -> tuple[int, bool]:
        """Write the next dictionary version: partitioned by term_bucket
        (the SAME pruning as postings — no single-partition write),
        term-sorted within files for row-group min/max skipping.
        Idempotent per `covers` tag: if some committed version already
        covers this merge step, it is reused (crash recovery never
        double-folds a delta). Returns (seq, freshly_written) — callers
        piggybacking Observations on the write must know whether the
        job actually ran."""
        existing = self.find_dictionary_version(covers)
        if existing is not None:
            return existing, False
        vs = self._dict_versions()
        seq = vs[-1][0] + 1 if vs else 0
        path = os.path.join(self.dictionary_root, f"v{seq:06d}")
        shutil.rmtree(path, ignore_errors=True)  # uncommitted leftover
        (
            dictionary.withColumn(
                "term_bucket", term_bucket_col(F.col("term"), config.term_buckets)
            )
            .repartition("term_bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(path)
        )
        marker = os.path.join(path, "_covers.json")
        with open(marker + ".tmp", "w") as f:
            json.dump({"covers": covers}, f)
        os.replace(marker + ".tmp", marker)
        return seq, True

    def gc_dictionaries(self, keep_seq: int | None = None) -> None:
        """Drop every dictionary version except the referenced one. A
        real deployment keeps a few for snapshot readers; locally one
        suffices."""
        if keep_seq is None:
            vs = self._dict_versions()
            keep_seq = vs[-1][0] if vs else -1
        if not os.path.isdir(self.dictionary_root):
            return
        for d in os.listdir(self.dictionary_root):
            if d.startswith("v") and d != f"v{keep_seq:06d}":
                shutil.rmtree(
                    os.path.join(self.dictionary_root, d), ignore_errors=True
                )

    def read_dictionary(
        self, spark: SparkSession, stats: dict | None = None
    ) -> DataFrame:
        p = self._resolve_dict_path(stats)
        if p is None:
            return spark.createDataFrame([], DICTIONARY_SCHEMA)
        return (
            spark.read.schema("term_bucket int, " + DICTIONARY_SCHEMA)
            .option("basePath", p)
            .parquet(p)
            .select("term", "df")
        )

    # ---- tombstones (deletes) ----
    def tombstone_path(self, name: str) -> str:
        return os.path.join(self.tombstones_path, name)

    # ---- purged ledger (docs removed by past compactions) ----
    # Lucene analog: liveDocs carried through merges — a doc deleted in
    # an earlier merge round never reappears when its segment merges
    # again. Our compactions rebuild chunks FROM SOURCE text, so without
    # this ledger a later compaction of the same chunk would resurrect
    # previously purged docs. Rows are (chunk_id, doc_id); reads are
    # pruned by a chunk_id pushdown filter, so a compaction touching
    # K chunks reads O(deletes in those chunks), never the full ledger.
    @property
    def purged_path(self) -> str:
        return os.path.join(self.root, "purged")

    def purged_batch_path(self, name: str) -> str:
        return os.path.join(self.purged_path, name)

    def read_purged(
        self,
        spark: SparkSession,
        stats: dict | None = None,
        chunks: list[int] | None = None,
    ) -> DataFrame | None:
        """(doc_id long) docs purged by past compactions, optionally
        restricted to the given chunk_ids; None when empty."""
        if stats is None:
            stats, _ = self.read_stats()
        paths = [
            self.purged_batch_path(n)
            for n in stats.get("purged_batches", [])
        ]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return None
        df = spark.read.schema("chunk_id long, doc_id long").parquet(*paths)
        if chunks is not None:
            df = df.filter(F.col("chunk_id").isin(chunks))
        return df.select("doc_id").distinct()

    def read_tombstones(self, spark: SparkSession, stats: dict | None = None) -> DataFrame | None:
        """Visible deleted doc_ids (doc_id long), or None when empty."""
        if stats is None:
            stats, _ = self.read_stats()
        paths = [
            self.tombstone_path(n)
            for n in stats.get("tombstone_batches", [])
        ]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return None
        return spark.read.schema("doc_id long").parquet(*paths).distinct()

    # ---- warm query path ----
    # Reference analog: the reader's lazily-mmapped per-segment state +
    # quantization state cache (JVectorReader.java:277-317,
    # QuantizationStateCache.java). For repeated queries against one
    # store, cache the chunk norms (small: one row per chunk) in
    # executor memory and the term dictionary driver-side; cold queries
    # work identically without warming. EVERY driver-side cache is
    # size-gated from parquet FOOTER metadata — nothing corpus-sized is
    # ever read to decide whether it would fit (10^12-turn safety).
    _norms_cache: DataFrame | None = None
    _dict_cache: dict | None = None
    _driver_norms: dict | None = None
    _driver_tombstones = None  # np.ndarray | None
    _cache_key: str | None = None  # snapshot the caches were built from

    @staticmethod
    def _snapshot_key(stats: dict) -> str:
        """Canonical identity of a snapshot's visible state — every warm
        cache is valid only for the snapshot it was built from."""
        return json.dumps(
            [
                stats.get("deltas", []),
                sorted(stats.get("chunk_overrides", {}).items()),
                bool(stats.get("base_retired")),
                sorted(stats.get("tombstone_batches", [])),
                stats.get("dict_version"),
            ]
        )

    def _parquet_files(self, prefixes: list[str]) -> list[str]:
        out = []
        for p in prefixes:
            if not os.path.isdir(p):
                continue
            for base, _, files in os.walk(p):
                for f in files:
                    if f.endswith(".parquet"):
                        out.append(os.path.join(base, f))
        return sorted(out)

    @staticmethod
    def _column_bytes(files: list[str], column: str) -> int:
        """Total UNCOMPRESSED bytes of one column across parquet files,
        from footer metadata only (no data pages read)."""
        import pyarrow.parquet as pq

        total = 0
        for fp in files:
            md = pq.ParquetFile(fp).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema == column:
                        total += col.total_uncompressed_size
        return total

    def warm(
        self,
        spark: SparkSession,
        driver_norms_limit: int = 256 << 20,
        driver_dict_limit: int = 64 << 20,
    ) -> "IndexStore":
        stats, _ = self.read_stats()
        if self._cache_key != self._snapshot_key(stats):
            self.invalidate()  # stale caches from an older snapshot
        if self._norms_cache is None:
            self._norms_cache = self.read_norms(spark, stats).persist()
            self._norms_cache.count()
            self._cache_key = self._snapshot_key(stats)
        if self._dict_cache is None:
            # gate by on-disk footprint BEFORE collecting: at 10^12
            # turns the vocabulary is driver-hostile; term_dfs_for then
            # falls back to per-query pruned bucket reads
            dp = self._resolve_dict_path(stats)
            files = self._parquet_files([dp]) if dp else []
            disk = sum(os.path.getsize(f) for f in files)
            if dp and disk <= driver_dict_limit:
                self._dict_cache = {
                    r["term"]: r["df"]
                    for r in self.read_dictionary(spark, stats).collect()
                }
        if self._driver_norms is None:
            # driver-side norms enable the no-Spark-job small-query
            # path; the fit check reads FOOTERS ONLY (ADVICE: the old
            # gate materialized the whole table before deciding)
            normal, override = self._norms_sources(stats)
            files = self._parquet_files(normal + [p for p, _ in override])
            if files and self._column_bytes(files, "dl_bytes") <= driver_norms_limit:
                import numpy as np
                import pyarrow.parquet as pq

                dead = set(self._overridden_chunks(stats))
                # (files, excluded_chunks): normal sources drop every
                # overridden chunk; each override source drops the
                # chunks it does NOT currently own (stale rows from a
                # partially superseded compaction delta)
                sources = [(self._parquet_files(normal), dead)]
                for prefix, owned in override:
                    sources.append(
                        (self._parquet_files([prefix]), dead - set(owned))
                    )
                dn: dict = {}
                for fs, excluded in sources:
                    for fp in fs:
                        t = pq.read_table(
                            fp, columns=["chunk_id", "base_doc", "dl_bytes"]
                        )
                        for c, b, raw in zip(
                            t["chunk_id"].to_pylist(),
                            t["base_doc"].to_pylist(),
                            t["dl_bytes"].to_pylist(),
                        ):
                            if int(c) in excluded:
                                continue
                            dn[int(c)] = (int(b), np.frombuffer(raw, dtype=np.int32))
                self._driver_norms = dn
        if self._driver_tombstones is None:
            tpaths = [
                self.tombstone_path(n) for n in stats.get("tombstone_batches", [])
            ]
            files = self._parquet_files(tpaths)
            if files:
                import numpy as np
                import pyarrow.parquet as pq

                ids = np.concatenate(
                    [
                        pq.read_table(f, columns=["doc_id"])["doc_id"]
                        .to_numpy(zero_copy_only=False)
                        for f in files
                    ]
                )
                self._driver_tombstones = np.unique(ids.astype(np.int64))
        return self

    def invalidate(self) -> None:
        """Drop warm caches (call after an incremental append)."""
        if self._norms_cache is not None:
            self._norms_cache.unpersist()
            self._norms_cache = None
        self._dict_cache = None
        self._driver_norms = None
        self._driver_tombstones = None
        self._cache_key = None

    def read_postings_arrow(
        self, terms: list[str], config: EngineConfig, stats: dict | None = None
    ):
        """Driver-side pruned postings read (no Spark): only the
        term_bucket directories of the query terms are opened — across
        base + visible deltas — with the term filter pushed to parquet
        row groups (files are term-sorted so row-group min/max stats
        skip)."""
        import pyarrow.dataset as pads

        if stats is None:
            stats, _ = self.read_stats()
        buckets = sorted({term_bucket_py(t, config.term_buckets) for t in terms})
        normal, override = self._posting_sources(stats)
        n_files = self._parquet_files(
            [d for p in normal for d in _bucket_dirs(p, buckets)]
        )
        dead = set(self._overridden_chunks(stats))
        tables = []
        if n_files:
            flt = pads.field("term").isin(terms)
            if dead:
                flt = flt & ~pads.field("chunk_id").isin(sorted(dead))
            tables.append(
                pads.dataset(n_files, format="parquet").to_table(filter=flt)
            )
        for prefix, owned in override:
            o_files = self._parquet_files(_bucket_dirs(prefix, buckets))
            if o_files:
                tables.append(
                    pads.dataset(o_files, format="parquet").to_table(
                        filter=pads.field("term").isin(terms)
                        & pads.field("chunk_id").isin(owned)
                    )
                )
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return None
        import pyarrow as pa

        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]

    def term_dfs_for(self, spark: SparkSession, terms: list[str]) -> dict:
        """df per query term: warm driver cache when the vocabulary is
        driver-sized, else a pruned driver-side pyarrow read of ONLY the
        terms' bucket directories (a few row groups, never a Spark job —
        mirrors read_postings_arrow)."""
        if self._dict_cache is not None:
            return {t: self._dict_cache[t] for t in terms if t in self._dict_cache}
        stats, config = self.read_stats()
        dp = self._resolve_dict_path(stats)
        if dp is not None:
            import pyarrow.dataset as pads

            buckets = sorted(
                {term_bucket_py(t, config.term_buckets) for t in terms}
            )
            files = self._parquet_files(_bucket_dirs(dp, buckets))
            if not files:
                return {}
            t = pads.dataset(files, format="parquet").to_table(
                filter=pads.field("term").isin(terms), columns=["term", "df"]
            )
            return dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        rows = (
            self.read_dictionary(spark)
            .filter(F.col("term").isin(terms))
            .collect()
        )
        return {r["term"]: r["df"] for r in rows}
