"""Snapshot store: Iceberg-semantics table layout on plain Parquet + JSON.

No Iceberg runtime jar ships in this sandbox, so the engine provides a thin
store with the same *semantics* over a directory layout a real
``iceberg-spark-runtime`` catalog could replace verbatim on a cluster:

- atomic snapshot commits + time travel + resume (``commit_partitions``,
  ``read``, ``run_resumable``), with per-partition lineage, row counts, and
  metrics (``lineage``) and the ``.snapshots`` / ``.files`` metadata tables
  (``snapshots_table``, ``files_table``);
- scan planning: per-file [min, max] manifest column stats collected from
  parquet footers at commit time (``stat_cols=``), range-pruned
  file-skipping reads (``read(ranges=...)`` / ``files_for``), and
  range-clustered writes so KEY-range pruning bites (``cluster_by=``);
- maintenance: bin-pack compaction (``compact_partitions``), snapshot
  expiry (``expire_snapshots``), grace-period orphan sweep
  (``remove_orphan_files``), composed nightly by ``maintain()``;
- incremental consumption: changed-partitions-since-a-snapshot reads
  (``read_incremental`` — appends, refreshes, and row-level deletes count,
  byte compactions don't) and the polling change feed (``follow``);
- additive schema evolution on read (``read(merge_schema=True)``), and
  PARTITION-granularity evolution for free from key-opaque partitions:
  the store never parses partition keys, so a table can switch from daily
  to monthly keys (or any other scheme) mid-history — prefix reads span
  both generations, file-stats pruning prunes across mixed layouts
  without interpreting keys, and pre-evolution snapshots time-travel to
  the old layout (tests/test_pages_snapshots.py::
  test_partition_granularity_evolution);
- row-level DML: copy-on-write ``merge_into`` / ``delete_where`` /
  ``update_where`` (touched files only, stats-pruned probe),
  merge-on-read ``delete_where(mode="merge-on-read")`` — Iceberg-v2-style
  positional delete files applied at read via a broadcast anti-join on
  parquet ``_metadata`` and folded back into plain files by compaction —
  and probe-free equality tombstones ``delete_keys`` with sequence-epoch
  semantics (a key re-inserted after its tombstone is alive again).

    table_dir/
      data/<snapshot_id>/<partition>/...parquet   (immutable once committed)
      snapshots/<snapshot_id>.json                (manifest: files, lineage)
      HEAD                                        (atomic pointer, rename())

A snapshot manifest lists every data file of every partition visible at that
snapshot plus a watermark and per-partition metrics; a crashed job leaves at
most orphaned data files (never a corrupt manifest) because the manifest and
HEAD are written via atomic rename.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from contextlib import contextmanager
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


def _atomic_write(path: str, payload: str):
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write(payload)
    os.replace(tmp, path)


@contextmanager
def _stats_friendly_writes(spark: SparkSession):
    """Spark's legacy INT96 parquet timestamps carry NO min/max footer
    statistics (and Iceberg forbids INT96 outright), which would make
    timestamp columns invisible to manifest-stats file skipping. Store
    writes therefore run under TIMESTAMP_MICROS — read-back values are
    identical; only the physical encoding (and its stats) change."""
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _json_safe_stat(v):
    """Parquet-footer min/max -> JSON-storable, ORDER-PRESERVING encoding.
    Timestamps become ISO-8601 strings (lexicographic order == time order);
    numbers and strings pass through; anything else is unusable for pruning."""
    import datetime

    if isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep="T")
    return None


#: Manifest-stat spec prefix: ``stat_cols=["url", "bloom:url"]`` records the
#: footer [min, max] AND a per-file bloom filter over ``url``.  Blooms live in
#: the same per-file stats dict under their spec name, so every path that
#: re-derives a rewrite's stat columns from the manifest (compaction,
#: MERGE INTO, DELETE) recomputes them automatically.
BLOOM_PREFIX = "bloom:"

_BLOOM_K = 6  # hash probes per value (double hashing)
_BLOOM_BITS_PER_VALUE = 10  # ~0.8% fpp at k=6
_BLOOM_MIN_BITS = 256
_BLOOM_MAX_BITS = 1 << 16  # 8 KiB of bits -> ~11 KiB base64 per file/col


def _bloom_canon(v) -> bytes | None:
    """Type-tagged canonical bytes for bloom hashing — identical for the
    value read from the parquet page and the value the query passes to
    ``files_for(eq=...)``. Unsupported types return None (the file is then
    never skipped on this column: sound)."""
    import datetime

    if isinstance(v, bool):
        return b"i:%d" % int(v)
    if isinstance(v, bytes):
        return b"b:" + v
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    if isinstance(v, int):
        return b"i:%d" % v
    if isinstance(v, float):
        return b"f:" + repr(float(v)).encode()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return b"t:" + v.isoformat(sep="T").encode()
    return None


def _bloom_positions(canon: bytes, m: int):
    """k bit positions via double hashing over one blake2b digest —
    deterministic across processes (no PYTHONHASHSEED dependence)."""
    import hashlib

    d = hashlib.blake2b(canon, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m for i in range(_BLOOM_K)]


def _bloom_build(values) -> dict | None:
    """{"m": bits, "b64": bitset} over the distinct values of one file's
    column. Sizing follows the file's own distinct count (clamped), so small
    files pay bytes proportional to their content; NULLs are not members."""
    import base64

    canons = []
    for v in values:
        if v is None:
            continue
        c = _bloom_canon(v)
        if c is None:
            return None  # unsupported value domain -> no bloom at all
        canons.append(c)
    target = len(canons) * _BLOOM_BITS_PER_VALUE
    m = 1 << max(target - 1, 1).bit_length()  # next power of two >= target
    m = min(max(m, _BLOOM_MIN_BITS), _BLOOM_MAX_BITS)
    bits = bytearray(m // 8)
    for c in canons:
        for pos in _bloom_positions(c, m):
            bits[pos // 8] |= 1 << (pos % 8)
    return {"m": m, "b64": base64.b64encode(bytes(bits)).decode("ascii")}


def _bloom_might_contain(bloom: dict, value) -> bool:
    """False ONLY when the bloom proves the file cannot hold the value."""
    import base64

    c = _bloom_canon(value)
    if c is None:
        return True
    m = bloom["m"]
    bits = base64.b64decode(bloom["b64"])
    return all(
        bits[pos // 8] & (1 << (pos % 8)) for pos in _bloom_positions(c, m)
    )


def _file_bloom_stats(path: str, bloom_cols) -> dict[str, dict]:
    """Per-file bloom filters over each requested column's distinct values.
    Unlike the footer [min, max] reads this scans the column's data pages —
    but only for the files THIS commit just wrote (cost proportional to the
    commit, never the table; on a real cluster Iceberg computes these inside
    the write tasks). One columnar pyarrow read per file."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    pf = pq.ParquetFile(path)
    present = set(pf.schema_arrow.names)
    want = [c for c in bloom_cols if c in present]
    if not want:
        return out
    tbl = pf.read(columns=want)
    for c in want:
        bloom = _bloom_build(tbl.column(c).to_pylist())
        if bloom is not None:
            out[BLOOM_PREFIX + c] = bloom
    return out


def _file_column_stats(path: str, stat_cols) -> dict[str, list]:
    """Per-file [min, max] for the requested columns, read from the parquet
    footer only (no data pages touched) — the manifest-stats source for
    file-skipping reads. Footer bounds are trusted as-is: parquet writers
    that truncate binary stats do so order-safely (min prefix rounds down,
    max increments the last byte), and Spark's writer stores string footer
    stats untruncated (verified to 289-char values), so [min, max] is
    always a sound enclosure."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    agg: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for i in range(row_group.num_columns):
            col = row_group.column(i)
            name = col.path_in_schema
            if name not in stat_cols:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                # A single stat-less row group poisons the whole file's
                # entry: pruning on partial stats would be unsound.
                agg[name] = None
                continue
            mn, mx = _json_safe_stat(st.min), _json_safe_stat(st.max)
            if mn is None or mx is None or agg.get(name, "missing") is None:
                agg[name] = None
                continue
            if name in agg:
                agg[name] = [min(agg[name][0], mn), max(agg[name][1], mx)]
            else:
                agg[name] = [mn, mx]
    return {k: v for k, v in agg.items() if v is not None}


def _collect_file_stats(paths, stat_cols) -> dict[str, dict]:
    """Footer-stat reads for many files, thread-pooled: the reads are tiny
    I/O-bound metadata fetches, and a serial driver loop over thousands of
    committed files would add a visible driver stall per commit. (On a real
    cluster Iceberg collects these from the write tasks themselves; the
    pool is the honest single-process analogue.)"""
    paths = list(paths)
    specs = list(stat_cols)
    plain = [c for c in specs if not c.startswith(BLOOM_PREFIX)]
    blooms = [c[len(BLOOM_PREFIX):] for c in specs if c.startswith(BLOOM_PREFIX)]

    def one(p: str) -> dict:
        s = _file_column_stats(p, plain) if plain else {}
        if blooms:
            s.update(_file_bloom_stats(p, blooms))
        return s

    if len(paths) <= 2:
        out = {p: one(p) for p in paths}
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(paths))) as pool:
            out = dict(zip(paths, pool.map(one, paths)))
    return {p: s for p, s in out.items() if s}


def _rows_per_file(paths) -> dict[str, int]:
    """Exact row count per file from parquet footers (no data pages),
    thread-pooled like the stats reads — recorded per partition at commit
    time so row counts are a metadata lookup (`lineage`), never a scan."""
    import pyarrow.parquet as pq

    paths = list(paths)

    def one(p: str) -> int:
        return pq.ParquetFile(p).metadata.num_rows

    if len(paths) <= 2:
        return {p: one(p) for p in paths}
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(16, len(paths))) as pool:
        return dict(zip(paths, pool.map(one, paths)))


def zorder_column(df: DataFrame, cols, bits_per_col: int | None = None):
    """A Z-order (Morton) key over up to 4 columns, built entirely from JVM
    column expressions — the multi-dimensional clustering key behind
    ``commit_partitions(cluster_mode="zorder")`` (the Databricks ``OPTIMIZE
    ZORDER BY`` / Iceberg z-ordering analogue).

    Why: range clustering on ``(a, b)`` is lexicographic — files become
    disjoint in ``a`` but every file spans all of ``b``, so only
    leading-column predicates prune. Interleaving the bits of per-column
    ranks makes every file's [min, max] box TIGHT in every dimension, so a
    predicate on ANY z-ordered column skips most files.

    Per column a locality-preserving integer in [0, 2^bits) is derived
    from a single min/max agg job (no sort, no window):

    - numeric/timestamp: ``width_bucket`` over the observed [min, max]
      (uniform-width buckets — coarse under heavy skew, which costs
      pruning selectivity, never correctness);
    - string: the first 8 bytes big-endian (byte-wise order == string
      order prefix) bucketed the same way — for urls this is domain
      locality, exactly what a crawl table wants.

    Returns ``(zcol, n_buckets_per_col)``; NULLs map to bucket 0."""
    from pyspark.sql import functions as F

    cols = list(cols)
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_column takes 1-4 columns")
    # 16 bits/col (65,536 buckets) is plenty of locality for file-level
    # pruning and keeps the interleave expression tree shallow.
    bits = min(bits_per_col or 16, 63 // len(cols))
    n_buckets = 2**bits
    schema = dict(df.dtypes)

    def numeric_proxy(c: str):
        t = schema[c]
        if t == "string":
            # first-8-bytes big-endian integer: byte order == string order
            hx = F.rpad(F.substring(F.hex(F.encode(F.col(c), "UTF-8")), 1, 16),
                        16, "0")
            return F.conv(hx, 16, 10).cast("decimal(20,0)").cast("double")
        if t == "timestamp":
            return F.unix_micros(F.col(c)).cast("double")
        if t == "date":
            return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        return F.col(c).cast("double")

    proxies = {c: numeric_proxy(c) for c in cols}
    row = df.agg(
        *[F.min(p).alias(f"lo_{c}") for c, p in proxies.items()],
        *[F.max(p).alias(f"hi_{c}") for c, p in proxies.items()],
    ).collect()[0]
    parts = []
    for c, p in proxies.items():
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            parts.append(F.lit(0).cast("long"))
            continue
        parts.append(
            (
                F.least(
                    F.lit(n_buckets - 1),
                    F.width_bucket(p, F.lit(lo), F.lit(hi), F.lit(n_buckets))
                    - 1,
                )
            ).cast("long")
        )
    parts = [F.coalesce(p, F.lit(0)) for p in parts]
    if len(cols) == 1:
        return parts[0], n_buckets
    # Interleave: bit i of column k lands at position i*len(cols)+k.
    z = F.lit(0).cast("long")
    for i in range(bits):
        for k, p in enumerate(parts):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(p, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + k,
                )
            )
    return z, n_buckets


def _manifest_all_paths(m: dict) -> set[str]:
    """Every file a manifest pins as live: data files AND the positional /
    equality delete files attached to them — all must survive orphan sweeps
    and snapshot expiry while this manifest exists."""
    paths = {f for pf in m.get("files", {}).values() for f in pf}
    for dels in m.get("delete_files", {}).values():
        paths.update(dels)
    for e in m.get("eq_delete_files", []):
        paths.update(e.get("paths", []))
    return paths


class CommitConflictError(RuntimeError):
    """Another writer advanced HEAD while this commit was building: flipping
    HEAD now would silently orphan their snapshot. Re-read and retry (the
    Iceberg optimistic-concurrency contract). The loser's data files stay
    behind as orphans — exactly what ``remove_orphan_files`` reclaims."""


class SnapshotStore:
    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
        os.makedirs(os.path.join(table_dir, "snapshots"), exist_ok=True)
        # (path -> ((mtime_ns, size), parsed)) — manifests are immutable
        # once written (the two same-id rewrites, expire's root re-parent
        # and publish's staged-flag drop, change the file and therefore the
        # key), so parse each at most once per process. At 10^12-doc scale
        # a manifest is MBs of JSON and every read/plan call consults it —
        # re-parsing per call would dominate driver-side planning.
        self._manifest_cache: dict[str, tuple[tuple, dict]] = {}

    # -- manifest plumbing ---------------------------------------------------
    def _manifest_path(self, snapshot_id: str) -> str:
        return os.path.join(self.table_dir, "snapshots", f"{snapshot_id}.json")

    def _commit_manifest(self, manifest: dict) -> None:
        """Optimistic-concurrency commit: refuse to flip HEAD when another
        writer advanced it past this snapshot's parent (flipping anyway
        would silently orphan their commit). The check runs BEFORE the
        manifest file lands — an orphaned manifest would wrongly pin its
        data files as live against the orphan sweep. A check-then-rename
        race window remains (single-writer-per-table is still the deploy
        recommendation); the guard turns the common lost-update mistake
        into a loud, retryable :class:`CommitConflictError`."""
        current = self.head()
        if current != manifest["parent"]:
            raise CommitConflictError(
                f"HEAD moved from {manifest['parent']!r} to {current!r} while "
                f"building snapshot {manifest['snapshot_id']!r}; re-read and retry"
            )
        self._finalize_manifest(manifest)
        _atomic_write(
            self._manifest_path(manifest["snapshot_id"]),
            json.dumps(manifest, indent=1),
        )
        _atomic_write(os.path.join(self.table_dir, "HEAD"), manifest["snapshot_id"])

    def _finalize_manifest(self, manifest: dict) -> None:
        """Stamp the cross-commit invariants every manifest must carry —
        positional-delete carry-forward, sequence numbers, equality
        tombstone retention. Called by :meth:`_commit_manifest` AND by the
        staged-commit path (``commit_partitions(stage=True)`` writes the
        manifest directly so HEAD doesn't move until :meth:`publish`):
        skipping it there would strip outstanding deletes from the staged
        snapshot and resurrect purged rows at publish time."""
        parent_m = (
            self.manifest(manifest["parent"]) if manifest["parent"] else None
        )
        if "delete_files" not in manifest:
            # Merge-on-read positional deletes follow the data files they
            # cover: carried files keep their entries, rewritten/dropped
            # files shed them (every internal rewrite reads through
            # _scan_live, so the survivors were written post-delete and the
            # rewrite itself purges the entries). Centralized here so every
            # writer — append, compact, merge, CoW delete, recluster —
            # inherits the contract without repeating it.
            carried = self._live_delete_files(parent_m, manifest["files"])
            if carried:
                manifest["delete_files"] = carried
        elif not manifest["delete_files"]:
            del manifest["delete_files"]
        # Sequence numbers (the Iceberg data-sequence-number analogue):
        # every commit increments the table sequence, every data file is
        # stamped with the sequence it was born in, and equality deletes
        # apply only to rows from files STRICTLY OLDER than the delete —
        # a key re-inserted after its tombstone is alive again (the CDC
        # upsert contract). Centralized so every writer inherits it.
        seq = (parent_m or {}).get("seq", 0) + 1
        manifest["seq"] = seq
        prev_seq = (parent_m or {}).get("file_seq", {})
        manifest["file_seq"] = {
            f: prev_seq.get(f, seq)
            for pf in manifest["files"].values()
            for f in pf
        }
        if "eq_delete_files" not in manifest:
            kept = self._live_eq_deletes(
                (parent_m or {}).get("eq_delete_files", []),
                manifest["files"],
                manifest["file_seq"],
            )
            if kept:
                manifest["eq_delete_files"] = kept
        elif not manifest["eq_delete_files"]:
            del manifest["eq_delete_files"]

    def head(self) -> str | None:
        head_path = os.path.join(self.table_dir, "HEAD")
        if not os.path.exists(head_path):
            return None
        with open(head_path) as fh:
            return fh.read().strip() or None

    def manifest(self, snapshot_id: str | None = None) -> dict | None:
        """Load a snapshot manifest (cached per (mtime, size) — treat the
        returned dict as immutable; writers copy the containers they
        change before mutating)."""
        snapshot_id = self._resolve_ref(snapshot_id) if snapshot_id else self.head()
        if snapshot_id is None:
            return None
        path = self._manifest_path(snapshot_id)
        st = os.stat(path)
        key = (st.st_mtime_ns, st.st_size)
        hit = self._manifest_cache.get(path)
        if hit is not None and hit[0] == key:
            return hit[1]
        with open(path) as fh:
            m = json.load(fh)
        self._manifest_cache[path] = (key, m)
        while len(self._manifest_cache) > 16:  # bound driver memory
            self._manifest_cache.pop(next(iter(self._manifest_cache)))
        return m

    # -- refs: tags + timestamp travel -----------------------------------------
    def _resolve_ref(self, ref: str) -> str:
        """A snapshot argument anywhere in the API may be a snapshot id OR a
        tag name — tags resolve here, ids pass through."""
        tag_path = os.path.join(self.table_dir, "tags", ref)
        if not os.path.exists(self._manifest_path(ref)) and os.path.exists(
            tag_path
        ):
            with open(tag_path) as fh:
                return fh.read().strip()
        return ref

    def tag(self, name: str, snapshot_id: str | None = None) -> str:
        """Pin a named, immutable-by-convention ref to a snapshot (the
        Iceberg tag analogue): ``store.read(spark, snapshot_id="prod")``.
        Tags survive :meth:`rollback` (they point at manifests, not HEAD)
        but NOT :meth:`expire_snapshots` of their target — pin retention
        accordingly. Re-tagging an existing name moves it (atomic)."""
        snapshot_id = snapshot_id or self.head()
        if snapshot_id is None or not os.path.exists(
            self._manifest_path(snapshot_id)
        ):
            raise FileNotFoundError(f"no snapshot {snapshot_id!r} to tag")
        if "/" in name or name == "":
            raise ValueError(f"bad tag name {name!r}")
        os.makedirs(os.path.join(self.table_dir, "tags"), exist_ok=True)
        _atomic_write(os.path.join(self.table_dir, "tags", name), snapshot_id)
        return snapshot_id

    def tags(self) -> dict[str, str]:
        tag_dir = os.path.join(self.table_dir, "tags")
        if not os.path.isdir(tag_dir):
            return {}
        out = {}
        for name in sorted(os.listdir(tag_dir)):
            with open(os.path.join(tag_dir, name)) as fh:
                out[name] = fh.read().strip()
        return out

    def snapshot_as_of(self, timestamp: str) -> str:
        """The newest snapshot on the HEAD chain whose ``created_at`` is
        <= ``timestamp`` (ISO-8601 UTC, e.g. '2026-08-20T12:00:00Z') — the
        Iceberg ``FOR TIMESTAMP AS OF`` analogue:
        ``store.read(spark, snapshot_id=store.snapshot_as_of(ts))``.
        Raises when the whole chain is newer than the timestamp."""
        for m in self.history():  # newest first
            if m.get("created_at", "") <= timestamp:
                return m["snapshot_id"]
        raise FileNotFoundError(
            f"no snapshot at or before {timestamp!r} on the HEAD chain"
        )

    def history(self) -> list[dict]:
        chain = []
        snapshot_id = self.head()
        while snapshot_id:
            m = self.manifest(snapshot_id)
            chain.append(m)
            snapshot_id = m.get("parent")
        return chain

    # -- writes ----------------------------------------------------------------
    def commit_partitions(
        self,
        partitions: dict[str, DataFrame],
        watermark: str | None = None,
        properties: dict | None = None,
        stat_cols: Iterable[str] | None = None,
        cluster_by: Iterable[str] | None = None,
        cluster_files: int | None = None,
        cluster_mode: str = "range",
        stage: bool = False,
    ) -> str:
        """Write the given {partition_key: DataFrame} set as ONE new snapshot:
        data files land first, the manifest + HEAD flip last (atomic).
        Partitions already present in the parent snapshot are carried over
        unchanged (file reuse — no rewrite), so incremental jobs commit only
        the partitions they produced.

        ``stat_cols``: record per-FILE [min, max] manifest statistics for
        these columns (read from the parquet footers only — the Iceberg
        manifest column-stats analogue). :meth:`read` with ``ranges=``
        then skips every file whose stats don't overlap the query range,
        so a time- or key-range query over a month of hourly commits opens
        only the overlapping files instead of the whole partition family.
        Parent partitions keep whatever stats they were committed with.
        A ``"bloom:col"`` spec additionally records a per-file bloom filter
        over ``col``'s distinct values for :meth:`files_for` ``eq=`` point
        lookups (costs one columnar read of each NEW file at commit time);
        rewrites (compaction, MERGE, DELETE) recompute whatever specs the
        replaced files carried.

        ``cluster_by``: range-cluster each partition's rows on these columns
        before writing (the Iceberg ``write.distribution-mode=range``
        analogue) so data files become key-DISJOINT and key-range stats
        pruning actually bites — without it, every file of a time-partition
        holds the full key space and a key-range read must open them all.
        Costs one range shuffle per committed partition; ``cluster_files``
        caps the file count (default: the session's shuffle parallelism,
        AQE-coalesced for small partitions).

        ``cluster_mode="zorder"``: cluster on the Morton interleave of the
        ``cluster_by`` columns instead of their lexicographic order (see
        :func:`zorder_column`). Range mode makes files disjoint in the
        LEADING column only; z-order makes every file a tight box in EVERY
        listed column, so ``read(ranges=...)`` prunes on any of them — the
        right layout when a crawl table serves both url-scoped and
        time-scoped reads. Costs one extra min/max agg job per partition.

        ``stage=True``: write-audit-publish — the snapshot (data files AND
        manifest) lands fully formed but HEAD does not move, so readers
        keep seeing the parent while audit queries validate the staged
        snapshot via ``read(snapshot_id=...)``; then :meth:`publish` flips
        HEAD (with the optimistic-concurrency check) or :meth:`abandon`
        deletes the staged manifest and lets the orphan sweep reclaim its
        unique files. The gate a crawl pipeline wants before a bad dump
        becomes visible."""
        parent = self.head()
        parent_manifest = self.manifest(parent) if parent else None
        snapshot_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        stat_cols = set(stat_cols) if stat_cols else None

        files: dict[str, list[str]] = {}
        metrics: dict[str, dict] = {}
        file_stats: dict[str, dict] = {}
        if parent_manifest:
            files.update(parent_manifest["files"])
            metrics.update(parent_manifest.get("metrics", {}))
            file_stats.update(parent_manifest.get("file_stats", {}))

        cluster_by = list(cluster_by) if cluster_by else None
        for part_key, df in partitions.items():
            part_dir = os.path.join(self.table_dir, "data", snapshot_id, part_key)
            t0 = time.time()
            if cluster_by:
                if cluster_mode == "zorder":
                    z, _ = zorder_column(df, cluster_by)
                    df = df.withColumn("__z", z)
                    keys = ["__z"]
                elif cluster_mode == "range":
                    keys = cluster_by
                else:
                    raise ValueError(f"cluster_mode={cluster_mode!r}")
                if cluster_files:
                    df = df.repartitionByRange(cluster_files, *keys)
                else:
                    df = df.repartitionByRange(*keys)
                df = df.sortWithinPartitions(*keys)
                if keys == ["__z"]:
                    df = df.drop("__z")
            with _stats_friendly_writes(df.sparkSession):
                df.write.mode("overwrite").parquet(part_dir)
            part_files = sorted(
                os.path.join(part_dir, f)
                for f in os.listdir(part_dir)
                if f.endswith(".parquet")
            )
            # Never commit empty task outputs (a wide cluster writing a
            # small partition leaves one empty file per idle task): they
            # bloat the manifest and schedule pointless scan tasks. Keep
            # one only when the whole partition is empty, so reads still
            # infer a schema. The dropped files are deleted immediately —
            # nothing references them yet.
            rows_by_file = _rows_per_file(part_files)
            nonempty = [f for f in part_files if rows_by_file[f] > 0]
            kept = nonempty or part_files[:1]
            for f in part_files:
                if f not in kept:
                    os.remove(f)
            files[part_key] = kept
            if stat_cols:
                file_stats.update(_collect_file_stats(kept, stat_cols))
            metrics[part_key] = {
                "n_files": len(kept),
                "n_rows": sum(rows_by_file.values()),
                "bytes": sum(os.path.getsize(f) for f in kept),
                "write_seconds": round(time.time() - t0, 3),
                "snapshot_id": snapshot_id,
            }
            if cluster_by:
                # Recorded so maintenance rewrites preserve the layout the
                # file-skipping reads depend on (see compact_partitions).
                metrics[part_key]["cluster_by"] = list(cluster_by)
                metrics[part_key]["cluster_mode"] = cluster_mode

        live = {f for pf in files.values() for f in pf}
        manifest = {
            "snapshot_id": snapshot_id,
            "parent": parent,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "watermark": watermark,
            "properties": properties or {},
            "files": files,
            "metrics": metrics,
            "file_stats": {f: s for f, s in file_stats.items() if f in live},
        }
        if stage:
            manifest["properties"]["staged"] = True
            # Same invariants as a direct commit (delete carry, sequence
            # stamps): a staged manifest missing them would resurrect
            # purged rows the moment it publishes.
            self._finalize_manifest(manifest)
            _atomic_write(
                self._manifest_path(snapshot_id), json.dumps(manifest, indent=1)
            )
        else:
            self._commit_manifest(manifest)
        return snapshot_id

    def publish(self, snapshot_id: str) -> str:
        """Flip HEAD to a snapshot staged with ``commit_partitions(...,
        stage=True)`` after the audit queries passed. Runs the same
        optimistic-concurrency check as a direct commit: if another writer
        advanced HEAD past the staged snapshot's parent, the staged work is
        based on a stale table and publishing would silently drop theirs —
        :class:`CommitConflictError` instead (re-stage against the new HEAD
        or :meth:`abandon`)."""
        m = self.manifest(snapshot_id)
        snapshot_id = self._resolve_ref(snapshot_id)
        current = self.head()
        if current != m["parent"]:
            raise CommitConflictError(
                f"HEAD moved from {m['parent']!r} to {current!r} since "
                f"{snapshot_id!r} was staged; re-stage or abandon"
            )
        if m["properties"].get("staged"):
            # copy before mutating: manifest() returns the shared cached
            # dict — popping in place would diverge cache from disk if the
            # rewrite below failed
            m = {**m, "properties": dict(m["properties"])}
            m["properties"].pop("staged")
            _atomic_write(
                self._manifest_path(snapshot_id), json.dumps(m, indent=1)
            )
        _atomic_write(os.path.join(self.table_dir, "HEAD"), snapshot_id)
        return snapshot_id

    def abandon(self, snapshot_id: str) -> None:
        """Drop a staged (or otherwise off-chain) snapshot: deletes its
        manifest so its unique data files stop being pinned and age into
        :meth:`remove_orphan_files`' sweep. Refuses to touch HEAD or any
        ancestor of HEAD (use :meth:`rollback` / :meth:`expire_snapshots`
        for on-chain history)."""
        snapshot_id = self._resolve_ref(snapshot_id)
        on_chain = {m["snapshot_id"] for m in self.history()}
        if snapshot_id in on_chain:
            raise ValueError(
                f"{snapshot_id!r} is on the HEAD chain; abandon() is only "
                "for staged/off-chain snapshots"
            )
        os.remove(self._manifest_path(snapshot_id))

    def expire_partitions(
        self,
        predicate,
        properties: dict | None = None,
    ) -> tuple[str, list[str]]:
        """Retention: commit a new snapshot whose manifest DROPS every
        partition for which ``predicate(partition_key)`` is true — a pure
        metadata operation (no data files touched), so time travel to older
        snapshots still sees the expired partitions until
        :meth:`expire_snapshots` reclaims them. Returns
        (snapshot_id, dropped_keys)."""
        parent = self.head()
        m = self.manifest(parent)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.table_dir}")
        dropped = sorted(k for k in m["files"] if predicate(k))
        files = {k: v for k, v in m["files"].items() if k not in dropped}
        metrics = {
            k: v for k, v in m.get("metrics", {}).items() if k not in dropped
        }
        live = {f for pf in files.values() for f in pf}
        snapshot_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        manifest = {
            "snapshot_id": snapshot_id,
            "parent": parent,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "watermark": m.get("watermark"),
            "properties": {**(properties or {}), "expired_partitions": dropped},
            "files": files,
            "metrics": metrics,
            "file_stats": {
                f: s
                for f, s in m.get("file_stats", {}).items()
                if f in live
            },
        }
        self._commit_manifest(manifest)
        return snapshot_id, dropped

    def compact_partitions(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        min_files: int = 2,
        predicate=None,
        properties: dict | None = None,
    ) -> tuple[str | None, dict[str, dict]]:
        """Bin-pack small files (the Iceberg ``rewrite_data_files``
        binpack-strategy analogue): for every HEAD partition with at least
        ``min_files`` data files, rewrite its files into
        ``ceil(bytes / target_file_bytes)`` files when that shrinks the file
        count, and commit ONE new snapshot pointing at the compacted files.

        Why it matters at 100 TB: every incremental tier commit writes a
        partition with one file per task (32 cores -> 32 files), so after a
        month of hourly commits a day-partition scan opens thousands of
        KB-sized files and the scheduler pays per-file open/footer costs
        that dwarf the actual read. Compaction is a pure rewrite — row set
        unchanged (asserted in tests), old snapshots still time-travel to
        the pre-compaction files until :meth:`expire_snapshots` reclaims
        them, and a crash mid-compaction leaves only orphaned new files
        (HEAD flips last, same contract as :meth:`commit_partitions`).

        Plan shape: each partition is read from exactly its own files and
        ``coalesce``-d (no shuffle) down to the target file count; on a
        cluster the per-partition rewrites are independent jobs. ``predicate``
        restricts compaction to a partition family (e.g. only ``tier1h/``).
        Returns ``(snapshot_id | None, {partition: {files_before,
        files_after, bytes}})`` — snapshot_id is None when nothing needed
        compaction.
        """
        parent = self.head()
        m = self.manifest(parent)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.table_dir}")
        # Partitions carrying merge-on-read positional deletes or covered
        # by equality tombstones are always rewritten (even when already
        # bin-packed): compaction is the purge step that folds outstanding
        # deletes back into plain data files so the read-side anti-joins
        # stay bounded.
        dmap = m.get("delete_files", {})
        eq_entries = m.get("eq_delete_files", [])
        fseq = m.get("file_seq", {})
        parts_with_deletes = {
            p for p, pf in m["files"].items() if any(f in dmap for f in pf)
        }
        for p, pf in m["files"].items():
            if p in parts_with_deletes:
                continue
            for e in eq_entries:
                pfx = e.get("prefix")
                if pfx is not None and not p.startswith(pfx):
                    continue
                if any(fseq.get(f, 0) < e["seq"] for f in pf):
                    parts_with_deletes.add(p)
                    break
        todo: dict[str, int] = {}
        for part_key, part_files in m["files"].items():
            if predicate is not None and not predicate(part_key):
                continue
            has_deletes = part_key in parts_with_deletes
            if len(part_files) < min_files and not has_deletes:
                continue
            part_bytes = sum(os.path.getsize(f) for f in part_files)
            n_out = max(1, -(-part_bytes // target_file_bytes))
            if n_out < len(part_files) or has_deletes:
                todo[part_key] = min(n_out, len(part_files))
        if not todo:
            return None, {}

        snapshot_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        files = dict(m["files"])
        metrics = dict(m.get("metrics", {}))
        file_stats = dict(m.get("file_stats", {}))
        report: dict[str, dict] = {}
        for part_key, n_out in todo.items():
            old_files = files[part_key]
            # The compacted files inherit manifest stats on the union of the
            # columns the replaced files carried stats for.
            stat_cols = {
                c for f in old_files for c in file_stats.get(f, {})
            }
            part_dir = os.path.join(self.table_dir, "data", snapshot_id, part_key)
            t0 = time.time()
            # Live scan: outstanding positional deletes are applied here and
            # their entries shed at commit, restoring plain-file reads.
            src = self._scan_live(spark, old_files, m)
            # A clustered partition must stay clustered through compaction:
            # a plain coalesce merges arbitrary scan partitions, undoing
            # the file disjointness every stats-pruned read depends on —
            # the nightly maintain() would silently de-optimize the table.
            # Re-cluster on the recorded keys instead (range shuffle).
            prev = metrics.get(part_key, {})
            ckeys, cmode = prev.get("cluster_by"), prev.get("cluster_mode")
            if ckeys:
                if cmode == "zorder":
                    z, _ = zorder_column(src, ckeys)
                    src = (
                        src.withColumn("__z", z)
                        .repartitionByRange(n_out, "__z")
                        .sortWithinPartitions("__z")
                        .drop("__z")
                    )
                else:
                    src = src.repartitionByRange(
                        n_out, *ckeys
                    ).sortWithinPartitions(*ckeys)
            else:
                src = src.coalesce(n_out)
            with _stats_friendly_writes(spark):
                src.write.mode("overwrite").parquet(part_dir)
            new_files = sorted(
                os.path.join(part_dir, f)
                for f in os.listdir(part_dir)
                if f.endswith(".parquet")
            )
            files[part_key] = new_files
            for f in old_files:
                file_stats.pop(f, None)
            if stat_cols:
                file_stats.update(_collect_file_stats(new_files, stat_cols))
            # Compaction rewrites bytes, not data: incremental consumers
            # key off the last DATA write, carried through every rewrite.
            prev = metrics.get(part_key, {})
            data_snapshot_id = prev.get(
                "data_snapshot_id", prev.get("snapshot_id")
            )
            part_bytes = sum(os.path.getsize(f) for f in new_files)
            metrics[part_key] = {
                "n_files": len(new_files),
                "n_rows": sum(_rows_per_file(new_files).values()),
                "bytes": part_bytes,
                "write_seconds": round(time.time() - t0, 3),
                "snapshot_id": snapshot_id,
                "compacted_from": len(old_files),
                "data_snapshot_id": data_snapshot_id,
            }
            if ckeys:
                metrics[part_key]["cluster_by"] = ckeys
                metrics[part_key]["cluster_mode"] = cmode
            report[part_key] = {
                "files_before": len(old_files),
                "files_after": len(new_files),
                "bytes": part_bytes,
            }

        manifest = {
            "snapshot_id": snapshot_id,
            "parent": parent,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "watermark": m.get("watermark"),
            "properties": {
                **(properties or {}),
                "compacted_partitions": sorted(todo),
            },
            "files": files,
            "metrics": metrics,
            "file_stats": file_stats,
        }
        self._commit_manifest(manifest)
        return snapshot_id, report

    def _register_part_files(
        self,
        files: dict,
        metrics: dict,
        file_stats: dict,
        snapshot_id: str,
        part_key: str,
        kept_files: list,
        new_dir: str,
        stat_cols,
        t0: float,
        extra: dict,
    ) -> None:
        """Fold a just-written directory of data files into an in-progress
        manifest: drop empty task outputs (one kept only when the partition
        would otherwise have no file at all, so reads still infer a schema),
        append to the carried-over files, recompute footer stats for the new
        files and exact metadata row counts for the partition."""
        new_files = sorted(
            os.path.join(new_dir, f)
            for f in os.listdir(new_dir)
            if f.endswith(".parquet")
        )
        rows_by_file = _rows_per_file(new_files)
        nonempty = [f for f in new_files if rows_by_file[f] > 0]
        kept_new = nonempty or ([] if kept_files else new_files[:1])
        for f in new_files:
            if f not in kept_new:
                os.remove(f)
        files[part_key] = sorted(kept_files) + kept_new
        if stat_cols:
            file_stats.update(_collect_file_stats(kept_new, stat_cols))
        # Carry the recorded cluster layout through DML rewrites: dropping
        # it would make the next compaction fall back to plain coalesce and
        # silently de-cluster the partition (compact_partitions re-clusters
        # on exactly these recorded keys).
        prev = metrics.get(part_key, {})
        layout = {
            k: prev[k] for k in ("cluster_by", "cluster_mode") if k in prev
        }
        metrics[part_key] = {
            "n_files": len(files[part_key]),
            "n_rows": sum(_rows_per_file(files[part_key]).values()),
            "bytes": sum(os.path.getsize(f) for f in files[part_key]),
            "write_seconds": round(time.time() - t0, 3),
            "snapshot_id": snapshot_id,
            **layout,
            **extra,
        }

    def merge_into(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: Iterable[str],
        prefix: str | None = None,
        when_not_matched: str = "insert",
        insert_partition: str | None = None,
        properties: dict | None = None,
    ) -> tuple[str | None, dict]:
        """Row-level upsert with copy-on-write rewrite — the Iceberg
        ``MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *`` analogue, the verb a crawl table
        needs when a URL is re-fetched. Every target row whose key appears
        in ``source`` is replaced by the source row (all columns, including
        explicit NULLs); source rows matching no target row are appended to
        ``insert_partition`` (``when_not_matched``: ``"insert"`` |
        ``"ignore"`` | ``"error"``).

        Scale shape (what Iceberg's COW MERGE does, re-expressed):

        1. *Prune*: candidate files = manifest-stats file skipping of the
           ``prefix`` family against the source's global per-key-column
           [min, max] — a 100-TB table with range-clustered keys prunes to
           the files whose key range overlaps the increment at planning
           time, no scan.
        2. *Probe*: ONE column-pruned scan of the candidate files (key
           columns only) semi-joined against the broadcast source keys
           finds the files that actually contain a matching key. Only
           those are rewritten.
        3. *Rewrite*: each touched file set is re-read once, left-joined
           against the broadcast source with a match marker (exact
           NULL-update semantics — no ``coalesce`` trap), and written as
           new files; untouched files are carried over by reference.
        4. *Append*: unmatched source rows land as NEW files appended to
           ``insert_partition``'s file list — O(increment), no rewrite.

        The source must be unique on ``key_cols`` (checked; the SQL MERGE
        cardinality rule) and its schema must cover the target's columns.
        Inserts are PROJECTED to the table's schema (the insert partition's
        own files, else any partition under ``prefix``): source-only
        columns — a CDC version/op column — never leak into the store as a
        divergent file schema. The flip side: MERGE does not perform
        additive schema evolution; to add a column, commit the widened
        partitions via :meth:`commit_partitions` and read with
        ``merge_schema=True``, then MERGE.
        A key present in several partitions is updated in each (standard
        MERGE updates every matching target row). Rewritten/inserted files
        inherit manifest stats for the union of the stat columns the
        partition's replaced files carried. Commits ONE snapshot under the
        optimistic-concurrency check; a crash leaves only orphaned files.
        Returns ``(snapshot_id | None, report)`` — ``None`` when the merge
        was a provable no-op (empty source, or no matches and nothing to
        insert)."""
        from urllib.parse import unquote, urlparse

        from pyspark.sql import functions as F

        key_cols = list(key_cols)
        if when_not_matched not in ("insert", "ignore", "error"):
            raise ValueError(f"when_not_matched={when_not_matched!r}")
        if when_not_matched == "insert" and insert_partition is None:
            raise ValueError("when_not_matched='insert' needs insert_partition")
        parent = self.head()
        m = self.manifest(parent)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.table_dir}")

        # One pass over the (small) source: per-key-column bounds for stats
        # pruning + the MERGE cardinality check, a single tiny agg job.
        src_keys = source.select(*key_cols)
        agg_cols = [F.count(F.lit(1)).alias("__n")] + [
            F.count_distinct(*[F.col(c) for c in key_cols]).alias("__d")
        ]
        for c in key_cols:
            agg_cols += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        stats_row = source.agg(*agg_cols).collect()[0]
        if stats_row["__n"] == 0:
            return None, {"matched_rows": 0, "inserted_rows": 0, "touched_files": 0}
        if stats_row["__d"] != stats_row["__n"]:
            raise ValueError(
                f"source is not unique on {key_cols}: {stats_row['__n']} rows, "
                f"{stats_row['__d']} distinct keys (SQL MERGE cardinality rule)"
            )
        ranges = {}
        for c in key_cols:
            lo = _json_safe_stat(stats_row[f"__lo_{c}"])
            hi = _json_safe_stat(stats_row[f"__hi_{c}"])
            if lo is not None and hi is not None:
                ranges[c] = (lo, hi)

        all_files = self.files_for(parent, prefix)
        cand = self.files_for(parent, prefix, ranges or None)
        # input_file_name() yields file: URIs with absolute paths; manifests
        # may hold relative ones — normalize through abspath for the lookup
        # but keep manifest spelling everywhere else.
        abs_to_manifest = {
            os.path.abspath(f): (f, p)
            for p, pf in m["files"].items()
            for f in pf
        }

        # Probe scan: key columns only, semi-joined against the broadcast
        # source keys; yields both the touched files and the matched keys.
        touched_by_part: dict[str, set] = {}
        matched_rows = 0
        hits = None
        if cand:
            probe = self._scan_live(spark, cand, m, file_col="__file").select(
                "__file", *key_cols
            )
            hits = probe.join(F.broadcast(src_keys), key_cols, "leftsemi").persist()
            for r in hits.groupBy("__file").count().collect():
                path = unquote(urlparse(r["__file"]).path) or r["__file"]
                hit = abs_to_manifest.get(os.path.abspath(path))
                if hit is None:
                    raise RuntimeError(f"probe saw unmanifested file {path}")
                manifest_path, part = hit
                touched_by_part.setdefault(part, set()).add(manifest_path)
                matched_rows += r["count"]

        # Split the source: matched keys update in place, the rest insert.
        if hits is not None and matched_rows:
            matched_keys = hits.select(*key_cols).distinct()
            unmatched = source.join(F.broadcast(matched_keys), key_cols, "left_anti")
        else:
            unmatched = source
        n_insert = 0
        if when_not_matched == "error":
            stray = unmatched.count()
            if stray:
                if hits is not None:
                    hits.unpersist()
                raise ValueError(
                    f"{stray} source rows match no target row "
                    "(when_not_matched='error')"
                )
        if not touched_by_part and when_not_matched != "insert":
            if hits is not None:
                hits.unpersist()
            return None, {
                "matched_rows": 0,
                "inserted_rows": 0,
                "touched_files": 0,
                "candidate_files": len(cand),
                "pruned_files": len(all_files) - len(cand),
            }

        snapshot_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        files = dict(m["files"])
        metrics = dict(m.get("metrics", {}))
        file_stats = dict(m.get("file_stats", {}))
        rewritten: dict[str, dict] = {}

        def _finish_part(part_key, kept_files, new_dir, stat_cols, t0, extra):
            self._register_part_files(
                files,
                metrics,
                file_stats,
                snapshot_id,
                part_key,
                kept_files,
                new_dir,
                stat_cols,
                t0,
                extra,
            )

        # Build every partition's replacement rows, then write them all in
        # ONE Spark job via dynamic partition directories — on a cluster the
        # rewrites parallelize across executors instead of running as one
        # sequential job per partition (driver-side job latency would
        # otherwise dominate small merges).
        union_df = None
        plan: list[tuple[str, list[str]]] = []
        for part_key, touched in sorted(touched_by_part.items()):
            touched = sorted(touched)
            old = self._scan_live(spark, touched, m)
            data_cols = [c for c in old.columns if c not in key_cols]
            missing = set(old.columns) - set(source.columns)
            if missing:
                raise ValueError(
                    f"source lacks target columns {sorted(missing)} "
                    "(MERGE is UPDATE SET * — schemas must align)"
                )
            src_marked = F.broadcast(
                source.select(
                    *key_cols,
                    *[F.col(c).alias(f"__src_{c}") for c in data_cols],
                    F.lit(True).alias("__matched"),
                )
            )
            # Exact NULL-update semantics: a marker column, not coalesce —
            # a source row that sets a value to NULL must win.
            new_data = (
                old.join(src_marked, key_cols, "left")
                .select(
                    *key_cols,
                    *[
                        F.when(F.col("__matched"), F.col(f"__src_{c}"))
                        .otherwise(F.col(c))
                        .alias(c)
                        for c in data_cols
                    ],
                )
                .select(*old.columns)
                .withColumn("__cowpart", F.lit(part_key))
            )
            union_df = (
                new_data if union_df is None else union_df.unionByName(new_data)
            )
            plan.append((part_key, touched))
        if union_df is not None:
            cow_dir = os.path.join(self.table_dir, "data", snapshot_id, "__cow__")
            t0 = time.time()
            n_out = max(1, sum(len(t) for _, t in plan))
            with _stats_friendly_writes(spark):
                union_df.coalesce(n_out).write.partitionBy(
                    "__cowpart"
                ).mode("overwrite").parquet(cow_dir)
            sub_by_part = {
                unquote(d.split("=", 1)[1]): os.path.join(cow_dir, d)
                for d in os.listdir(cow_dir)
                if d.startswith("__cowpart=")
            }
            for part_key, touched in plan:
                kept_files = [f for f in files[part_key] if f not in set(touched)]
                stat_cols = {c for f in touched for c in file_stats.get(f, {})}
                for f in touched:
                    file_stats.pop(f, None)
                _finish_part(
                    part_key,
                    kept_files,
                    sub_by_part[part_key],
                    stat_cols,
                    t0,
                    {"merged_files": len(touched)},
                )
                rewritten[part_key] = {"files_rewritten": len(touched)}

        if when_not_matched == "insert":
            existing = files.get(insert_partition, [])
            # Align inserts to the table's schema: the insert partition's
            # own files if it exists, else any file under the MERGE prefix
            # (one table, one schema — source-only columns like a CDC
            # version/op column must not leak into the store), else (truly
            # empty table) the source verbatim.
            schema_file = existing[0] if existing else next(
                (
                    pf[0]
                    for part, pf in sorted(files.items())
                    if pf and (prefix is None or part.startswith(prefix))
                ),
                None,
            )
            if schema_file is not None:
                tgt_cols = spark.read.parquet(schema_file).columns
                missing = set(tgt_cols) - set(source.columns)
                if missing:
                    raise ValueError(
                        f"source lacks {sorted(missing)} of insert partition "
                        f"{insert_partition!r}"
                    )
                ins = unmatched.select(*tgt_cols)
            else:
                ins = unmatched
            # A dedicated subdir: when insert_partition was ALSO rewritten
            # above, its new files already live in data/<sid>/<part>/ and an
            # overwrite-mode write there would wipe them.
            part_dir = os.path.join(
                self.table_dir, "data", snapshot_id, insert_partition, "__append__"
            )
            t0 = time.time()
            stat_cols = {c for f in existing for c in file_stats.get(f, {})}
            with _stats_friendly_writes(spark):
                ins.write.mode("overwrite").parquet(part_dir)
            before = metrics.get(insert_partition, {}).get("n_rows", 0)
            _finish_part(
                insert_partition, list(existing), part_dir, stat_cols, t0, {}
            )
            n_insert = metrics[insert_partition]["n_rows"] - before

        if hits is not None:
            hits.unpersist()
        if not touched_by_part and not n_insert:
            # Inserts resolved to zero rows and nothing matched: drop the
            # would-be snapshot rather than committing a no-op.
            return None, {
                "matched_rows": 0,
                "inserted_rows": 0,
                "touched_files": 0,
                "candidate_files": len(cand),
                "pruned_files": len(all_files) - len(cand),
            }
        live = {f for pf in files.values() for f in pf}
        manifest = {
            "snapshot_id": snapshot_id,
            "parent": parent,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "watermark": m.get("watermark"),
            "properties": {
                **(properties or {}),
                "merge_keys": key_cols,
                "merged_partitions": sorted(rewritten),
                "merge_inserted_into": insert_partition
                if (when_not_matched == "insert" and n_insert)
                else None,
            },
            "files": files,
            "metrics": metrics,
            "file_stats": {f: s for f, s in file_stats.items() if f in live},
        }
        self._commit_manifest(manifest)
        report = {
            "matched_rows": matched_rows,
            "inserted_rows": n_insert,
            "candidate_files": len(cand),
            "pruned_files": len(all_files) - len(cand),
            "touched_files": sum(len(v) for v in touched_by_part.values()),
            "rewritten_partitions": rewritten,
        }
        return snapshot_id, report

    def delete_where(
        self,
        spark: SparkSession,
        condition,
        prefix: str | None = None,
        ranges: dict[str, tuple] | None = None,
        properties: dict | None = None,
        mode: str = "copy-on-write",
    ) -> tuple[str | None, dict]:
        """Row-level DELETE — the Iceberg ``DELETE FROM t WHERE ...``
        analogue, and the right-to-be-forgotten path for a crawl table
        (drop every row of a url without rewriting the world).
        ``condition`` is a SQL string or Column selecting the rows to
        DELETE.

        ``mode="copy-on-write"`` (default) rewrites every touched file's
        survivors — reads stay plain scans, the delete pays the write.
        ``mode="merge-on-read"`` (the Iceberg v2 positional-delete shape)
        writes only a tiny delete file of (file, row_index) pairs and
        commits in O(deleted rows): the right verb when a delete touches a
        few rows in many files (rewriting TBs to drop KBs). Reads apply
        outstanding deletes via a broadcast anti-join on
        (``_metadata.file_path``, ``_metadata.row_index``);
        :meth:`compact_partitions` (and the nightly :meth:`maintain`)
        purges them back into plain files.

        Scale shape: ``ranges`` (same domain as :meth:`files_for`) prunes
        candidate files from the manifest stats at planning time — pass the
        key bounds implied by the predicate, e.g. ``{"url": (u, u)}`` for a
        single-url purge over a url-range-clustered table. One probe scan
        of the candidates (predicate columns only, via the filter's own
        column pruning) counts matching rows per file; only files with a
        hit are rewritten (``.where(~condition)``), everything else is
        carried by reference. A partition whose every row dies keeps one
        empty file so reads still infer a schema (the retention verb for
        dropping WHOLE partitions is :meth:`expire_partitions`, a pure
        metadata operation — prefer it when the predicate is the partition
        key). Commits ONE snapshot under the optimistic-concurrency check;
        time travel to the pre-delete snapshot still sees the deleted rows
        until :meth:`expire_snapshots` reclaims them (document retention
        obligations accordingly). Returns ``(snapshot_id | None, report)``
        — ``None`` when no row matched."""
        from urllib.parse import unquote, urlparse

        from pyspark.sql import functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition
        parent = self.head()
        m = self.manifest(parent)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.table_dir}")
        all_files = self.files_for(parent, prefix)
        cand = self.files_for(parent, prefix, ranges)
        abs_to_manifest = {
            os.path.abspath(f): (f, p)
            for p, pf in m["files"].items()
            for f in pf
        }
        report = {
            "deleted_rows": 0,
            "touched_files": 0,
            "candidate_files": len(cand),
            "pruned_files": len(all_files) - len(cand),
        }
        if not cand:
            return None, report
        if mode == "merge-on-read":
            return self._delete_merge_on_read(
                spark, cond, condition, parent, m, cand, abs_to_manifest,
                report, properties,
            )
        if mode != "copy-on-write":
            raise ValueError(
                f"mode must be 'copy-on-write' or 'merge-on-read', got {mode!r}"
            )

        touched_by_part: dict[str, set] = {}
        for r in (
            self._scan_live(spark, cand, m, file_col="__file")
            .where(cond)
            .groupBy("__file")
            .count()
            .collect()
        ):
            path = unquote(urlparse(r["__file"]).path) or r["__file"]
            hit = abs_to_manifest.get(os.path.abspath(path))
            if hit is None:
                raise RuntimeError(f"probe saw unmanifested file {path}")
            manifest_path, part = hit
            touched_by_part.setdefault(part, set()).add(manifest_path)
            report["deleted_rows"] += r["count"]
            report["touched_files"] += 1
        if not touched_by_part:
            return None, report

        snapshot_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        files = dict(m["files"])
        metrics = dict(m.get("metrics", {}))
        file_stats = dict(m.get("file_stats", {}))
        # One Spark job rewrites every touched partition's survivors via
        # dynamic partition directories (same shape as merge_into): the
        # rewrites parallelize across executors instead of paying one
        # sequential job per partition.
        union_df = None
        plan: list[tuple[str, list[str]]] = []
        for part_key, touched in sorted(touched_by_part.items()):
            touched = sorted(touched)
            # NULL predicate rows are NOT deleted (SQL DELETE semantics), so
            # they must survive: plain ~cond would drop them too. Scanning
            # live (not raw) keeps earlier merge-on-read deletes deleted —
            # a raw rewrite would resurrect those rows because the new file
            # sheds the parent's positional-delete entries.
            survivors = (
                self._scan_live(spark, touched, m)
                .where(~F.coalesce(cond, F.lit(False)))
                .withColumn("__cowpart", F.lit(part_key))
            )
            union_df = (
                survivors if union_df is None else union_df.unionByName(survivors)
            )
            plan.append((part_key, touched))
        cow_dir = os.path.join(self.table_dir, "data", snapshot_id, "__cow__")
        t0 = time.time()
        n_out = max(1, sum(len(t) for _, t in plan))
        with _stats_friendly_writes(spark):
            union_df.coalesce(n_out).write.partitionBy("__cowpart").mode(
                "overwrite"
            ).parquet(cow_dir)
        sub_by_part = {
            unquote(d.split("=", 1)[1]): os.path.join(cow_dir, d)
            for d in os.listdir(cow_dir)
            if d.startswith("__cowpart=")
        }
        dropped_parts = []
        for part_key, touched in plan:
            kept_files = [f for f in files[part_key] if f not in set(touched)]
            stat_cols = {c for f in touched for c in file_stats.get(f, {})}
            for f in touched:
                file_stats.pop(f, None)
            sub = sub_by_part.get(part_key)
            if sub is None and not kept_files:
                # Every row of the partition died: drop it from the manifest
                # (the expire_partitions shape) instead of keeping a husk.
                files.pop(part_key)
                metrics.pop(part_key, None)
                dropped_parts.append(part_key)
                continue
            if sub is None:
                # No survivors from the touched files; the partition keeps
                # only its untouched files.
                files[part_key] = sorted(kept_files)
                metrics[part_key] = {
                    "n_files": len(kept_files),
                    "n_rows": sum(_rows_per_file(kept_files).values()),
                    "bytes": sum(os.path.getsize(f) for f in kept_files),
                    "write_seconds": round(time.time() - t0, 3),
                    "snapshot_id": snapshot_id,
                    "deleted_from_files": len(touched),
                }
                continue
            self._register_part_files(
                files,
                metrics,
                file_stats,
                snapshot_id,
                part_key,
                kept_files,
                sub,
                stat_cols,
                t0,
                {"deleted_from_files": len(touched)},
            )
        live = {f for pf in files.values() for f in pf}
        manifest = {
            "snapshot_id": snapshot_id,
            "parent": parent,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "watermark": m.get("watermark"),
            "properties": {
                **(properties or {}),
                "delete_condition": str(condition),
                "deleted_partitions": sorted(touched_by_part),
                "dropped_partitions": dropped_parts,
            },
            "files": files,
            "metrics": metrics,
            "file_stats": {f: s for f, s in file_stats.items() if f in live},
        }
        self._commit_manifest(manifest)
        return snapshot_id, report

    def update_where(
        self,
        spark: SparkSession,
        condition,
        set: dict,
        prefix: str | None = None,
        ranges: dict[str, tuple] | None = None,
        properties: dict | None = None,
    ) -> tuple[str | None, dict]:
        """Row-level ``UPDATE t SET col = expr, ... WHERE ...`` with
        copy-on-write rewrite — the third DML verb next to
        :meth:`merge_into` and :meth:`delete_where`, for in-place fixes
        that have no natural source table (backfilling a parsed field,
        correcting a mislabeled language, clamping a bad sensor range).
        ``set`` maps column name → Column or SQL expression string; every
        assignment is evaluated against the OLD row (standard SQL UPDATE:
        ``SET a = b, b = a`` swaps), cast back to the column's existing
        type so the table schema never drifts, and applied only where
        ``condition`` is TRUE (NULL-predicate rows keep their values).

        Scale shape is :meth:`delete_where`'s: ``ranges`` prunes candidate
        files from the manifest stats, one live probe scan finds the files
        with a hit, only those are rewritten (ONE dynamic-partition Spark
        job), everything else is carried by reference and keeps its
        positional-delete entries. Updating a cluster-key column leaves the
        rewritten files' NEW stats correct but no longer key-disjoint with
        their neighbors — re-cluster via :meth:`compact_partitions` if
        range pruning on that key matters. Returns
        ``(snapshot_id | None, report)`` — ``None`` when no row matched."""
        from urllib.parse import unquote, urlparse

        from pyspark.sql import functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition
        parent = self.head()
        m = self.manifest(parent)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.table_dir}")
        if not set:
            raise ValueError("update_where needs at least one SET assignment")
        assignments = {
            c: (F.expr(v) if isinstance(v, str) else v) for c, v in set.items()
        }
        all_files = self.files_for(parent, prefix)
        cand = self.files_for(parent, prefix, ranges)
        abs_to_manifest = {
            os.path.abspath(f): (f, p)
            for p, pf in m["files"].items()
            for f in pf
        }
        report = {
            "updated_rows": 0,
            "touched_files": 0,
            "candidate_files": len(cand),
            "pruned_files": len(all_files) - len(cand),
        }
        if not cand:
            return None, report
        touched_by_part: dict[str, set] = {}
        for r in (
            self._scan_live(spark, cand, m, file_col="__file")
            .where(cond)
            .groupBy("__file")
            .count()
            .collect()
        ):
            path = unquote(urlparse(r["__file"]).path) or r["__file"]
            hit = abs_to_manifest.get(os.path.abspath(path))
            if hit is None:
                raise RuntimeError(f"probe saw unmanifested file {path}")
            manifest_path, part = hit
            # {literal} instead of set(): the SET-clause parameter shadows
            # the builtin in this scope
            touched_by_part.setdefault(part, {manifest_path}).add(manifest_path)
            report["updated_rows"] += r["count"]
            report["touched_files"] += 1
        if not touched_by_part:
            return None, report

        snapshot_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        files = dict(m["files"])
        metrics = dict(m.get("metrics", {}))
        file_stats = dict(m.get("file_stats", {}))
        union_df = None
        plan: list[tuple[str, list[str]]] = []
        matched = F.coalesce(cond, F.lit(False))
        for part_key, touched in sorted(touched_by_part.items()):
            touched = sorted(touched)
            cur = self._scan_live(spark, touched, m)
            types = dict(cur.dtypes)
            # NB: the parameter named ``set`` shadows the builtin in here
            unknown = [c for c in assignments if c not in types]
            if unknown:
                raise ValueError(f"SET references unknown columns {sorted(unknown)}")
            rewritten = cur.select(
                *[
                    (
                        F.when(matched, assignments[c].cast(types[c]))
                        .otherwise(F.col(c))
                        .alias(c)
                        if c in assignments
                        else F.col(c)
                    )
                    for c in cur.columns
                ]
            ).withColumn("__cowpart", F.lit(part_key))
            union_df = (
                rewritten if union_df is None else union_df.unionByName(rewritten)
            )
            plan.append((part_key, touched))
        cow_dir = os.path.join(self.table_dir, "data", snapshot_id, "__cow__")
        t0 = time.time()
        n_out = max(1, sum(len(t) for _, t in plan))
        with _stats_friendly_writes(spark):
            union_df.coalesce(n_out).write.partitionBy("__cowpart").mode(
                "overwrite"
            ).parquet(cow_dir)
        sub_by_part = {
            unquote(d.split("=", 1)[1]): os.path.join(cow_dir, d)
            for d in os.listdir(cow_dir)
            if d.startswith("__cowpart=")
        }
        for part_key, touched in plan:
            touched_set = frozenset(touched)
            kept_files = [f for f in files[part_key] if f not in touched_set]
            stat_cols = {c for f in touched for c in file_stats.get(f, {})}
            for f in touched:
                file_stats.pop(f, None)
            self._register_part_files(
                files,
                metrics,
                file_stats,
                snapshot_id,
                part_key,
                kept_files,
                sub_by_part[part_key],
                stat_cols,
                t0,
                {"updated_from_files": len(touched)},
            )
        live = {f for pf in files.values() for f in pf}
        manifest = {
            "snapshot_id": snapshot_id,
            "parent": parent,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "watermark": m.get("watermark"),
            "properties": {
                **(properties or {}),
                "update_condition": str(condition),
                "update_set": {c: str(v) for c, v in set.items()},
                "updated_partitions": sorted(touched_by_part),
            },
            "files": files,
            "metrics": metrics,
            "file_stats": {f: s for f, s in file_stats.items() if f in live},
        }
        self._commit_manifest(manifest)
        return snapshot_id, report

    def rollback(self, snapshot_id: str, purge_abandoned: bool = False) -> list[str]:
        """Point HEAD back at an ancestor snapshot (the Iceberg
        ``rollback_to_snapshot`` analogue) — an O(1) metadata flip that
        undoes bad commits without touching data files; time travel to the
        abandoned snapshots keeps working through their manifests. With
        ``purge_abandoned`` the manifests newer than the target (reachable
        from the old HEAD but not the new one) are deleted so their unique
        data files age into :meth:`remove_orphan_files`' sweep — otherwise
        an abandoned branch pins its files forever. Returns the abandoned
        snapshot ids (newest first)."""
        snapshot_id = self._resolve_ref(snapshot_id)
        if not os.path.exists(self._manifest_path(snapshot_id)):
            raise FileNotFoundError(f"no snapshot {snapshot_id!r}")
        abandoned = []
        cur = self.head()
        while cur and cur != snapshot_id:
            mm = self.manifest(cur)
            abandoned.append(cur)
            cur = mm.get("parent")
        if cur != snapshot_id:
            raise ValueError(
                f"{snapshot_id!r} is not an ancestor of HEAD; refusing to "
                "roll back across branches"
            )
        _atomic_write(os.path.join(self.table_dir, "HEAD"), snapshot_id)
        if purge_abandoned:
            for sid in abandoned:
                os.remove(self._manifest_path(sid))
        return abandoned

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Physically reclaim history (the Iceberg ``expire_snapshots``
        analogue): keep the newest ``keep_last`` snapshots, delete the
        older manifests, and delete every data file referenced ONLY by the
        expired snapshots. The kept chain's oldest manifest becomes the new
        root (parent = null). Returns the deleted data files."""
        assert keep_last >= 1
        chain = self.history()  # newest first
        keep, drop = chain[:keep_last], chain[keep_last:]
        if not drop:
            return []
        live_files = {f for m in keep for f in _manifest_all_paths(m)}
        deleted = []
        for m in drop:
            for f in sorted(_manifest_all_paths(m)):
                if f not in live_files and os.path.exists(f):
                    os.remove(f)
                    deleted.append(f)
            os.remove(self._manifest_path(m["snapshot_id"]))
        root = dict(keep[-1])
        root["parent"] = None
        _atomic_write(
            self._manifest_path(root["snapshot_id"]), json.dumps(root, indent=1)
        )
        # prune now-empty data dirs
        data_dir = os.path.join(self.table_dir, "data")
        for dirpath, dirnames, filenames in os.walk(data_dir, topdown=False):
            if not dirnames and not filenames:
                os.rmdir(dirpath)
        return deleted

    def maintain(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        keep_last: int = 3,
        orphan_grace_seconds: float = 3 * 86400,
        predicate=None,
    ) -> dict:
        """The nightly maintenance job, in the only safe order: bin-pack
        compaction first (commits a new snapshot), snapshot expiry second
        (reclaims the files compaction replaced, beyond ``keep_last`` of
        time travel), orphan sweep last (crash residue older than the grace
        period). One call per table per night keeps file counts, history
        size, and orphan storage bounded forever."""
        snap, report = self.compact_partitions(
            spark, target_file_bytes=target_file_bytes, predicate=predicate
        )
        expired = self.expire_snapshots(keep_last=keep_last)
        orphans = self.remove_orphan_files(older_than_seconds=orphan_grace_seconds)
        return {
            "compaction_snapshot": snap,
            "compacted_partitions": len(report),
            "expired_files": len(expired),
            "orphan_files_removed": len(orphans),
        }

    def remove_orphan_files(self, older_than_seconds: float = 3 * 86400) -> list[str]:
        """Delete data files no manifest references (the Iceberg
        ``remove_orphan_files`` analogue). The crash contract of
        :meth:`commit_partitions` / :meth:`compact_partitions` is "at most
        orphaned data files, never a corrupt manifest" — so orphans are
        exactly what a crashed writer leaves behind, and at 100 TB with
        hourly jobs they accumulate into real storage cost.

        Safety: only files under ``data/`` that (a) appear in NO manifest in
        ``snapshots/`` — including manifests not on the current HEAD chain —
        and (b) are older than ``older_than_seconds`` (grace period so an
        in-flight writer's files, whose manifest has not landed yet, are
        never swept) are removed. Returns the deleted paths."""
        live: set[str] = set()
        snap_dir = os.path.join(self.table_dir, "snapshots")
        for name in os.listdir(snap_dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(snap_dir, name)) as fh:
                m = json.load(fh)
            live.update(_manifest_all_paths(m))
        cutoff = time.time() - older_than_seconds
        deleted = []
        data_dir = os.path.join(self.table_dir, "data")
        for dirpath, _dirnames, filenames in os.walk(data_dir):
            for name in filenames:
                # Manifests list only data files; leave Spark's _SUCCESS /
                # .crc markers alone so a live partition dir stays intact.
                if not name.endswith(".parquet"):
                    continue
                path = os.path.join(dirpath, name)
                if path in live:
                    continue
                if os.path.getmtime(path) > cutoff:
                    continue
                os.remove(path)
                deleted.append(path)
        for dirpath, dirnames, filenames in os.walk(data_dir, topdown=False):
            if not dirnames and not filenames:
                os.rmdir(dirpath)
        return deleted

    # -- merge-on-read delete plumbing ------------------------------------------
    def _delete_merge_on_read(
        self,
        spark: SparkSession,
        cond,
        condition,
        parent: str | None,
        m: dict,
        cand: list,
        abs_to_manifest: dict,
        report: dict,
        properties: dict | None,
    ) -> tuple[str | None, dict]:
        """The ``mode="merge-on-read"`` body of :meth:`delete_where`: ONE
        probe job writes a positional-delete parquet of
        ``(file: _metadata.file_path URI, pos: _metadata.row_index)`` for
        every matching live row, and the commit is pure metadata — data
        files, metrics, and file stats are carried verbatim, only the
        ``delete_files`` map (manifest data path → covering delete files)
        grows. O(deleted rows) I/O instead of O(touched-file bytes): the
        right verb when a delete touches a few rows in many files.

        The probe scans LIVE (earlier deletes applied), so stacked MoR
        deletes never double-count a row, and the delete file is shared
        across all data files it covers — the read-side anti-join keys on
        (file, pos), so entries for since-rewritten files are inert.
        Manifest ``metrics.n_rows`` / file stats intentionally keep their
        pre-delete values (the Iceberg v2 convention): stats-based file
        skipping only ever skips files that cannot match, and
        :meth:`compact_partitions` restores exact counts when it purges."""
        from urllib.parse import unquote, urlparse

        from pyspark.sql import functions as F

        snapshot_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        hits = (
            self._scan_live(spark, cand, m, file_col="__file", pos_col="__pos")
            .where(cond)
            .select(F.col("__file").alias("file"), F.col("__pos").alias("pos"))
        )
        # NOT "__deletes__": Spark's file index silently filters
        # underscore-prefixed path segments, so a reserved-looking name
        # would make the read-back warn "All paths were ignored".
        del_dir = os.path.join(self.table_dir, "data", snapshot_id, "deletes")
        t0 = time.time()
        hits.coalesce(1).write.mode("overwrite").parquet(del_dir)
        delete_paths = sorted(
            os.path.join(del_dir, f)
            for f in os.listdir(del_dir)
            if f.endswith(".parquet")
        )
        per_file = (
            spark.read.parquet(*delete_paths).groupBy("file").count().collect()
            if delete_paths
            else []
        )
        if not per_file:
            shutil.rmtree(os.path.dirname(del_dir), ignore_errors=True)
            return None, report
        new_entries: dict[str, list[str]] = {}
        touched_parts: set[str] = set()
        for r in per_file:
            path = unquote(urlparse(r["file"]).path) or r["file"]
            hit = abs_to_manifest.get(os.path.abspath(path))
            if hit is None:
                raise RuntimeError(f"probe saw unmanifested file {path}")
            new_entries[hit[0]] = delete_paths
            touched_parts.add(hit[1])
            report["deleted_rows"] += r["count"]
            report["touched_files"] += 1
        dmap = self._live_delete_files(m, m["files"])
        for f, paths in new_entries.items():
            dmap[f] = sorted(set(dmap.get(f, [])) | set(paths))
        report["delete_files_written"] = len(delete_paths)
        report["delete_bytes"] = sum(os.path.getsize(p) for p in delete_paths)
        report["write_seconds"] = round(time.time() - t0, 3)
        # Incremental consumers detect change via metrics.snapshot_id; a
        # MoR delete changes a partition's LOGICAL rows without rewriting
        # its files, so bump the touched partitions' write snapshot (and
        # drop any compaction-carried data_snapshot_id override) or
        # changed_partitions()/follow() would silently skip the delete.
        metrics = dict(m.get("metrics", {}))
        for p in touched_parts:
            bumped = {**metrics.get(p, {}), "snapshot_id": snapshot_id}
            bumped.pop("data_snapshot_id", None)
            metrics[p] = bumped
        manifest = {
            "snapshot_id": snapshot_id,
            "parent": parent,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "watermark": m.get("watermark"),
            "properties": {
                **(properties or {}),
                "delete_condition": str(condition),
                "delete_mode": "merge-on-read",
                "deleted_partitions": sorted(touched_parts),
            },
            "files": dict(m["files"]),
            "metrics": metrics,
            "file_stats": dict(m.get("file_stats", {})),
            "delete_files": dmap,
        }
        self._commit_manifest(manifest)
        return snapshot_id, report

    def delete_keys(
        self,
        spark: SparkSession,
        keys: DataFrame,
        prefix: str | None = None,
        properties: dict | None = None,
    ) -> tuple[str | None, dict]:
        """Equality DELETE (the Iceberg v2 equality-delete-file shape): drop
        every row whose key columns match a row of ``keys`` — WITHOUT any
        probe scan of the table. The commit writes only the deduplicated
        key set as a tombstone parquet and is O(keys): the right verb for
        CDC tombstones and purge lists arriving faster than a probe could
        run (a positional delete must first FIND the rows; an equality
        delete just declares the keys dead). ``keys``' column names select
        the key columns; NULL key values match NULL row values (null-safe
        equality, the Iceberg convention).

        Sequence semantics: the tombstone applies only to rows from data
        files with a strictly older sequence number, so a key re-inserted
        by a LATER commit is alive again — exactly the delete+insert
        ordering a CDC upsert stream needs. Reads anti-join the broadcast
        key set per sequence epoch (:meth:`_scan_live`);
        :meth:`compact_partitions` folds tombstones into plain files and
        sheds the entry once no older file survives. ``prefix`` scopes the
        tombstone to a partition family (and marks those partitions
        changed for incremental consumers — an equality delete cannot know
        which partitions actually held matches without the probe it
        exists to avoid, so consumers conservatively reprocess the
        family). Returns ``(snapshot_id | None, report)``."""
        parent = self.head()
        m = self.manifest(parent)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.table_dir}")
        key_cols = list(keys.columns)
        if not key_cols:
            raise ValueError("delete_keys needs at least one key column")
        # Validate the key columns against every covered partition NOW
        # (one footer read per partition, no Spark job): a tombstone whose
        # columns a covered file lacks would poison every subsequent read,
        # probe, and compaction of the family with AnalysisException — the
        # purge remedy itself included.
        import pyarrow.parquet as _pq

        for part, pf in sorted(m["files"].items()):
            if prefix is not None and not part.startswith(prefix):
                continue
            if not pf:
                continue
            cols = set(_pq.read_schema(pf[0]).names)
            missing = [c for c in key_cols if c not in cols]
            if missing:
                raise ValueError(
                    f"tombstone key columns {missing} absent from partition "
                    f"{part!r} — scope the delete with prefix= to the "
                    "families that carry them"
                )
        snapshot_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        eq_dir = os.path.join(self.table_dir, "data", snapshot_id, "eq_deletes")
        t0 = time.time()
        keys.dropDuplicates().coalesce(1).write.mode("overwrite").parquet(eq_dir)
        paths = sorted(
            os.path.join(eq_dir, f)
            for f in os.listdir(eq_dir)
            if f.endswith(".parquet")
        )
        n_keys = sum(_rows_per_file(paths).values()) if paths else 0
        report = {
            "n_keys": n_keys,
            "eq_delete_bytes": sum(os.path.getsize(p) for p in paths),
            "write_seconds": round(time.time() - t0, 3),
        }
        if n_keys == 0:
            shutil.rmtree(os.path.dirname(eq_dir), ignore_errors=True)
            return None, report
        seq = m.get("seq", 0) + 1  # matches _commit_manifest's assignment
        entry = {"paths": paths, "cols": key_cols, "seq": seq, "prefix": prefix}
        kept = self._live_eq_deletes(
            m.get("eq_delete_files", []), m["files"], m.get("file_seq", {})
        )
        marked = [
            p for p in m["files"] if prefix is None or p.startswith(prefix)
        ]
        metrics = dict(m.get("metrics", {}))
        for p in marked:
            bumped = {**metrics.get(p, {}), "snapshot_id": snapshot_id}
            bumped.pop("data_snapshot_id", None)
            metrics[p] = bumped
        report["partitions_marked"] = len(marked)
        manifest = {
            "snapshot_id": snapshot_id,
            "parent": parent,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "watermark": m.get("watermark"),
            "properties": {
                **(properties or {}),
                "delete_mode": "equality",
                "delete_key_cols": key_cols,
                "delete_prefix": prefix,
            },
            "files": dict(m["files"]),
            "metrics": metrics,
            "file_stats": dict(m.get("file_stats", {})),
            "eq_delete_files": kept + [entry],
        }
        self._commit_manifest(manifest)
        return snapshot_id, report

    @staticmethod
    def _live_delete_files(m: dict | None, files: dict) -> dict:
        """The parent's positional-delete map restricted to data files still
        live in the child manifest — a rewritten or dropped data file takes
        its delete entries with it (the survivors were written WITHOUT the
        deleted rows, so carrying stale positions would delete wrong rows)."""
        live = {f for pf in files.values() for f in pf}
        return {
            f: d
            for f, d in (m or {}).get("delete_files", {}).items()
            if f in live and d
        }

    def _apply_delete_files(
        self, spark: SparkSession, df: DataFrame, paths, m: dict
    ) -> DataFrame:
        """Apply positional delete files covering ``paths`` to a scan of
        exactly those paths — the Iceberg v2 merge-on-read contract. Rows
        are identified by (``_metadata.file_path``, ``_metadata.row_index``),
        the same values the delete commit recorded, so no path
        normalization is involved. The delete set rides a broadcast
        LEFT ANTI join: tiny against the data scan (deletes that grow large
        are exactly what :meth:`compact_partitions` purges)."""
        dmap = m.get("delete_files", {})
        rel = sorted({d for p in paths for d in dmap.get(p, [])})
        if not rel:
            return df
        from pyspark.sql import functions as F

        dels = (
            spark.read.parquet(*rel)
            .select(
                F.col("file").alias("__del_file"), F.col("pos").alias("__del_pos")
            )
            .dropDuplicates(["__del_file", "__del_pos"])
        )
        keyed = df.withColumn("__row_file", F.col("_metadata.file_path")).withColumn(
            "__row_pos", F.col("_metadata.row_index")
        )
        survivors = keyed.join(
            F.broadcast(dels),
            (keyed["__row_file"] == dels["__del_file"])
            & (keyed["__row_pos"] == dels["__del_pos"]),
            "left_anti",
        )
        return survivors.drop("__row_file", "__row_pos")

    @staticmethod
    def _live_eq_deletes(entries: list, files: dict, file_seq: dict) -> list:
        """Parent equality-delete entries still needed by the child
        manifest: an entry can be dropped once every live file it could
        apply to (strictly older sequence, under the entry's partition
        prefix) has been rewritten or removed — the rewrites scanned live,
        so the tombstoned rows are physically gone."""
        kept = []
        for e in entries:
            pfx = e.get("prefix")
            for part, pf in files.items():
                if pfx is not None and not part.startswith(pfx):
                    continue
                if any(file_seq.get(f, 0) < e["seq"] for f in pf):
                    kept.append(e)
                    break
        return kept

    def _apply_eq_deletes(
        self, spark: SparkSession, df: DataFrame, entry: dict
    ) -> DataFrame:
        """Anti-join one equality-delete entry's key set against a scan.
        Null-safe equality per key column (the Iceberg equality-delete
        convention: NULL is a value, so a NULL-keyed tombstone kills
        NULL-keyed rows). The key set rides a broadcast — equality deletes
        are tombstone-sized by construction (a CDC batch, a purge list),
        and compaction folds them into plain files before they grow."""
        import functools

        from pyspark.sql import functions as F

        keys = spark.read.parquet(*entry["paths"]).dropDuplicates()
        cond = functools.reduce(
            lambda a, b: a & b,
            [df[c].eqNullSafe(keys[c]) for c in entry["cols"]],
        )
        return df.join(F.broadcast(keys), cond, "left_anti")

    def _scan_live(
        self,
        spark: SparkSession,
        paths,
        m: dict,
        file_col: str | None = None,
        pos_col: str | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Scan manifest data files with every outstanding delete applied —
        positional (merge-on-read DELETE) and equality (tombstones) — what
        every reader, internal or external, must use instead of a raw
        ``spark.read.parquet`` so row-level deletes are invisible
        everywhere. Select the needed columns AFTER (Catalyst prunes them
        through the anti-joins; projecting first would drop the virtual
        ``_metadata`` column the positional join keys on). ``file_col`` /
        ``pos_col`` materialize each row's source-file URI and row index —
        the probe scans' replacement for ``input_file_name()``, which does
        not survive the anti-join.

        Equality deletes respect sequence epochs: the scanned paths are
        grouped by WHICH tombstone entries postdate their birth sequence
        (at most #entries+1 groups, each one scan + broadcast anti-joins,
        unioned) so a key re-inserted after its tombstone survives. No
        per-row file-path lookup table is ever built — epoch membership is
        decided at plan time from the manifest."""
        from pyspark.sql import functions as F

        paths = list(paths)

        def build(group_paths):
            reader = spark.read
            if merge_schema:
                reader = reader.option("mergeSchema", "true")
            df = reader.parquet(*group_paths)
            if file_col is not None:
                df = df.withColumn(file_col, F.col("_metadata.file_path"))
            if pos_col is not None:
                df = df.withColumn(pos_col, F.col("_metadata.row_index"))
            return self._apply_delete_files(spark, df, group_paths, m)

        entries = m.get("eq_delete_files", [])
        if not entries:
            return build(paths)
        part_of = {
            f: part for part, pf in m.get("files", {}).items() for f in pf
        }
        fseq = m.get("file_seq", {})
        groups: dict[tuple, list] = {}
        for p in paths:
            s = fseq.get(p, 0)
            part = part_of.get(p, "")
            applicable = tuple(
                i
                for i, e in enumerate(entries)
                if s < e["seq"]
                and (e.get("prefix") is None or part.startswith(e["prefix"]))
            )
            groups.setdefault(applicable, []).append(p)
        out = None
        for applicable in sorted(groups):
            df = build(groups[applicable])
            for i in applicable:
                df = self._apply_eq_deletes(spark, df, entries[i])
            out = (
                df
                if out is None
                # an epoch group may lack columns newer files added
                else out.unionByName(df, allowMissingColumns=merge_schema)
            )
        return out

    # -- reads -----------------------------------------------------------------
    def files_for(
        self,
        snapshot_id: str | None = None,
        prefix: str | None = None,
        ranges: dict[str, tuple] | None = None,
        eq: dict | None = None,
    ) -> list[str]:
        """The data files a scan must open: partition-family selection by
        ``prefix``, then manifest-stats file skipping by ``ranges`` —
        ``{column: (lo, hi)}``, inclusive. A file is skipped only when it
        CARRIES stats for the column and its [min, max] provably misses the
        query range; files without stats are always read (sound, never
        drops rows). Range endpoints must live in the stats' stored domain:
        numbers for numeric columns, the string itself for strings,
        ISO-8601 ``T``-separated strings for timestamps; ``None`` for an
        open endpoint.

        ``eq`` — ``{column: value}`` point lookups: a file is skipped when
        its [min, max] misses the value OR its bloom filter (committed via
        ``stat_cols=["bloom:col"]``) proves absence. Blooms are what make
        point lookups on a high-cardinality key selective inside a time
        partition whose files all span the key space (unclustered layouts,
        where [min, max] keeps every file); Iceberg reads parquet
        bloom/dictionary pages at planning time for the same reason."""
        m = self.manifest(snapshot_id)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.table_dir}")
        parts = sorted(
            p for p in m["files"] if prefix is None or p.startswith(prefix)
        )
        all_files = [f for part in parts for f in m["files"][part]]
        if not ranges and not eq:
            return all_files
        stats = m.get("file_stats", {})
        kept = []
        for f in all_files:
            fs = stats.get(f, {})
            if not self._file_may_match(fs, ranges, eq):
                continue
            kept.append(f)
        return kept

    @staticmethod
    def _file_may_match(fs: dict, ranges: dict | None, eq: dict | None) -> bool:
        """True unless the file's manifest stats PROVE no row can match."""
        for col, (lo, hi) in (ranges or {}).items():
            if col not in fs:
                continue
            mn, mx = fs[col]
            if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                return False  # provably disjoint -> skip the file
        for col, v in (eq or {}).items():
            if col in fs:
                mn, mx = fs[col]
                sv = _json_safe_stat(v)
                try:
                    if sv is not None and (sv < mn or sv > mx):
                        return False
                except TypeError:
                    pass  # value outside the stats' domain: never skip on it
            bloom = fs.get(BLOOM_PREFIX + col)
            if bloom is not None and not _bloom_might_contain(bloom, v):
                return False
        return True

    def read(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        prefix: str | None = None,
        ranges: dict[str, tuple] | None = None,
        eq: dict | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Read the table as of a snapshot (time travel); HEAD by default.
        ``prefix`` selects a partition family (e.g. 'tier1h/') — required when
        a store holds heterogeneous partition schemas. ``ranges`` prunes
        files via manifest column stats (see :meth:`files_for`) — the
        Iceberg scan-planning analogue: a narrow time/key range over a
        100-TB table opens only the overlapping files; ``eq`` point lookups
        additionally consult per-file bloom filters (see :meth:`files_for`).
        The read still returns ALL rows of the kept files; apply the same
        predicate with ``.where`` for row-level filtering (parquet
        row-group skipping handles the rest). Raises ``FileNotFoundError`` when every file is
        pruned (the caller knows the result is empty without a scan).

        ``merge_schema``: additive schema evolution — when newer partitions
        carry columns older ones lack (a crawl gains a metadata field), the
        merged read fills the old rows with NULLs instead of failing or
        silently taking one file's schema. Costs a footer read per file at
        planning time; leave False when the family's schema is fixed."""
        kept = self.files_for(snapshot_id, prefix, ranges, eq)
        if not kept:
            raise FileNotFoundError(
                f"every data file pruned for prefix={prefix!r} "
                f"ranges={ranges!r} eq={eq!r}"
            )
        return self._scan_live(
            spark,
            kept,
            self.manifest(snapshot_id) or {},
            merge_schema=merge_schema,
        )

    def changed_partitions(
        self,
        since_snapshot: str,
        snapshot_id: str | None = None,
        prefix: str | None = None,
    ) -> list[str]:
        """Partitions written or rewritten strictly AFTER ``since_snapshot``
        and still visible at ``snapshot_id`` (HEAD by default) — the Iceberg
        incremental-append-scan planning step. Detection is by each
        partition's ``metrics.snapshot_id`` (the snapshot that last wrote
        it), so a late-data refresh that rewrites an old day shows up again
        — exactly what an incremental consumer must reprocess. Raises if
        ``since_snapshot`` is not on the target's parent chain (history may
        have been expired; the consumer must fall back to a full read)."""
        m = self.manifest(snapshot_id)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.table_dir}")
        newer: set[str] = set()
        cur = m
        while True:
            if cur["snapshot_id"] == since_snapshot:
                break
            newer.add(cur["snapshot_id"])
            parent = cur.get("parent")
            if parent is None:
                raise ValueError(
                    f"snapshot {since_snapshot!r} not on the chain of "
                    f"{m['snapshot_id']!r} (history expired?) — fall back "
                    "to a full read"
                )
            cur = self.manifest(parent)
        metrics = m.get("metrics", {})

        def last_data_write(part: str) -> str | None:
            s = metrics.get(part, {})
            # Compaction rewrites bytes, not data; its metrics carry the
            # last DATA write forward so consumers don't reprocess it.
            return s.get("data_snapshot_id", s.get("snapshot_id"))

        return sorted(
            part
            for part in m["files"]
            if (prefix is None or part.startswith(prefix))
            and last_data_write(part) in newer
        )

    def read_incremental(
        self,
        spark: SparkSession,
        since_snapshot: str,
        snapshot_id: str | None = None,
        prefix: str | None = None,
    ) -> tuple[DataFrame | None, list[str]]:
        """Rows of every partition (re)written after ``since_snapshot`` —
        what a downstream incremental consumer (coarser tier, export job,
        index refresh) processes instead of re-reading the table. Returns
        ``(df | None, changed_partition_keys)``; ``df`` is None when
        nothing changed. At 100 TB this is the difference between a daily
        consumer scanning one day's partitions and scanning the archive."""
        m = self.manifest(snapshot_id)
        changed = self.changed_partitions(since_snapshot, snapshot_id, prefix)
        if not changed:
            return None, []
        files = [f for part in changed for f in m["files"][part]]
        return self._scan_live(spark, files, m), changed

    def follow(
        self,
        spark: SparkSession,
        since_snapshot: str | None = None,
        prefix: str | None = None,
        poll_seconds: float = 5.0,
        idle_limit: int | None = None,
    ):
        """Change feed: a generator yielding ``(snapshot_id, df, changed)``
        every time HEAD advances — the store-as-a-stream consumption loop
        (Delta's streaming-source analogue) for consumers that want to
        process each commit's increment without running Structured
        Streaming. ``df`` contains only the partitions (re)written since
        the previously yielded snapshot (see :meth:`read_incremental`;
        None when a commit touched nothing under ``prefix``); the very
        first yield after an empty start is the full table. Polls HEAD
        every ``poll_seconds``; stops after ``idle_limit`` consecutive
        empty polls (None = follow forever). Single-writer semantics: each
        commit is yielded exactly once, in chain order. The starting point
        is captured EAGERLY at call time (not at the first ``next()``), so
        "follow from now on" means from the moment of the call."""
        last = since_snapshot if since_snapshot is not None else self.head()

        def feed():
            nonlocal last
            idle = 0
            while idle_limit is None or idle < idle_limit:
                head = self.head()
                if head is not None and head != last:
                    if last is None:
                        df = self.read(spark, snapshot_id=head, prefix=prefix)
                        changed = sorted(
                            p
                            for p in self.manifest(head)["files"]
                            if prefix is None or p.startswith(prefix)
                        )
                    else:
                        df, changed = self.read_incremental(
                            spark, since_snapshot=last,
                            snapshot_id=head, prefix=prefix,
                        )
                    yield head, df, changed
                    last = head
                    idle = 0
                else:
                    idle += 1
                    time.sleep(poll_seconds)

        return feed()

    def completed_partitions(self, snapshot_id: str | None = None) -> set[str]:
        m = self.manifest(snapshot_id)
        return set(m["files"]) if m else set()

    def snapshots_table(self, spark: SparkSession) -> DataFrame:
        """The snapshot history as a DataFrame (the Iceberg ``.snapshots``
        metadata table analogue): one row per snapshot on the HEAD chain,
        newest first — commit time, watermark, stage properties, and size."""
        rows = []
        for m in self.history():
            rows.append(
                {
                    "snapshot_id": m["snapshot_id"],
                    "parent": m.get("parent"),
                    "created_at": m["created_at"],
                    "watermark": m.get("watermark"),
                    "stage": (m.get("properties") or {}).get("stage"),
                    "n_partitions": len(m["files"]),
                    "n_files": sum(len(v) for v in m["files"].values()),
                    "seq": m.get("seq"),
                    "n_pos_delete_files": len(
                        {d for v in m.get("delete_files", {}).values() for d in v}
                    ),
                    "n_eq_tombstones": len(m.get("eq_delete_files", [])),
                }
            )
        return spark.createDataFrame(
            rows or [],
            "snapshot_id string, parent string, created_at string, "
            "watermark string, stage string, n_partitions long, n_files long, "
            "seq long, n_pos_delete_files long, n_eq_tombstones long",
        )

    def files_table(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        """Per-file metadata as a DataFrame (the Iceberg ``.files`` metadata
        table analogue): partition, path, size, and the manifest column
        stats as a ``{col: [min, max]}`` JSON string — what an operator
        inspects to see whether stats pruning can work before running the
        query."""
        m = self.manifest(snapshot_id)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.table_dir}")
        stats = m.get("file_stats", {})
        rows = []
        for part, part_files in m["files"].items():
            for f in part_files:
                rows.append(
                    {
                        "partition": part,
                        "path": f,
                        "bytes": os.path.getsize(f) if os.path.exists(f) else None,
                        # blooms render as their bit size only — the
                        # bitset payload is planning state, not metadata
                        "column_stats": json.dumps(
                            {
                                k: ({"m": v["m"]} if k.startswith(BLOOM_PREFIX) else v)
                                for k, v in stats[f].items()
                            }
                        )
                        if f in stats
                        else None,
                    }
                )
        return spark.createDataFrame(
            rows or [],
            "partition string, path string, bytes long, column_stats string",
        )

    def lineage(self, spark: SparkSession) -> DataFrame:
        """Per-partition lineage/metrics across the whole snapshot chain as a
        DataFrame (partition, snapshot_id, n_files, n_rows, bytes,
        write_seconds). Row counts come from commit-time footer metadata
        (None for partitions committed before counts were recorded), so
        auditing table sizes is a metadata lookup, never a scan."""
        rows = []
        for m in self.history():
            for part, stats in m.get("metrics", {}).items():
                if stats.get("snapshot_id") == m["snapshot_id"]:
                    rows.append(
                        {
                            "partition": part,
                            "snapshot_id": m["snapshot_id"],
                            "n_files": stats["n_files"],
                            "n_rows": stats.get("n_rows"),
                            "bytes": stats["bytes"],
                            "write_seconds": stats["write_seconds"],
                        }
                    )
        return spark.createDataFrame(
            rows or [],
            "partition string, snapshot_id string, n_files long, n_rows long, "
            "bytes long, write_seconds double",
        )


def run_resumable(
    store: SnapshotStore,
    partition_keys: Iterable[str],
    build_partition,
    watermark: str | None = None,
) -> tuple[str | None, list[str]]:
    """Resume-aware driver loop: build only partitions missing from HEAD,
    commit them as one snapshot. Returns (snapshot_id, built_partitions);
    snapshot_id is None when everything was already committed."""
    done = store.completed_partitions()
    todo = [k for k in partition_keys if k not in done]
    if not todo:
        return None, []
    built = {k: build_partition(k) for k in todo}
    snapshot_id = store.commit_partitions(built, watermark=watermark)
    return snapshot_id, todo
