"""LakeTable — an exactly-once, LSM-style keyed Parquet lake for CDC ingest.

This is the engine's heart per BASELINE.json's north rule: a binlog-style
change-event tail of upserts/deletes keyed by ``key_cols`` (canonically
``(repo, path)``) and ordered by a strictly-increasing ``seq`` is applied
into a Parquet table with last-writer-wins (LWW) semantics, additive schema
evolution, an epoch-fenced idempotent commit log (exactly-once under Ray's
at-least-once task retries), checkpoint-resumable replay, and per-partition
lineage counters.

The reference analog is NiFi's StateManager record + per-row routing
(ExecuteRuleEngine.java:108,315-322,559-564) — informational only; the
durable, recoverable design here is new and Ray-Data-first.

On-disk layout (all commits are atomic ``os.replace`` renames)::

    root/
      _lake.json                      # table config: keys, seq/op cols, P
      _manifests/epoch-<e>.json       # commit fence + fragment index + counters
      _manifests/compact-<v>.json     # compaction fence: folded epochs, new base
      deltas/epoch-<e>-<uuid>.parquet # scatter fragments, 1 row group per pid
      base/v=<v>/pid=<p>[-s<k>].parquet

Dataflow per epoch (all streaming, no full materialization, NO shuffle):

1. ``map_batches(_FragmentWriter)``: each task derives ``pid =
   hash64(*key_cols) % P``, LWW-reduces its batch to per-key max-``seq``
   rows (the combiner — a hot key contributes at most one row per input
   batch, except under interleaved 64-bit key-hash collisions, where extra
   rows may survive the combiner; merge-on-read's ``latest_by_key`` over
   real keys still resolves the final state exactly), sorts by ``(pid,
   keys, seq desc)`` and writes ONE fragment file with ONE PARQUET ROW
   GROUP PER PID, returning a tiny index table ``(file, pid, row_group,
   rows, …)``.
2. The driver collects the index (P x tasks small rows) and writes
   ``_manifests/epoch-<e>.json`` — the commit fence — listing exactly which
   fragment files/row groups belong to the epoch, plus per-pid lineage
   counters. Readers open ONLY manifest-listed row groups, so a fragment
   written by a retried/zombie task is an invisible orphan (GC'd at
   compaction), never a duplicate: this is the Delta/Iceberg-style
   manifest-fenced commit, and (key,seq)-level duplicates across fragments
   are additionally collapsed by LWW at merge time.

Why no ``groupby(pid)`` shuffle (the obvious alternative): measured on the
1M-event bench, Ray Data's sort-shuffle costs ~4-5s of fixed wall per epoch
pipeline and hash-shuffle pays aggregator-actor startup, while this scatter
write is pure map — per-epoch overhead drops ~3x and, more importantly,
nothing in the ingest is an all-to-all, so throughput scales linearly with
cores/nodes (the north rule's >=0.8 scaling-efficiency criterion). The
partitioning is still explicit — every row lands in a pid-labelled row
group — but the *physical grouping* of a pid's rows is deferred to
merge-on-read/compaction, which reads only its pid's row groups
(column-chunk-granular reads, no full-fragment scans).

Reads are merge-on-read: one task per pid streams ``base + manifest-listed
delta row groups``, resolves LWW, drops tombstones. ``compact()`` folds
committed deltas into a new base version (copy-on-write, oversized
partitions salted into sub-files by the last key column's hash) so read
amplification stays bounded; schema evolution is handled by Arrow schema
unification with null-backfill at every concat point.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import hash64_columns

PID_COL = "_pid"


# ---------------------------------------------------------------------------
# pure-Arrow kernels
# ---------------------------------------------------------------------------


def concat_evolve(tables: list[pa.Table]) -> pa.Table:
    """Concat with additive schema evolution (missing columns null-backfilled)."""
    tables = [t for t in tables if t is not None and t.num_rows >= 0]
    if len(tables) == 1:
        return tables[0]
    return pa.concat_tables(tables, promote_options="default")


def latest_by_key(table: pa.Table, key_cols: list[str], seq_col: str) -> pa.Table:
    """LWW reduce: keep, per key, exactly ONE row — the max-``seq`` one.
    Pure Arrow: sort by (keys asc, seq desc), then a vectorized
    first-row-per-key mask. No pandas, no Python rows.

    Duplicate-tolerant by construction: at-least-once delivery can put the
    SAME (key, seq) event into a batch (or into two different epochs'
    deltas) — a group-max + join-back would fan those out into duplicate
    output rows; the sort+mask keeps one. Rows tied on (key, seq) with
    different payloads (invalid streams) resolve to a single arbitrary
    winner."""
    n = table.num_rows
    if n <= 1:
        return table
    # narrow-first: order + survivor mask come from the (small) key/seq
    # columns; the wide, content-heavy table is copied exactly once, taking
    # only the surviving rows (vs sort-take of everything + filter)
    sort_keys = [(k, "ascending") for k in key_cols] + [(seq_col, "descending")]
    narrow = table.select(list(key_cols) + [seq_col])
    idx = pc.sort_indices(narrow, sort_keys=sort_keys)
    first = np.zeros(n, dtype=bool)
    first[0] = True
    for k in key_cols:
        arr = pc.take(narrow[k], idx).combine_chunks()
        neq = pc.invert(pc.equal(arr.slice(1), arr.slice(0, n - 1)))
        first[1:] |= np.asarray(neq.fill_null(True))
    return table.take(pa.array(np.asarray(idx)[first]))


def _seq_sort_key(col) -> np.ndarray:
    """``seq`` column -> numpy array safe to NEGATE inside ``np.lexsort``.

    Negating is only sound for signed dtypes: a uint64 seq wraps mod 2^64
    (seq=0 would beat every higher seq) and nulls turn into garbage via
    ``np.asarray``. So: reject nulls outright, and range-check-cast integer/
    timestamp seqs to int64 (pyarrow's safe cast raises on overflow).
    Float seqs pass through as float64."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(
            "seq column must be non-null: LWW ordering is undefined for "
            "events without a sequence number")
    t = col.type
    if (pa.types.is_unsigned_integer(t) or pa.types.is_signed_integer(t)
            or pa.types.is_timestamp(t)):
        col = pc.cast(col, pa.int64())  # safe cast: raises if out of range
    elif not pa.types.is_floating(t):
        raise TypeError(f"unsupported seq dtype for LWW ordering: {t}")
    return np.asarray(col)


def _atomic_write_parquet(table: pa.Table, final_path: str) -> int:
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(table, tmp, compression="zstd")
    size = os.path.getsize(tmp)
    os.replace(tmp, final_path)
    return size


def _atomic_write_json(obj: dict, final_path: str) -> None:
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(final_path))
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final_path)


# ---------------------------------------------------------------------------
# stage callables (run inside Ray tasks)
# ---------------------------------------------------------------------------


@dataclass
class _PartialReduce:
    """pid derivation + per-batch combiner (kept as a standalone stage for
    callers that want the reduced/labelled stream without writing it)."""

    key_cols: list[str]
    seq_col: str
    num_partitions: int

    def __call__(self, batch: pa.Table) -> pa.Table:
        if PID_COL in batch.column_names:
            batch = batch.drop_columns([PID_COL])
        reduced = latest_by_key(batch, self.key_cols, self.seq_col)
        pid = hash64_columns(reduced, self.key_cols) % np.uint64(self.num_partitions)
        return reduced.append_column(PID_COL, pa.array(pid.astype(np.int64)))


@dataclass
class _FragmentWriter:
    """Scatter-write stage: combiner + one fragment file per task with one
    row group per pid (see module docstring). Emits the fragment index."""

    root: str
    epoch: int
    key_cols: list[str]
    seq_col: str
    op_col: str | None
    num_partitions: int

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Narrow-first plan: the batch is content-heavy, so the wide table is
        # copied exactly ONCE — sort order AND the LWW survivor mask are both
        # computed on u64 arrays (numpy lexsort on (pid, key-hash, -seq)),
        # the indices are composed, and a single ``take`` gathers only the
        # surviving rows already grouped by pid. (The previous full
        # sort-take + filter plan copied the wide table twice; on this
        # host the extra pass was the memory-bandwidth scaling limiter.)
        n = batch.num_rows
        h = hash64_columns(batch, self.key_cols)
        pid_all = (h % np.uint64(self.num_partitions)).astype(np.int64)
        seq = _seq_sort_key(batch[self.seq_col])
        idx = np.lexsort((-seq, h, pid_all)) if n else np.empty(0, np.int64)
        hs = h[idx]
        first = np.zeros(n, dtype=bool)
        if n:
            first[0] = True
            first[1:] = hs[1:] != hs[:-1]
            ties = np.flatnonzero(~first)
            if len(ties):
                # hash-tied adjacent rows: same key (duplicate seq — drop) or
                # a 64-bit collision of two distinct keys (must keep both).
                # Compare the REAL key columns, but only for tied rows.
                cur = pa.Table.from_pydict(
                    {k: pc.take(batch[k], pa.array(idx[ties]))
                     for k in self.key_cols})
                prev = pa.Table.from_pydict(
                    {k: pc.take(batch[k], pa.array(idx[ties - 1]))
                     for k in self.key_cols})
                differs = np.zeros(len(ties), dtype=bool)
                for k in self.key_cols:
                    neq = pc.invert(pc.equal(cur[k].combine_chunks(),
                                             prev[k].combine_chunks()))
                    differs |= np.asarray(neq.fill_null(True))
                first[ties[differs]] = True
        keep = idx[first]
        red = batch.take(pa.array(keep))
        pids = pid_all[keep]
        is_del = None
        if self.op_col and self.op_col in red.column_names:
            is_del = np.asarray(pc.equal(red[self.op_col], "delete").combine_chunks()
                                .fill_null(False))
        bounds = np.flatnonzero(np.diff(pids)) + 1
        starts = np.concatenate([[0], bounds]).astype(np.int64)
        ends = np.concatenate([bounds, [len(pids)]]).astype(np.int64)
        fn = f"epoch-{self.epoch}-{uuid.uuid4().hex}.parquet"
        path = os.path.join(self.root, "deltas", fn)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        out_pid, out_rg, out_rows, out_del = [], [], [], []
        if len(pids):
            # snappy for delta fragments: they live only until compaction,
            # and snappy writes ~1.7x faster (and reads faster) than zstd;
            # the long-lived base stays zstd (see compact/_atomic_write)
            with pq.ParquetWriter(tmp, red.schema, compression="snappy") as w:
                for i, (s, e) in enumerate(zip(starts, ends)):
                    w.write_table(red.slice(s, e - s), row_group_size=int(e - s))
                    out_pid.append(int(pids[s]))
                    out_rg.append(i)
                    out_rows.append(int(e - s))
                    out_del.append(int(is_del[s:e].sum()) if is_del is not None else 0)
            nbytes = os.path.getsize(tmp)
            os.replace(tmp, path)
        else:
            nbytes = 0
        n = len(out_pid)
        return pa.table(
            {
                "file": pa.array([fn] * n, pa.string()),
                "pid": pa.array(out_pid, pa.int64()),
                "rg": pa.array(out_rg, pa.int64()),
                "rows_in": pa.array([batch.num_rows] + [0] * (n - 1) if n else [],
                                    pa.int64()),
                "rows_delta": pa.array(out_rows, pa.int64()),
                "deletes": pa.array(out_del, pa.int64()),
                "bytes": pa.array([nbytes] + [0] * (n - 1) if n else [], pa.int64()),
            }
        )


#: worker-global ParquetFile cache: a compaction / merge-on-read worker
#: resolves several (pid, salt) sub-partitions over the SAME fragment
#: files (one row group per pid), and the footer parse is ~25% of a
#: resolve (measured: 0.21s of 0.85s per pid over 228 fragments).
#: Fragment/base files are immutable once atomically renamed, and the
#: (mtime_ns, size) key guards same-path rewrites. Bounded LRU so file
#: handles stay far under ulimit.
_PF_CACHE: "dict[tuple, pq.ParquetFile]" = {}
_PF_CACHE_MAX = 256


def _cached_parquet_file(path: str) -> pq.ParquetFile:
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    pf = _PF_CACHE.get(key)
    if pf is None:
        pf = pq.ParquetFile(path)
        _PF_CACHE[key] = pf
        while len(_PF_CACHE) > _PF_CACHE_MAX:
            # evict the LEAST-recently-used entry; do NOT close() it —
            # another caller may still hold the handle (threaded actor
            # use), so let GC close it when the last reference drops
            _PF_CACHE.pop(next(iter(_PF_CACHE)))
    else:
        # refresh recency (true LRU, not FIFO): hot fragments survive
        _PF_CACHE[key] = _PF_CACHE.pop(key)
    return pf


@dataclass
class _PartitionResolver:
    """Merge-on-read / compaction kernel for one (pid, salt) sub-partition:
    stream the matching base sub-file(s) + the pid's manifest-listed delta
    row groups (filtered to the salt), resolve LWW, drop tombstones.

    ``frag_index``: pid -> list of (fragment relpath, row_group) pairs,
    built by the driver from the pending epochs' manifests — ONLY committed
    row groups are ever read (the exactly-once read side).

    Salt model (the 100-TB bound): a pid whose resolved state outgrows
    ``salt_threshold`` is physically split into ``k`` sub-files
    ``pid=<p>-s<t>.parquet`` by ``hash64(last key col) % k`` with ``k``
    always a POWER OF TWO. Power-of-two ``k`` makes sub-files alignable
    across versions without whole-pid reads: for a task resolving salt
    ``t`` at width ``k`` against a base written at width ``k_old``,

    * ``k >= k_old``: rows of new salt ``t`` live only in old sub-file
      ``t % k_old`` (one read, filtered down when ``k > k_old``);
    * ``k < k_old``: they are exactly the union of old sub-files
      ``{t, t+k, t+2k, ...}`` (no filter needed).

    So no task — compaction or merge-on-read — ever materializes more than
    one sub-partition of base plus its share of deltas, regardless of how
    hot the pid is."""

    root: str
    key_cols: list[str]
    seq_col: str
    op_col: str | None
    schema: pa.Schema | None
    frag_index: dict[int, list[tuple[str, int]]]
    drop_tombstones: bool = True
    drop_meta: bool = False
    columns: list[str] | None = None

    def _read_cols(self, available: list[str] | None = None) -> list[str] | None:
        """Physical projection for base/delta reads: the requested output
        columns plus everything LWW/tombstone/salt resolution needs (keys,
        seq, op). None = read everything."""
        if self.columns is None:
            return None
        need = list(dict.fromkeys(
            list(self.columns) + list(self.key_cols) + [self.seq_col]
            + ([self.op_col] if self.op_col else [])))
        if available is not None:
            need = [c for c in need if c in available]
        return need

    def _salt_hash(self, t: pa.Table) -> np.ndarray:
        return hash64_columns(t, self.key_cols[-1:])

    def _base_file(self, bdir: str, pid: int, s: int, k_old: int) -> str:
        fn = f"pid={pid}.parquet" if k_old <= 1 else f"pid={pid}-s{s}.parquet"
        return os.path.join(bdir, fn)

    def resolve_sub(self, pid: int, salt: int, k: int, base_version: int,
                    k_old: int) -> pa.Table:
        """Resolve sub-partition ``salt`` of ``k`` for ``pid`` whose base
        (version ``base_version``) was written with ``k_old`` salts.
        ``salt=0, k=1`` resolves the whole pid.

        ``k_old < 0`` marks a LEGACY base (pre-round-2 compactor: salted
        sub-files with a possibly non-power-of-two count and no
        ``partitions`` manifest metadata): ``-k_old`` sub-files exist and
        the power-of-two alignment math does not apply, so every matching
        sub-file is read and filtered to this task's (salt, k) slice. The
        next compaction rewrites such pids into the current layout (the
        hard-link fast path requires ``k == k_old``, which a negative
        ``k_old`` can never satisfy)."""
        tables = []
        if base_version >= 0:
            bdir = os.path.join(self.root, "base", f"v={base_version}")
            if k_old < 0:
                paths = [os.path.join(bdir, f"pid={pid}-s{s}.parquet")
                         for s in range(-k_old)]
                paths.append(os.path.join(bdir, f"pid={pid}.parquet"))
                for p in paths:
                    if os.path.exists(p):
                        t = self._read_parquet(p)
                        if k > 1 and t.num_rows:
                            mask = self._salt_hash(t) % np.uint64(k) == salt
                            t = t.filter(pa.array(mask))
                        tables.append(t)
            elif k >= k_old:
                p = self._base_file(bdir, pid, salt % max(1, k_old), k_old)
                if os.path.exists(p):
                    t = self._read_parquet(p)
                    if k > k_old and t.num_rows:
                        mask = self._salt_hash(t) % np.uint64(k) == salt
                        t = t.filter(pa.array(mask))
                    tables.append(t)
            else:
                for s in range(salt, k_old, k):
                    p = self._base_file(bdir, pid, s, k_old)
                    if os.path.exists(p):
                        tables.append(self._read_parquet(p))
        for relpath, rg in self.frag_index.get(pid, ()):
            f = _cached_parquet_file(os.path.join(self.root, "deltas",
                                                  relpath))
            t = f.read_row_group(
                rg, columns=self._read_cols(f.schema_arrow.names))
            if k > 1 and t.num_rows:
                mask = self._salt_hash(t) % np.uint64(k) == salt
                t = t.filter(pa.array(mask))
            tables.append(t)
        if not tables:
            return self._empty()
        merged = latest_by_key(concat_evolve(tables), self.key_cols, self.seq_col)
        if self.drop_tombstones and self.op_col and self.op_col in merged.column_names:
            merged = merged.filter(pc.not_equal(merged[self.op_col], "delete"))
        if self.schema is not None:
            merged = concat_evolve([self._aligned_schema().empty_table(),
                                    merged])
        if self.drop_meta and self.op_col and self.op_col in merged.column_names:
            merged = merged.drop_columns([self.op_col])
        if self.columns is not None:
            merged = merged.select(
                [c for c in self.columns if c in merged.column_names])
        return merged

    def _aligned_schema(self) -> pa.Schema:
        """The unification target: the full table schema, projected to the
        physical read set when a column projection is active."""
        if self.columns is None:
            return self.schema
        keep = set(self._read_cols())
        return pa.schema([f for f in self.schema if f.name in keep])

    def _read_parquet(self, path: str) -> pa.Table:
        pf = _cached_parquet_file(path)
        return pf.read(columns=self._read_cols(pf.schema_arrow.names))

    def resolve_pid(self, pid: int, base_version: int, k_old: int = 1) -> pa.Table:
        return self.resolve_sub(pid, 0, 1, base_version, k_old)

    def _empty(self) -> pa.Table:
        schema = (self._aligned_schema() if self.schema is not None
                  else pa.schema([]))
        if self.drop_meta and self.op_col and self.op_col in schema.names:
            schema = pa.schema([f for f in schema if f.name != self.op_col])
        if self.columns is not None:
            schema = pa.schema([schema.field(c) for c in self.columns
                                if c in schema.names])
        return schema.empty_table()


# ---------------------------------------------------------------------------
# the lake table
# ---------------------------------------------------------------------------


class LakeTable:
    """See module docstring for the design.

    Sizing ``num_partitions`` (the 100-TB decision, fixed at table
    creation): P is the unit of read/compaction parallelism AND the row-
    group fan-out of every delta fragment. Pick P ≈ (cluster cores x 2-4)
    so merge-on-read/compaction saturate the fleet — e.g. 2048 for a
    256-node x 32-core cluster; the sandbox default 32 matches one 32-core
    node. Too-small P caps parallelism; P >> cores only adds tiny row
    groups per fragment (metadata overhead). Per-pid SIZE needs no
    headroom: a pid outgrowing ``salt_threshold`` rows is automatically
    split into power-of-two ``(pid, salt)`` sub-files, so hot partitions
    stay task-sized without rewriting the table.

    Change-feed consumers: ``register_consumer`` / ``consume_changes`` /
    ``commit_consumer`` give incremental readers a durable checkpoint;
    fragments of epochs past a registered consumer's checkpoint survive
    compaction until every consumer has drained them (enforced retention).
    """

    def __init__(
        self,
        root: str,
        *,
        key_cols: tuple[str, ...] = ("repo", "path"),
        seq_col: str = "seq",
        op_col: str | None = "op",
        num_partitions: int = 32,
        salt_threshold: int = 2_000_000,
    ):
        self.root = root
        self.salt_threshold = salt_threshold
        cfg_path = os.path.join(root, "_lake.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            self.key_cols = list(cfg["key_cols"])
            self.seq_col = cfg["seq_col"]
            self.op_col = cfg["op_col"]
            self.num_partitions = cfg["num_partitions"]
        else:
            self.key_cols = list(key_cols)
            self.seq_col = seq_col
            self.op_col = op_col
            self.num_partitions = num_partitions
            _atomic_write_json(
                {
                    "key_cols": self.key_cols,
                    "seq_col": seq_col,
                    "op_col": op_col,
                    "num_partitions": num_partitions,
                },
                cfg_path,
            )

    # -- commit log ---------------------------------------------------------

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    def _scan_dir(self, d: str) -> list[str]:
        """Directory listing cached on the directory's mtime: at 10^5
        committed epochs a single read plan used to pay several full
        ``os.listdir`` scans (committed_epochs + latest_compaction +
        consumers) — now exactly one listdir per directory CHANGE. An
        atomic-rename manifest write bumps the dir mtime, so cross-process
        writers invalidate the cache naturally; our own writers also call
        ``_invalidate_scan_cache`` so a same-tick write can never serve a
        stale listing."""
        try:
            mt = os.stat(d).st_mtime_ns
        except FileNotFoundError:
            return []
        cache = getattr(self, "_scan_cache", None)
        if cache is None:
            cache = self._scan_cache = {}
        hit = cache.get(d)
        if hit is not None and hit[0] == mt:
            return hit[1]
        names = os.listdir(d)
        # git's "racily clean" guard: a cross-process writer committing in
        # the SAME filesystem timestamp tick as our stat would not bump
        # the mtime we cache — a polling consumer could then miss the last
        # epoch(s) forever. Only cache when (a) the dir mtime did not move
        # while we listed and (b) it is strictly older than now minus the
        # coarsest plausible fs tick (10 ms); otherwise serve uncached.
        import time as _time

        try:
            mt2 = os.stat(d).st_mtime_ns
        except FileNotFoundError:
            return names
        if mt2 == mt and mt < _time.time_ns() - 10_000_000:
            cache[d] = (mt, names)
        else:
            cache.pop(d, None)
        return names

    def _invalidate_scan_cache(self) -> None:
        self._scan_cache = {}

    def committed_epochs(self) -> list[int]:
        return sorted(
            int(fn[len("epoch-") : -len(".json")])
            for fn in self._scan_dir(self._manifest_dir)
            if fn.startswith("epoch-") and fn.endswith(".json")
        )

    def _read_manifest(self, name: str) -> dict:
        with open(os.path.join(self._manifest_dir, name)) as f:
            return json.load(f)

    def _compact_versions(self) -> list[int]:
        return sorted(
            int(fn[len("compact-") : -len(".json")])
            for fn in self._scan_dir(self._manifest_dir)
            if fn.startswith("compact-") and fn.endswith(".json")
        )

    def latest_compaction(self) -> tuple[int, list[int]]:
        """-> (base_version, epochs_folded_into_base); (-1, []) if none."""
        versions = self._compact_versions()
        if not versions:
            return -1, []
        m = self._read_manifest(f"compact-{versions[-1]}.json")
        return versions[-1], list(m["epochs"])

    def schema(self) -> pa.Schema | None:
        """Unified logical schema as of the last committed epoch/compaction."""
        epochs = self.committed_epochs()
        if not epochs:
            return None
        m = self._read_manifest(f"epoch-{epochs[-1]}.json")
        return pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(m["schema_hex"])))

    # -- ingest -------------------------------------------------------------

    def apply_epoch(self, ds, epoch: int, *, batch_size: int | None = None) -> dict:
        """Apply one epoch's change events (a ``ray.data.Dataset`` with
        ``key_cols + [seq_col, op_col] + payload``) exactly once.

        Returns the epoch manifest (per-pid lineage counters). If the epoch
        is already committed this is a resume no-op that returns the stored
        manifest — the checkpoint/resume contract.
        """
        mpath = os.path.join(self._manifest_dir, f"epoch-{epoch}.json")
        if os.path.exists(mpath):
            return self._read_manifest(f"epoch-{epoch}.json")

        prev_schema = self.schema()
        in_schema = ds.schema()
        cur_schema = pa.schema(
            [pa.field(n, t) for n, t in zip(in_schema.names, in_schema.types)]
        )
        unified = (
            pa.unify_schemas([prev_schema, cur_schema], promote_options="default")
            if prev_schema is not None
            else cur_schema
        )

        # scatter write, NO shuffle (module docstring): each task combines
        # its batch (per-key max-seq — bounds hot-key fan-in to one row per
        # batch) and writes one fragment file with one row group per pid.
        # Large batches amortize the sort/write, collapse more duplicate
        # keys in the combiner, AND halve the downstream row-group count
        # (measured: 128Ki cuts compaction ~33% vs 64Ki at equal apply
        # time); ~50MB of wide rows per batch stays well inside task heaps.
        stats = ds.map_batches(
            _FragmentWriter(self.root, epoch, self.key_cols, self.seq_col,
                            self.op_col, self.num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size or 131072,
        ).take_all()  # tiny index rows only — the data stays in the tasks

        fragments: dict[str, dict[str, int]] = {}
        partitions: dict[str, dict[str, int]] = {}
        for s in stats:
            fragments.setdefault(s["file"], {})[str(s["pid"])] = int(s["rg"])
            p = partitions.setdefault(
                str(s["pid"]), {"rows_delta": 0, "deletes": 0})
            p["rows_delta"] += int(s["rows_delta"])
            p["deletes"] += int(s["deletes"])
        manifest = {
            "epoch": epoch,
            "num_partitions": self.num_partitions,
            "fragments": fragments,
            "partitions": partitions,
            "rows_in": int(sum(s["rows_in"] for s in stats)),
            "rows_delta": int(sum(s["rows_delta"] for s in stats)),
            "deletes": int(sum(s["deletes"] for s in stats)),
            "bytes": int(sum(s["bytes"] for s in stats)),
            "schema_hex": unified.serialize().to_pybytes().hex(),
        }
        _atomic_write_json(manifest, mpath)
        self._invalidate_scan_cache()
        return manifest

    # -- lineage / metrics ---------------------------------------------------

    def lineage(self) -> pa.Table:
        """Per-(epoch, partition) lineage counters from the commit log:
        rows_delta (rows landed after LWW combine) and deletes. The
        observability surface the north rule asks for — derived purely from
        manifests, so it reflects exactly what was committed."""
        epochs, pids, rows_delta, deletes = [], [], [], []
        for e in self.committed_epochs():
            m = self._read_manifest(f"epoch-{e}.json")
            for pid_s, c in m.get("partitions", {}).items():
                epochs.append(e)
                pids.append(int(pid_s))
                rows_delta.append(int(c.get("rows_delta", 0)))
                deletes.append(int(c.get("deletes", 0)))
        return pa.table({
            "epoch": pa.array(epochs, pa.int64()),
            "pid": pa.array(pids, pa.int64()),
            "rows_delta": pa.array(rows_delta, pa.int64()),
            "deletes": pa.array(deletes, pa.int64()),
        })

    # -- read / compact -----------------------------------------------------

    def _fragment_index(self, pending: list[int]) -> dict[int, list[tuple[str, int]]]:
        """pid -> [(fragment relpath, row group)] across the given epochs,
        built purely from committed manifests (never from directory listing
        — orphan fragments from retried tasks are invisible)."""
        index: dict[int, list[tuple[str, int]]] = {}
        for e in pending:
            m = self._read_manifest(f"epoch-{e}.json")
            for fn, pids in m.get("fragments", {}).items():
                for pid_s, rg in pids.items():
                    index.setdefault(int(pid_s), []).append((fn, int(rg)))
        return index

    def _resolver(self, pending: list[int], drop_tombstones=True,
                  drop_meta=False, columns=None) -> _PartitionResolver:
        return _PartitionResolver(
            self.root,
            self.key_cols,
            self.seq_col,
            self.op_col,
            self.schema(),
            self._fragment_index(pending),
            drop_tombstones=drop_tombstones,
            drop_meta=drop_meta,
            columns=columns,
        )

    def _pending_state(self) -> tuple[int, list[int]]:
        """-> (base_version, committed epochs not yet folded into base)."""
        base_version, folded = self.latest_compaction()
        pending = [e for e in self.committed_epochs() if e not in set(folded)]
        return base_version, pending

    def _as_of_state(self, epoch: int) -> tuple[int, list[int]]:
        """Time travel: -> (base_version, delta epochs) reconstructing the
        table EXACTLY as of committed ``epoch``. Uses the newest base whose
        folded epochs are all <= ``epoch``; remaining epochs resolve from
        their (possibly consumer-retained) delta fragments. Raises when a
        needed fragment was GC'd — snapshots stay reconstructable as long
        as a registered change-feed consumer's checkpoint (or the absence
        of compaction) keeps the fragments alive."""
        committed = [e for e in self.committed_epochs() if e <= epoch]
        versions = self._compact_versions()
        best, folded_best = -1, []
        for v in versions:
            m = self._read_manifest(f"compact-{v}.json")
            if all(fe <= epoch for fe in m["epochs"]):
                best, folded_best = v, list(m["epochs"])
        pending = [e for e in committed if e not in set(folded_best)]
        missing = []
        for e in pending:
            m = self._read_manifest(f"epoch-{e}.json")
            for fn in m.get("fragments", {}):
                if not os.path.exists(os.path.join(self.root, "deltas", fn)):
                    missing.append(f"epoch {e}: deltas/{fn}")
        if missing:
            raise FileNotFoundError(
                f"cannot reconstruct state as of epoch {epoch}: needed "
                f"delta fragments were GC'd by a later compaction "
                f"({missing[:3]}...). Register a change-feed consumer "
                "(register_consumer) before compacting to retain them.")
        return best, pending

    def _base_partitions(self, base_version: int) -> dict[int, dict]:
        """pid -> {"rows", "salts"[, "legacy"]} from the base version's
        compact manifest ({} when there is no base).

        Legacy compat (round-2 advice): manifests written by the pre-round-2
        compactor have NO ``partitions`` key, yet may have salted
        ``pid=<p>-s<t>.parquet`` sub-files with a non-power-of-two count —
        silently assuming ``salts=1`` would make those pids resolve EMPTY
        (data loss). Detect that layout from the base directory listing and
        mark the affected pids ``legacy`` so resolution reads every
        sub-file (see ``_PartitionResolver.resolve_sub``)."""
        if base_version < 0:
            return {}
        m = self._read_manifest(f"compact-{base_version}.json")
        if "partitions" in m:
            return {int(p): v for p, v in m["partitions"].items()}
        import re

        bdir = os.path.join(self.root, "base", f"v={base_version}")
        out: dict[int, dict] = {}
        if os.path.isdir(bdir):
            for fn in sorted(os.listdir(bdir)):
                mt = re.fullmatch(r"pid=(\d+)(?:-s(\d+))?\.parquet", fn)
                if not mt:
                    continue
                pid = int(mt.group(1))
                d = out.setdefault(pid, {"rows": 0, "salts": 1})
                d["rows"] += pq.ParquetFile(
                    os.path.join(bdir, fn)).metadata.num_rows
                if mt.group(2) is not None:
                    d["salts"] = max(d["salts"], int(mt.group(2)) + 1)
                    d["legacy"] = True
        return out

    def _salt_plan(self, base_version: int, pending: list[int],
                   max_salts: int = 256) -> dict[int, tuple[int, int]]:
        """pid -> (k, k_old): per-pid sub-partition width for the NEXT
        resolve pass, from manifest row counts only (no data reads).

        ``k`` is the next power of two covering (base rows + pending delta
        rows) / salt_threshold — an upper bound on the resolved size, so a
        sub-partition task never sees more than ~salt_threshold rows of base
        plus its 1/k share of deltas. ``k_old`` is the width the current
        base was written with (1 = unsalted)."""
        base_parts = self._base_partitions(base_version)
        est: dict[int, int] = {p: int(v.get("rows", 0))
                               for p, v in base_parts.items()}
        for e in pending:
            m = self._read_manifest(f"epoch-{e}.json")
            for pid_s, c in m.get("partitions", {}).items():
                pid = int(pid_s)
                est[pid] = est.get(pid, 0) + int(c.get("rows_delta", 0))
        plan = {}
        for pid in range(self.num_partitions):
            need = max(1, -(-est.get(pid, 0) // max(1, self.salt_threshold)))
            k = 1
            while k < need and k < max_salts:
                k *= 2
            part = base_parts.get(pid, {})
            k_old = int(part.get("salts", 1))
            if part.get("legacy"):
                k_old = -k_old  # legacy marker: read-all-sub-files path
            plan[pid] = (k, k_old)
        return plan

    def read(self, *, drop_meta: bool = True,
             columns: list[str] | None = None,
             as_of_epoch: int | None = None,
             pids: "set[int] | None" = None,
             keep_tombstones: bool = False):
        """Current table state as a streaming ``ray.data.Dataset`` — one
        merge-on-read task per (pid, salt) sub-partition (see
        ``_PartitionResolver``: a hot pid fans out to k bounded tasks
        instead of one giant one), nothing materialized on the driver.

        ``columns`` prunes the read at the parquet layer (only the
        requested columns + the key/seq/op columns resolution needs leave
        storage) — a 2-column read of a wide table no longer pays for
        ``content``. ``as_of_epoch`` TIME-TRAVELS to the snapshot as of
        that committed epoch (see ``_as_of_state`` for reconstructability
        rules). ``pids`` prunes to the given hash partitions (the
        incremental-refresh read path: touch only partitions whose keys
        changed — see ``changed_keys`` / ``state.matview``).
        ``keep_tombstones=True`` returns per-key LWW winners INCLUDING
        delete markers (op column retained) — required by consumers that
        LWW-compare late rows against the full key history, e.g. the
        matview retraction read. Note tombstones folded into a compacted
        base are physically gone (the lake's monotone-seq contract), so
        the flag only surfaces tombstones still in delta fragments."""
        import ray.data as rd

        base_version, pending = (self._pending_state()
                                 if as_of_epoch is None
                                 else self._as_of_state(as_of_epoch))
        resolver = self._resolver(pending,
                                  drop_tombstones=not keep_tombstones,
                                  drop_meta=drop_meta, columns=columns)
        plan = self._salt_plan(base_version, pending)
        if pids is not None:
            want = {int(p) for p in pids}
            plan = {pid: v for pid, v in plan.items() if pid in want}

        def resolve(batch: pa.Table) -> pa.Table:
            out = [
                resolver.resolve_sub(int(pid), int(salt), int(k),
                                     base_version, int(k_old))
                for pid, salt, k, k_old in zip(
                    batch["pid"].to_pylist(), batch["salt"].to_pylist(),
                    batch["k"].to_pylist(), batch["k_old"].to_pylist())
            ]
            return concat_evolve(out) if out else resolver._empty()

        items = [
            {"pid": pid, "salt": s, "k": k, "k_old": k_old}
            for pid, (k, k_old) in plan.items()
            for s in range(k)
        ]
        if not items:
            return rd.from_arrow(resolver._empty())
        subs = rd.from_items(items, override_num_blocks=len(items))
        return subs.map_batches(resolve, batch_format="pyarrow", batch_size=1)

    def changes(self, *, since_epoch: int = -1,
                epochs: list[int] | None = None,
                columns: list[str] | None = None):
        """Change feed: the committed (post-combiner) change rows of the
        given epochs as a streaming Dataset with an ``_epoch`` column — the
        incremental-consumer API (a downstream job reads only what changed
        since its last checkpoint instead of re-scanning the table).

        Defaults to all committed epochs after ``since_epoch``. Rows come
        straight from the manifest-listed delta row groups (exactly-once:
        orphan fragments are invisible). A compaction GC's the fragments of
        folded epochs — UNLESS a registered consumer (``register_consumer``
        / ``consume_changes`` / ``commit_consumer``) still needs them, in
        which case they are retained until every checkpoint passes. An
        anonymous (unregistered) reader that races a compaction gets a
        missing-fragment error with that explanation."""
        import ray.data as rd

        eps = (list(epochs) if epochs is not None
               else [e for e in self.committed_epochs() if e > since_epoch])
        items = []
        for e in eps:
            m = self._read_manifest(f"epoch-{e}.json")
            for fn, pids in m.get("fragments", {}).items():
                for _pid, rg in pids.items():
                    items.append({"file": fn, "rg": int(rg), "epoch": e})
        schema = self.schema()
        out_schema = (schema if schema is not None else pa.schema([])).append(
            pa.field("_epoch", pa.int64()))
        if columns is not None:
            out_schema = pa.schema(
                [out_schema.field(c) for c in list(columns) + ["_epoch"]])
        if not items:
            return rd.from_arrow(out_schema.empty_table())
        root = self.root

        def load(batch: pa.Table) -> pa.Table:
            out = []
            for fn, rg, ep in zip(batch["file"].to_pylist(),
                                  batch["rg"].to_pylist(),
                                  batch["epoch"].to_pylist()):
                path = os.path.join(root, "deltas", fn)
                if not os.path.exists(path):
                    raise FileNotFoundError(
                        f"delta fragment {fn} of epoch {ep} was GC'd by a "
                        "compaction that folded the epoch — change feeds "
                        "must be drained before compacting past their "
                        "checkpoint")
                f = pq.ParquetFile(path)
                cols = (None if columns is None else
                        [c for c in columns if c in f.schema_arrow.names])
                t = f.read_row_group(rg, columns=cols)
                out.append(t.append_column(
                    "_epoch", pa.array(np.full(t.num_rows, ep, np.int64))))
            return concat_evolve([out_schema.empty_table()] + out)

        return rd.from_items(
            items, override_num_blocks=min(len(items), 256)
        ).map_batches(load, batch_format="pyarrow", batch_size=4)

    # -- change-feed consumers (checkpointed incremental consumption) -------

    def _consumer_dir(self) -> str:
        return os.path.join(self.root, "_consumers")

    def _consumers(self) -> dict[str, int]:
        """name -> last-committed epoch checkpoint for every registered
        change-feed consumer."""
        d = self._consumer_dir()
        out: dict[str, int] = {}
        for fn in self._scan_dir(d):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    out[fn[:-5]] = int(json.load(f)["since_epoch"])
        return out

    def register_consumer(self, name: str, *, since_epoch: int = -1) -> int:
        """Register a change-feed consumer (idempotent). From this point the
        retention contract is ENFORCED, not just documented: compaction and
        gc keep the delta fragments of any folded epoch ABOVE the minimum
        registered checkpoint, so ``consume_changes`` can always resume —
        a compaction can no longer destroy an undrained feed."""
        path = os.path.join(self._consumer_dir(), f"{name}.json")
        if not os.path.exists(path):
            _atomic_write_json({"since_epoch": int(since_epoch)}, path)
            self._invalidate_scan_cache()
        return self._consumers()[name]

    def commit_consumer(self, name: str, epoch: int) -> int:
        """Advance ``name``'s checkpoint to ``epoch`` (monotone): fragments
        of epochs <= the minimum committed checkpoint become reclaimable by
        ``gc()`` / the next compaction."""
        cur = self._consumers().get(name)
        if cur is None:
            raise KeyError(f"unregistered change-feed consumer: {name}")
        new = max(cur, int(epoch))
        _atomic_write_json({"since_epoch": new},
                           os.path.join(self._consumer_dir(), f"{name}.json"))
        self._invalidate_scan_cache()
        return new

    def consume_changes(self, name: str, *, columns: list[str] | None = None):
        """Checkpointed incremental read: -> (Dataset of change rows after
        ``name``'s checkpoint, list of epochs included). The caller
        processes the Dataset, then calls ``commit_consumer(name,
        max(epochs))`` — crash before the commit and the next call replays
        the same epochs (at-least-once consumption; rows carry ``_epoch``
        for consumer-side idempotence)."""
        since = self._consumers().get(name)
        if since is None:
            raise KeyError(f"unregistered change-feed consumer: {name}")
        eps = [e for e in self.committed_epochs() if e > since]
        return self.changes(epochs=eps, columns=columns), eps

    def _retained_epochs(self, candidates: list[int]) -> set[int]:
        """Epochs among ``candidates`` whose fragments must be kept for
        registered consumers (epoch > min committed checkpoint)."""
        consumers = self._consumers()
        if not consumers:
            return set()
        min_ack = min(consumers.values())
        return {e for e in candidates if e > min_ack}

    def changed_keys(self, *, since_epoch: int = -1,
                     epochs: list[int] | None = None):
        """DISTINCT keys touched by the given epochs, as a streaming
        Dataset — the standard input to incremental downstream refresh
        ("recompute only partitions whose keys changed"). Reads ONLY the
        key columns of the manifest-listed delta row groups (column-pruned
        at the parquet layer), deduplicates with a per-batch group_by
        partial + one hash-partition groupby (no per-key dispatch)."""
        import ray.data as rd

        feed = self.changes(since_epoch=since_epoch, epochs=epochs,
                            columns=list(self.key_cols))
        keys = list(self.key_cols)

        def partial(batch: pa.Table) -> pa.Table:
            slim = batch.select(keys).group_by(keys).aggregate([])
            h = hash64_columns(slim, keys)
            return slim.append_column(
                "_part", pa.array((h % np.uint64(64)).astype(np.int64)))

        def finalize(group: pa.Table) -> pa.Table:
            return group.select(keys).group_by(keys).aggregate([])

        return (feed.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .groupby("_part")
                .map_groups(finalize, batch_format="pyarrow"))

    def verify_integrity(self) -> dict:
        """fsck for the lake: every manifest-listed fragment row group and
        base sub-file must exist with the expected shape. Returns a report
        dict; ``ok`` is False if anything committed is missing (orphans —
        files present but not referenced — are listed, never an error:
        they're invisible to readers by design)."""
        missing: list[str] = []
        orphans: list[str] = []
        base_version, pending = self._pending_state()
        listed: set[str] = set()
        for e in self.committed_epochs():
            m = self._read_manifest(f"epoch-{e}.json")
            for fn, pids in m.get("fragments", {}).items():
                listed.add(fn)
                if e not in pending:
                    continue  # folded fragments are legitimately GC'd
                path = os.path.join(self.root, "deltas", fn)
                if not os.path.exists(path):
                    missing.append(f"deltas/{fn}")
                    continue
                n_rg = pq.ParquetFile(path).metadata.num_row_groups
                for pid_s, rg in pids.items():
                    if int(rg) >= n_rg:
                        missing.append(f"deltas/{fn}#rg{rg} (pid {pid_s})")
        ddir = os.path.join(self.root, "deltas")
        if os.path.isdir(ddir):
            for fn in os.listdir(ddir):
                if fn not in listed:
                    orphans.append(f"deltas/{fn}")
        if base_version >= 0:
            bdir = os.path.join(self.root, "base", f"v={base_version}")
            for pid, part in self._base_partitions(base_version).items():
                k = int(part.get("salts", 1))
                want_rows = int(part.get("rows", 0))
                got = 0
                for s in range(k):
                    fn = (f"pid={pid}.parquet" if k == 1
                          else f"pid={pid}-s{s}.parquet")
                    p = os.path.join(bdir, fn)
                    if os.path.exists(p):
                        got += pq.ParquetFile(p).metadata.num_rows
                if got != want_rows:
                    missing.append(
                        f"base/v={base_version}/pid={pid}: {got} rows on "
                        f"disk vs {want_rows} in manifest")
        return {"ok": not missing, "missing": missing, "orphans": orphans,
                "base_version": base_version, "pending_epochs": pending}

    def gc(self) -> dict:
        """Remove orphan delta fragments — files on disk that no committed
        manifest references (crashed / retried / never-committed writer
        output). Safe by construction: readers only ever open
        manifest-listed row groups, so orphans are invisible; gc just
        reclaims their bytes. Fragments of not-yet-committed IN-FLIGHT
        epochs are also orphans by this definition, so run gc() between
        ingest batches, not concurrently with one."""
        report = self.verify_integrity()
        removed = []
        for rel in report["orphans"]:
            os.unlink(os.path.join(self.root, rel))
            removed.append(rel)
        # folded-epoch fragments retained for change-feed consumers become
        # reclaimable once every consumer's checkpoint has passed them
        _, folded = self.latest_compaction()
        retained = self._retained_epochs(folded)
        drained = [e for e in folded if e not in retained]
        ddir = os.path.join(self.root, "deltas")
        prefixes = tuple(f"epoch-{e}-" for e in drained)
        if os.path.isdir(ddir) and prefixes:
            for fn in os.listdir(ddir):
                if fn.startswith(prefixes):
                    os.unlink(os.path.join(ddir, fn))
                    removed.append(f"deltas/{fn}")
        return {"removed": removed}

    def read_table(self, *, as_of_epoch: int | None = None) -> pa.Table:
        """Small-scale convenience: fully materialized current state,
        resolved WITHOUT Ray (driver-side pyarrow) — used by tests/oracles.
        ``as_of_epoch`` time-travels like ``read``."""
        base_version, pending = (self._pending_state()
                                 if as_of_epoch is None
                                 else self._as_of_state(as_of_epoch))
        resolver = self._resolver(pending, drop_tombstones=True, drop_meta=True)
        plan = self._salt_plan(base_version, pending)
        return concat_evolve(
            [resolver.resolve_pid(p, base_version, plan[p][1])
             for p in range(self.num_partitions)]
        )

    def export_snapshot(self, out_dir: str, *, columns: list[str] | None = None,
                        as_of_epoch: int | None = None) -> dict:
        """RESUMABLE partitioned export of the (optionally time-traveled)
        table state to plain Parquet: one task per (pid, salt)
        sub-partition writes ``part-<pid>-<salt>.parquet`` plus a ``.done``
        marker, and a re-run SKIPS partitions whose marker exists — a
        killed 100-TB export resumes from where it stopped instead of
        rewriting everything (the brief's resumable-output contract; never
        one giant file). Atomic per partition (tmp + rename before the
        marker). Returns {files, rows, skipped}."""
        import ray.data as rd

        base_version, pending = (self._pending_state()
                                 if as_of_epoch is None
                                 else self._as_of_state(as_of_epoch))
        resolver = self._resolver(pending, drop_tombstones=True,
                                  drop_meta=True, columns=columns)
        plan = self._salt_plan(base_version, pending)
        os.makedirs(out_dir, exist_ok=True)

        def export_sub(batch: pa.Table) -> pa.Table:
            rows_out, files, skipped = [], [], []
            for pid, salt, k, k_old in zip(
                    batch["pid"].to_pylist(), batch["salt"].to_pylist(),
                    batch["k"].to_pylist(), batch["k_old"].to_pylist()):
                name = f"part-{int(pid):05d}-{int(salt):04d}"
                dst = os.path.join(out_dir, name + ".parquet")
                marker = os.path.join(out_dir, name + ".done")
                if os.path.exists(marker):
                    skipped.append(name)
                    rows_out.append(0)
                    files.append("")
                    continue
                t = resolver.resolve_sub(int(pid), int(salt), int(k),
                                         base_version, int(k_old))
                n = t.num_rows
                if n:
                    _atomic_write_parquet(t, dst)
                    files.append(name + ".parquet")
                else:
                    files.append("")
                with open(marker + ".tmp", "w") as f:
                    f.write(str(n))
                os.replace(marker + ".tmp", marker)
                rows_out.append(n)
            return pa.table({
                "file": pa.array(files, pa.string()),
                "rows": pa.array(rows_out, pa.int64()),
                "skipped": pa.array(
                    [",".join(skipped)] + [""] * (len(files) - 1)
                    if files else [], pa.string()),
            })

        items = [
            {"pid": pid, "salt": s, "k": k, "k_old": k_old}
            for pid, (k, k_old) in plan.items()
            for s in range(k)
        ]
        stats = (rd.from_items(items, override_num_blocks=len(items))
                 .map_batches(export_sub, batch_format="pyarrow",
                              batch_size=1)
                 .take_all())
        return {
            "files": sorted(s["file"] for s in stats if s["file"]),
            "rows": int(sum(s["rows"] for s in stats)),
            "skipped": sorted(x for s in stats
                              for x in s["skipped"].split(",") if x),
        }

    def compact(self) -> dict:
        """Copy-on-write compaction: fold all committed deltas + current base
        into base version v+1, dropping tombstones. Idempotent and atomic
        (deterministic file names, manifest fence). Delta files of folded
        epochs are removed only after the compaction manifest commits."""
        import ray.data as rd

        base_version, pending = self._pending_state()
        new_version = base_version + 1
        if not pending and base_version >= 0:
            return self._read_manifest(f"compact-{base_version}.json")
        resolver = self._resolver(pending, drop_tombstones=True, drop_meta=False)
        root = self.root
        plan = self._salt_plan(base_version, pending)

        touched = set(self._fragment_index(pending))  # pids with deltas

        def compact_sub(batch: pa.Table) -> pa.Table:
            # one task per (pid, salt) sub-partition: reads ONLY the aligned
            # base sub-file(s) + this pid's delta row groups filtered to the
            # salt — never a whole hot pid (the 100-TB bound; see
            # _PartitionResolver docstring)
            rows = []
            bdir = os.path.join(root, "base", f"v={new_version}")
            for pid, salt, k, k_old in zip(
                    batch["pid"].to_pylist(), batch["salt"].to_pylist(),
                    batch["k"].to_pylist(), batch["k_old"].to_pylist()):
                fn = (f"pid={int(pid)}.parquet" if k == 1
                      else f"pid={int(pid)}-s{int(salt)}.parquet")
                dst = os.path.join(bdir, fn)
                if pid not in touched and k == k_old and base_version >= 0:
                    # INCREMENTAL compaction: a sub-partition with no
                    # pending deltas and an unchanged salt width carries
                    # forward as a hard link — no read, no rewrite. This
                    # bounds compaction cost by the touched data, not the
                    # table size (rewriting 100 TB to fold a 1 GB delta is
                    # the naive copy-on-write failure mode).
                    src = resolver._base_file(
                        os.path.join(root, "base", f"v={base_version}"),
                        int(pid), int(salt), int(k_old))
                    if os.path.exists(src):
                        os.makedirs(bdir, exist_ok=True)
                        if not os.path.exists(dst):
                            os.link(src, dst)
                        md = pq.ParquetFile(dst).metadata
                        rows.append((int(pid), int(salt), int(k),
                                     md.num_rows, os.path.getsize(dst)))
                    else:
                        rows.append((int(pid), int(salt), int(k), 0, 0))
                    continue
                t = resolver.resolve_sub(int(pid), int(salt), int(k),
                                         base_version, int(k_old))
                # skip empty sub-files (k is an upper-bound estimate);
                # resolve_sub treats a missing sub-file as empty
                nbytes = (_atomic_write_parquet(t, dst)
                          if t.num_rows else 0)
                rows.append((int(pid), int(salt), int(k), t.num_rows, nbytes))
            return pa.table(
                {
                    "pid": pa.array([r[0] for r in rows], pa.int64()),
                    "salt": pa.array([r[1] for r in rows], pa.int64()),
                    "salts": pa.array([r[2] for r in rows], pa.int64()),
                    "rows": pa.array([r[3] for r in rows], pa.int64()),
                    "bytes": pa.array([r[4] for r in rows], pa.int64()),
                }
            )

        items = [
            {"pid": pid, "salt": s, "k": k, "k_old": k_old}
            for pid, (k, k_old) in plan.items()
            for s in range(k)
        ]
        subs = rd.from_items(items, override_num_blocks=len(items))
        stats = (
            subs.map_batches(compact_sub, batch_format="pyarrow", batch_size=1)
            .take_all()
        )
        partitions: dict[str, dict[str, int]] = {}
        for s in stats:
            p = partitions.setdefault(str(s["pid"]), {"rows": 0, "salts": 1})
            p["rows"] += int(s["rows"])
            p["salts"] = int(s["salts"])
        _, folded_before = self.latest_compaction()
        manifest = {
            "version": new_version,
            "epochs": sorted(set(folded_before) | set(pending)),
            "partitions": partitions,
            "rows": int(sum(s["rows"] for s in stats)),
            "bytes": int(sum(s["bytes"] for s in stats)),
        }
        _atomic_write_json(
            manifest, os.path.join(self._manifest_dir, f"compact-{new_version}.json")
        )
        self._invalidate_scan_cache()
        # GC folded-epoch fragments — including orphans from retried or
        # crashed tasks of those epochs (name prefix match) — plus the
        # previous base version (safe: fenced by the manifest just written).
        # Epochs not yet drained by every registered change-feed consumer
        # are RETAINED (the enforced retention contract; gc() reclaims them
        # once checkpoints advance).
        ddir = os.path.join(self.root, "deltas")
        retained = self._retained_epochs(pending)
        prefixes = tuple(f"epoch-{e}-" for e in pending if e not in retained)
        if os.path.isdir(ddir) and prefixes:
            for fn in os.listdir(ddir):
                if fn.startswith(prefixes):
                    os.unlink(os.path.join(ddir, fn))
        if base_version >= 0:
            import shutil

            shutil.rmtree(os.path.join(root, "base", f"v={base_version}"),
                          ignore_errors=True)
        return manifest
