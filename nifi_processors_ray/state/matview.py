"""Incrementally-maintained materialized aggregate view over a LakeTable.

The canonical CDC downstream consumer (the reference's analog is a NiFi
flow fanning ExecuteRuleEngine output into an aggregating sink;
re-expressed here as a checkpointed change-feed consumer): maintain

    SELECT group_cols..., COUNT(*) AS cnt, SUM(value_col) AS sum_value
    FROM   <latest-row-per-key table state>   GROUP BY group_cols

so that each refresh costs O(change volume + touched partitions), never
O(table size). Correct under the full CDC semantics the lake supports:
updates that MOVE a key between groups, deletes (tombstones), stale /
replayed change rows (LWW by seq), and crash-resume at every step.

Mechanism — retract/insert deltas:

* The view keeps its own key -> contribution state as a second
  ``LakeTable`` (projection of the main table, lagging at the view's
  checkpoint) — LWW, tombstones, exactly-once fences all reused.
* A refresh generation over new epochs ``eps`` (hi = max(eps)):
  1. reduce the change feed to one row per key (per-batch combiner +
     bounded key-hash-partition groupby — shuffle volume = change volume);
  2. broadcast the changed-key u64 hash set (``ray.put`` once, byte-
     guarded) and filter the view state's PID-PRUNED read down to changed
     keys (hash false positives are harmless: such a row wins its own key
     group and its retract/insert contributions cancel exactly);
  3. one bounded shuffle co-locates state rows and change rows per key:
     every state row emits a RETRACT (-1, -value); the LWW winner of
     (state row, change rows) emits an INSERT (+1, +value) unless it is a
     tombstone. A stale change row loses LWW, so retract+insert net zero.
  4. fold the per-group delta into the (small) aggregate table.

Crash safety — each artifact is atomic and the sequence is idempotent:
``delta-<hi>.parquet`` -> ``gen-<hi>.json`` (pins the epoch set; the
delta MUST be computed against pre-generation state, so it is persisted
before the state epoch) -> fenced state ``apply_epoch(hi)`` ->
``agg-<hi>.parquet`` -> ``_view.json`` (applied_through=hi) ->
``commit_consumer`` (retention fence: the main lake keeps the delta
fragments the view may still need to replay).

Tombstone contract: winner selection reads the state WITH tombstones
(``read(keep_tombstones=True)``) so a key deleted at seq S beats a stale
change upsert with seq < S. Compacting the view's state lake folds
tombstones away (the lake-wide monotone-seq contract: rows older than a
compacted tombstone are assumed never to arrive after it) — the same
exposure the main lake accepts, no worse.

Scale notes (100 TB design point): the aggregate table itself (one row
per group) is the only driver-resident piece — the standard matview
contract. The changed-key broadcast is capped (``max_changed_keys``,
default 50M keys = 400 MB) and raises loudly past it; split the refresh
into smaller epoch windows in that regime. ``SUM`` treats nulls as 0
(all-null groups report 0.0 where SQL reports NULL); MIN/MAX are not
offered — they are not incrementally maintainable under retraction
without re-reading affected groups.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import hash64_columns
from .lake import LakeTable, _atomic_write_json, latest_by_key

_SRC = "_mv_src"  # 0 = prior state row, 1 = change row
_PART = "_mv_part"
_KH = "_mv_kh"


def _group_sum(t: pa.Table, group_cols: list[str]) -> pa.Table:
    """group_by(group_cols) -> sum(cnt), sum(sum_value), normalized back to
    ``group_cols + [cnt, sum_value]`` (pyarrow emits aggregate columns
    under *_sum names, keys last)."""
    r = t.group_by(group_cols).aggregate([("cnt", "sum"),
                                          ("sum_value", "sum")])
    ren = {"cnt_sum": "cnt", "sum_value_sum": "sum_value"}
    r = r.rename_columns([ren.get(c, c) for c in r.column_names])
    return r.select(group_cols + ["cnt", "sum_value"])


class IncrementalAggView:
    """See module docstring. ``value_col=None`` maintains counts only."""

    def __init__(self, lake: LakeTable, root: str, *, name: str,
                 group_cols: list[str], value_col: str | None = None,
                 num_partitions: int | None = None,
                 max_changed_keys: int = 50_000_000,
                 rows_per_finalize_task: int = 50_000,
                 small_bytes: int | None = None):
        self.lake = lake
        self.root = root
        self.name = name
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.max_changed_keys = int(max_changed_keys)
        self.rows_per_finalize_task = int(rows_per_finalize_task)
        # byte budget for the driver-side small-change fast path in
        # _compute_delta (None = engine default; 0 disables, forcing the
        # distributed path — the standard guarded-stage contract)
        self.small_bytes = small_bytes
        os.makedirs(root, exist_ok=True)
        lake.register_consumer(name)
        self.state = LakeTable(
            os.path.join(root, "state"),
            key_cols=tuple(lake.key_cols), seq_col=lake.seq_col,
            op_col=lake.op_col,
            num_partitions=(num_partitions if num_partitions is not None
                            else lake.num_partitions))

    # -- manifests ----------------------------------------------------------

    def _view_path(self) -> str:
        return os.path.join(self.root, "_view.json")

    def applied_through(self) -> int:
        p = self._view_path()
        if not os.path.exists(p):
            return -1
        with open(p) as f:
            return int(json.load(f)["applied_through"])

    def _gens(self) -> list[int]:
        return sorted(
            int(fn[len("gen-"):-len(".json")])
            for fn in os.listdir(self.root)
            if fn.startswith("gen-") and fn.endswith(".json"))

    # -- schemas / projections ----------------------------------------------

    def _feed_cols(self) -> list[str]:
        return list(dict.fromkeys(
            list(self.lake.key_cols) + self.group_cols
            + ([self.value_col] if self.value_col else [])
            + [self.lake.seq_col]
            + ([self.lake.op_col] if self.lake.op_col else [])))

    def _data_cols(self) -> list[str]:
        """Feed columns minus the op column (op is re-appended normalized)."""
        return [c for c in self._feed_cols() if c != self.lake.op_col]

    def _norm_schema(self) -> pa.Schema:
        src = self.state.schema() or self.lake.schema()
        if src is None:
            raise RuntimeError("no committed epochs — nothing to refresh")
        fields = [src.field(c) for c in self._data_cols()]
        if self.lake.op_col:
            fields.append(pa.field(self.lake.op_col, pa.string()))
        fields += [pa.field(_SRC, pa.int8()), pa.field(_PART, pa.int64())]
        return pa.schema(fields)

    def _empty_agg(self) -> pa.Table:
        src = self.state.schema() or self.lake.schema()
        fields = []
        for g in self.group_cols:
            t = (src.field(g).type if src is not None and g in src.names
                 else pa.string())
            fields.append(pa.field(g, t))
        fields += [pa.field("cnt", pa.int64()),
                   pa.field("sum_value", pa.float64())]
        return pa.schema(fields).empty_table()

    def _changes(self, eps: list[int]):
        feed = self.lake.changes(epochs=eps, columns=self._feed_cols())

        def drop_epoch(b: pa.Table) -> pa.Table:
            return b.drop_columns(["_epoch"])

        return feed.map_batches(drop_epoch, batch_format="pyarrow",
                                zero_copy_batch=True)

    # -- delta computation --------------------------------------------------

    def _changed_key_hashes(self, eps: list[int]) -> np.ndarray:
        """Sorted unique u64 key hashes touched by ``eps`` (the broadcast
        small side). Per-batch dedup first, so the driver sees per-batch
        uniques, not raw change rows."""
        keys = list(self.lake.key_cols)
        feed = self.lake.changes(epochs=eps, columns=keys)

        def partial(b: pa.Table) -> pa.Table:
            slim = b.select(keys).group_by(keys).aggregate([])
            h = np.unique(hash64_columns(slim, keys))
            return pa.table({_KH: pa.array(h.view(np.int64))})

        # keep a RUNNING deduped array so the guard measures actual
        # distinct keys (keys repeating across batches must not trip it)
        # while driver memory stays bounded by the cap itself
        uniq = np.empty(0, np.uint64)
        for b in feed.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True).iter_batches(
                                      batch_format="pyarrow"):
            a = np.ascontiguousarray(
                b.column(_KH).to_numpy(zero_copy_only=False)).view(np.uint64)
            uniq = np.union1d(uniq, a) if len(uniq) else np.unique(a)
            if len(uniq) > self.max_changed_keys:
                raise ValueError(
                    f"refresh touches more than {self.max_changed_keys} "
                    "distinct keys — the changed-key broadcast would "
                    "exceed its byte budget. Refresh in smaller epoch "
                    "windows, or raise max_changed_keys.")
        return uniq

    def _delta_path(self, hi: int) -> str:
        return os.path.join(self.root, f"delta-{hi}.parquet")

    def _agg_path(self, hi: int) -> str:
        return os.path.join(self.root, f"agg-{hi}.parquet")

    def _compute_delta(self, eps: list[int], hi: int) -> None:
        """Write ``delta-<hi>.parquet`` + ``gen-<hi>.json``. MUST run
        before the generation's state epoch is applied (reads old
        contributions); the gen manifest is the commit point.

        Small-change fast path (engine-wide guarded-stage pattern): when
        the raw change rows fit the byte budget, they gather once on the
        driver — the changed-key scan, the change-side reduce and the
        retract/insert finalize then run as single vectorized kernel
        passes (the SAME kernels as the distributed path, which shards
        them by key-hash partition), and the per-generation refresh drops
        from three Ray executions to one pid-pruned state read. Past the
        budget — or when the filtered state side exceeds it — the
        distributed pipeline below runs unchanged."""
        import ray

        from ..stages.similarity import SMALL_CORPUS_BYTES, _try_gather_small

        keys = list(self.lake.key_cols)
        seq, op = self.lake.seq_col, self.lake.op_col
        group_cols, value_col = self.group_cols, self.value_col
        data_cols = self._data_cols()
        norm_schema = self._norm_schema()

        budget = (SMALL_CORPUS_BYTES if self.small_bytes is None
                  else self.small_bytes)
        changes_tab = (_try_gather_small(self._changes(eps), budget)
                       if budget > 0 else None)
        if changes_tab is not None:
            red = (latest_by_key(changes_tab, keys, seq)
                   if changes_tab.num_rows else changes_tab)
            kh = (np.unique(hash64_columns(red, keys)) if red.num_rows
                  else np.empty(0, np.uint64))
            if len(kh) > self.max_changed_keys:
                raise ValueError(
                    f"refresh touches more than {self.max_changed_keys} "
                    "distinct keys — the changed-key broadcast would "
                    "exceed its byte budget. Refresh in smaller epoch "
                    "windows, or raise max_changed_keys.")
        else:
            kh = self._changed_key_hashes(eps)
        nparts = max(1, min(1024, int(np.ceil(
            max(len(kh), 1) / self.rows_per_finalize_task))))
        touched = {int(p) for p in
                   np.unique(kh % np.uint64(self.state.num_partitions))}

        def norm(b: pa.Table, src: int) -> pa.Table:
            if b.num_rows == 0:
                return norm_schema.empty_table()
            h = hash64_columns(b, keys)
            part = (h % np.uint64(nparts)).astype(np.int64)
            t = b.select(data_cols)
            if op:
                opv = (pc.cast(b[op], pa.string()) if op in b.column_names
                       else pa.nulls(b.num_rows, pa.string()))
                t = t.append_column(op, opv)
            return (t.append_column(
                _SRC, pa.array(np.full(b.num_rows, src, np.int8)))
                .append_column(_PART, pa.array(part)))

        def finalize(group: pa.Table) -> pa.Table:
            """Per key-hash partition: retract every prior-state row,
            insert the per-key LWW winner unless tombstoned."""
            prior = group.filter(pc.equal(group[_SRC], 0))
            if op and op in prior.column_names:
                live = pc.invert(
                    pc.equal(prior[op], "delete")).fill_null(True)
                prior = prior.filter(live)
            winners = latest_by_key(group, keys, seq)
            if op and op in winners.column_names:
                keep = pc.invert(
                    pc.equal(winners[op], "delete")).fill_null(True)
                winners = winners.filter(keep)

            def contrib(t: pa.Table, sign: int) -> pa.Table:
                n = t.num_rows
                if value_col:
                    v = pc.cast(t[value_col], pa.float64()).combine_chunks()
                    v = pc.multiply(v.fill_null(0.0), pa.scalar(float(sign)))
                else:
                    v = pa.array(np.zeros(n, np.float64))
                out = t.select(group_cols)
                return (out.append_column(
                    "cnt", pa.array(np.full(n, sign, np.int64)))
                    .append_column("sum_value", v))

            both = pa.concat_tables([contrib(prior, -1), contrib(winners, 1)])
            if both.num_rows == 0:
                return both
            return _group_sum(both, group_cols)

        delta = None
        if changes_tab is not None:
            # ---- driver-side fast path: one pid-pruned state read, all
            # kernels (searchsorted key filter, LWW reduce, retract/insert
            # finalize) in single vectorized passes. Hash partitions are a
            # function of the key, so the whole-set finalize equals the
            # union of the distributed per-partition results.
            if len(kh) == 0:
                delta = self._empty_agg()
            else:
                def state_filter_small(b: pa.Table) -> pa.Table:
                    if b.num_rows == 0:
                        return norm_schema.empty_table()
                    bh = hash64_columns(b, keys)
                    i = np.searchsorted(kh, bh)
                    i[i == len(kh)] = 0
                    return norm(b.filter(pa.array(kh[i] == bh)), 0)

                state_tab = _try_gather_small(
                    self.state.read(
                        pids=touched, columns=self._feed_cols(),
                        drop_meta=False, keep_tombstones=True
                    ).map_batches(state_filter_small,
                                  batch_format="pyarrow"),
                    budget)
                if state_tab is not None:
                    both = pa.concat_tables(
                        [state_tab, norm(red, 1)],
                        promote_options="default")
                    out = finalize(both)
                    delta = out if out.num_rows else self._empty_agg()
                # else: filtered state side over budget — fall through to
                # the distributed pipeline (kh is already computed)

        if delta is None:
            hashes_ref = ray.put(kh)

            class StateFilter:
                """Filter prior-state batches to (probable) changed keys
                via searchsorted on the broadcast hash set — loaded once
                per actor."""

                def __init__(self):
                    self.h = ray.get(hashes_ref)

                def __call__(self, b: pa.Table) -> pa.Table:
                    if b.num_rows == 0 or len(self.h) == 0:
                        return norm_schema.empty_table()
                    bh = hash64_columns(b, keys)
                    i = np.searchsorted(self.h, bh)
                    i[i == len(self.h)] = 0
                    hit = self.h[i] == bh
                    return norm(b.filter(pa.array(hit)), 0)

            # keep_tombstones: a key deleted at seq S must still BEAT a
            # stale change upsert with seq < S during winner selection —
            # reading only live rows would resurrect it. Tombstoned prior
            # rows join the LWW pool but are never retracted (they
            # contributed nothing).
            state_rows = self.state.read(
                pids=touched, columns=self._feed_cols(), drop_meta=False,
                keep_tombstones=True).map_batches(
                    StateFilter, batch_format="pyarrow", concurrency=(1, 8))

            def change_partial(b: pa.Table) -> pa.Table:
                return norm(latest_by_key(b, keys, seq), 1)

            change_rows = self._changes(eps).map_batches(
                change_partial, batch_format="pyarrow", zero_copy_batch=True)

            union = state_rows.union(change_rows)
            partials = union.groupby(_PART).map_groups(
                finalize, batch_format="pyarrow")
            tabs = [t for t in ray.get(partials.to_arrow_refs())
                    if t.num_rows]
            if tabs:
                delta = _group_sum(
                    pa.concat_tables(tabs, promote_options="default"),
                    group_cols)
            else:
                delta = self._empty_agg()
        tmp = self._delta_path(hi) + ".tmp"
        pq.write_table(delta, tmp)
        os.replace(tmp, self._delta_path(hi))
        _atomic_write_json({"epochs": [int(e) for e in eps]},
                           os.path.join(self.root, f"gen-{hi}.json"))

    def _finish_generation(self, hi: int, eps: list[int]) -> None:
        """Idempotently drive a pinned generation to completion: state
        epoch (fenced), agg fold (pure function of two immutable files),
        view manifest, consumer checkpoint."""
        if hi not in self.state.committed_epochs():
            self.state.apply_epoch(self._changes(eps), hi)
        applied = self.applied_through()
        if applied < hi:
            prev = (pq.read_table(self._agg_path(applied))
                    if applied >= 0 else self._empty_agg())
            delta = pq.read_table(self._delta_path(hi))
            folded = pa.concat_tables([prev, delta],
                                      promote_options="default")
            agg = (_group_sum(folded, self.group_cols)
                   if folded.num_rows else self._empty_agg())
            agg = agg.filter(pc.not_equal(agg["cnt"], 0))
            tmp = self._agg_path(hi) + ".tmp"
            pq.write_table(agg, tmp)
            os.replace(tmp, self._agg_path(hi))
            _atomic_write_json({"applied_through": int(hi)},
                               self._view_path())
        self.lake.commit_consumer(self.name, hi)

    # -- public API ---------------------------------------------------------

    def refresh(self) -> pa.Table:
        """Fold every committed-but-unapplied epoch into the view; returns
        the refreshed aggregate. Safe to re-run after a crash at any point
        (see module docstring for the commit-point analysis)."""
        while True:
            applied = self.applied_through()
            pending = [g for g in self._gens() if g > applied]
            if pending:
                hi = pending[0]
                with open(os.path.join(self.root, f"gen-{hi}.json")) as f:
                    eps = [int(e) for e in json.load(f)["epochs"]]
                self._finish_generation(hi, eps)
                continue
            eps = [e for e in self.lake.committed_epochs() if e > applied]
            if not eps:
                if applied >= 0:
                    self.lake.commit_consumer(self.name, applied)
                return self.result()
            hi = max(eps)
            self._compute_delta(eps, hi)
            self._finish_generation(hi, eps)
            return self.result()

    def result(self) -> pa.Table:
        """The current aggregate (group_cols..., cnt, sum_value), sorted by
        group for determinism."""
        applied = self.applied_through()
        t = (pq.read_table(self._agg_path(applied)) if applied >= 0
             else self._empty_agg())
        if t.num_rows:
            t = t.sort_by([(g, "ascending") for g in self.group_cols])
        return t
