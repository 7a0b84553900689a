"""Windowed / ordered operators the Dataset API lacks, composed
Ray-Data-first (SURVEY.md §2 "custom operators" guidance: composition of
map_batches + groupby().map_groups + sort where semantics allow).

* ``sessionize``     — gap-based session assignment per key (the streaming
  window the NiFi reference never had; queue order was its only notion of
  time, ExecuteRuleEngine.java:438-444).
* ``session_stats``  — one row per (key, session) with start/end/count.
* ``asof_join``      — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key (point-in-time lookup).
* ``range_join``     — validity-interval join: the right ``[start, end)``
  interval covering each left point per key (SCD-2 semantics, composed on
  the asof machinery — see its docstring for the non-overlap assumption).
* ``topk_per_group`` — per-batch partial top-k combiner, then a small
  groupby merge — the shuffle ships at most ``k`` rows per (group, batch),
  never the full table.

Partitioning (the 100-TB bound, round-2 verdict #1): no operator here ever
groups an entire key's history into one task, and no task dispatches a
Python call per key either. Work keys on ``(key, time_bucket)`` —
``bucket = floor(ts / bucket_seconds)`` — so a hot key (Zipf user, popular
repo) fans out across its time buckets; tasks group on a HASH PARTITION of
that work key (many segments per task, each processed by one segmented
numpy kernel — per-group ``map_groups`` pays a Python dispatch + block
build per group, which dominates wall beyond ~10^4 groups):

* sessionize: per-(key,bucket) local sessions (segmented cumsum), then a
  tiny per-key boundary pass over ONE ROW PER (key,bucket) computes each
  bucket's global session offset (cross-bucket sessions merge when the
  boundary gap is within ``gap_seconds``; chains across many buckets fold
  in the same cumsum). Offsets re-attach via a byte-budget-guarded
  broadcast join with a distributed-join fallback.
* session_stats: per-(key,bucket) session FRAGMENTS (one narrow row per
  local session), then a per-key merge over fragments — merge input is
  bounded by the key's session/bucket count, not its event count.
* asof_join: both sides co-group on (key, bucket); each left bucket
  additionally receives ONE carry row (the latest right row from any
  earlier bucket). Matching inside a partition is one sort + a segmented
  running-maximum scan (no per-group dispatch, no per-row Python).

Pick ``bucket_seconds`` so one key's events per bucket stay task-sized (it
defaults to ``64 x gap`` / 1 hour). ``max_group_rows`` turns the bound into
a loud guard: if any single (key, bucket) segment exceeds it, the task
raises instead of silently concentrating a hot key.

``bucket_seconds=None`` opts OUT of the hot-key bound into a single-shuffle
mode (one groupby on the key-hash partition, no bucket/carry machinery) —
choose it when keys are known well-distributed and the extra stages' fixed
cost isn't worth paying; a hot key then concentrates in one task exactly
like a plain ``groupby(key)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_columns

#: window tasks process many (key, bucket) segments per call
_WINDOW_PARTITIONS = 64

#: block count that summary-sized intermediates (per-batch partial
#: aggregates, boundary/carry rows) are coalesced to before a groupby: the
#: sort shuffle pays a per-input-block scheduling cost, so feeding it a few
#: dense blocks instead of one sliver per upstream batch is a measured
#: 2-3x win; the coalesce itself only ever moves summary-weight data
_SUMMARY_BLOCKS = 16


def _ts_scale(t: pa.DataType) -> int:
    """Seconds -> time-axis units multiplier (1 for plain integer axes)."""
    if pa.types.is_timestamp(t):
        return {"s": 1, "ms": 1_000, "us": 1_000_000,
                "ns": 1_000_000_000}[t.unit]
    return 1


def _col_type(ds, name: str) -> pa.DataType:
    sch = ds.schema()
    return dict(zip(sch.names, sch.types))[name]


def _schema_lost(ds) -> bool:
    """True for a zero-row dataset whose schema Ray could not recover
    (e.g. empty after a repartition/groupby): nothing is computable and no
    output schema can be synthesized, so window ops pass the empty input
    through unchanged (documented contract; hypothesis-pinned)."""
    return ds.schema() is None


def _seg_change(table: pa.Table, cols: list[str]) -> np.ndarray:
    """Boolean 'starts a new segment' mask over a SORTED table (adjacent
    inequality on the given columns, Arrow compares — any dtype)."""
    n = table.num_rows
    change = np.zeros(n, dtype=bool)
    if n:
        change[0] = True
        for c in cols:
            arr = table[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            neq = pc.invert(pc.equal(arr.slice(1), arr.slice(0, n - 1)))
            change[1:] |= np.asarray(neq.fill_null(True))
    return change


def _check_segments(change: np.ndarray, max_group_rows: int | None,
                    what: str) -> None:
    """Loud hot-key guard: largest single segment length vs the cap."""
    if max_group_rows is None or not len(change):
        return
    starts = np.flatnonzero(change)
    sizes = np.diff(np.append(starts, len(change)))
    biggest = int(sizes.max())
    if biggest > max_group_rows:
        raise ValueError(
            f"{what}: a single (key, bucket) segment holds {biggest} rows "
            f"> max_group_rows={max_group_rows}: shrink bucket_seconds so "
            "one key's rows per time bucket stay task-sized")


def _latest_marker_index(grp_id: np.ndarray, marker: np.ndarray) -> np.ndarray:
    """For each position: index of the latest marker row at-or-before it
    WITHIN its segment (-1 if none) — one running maximum over a
    segment-offset encoding, no per-segment loop."""
    N = len(grp_id)
    val = np.where(marker, np.arange(N, dtype=np.int64), -1)
    enc = grp_id.astype(np.int64) * np.int64(N + 1) + val + 1
    return np.maximum.accumulate(enc) - grp_id.astype(np.int64) * np.int64(
        N + 1) - 1


def _add_window_part(ds, key_col: str, ts_col: str, bucket_i: int,
                     extra: list[str] | None = None):
    """Append ``_tsb`` (time bucket) and ``_wp`` (hash partition of
    (key, _tsb)) columns."""

    def f(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch[ts_col], pa.int64()))
        tsb = ts // bucket_i
        batch = batch.append_column("_tsb", pa.array(tsb))
        h = hash64_columns(batch, [key_col, "_tsb"])
        return batch.append_column(
            "_wp", pa.array((h % np.uint64(_WINDOW_PARTITIONS))
                            .astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _key_partition(ds, key_col: str):
    """Append ``_kp`` (hash partition of the key alone)."""

    def f(batch: pa.Table) -> pa.Table:
        h = hash64_columns(batch, [key_col])
        return batch.append_column(
            "_kp", pa.array((h % np.uint64(_WINDOW_PARTITIONS))
                            .astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _local_sessions(g: pa.Table, key_col: str, ts_col: str, gap_i: int,
                    max_group_rows: int | None, what: str):
    """Sorted-partition kernel: -> (sorted table, ts int64, per-row
    bucket-local session index, 'new (key,bucket) segment' mask, 'new
    session' mask). Handles MANY (key,bucket) segments at once."""
    order = pc.sort_indices(g, sort_keys=[
        (key_col, "ascending"), ("_tsb", "ascending"), (ts_col, "ascending")])
    t = g.take(order)
    new_seg = _seg_change(t, [key_col, "_tsb"])
    _check_segments(new_seg, max_group_rows, what)
    ts = np.asarray(pc.cast(t[ts_col], pa.int64()))
    n = len(ts)
    brk = new_seg.copy()
    if n > 1:
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_i
    sid_glob = np.cumsum(brk) - 1
    seg_id = np.cumsum(new_seg) - 1
    seg_starts = np.flatnonzero(new_seg)
    local_sid = sid_glob - sid_glob[seg_starts][seg_id]
    return t, ts, local_sid, new_seg, brk


def sessionize(ds, *, key_col: str, ts_col: str, gap_seconds: float,
               session_col: str = "session_idx",
               bucket_seconds: float | None = "auto",
               max_group_rows: int | None = None,
               max_broadcast_bytes: int | None = None,
               num_partitions: int = 16):
    """Assign each row a per-key session index: a new session starts when
    the gap to the previous event of the SAME key exceeds ``gap_seconds``.
    Bounded composition per the module docstring."""
    from .joins import DEFAULT_BROADCAST_BUDGET

    if _schema_lost(ds):
        return ds
    ts_type = _col_type(ds, ts_col)
    scale = _ts_scale(ts_type)
    gap_i = max(1, int(gap_seconds * scale))
    if bucket_seconds is None:
        # single-shuffle opt-out (module docstring): whole keys per task
        def whole_key(g: pa.Table) -> pa.Table:
            order = pc.sort_indices(g, sort_keys=[
                (key_col, "ascending"), (ts_col, "ascending")])
            t = g.take(order)
            new_key = _seg_change(t, [key_col])
            ts = np.asarray(pc.cast(t[ts_col], pa.int64()))
            brk = new_key.copy()
            if len(ts) > 1:
                brk[1:] |= (ts[1:] - ts[:-1]) > gap_i
            sid_glob = np.cumsum(brk) - 1
            key_seg = np.cumsum(new_key) - 1
            key_starts = np.flatnonzero(new_key)
            sid = sid_glob - sid_glob[key_starts][key_seg]
            return t.append_column(session_col, pa.array(sid, pa.int64())
                                   ).drop_columns(["_kp"])

        return (_key_partition(ds, key_col)
                .groupby("_kp")
                .map_groups(whole_key, batch_format="pyarrow"))
    bucket_i = max(gap_i, int((gap_seconds * 64 if bucket_seconds == "auto"
                               else bucket_seconds) * scale))

    def per_partition(g: pa.Table) -> pa.Table:
        t, _, local_sid, _, _ = _local_sessions(
            g, key_col, ts_col, gap_i, max_group_rows,
            "sessionize (key,bucket)")
        return t.append_column(session_col, pa.array(local_sid, pa.int64()))

    part = (_add_window_part(ds, key_col, ts_col, bucket_i)
            .groupby("_wp")
            .map_groups(per_partition, batch_format="pyarrow")
            ).materialize()  # consumed twice (stats + offset attach)

    def stat_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: batch[key_col], "_tsb": batch["_tsb"],
            "_sid": batch[session_col],
            "_ts": pc.cast(batch[ts_col], pa.int64()),
        })
        agg = t.group_by([key_col, "_tsb"]).aggregate(
            [("_sid", "max"), ("_ts", "min"), ("_ts", "max")])
        return pa.table({
            key_col: agg[key_col], "_tsb": agg["_tsb"],
            "_nmax": agg["_sid_max"], "_first": agg["_ts_min"],
            "_last": agg["_ts_max"],
        })

    stat_partials = part.map_batches(stat_partial, batch_format="pyarrow",
                                     zero_copy_batch=True)
    offsets = _bucket_offsets(stat_partials, key_col=key_col,
                              gap_i=gap_i).materialize()

    budget = (max_broadcast_bytes if max_broadcast_bytes is not None
              else DEFAULT_BROADCAST_BUDGET)
    if offsets.size_bytes() <= budget:
        import ray

        off_tables = [t for t in ray.get(offsets.to_arrow_refs())
                      if t.num_rows]
        off_tbl = (pa.concat_tables(off_tables, promote_options="default")
                   if off_tables else
                   pa.table({key_col: pa.array([], _col_type(ds, key_col)),
                             "_tsb": pa.array([], pa.int64()),
                             "_offset": pa.array([], pa.int64())}))
        ref = ray.put(off_tbl)

        def attach(batch: pa.Table) -> pa.Table:
            off = ray.get(ref)
            j = batch.join(off, keys=[key_col, "_tsb"], join_type="inner")
            sid = pc.cast(pc.add(j[session_col], j["_offset"]), pa.int64())
            j = j.set_column(j.column_names.index(session_col), session_col,
                             sid)
            return j.drop_columns(["_tsb", "_wp", "_offset"])

        return part.map_batches(attach, batch_format="pyarrow",
                                zero_copy_batch=True)

    joined = part.join(offsets, join_type="inner",
                       num_partitions=num_partitions,
                       on=(key_col, "_tsb"))

    def attach_joined(batch: pa.Table) -> pa.Table:
        sid = pc.cast(pc.add(batch[session_col], batch["_offset"]), pa.int64())
        batch = batch.set_column(batch.column_names.index(session_col),
                                 session_col, sid)
        return batch.drop_columns(["_tsb", "_wp", "_offset"])

    return joined.map_batches(attach_joined, batch_format="pyarrow",
                              zero_copy_batch=True)


def _bucket_offsets(stat_partials, *, key_col: str, gap_i: int):
    """Per-key scan computing each bucket's global session offset, over
    PER-BATCH partial stats rows (several per bucket — merged in-task with
    reduceat). Tasks group on a hash partition of the key and the scan is
    segmented over all its keys at once: ``offset_b = sum_{b'<b}
    n_sessions_{b'} - (# boundary merges up to and including b)``."""

    def per_partition(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(key_col, "ascending"),
                                              ("_tsb", "ascending")])
        t = g.take(order)
        new_key = _seg_change(t, [key_col])
        new_b = new_key | _seg_change(t, ["_tsb"])
        bstart = np.flatnonzero(new_b)
        # merge per-batch partials of the same (key, bucket)
        n_sess = np.maximum.reduceat(
            np.asarray(t["_nmax"], dtype=np.int64), bstart) + 1
        first = np.minimum.reduceat(np.asarray(t["_first"]), bstart)
        last = np.maximum.reduceat(np.asarray(t["_last"]), bstart)
        kb_new_key = new_key[bstart]            # bucket-level key change
        m = len(bstart)
        merge = np.zeros(m, dtype=np.int64)
        if m > 1:
            merge[1:] = (~kb_new_key[1:]
                         & (first[1:] - last[:-1] <= gap_i)).astype(np.int64)
        cum_excl = np.cumsum(n_sess) - n_sess
        key_seg = np.cumsum(kb_new_key) - 1
        key_starts = np.flatnonzero(kb_new_key)
        prev_local = cum_excl - cum_excl[key_starts][key_seg]
        minc = np.cumsum(merge)
        minc_local = minc - minc[key_starts][key_seg] + merge[key_starts][key_seg]
        offset = prev_local - minc_local
        take = pa.array(bstart)
        return pa.table({key_col: t[key_col].take(take),
                         "_tsb": t["_tsb"].take(take),
                         "_offset": pa.array(offset, pa.int64())})

    return (_key_partition(stat_partials, key_col)
            .groupby("_kp")
            .map_groups(per_partition, batch_format="pyarrow"))


def session_stats(ds, *, key_col: str, ts_col: str, gap_seconds: float,
                  bucket_seconds: float | None = "auto",
                  max_group_rows: int | None = None,
                  max_broadcast_bytes: int | None = None):
    """Sessionize then reduce to one row per (key, session): start/end
    timestamps and event count. Bounded composition: per-(key,bucket)
    session FRAGMENTS (one narrow row per local session), then a per-key
    segmented merge over fragments — driver-side under
    ``max_broadcast_bytes`` (one sort shuffle saved), distributed past it.
    (``bucket_seconds=None`` — the single-shuffle opt-out — uses one huge
    bucket: the fragment stage then emits final sessions directly and the
    merge is a cheap pass-through.)"""
    if _schema_lost(ds):
        return ds
    ts_type = _col_type(ds, ts_col)
    scale = _ts_scale(ts_type)
    gap_i = max(1, int(gap_seconds * scale))
    if bucket_seconds is None:
        bucket_i = 1 << 60  # one bucket: whole keys per fragment task
    else:
        bucket_i = max(gap_i, int((gap_seconds * 64
                                   if bucket_seconds == "auto"
                                   else bucket_seconds) * scale))

    def frags(g: pa.Table) -> pa.Table:
        t, ts, local_sid, _, brk = _local_sessions(
            g, key_col, ts_col, gap_i, max_group_rows,
            "session_stats (key,bucket)")
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(ts)) - 1
        take = pa.array(starts)
        return pa.table({
            key_col: t[key_col].take(take),
            "_tsb": t["_tsb"].take(take),
            "_sid": pa.array(local_sid[starts], pa.int64()),
            "_start": pa.array(ts[starts], pa.int64()),
            "_end": pa.array(ts[ends], pa.int64()),
            "_n": pa.array(ends - starts + 1, pa.int64()),
        })

    def merge(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), ("_tsb", "ascending"),
            ("_sid", "ascending")])
        t = g.take(order)
        new_key = _seg_change(t, [key_col])
        sid = np.asarray(t["_sid"])
        starts_v = np.asarray(t["_start"])
        ends_v = np.asarray(t["_end"])
        cnt = np.asarray(t["_n"])
        m = len(sid)
        new = new_key.copy()
        if m > 1:
            # a bucket's FIRST fragment (sid 0) continues the previous
            # bucket's last session when the boundary gap is in range;
            # later fragments are real in-bucket gaps -> always new
            cont = ((sid[1:] == 0) & ~new_key[1:]
                    & (starts_v[1:] - ends_v[:-1] <= gap_i))
            new[1:] |= ~cont
        firsts = np.flatnonzero(new)
        ses_glob = np.cumsum(new) - 1
        key_seg = np.cumsum(new_key) - 1
        key_starts = np.flatnonzero(new_key)
        session_idx = (ses_glob - ses_glob[key_starts][key_seg])[firsts]
        k = len(firsts)
        return pa.table({
            key_col: t[key_col].take(pa.array(firsts)),
            "session_idx": pa.array(session_idx, pa.int64()),
            "session_start": pc.cast(pa.array(starts_v[firsts]), ts_type),
            "session_end": pc.cast(
                pa.array(np.maximum.reduceat(ends_v, firsts) if k else
                         np.empty(0, np.int64)), ts_type),
            "n_events": pa.array(
                np.add.reduceat(cnt, firsts) if k else np.empty(0, np.int64),
                pa.int64()),
        })

    fr = (_add_window_part(ds, key_col, ts_col, bucket_i)
          .groupby("_wp")
          .map_groups(frags, batch_format="pyarrow")).materialize()
    # fragments are NARROW (one 6-field row per in-bucket session): when
    # they fit the broadcast budget, run the SAME merge kernel once on the
    # driver instead of paying a second sort shuffle (the asof/lag_lead
    # summary-kernel pattern); past the budget — ~10^8+ sessions — the
    # distributed key-partition merge runs unchanged
    from .joins import DEFAULT_BROADCAST_BUDGET

    budget = (max_broadcast_bytes if max_broadcast_bytes is not None
              else DEFAULT_BROADCAST_BUDGET)
    size = fr.size_bytes()
    if size is not None and size <= budget:
        import ray
        import ray.data as rd

        tabs = [t for t in ray.get(fr.to_arrow_refs()) if t.num_rows]
        if not tabs:
            cols = {key_col: pa.array([], _col_type(ds, key_col)),
                    "session_idx": pa.array([], pa.int64()),
                    "session_start": pa.array([], ts_type),
                    "session_end": pa.array([], ts_type),
                    "n_events": pa.array([], pa.int64())}
            return rd.from_arrow(pa.table(cols))
        return rd.from_arrow(
            merge(pa.concat_tables(tabs, promote_options="default")))
    return (_key_partition(fr, key_col)
            .groupby("_kp")
            .map_groups(merge, batch_format="pyarrow"))


def asof_join(left, right, *, on: str, by: str, value_cols: list[str],
              suffix: str = "_right", bucket_seconds: float | None = 3600,
              max_group_rows: int | None = None,
              carry_broadcast_bytes: int = 64 << 20):
    """Point-in-time join: attach, to each left row, ``value_cols`` from
    the latest right row with ``right.on <= left.on`` within the same
    ``by`` key (nulls when none). Bounded composition per the module
    docstring: (key, bucket) co-groups + one carry row per left bucket,
    hash-partitioned tasks, segmented running-maximum matching.

    When the per-(key, bucket, batch) carry summaries fit
    ``carry_broadcast_bytes``, the cross-bucket carries are computed once
    on the driver (same vectorized kernel) and fed back as one block —
    eliminating a whole sort shuffle; past the budget the carries go
    through the distributed key-partition path unchanged."""
    side_col = "_asof_side"

    if _schema_lost(left):
        return left
    l_schema, r_schema = left.schema(), right.schema()
    if r_schema is None:
        # empty right with unrecoverable schema: every left row gets null
        # value columns (type unknowable -> null type)
        def all_null(batch: pa.Table) -> pa.Table:
            names = {c: (c + suffix if c in batch.column_names else c)
                     for c in value_cols}
            for c in value_cols:
                batch = batch.append_column(
                    names[c], pa.nulls(batch.num_rows, pa.null()))
            return batch

        return left.map_batches(all_null, batch_format="pyarrow",
                                 zero_copy_batch=True)
    keep_right = [by, on] + value_cols
    r_types = dict(zip(r_schema.names, r_schema.types))
    l_names = list(l_schema.names)
    out_names = {c: (c + suffix if c in l_names else c) for c in value_cols}
    on_type = dict(zip(l_schema.names, l_schema.types))[on]
    single_shuffle = bucket_seconds is None
    width = ((1 << 60) if single_shuffle
             else max(1, int(bucket_seconds * _ts_scale(on_type))))

    unified: dict[str, pa.DataType] = {n: t for n, t in
                                       zip(l_schema.names, l_schema.types)}
    for c in value_cols:
        unified[f"_r_{c}"] = r_types[c]
    unified["_tsb"] = pa.int64()
    cols_sorted = sorted(unified)

    def _add_wp(batch: pa.Table) -> pa.Table:
        h = hash64_columns(batch, [by, "_tsb"])
        return batch.append_column(
            "_wp", pa.array((h % np.uint64(_WINDOW_PARTITIONS))
                            .astype(np.int64)))

    def _pad(batch: pa.Table, side: int) -> pa.Table:
        n = batch.num_rows
        for name, typ in unified.items():
            if name not in batch.column_names:
                batch = batch.append_column(name, pa.nulls(n, typ))
        batch = batch.select(cols_sorted)
        batch = batch.append_column(
            side_col, pa.array(np.full(n, side, dtype=np.int8)))
        return _add_wp(batch).replace_schema_metadata(None)

    def tag_left(batch: pa.Table) -> pa.Table:
        batch = batch.select([c for c in l_names if c in batch.column_names])
        ts = np.asarray(pc.cast(batch[on], pa.int64()))
        return _pad(batch.append_column("_tsb", pa.array(ts // width)), 0)

    def tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep_right)
        batch = batch.rename_columns(
            [c if c in (by, on) else f"_r_{c}" for c in keep_right])
        ts = np.asarray(pc.cast(batch[on], pa.int64()))
        return _pad(batch.append_column("_tsb", pa.array(ts // width)), 1)

    lt = left.map_batches(tag_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow",
                           zero_copy_batch=True)
    tagged = lt.union(rt)

    def carry_partial(batch: pa.Table) -> pa.Table:
        """Per-batch combiner over the tagged union: the max-``on`` RIGHT
        row per (by, bucket) plus one slim LEFT marker row per (by,
        bucket) — narrow summaries only."""
        idx = pc.sort_indices(batch, sort_keys=[
            (side_col, "ascending"), (by, "ascending"),
            ("_tsb", "ascending"), (on, "descending")])
        t = batch.take(idx)
        side = np.asarray(t[side_col])
        first = _seg_change(t, [side_col, by, "_tsb"])
        return t.filter(pa.array(first))

    if single_shuffle:
        # one bucket per key -> no cross-bucket carries exist; ONE shuffle
        return tagged.groupby("_wp").map_groups(
            _asof_merge_factory(by, on, side_col, l_names, value_cols,
                                out_names, max_group_rows),
            batch_format="pyarrow")

    def carries_kernel(g: pa.Table) -> pa.Table:
        # within one key partition (or the whole summary table on the
        # broadcast fast path): for every LEFT bucket marker, the latest
        # right row from a STRICTLY earlier bucket of the same key. Sort
        # puts left rows BEFORE right rows at equal _tsb, so the running
        # maximum can only see rights from earlier buckets.
        order = pc.sort_indices(g, sort_keys=[
            (by, "ascending"), ("_tsb", "ascending"),
            (side_col, "ascending"), (on, "ascending")])
        t = g.take(order)
        side = np.asarray(t[side_col])
        grp_id = np.cumsum(_seg_change(t, [by])) - 1
        latest = _latest_marker_index(grp_id, side == 1)
        li = np.flatnonzero(side == 0)
        mi = latest[li]
        hit = mi >= 0
        if not hit.any():
            return t.slice(0, 0)
        out = t.take(pa.array(mi[hit]))
        l_tsb = np.asarray(t["_tsb"])[li[hit]]
        out = out.set_column(out.column_names.index("_tsb"), "_tsb",
                             pa.array(l_tsb))
        # the carry rides to the LEFT bucket's partition
        h = hash64_columns(out, [by, "_tsb"])
        return out.set_column(
            out.column_names.index("_wp"), "_wp",
            pa.array((h % np.uint64(_WINDOW_PARTITIONS)).astype(np.int64)))

    import ray
    import ray.data as rd

    # tagged feeds BOTH the carry summaries and the final merge exchange —
    # materialize once so the tag/union lineage doesn't execute twice
    # (the object store holds / spills it; recompute would re-read the
    # sources per consumer)
    tagged = tagged.materialize()
    carry_in = tagged.map_batches(carry_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    mat = carry_in.materialize()
    size = mat.size_bytes()
    if size is not None and size <= carry_broadcast_bytes:
        # summaries fit the budget: one driver-side kernel pass replaces a
        # full sort shuffle, and the carries enter the final exchange as a
        # single dense block
        tabs = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
        if tabs:
            carries = rd.from_arrow(carries_kernel(
                pa.concat_tables(tabs, promote_options="default")))
        else:
            carries = mat
    else:
        carries = (_key_partition(mat, by)
                   .groupby("_kp")
                   .map_groups(
                       lambda g: carries_kernel(g).drop_columns(["_kp"]),
                       batch_format="pyarrow"))

    both = tagged.union(carries)
    return both.groupby("_wp").map_groups(
        _asof_merge_factory(by, on, side_col, l_names, value_cols,
                            out_names, max_group_rows),
        batch_format="pyarrow")


def _asof_merge_factory(by, on, side_col, l_names, value_cols, out_names,
                        max_group_rows):
    """Segmented as-of match across ALL (by, bucket) groups in one
    partition task: sort (group, on, right-before-left at equal on), then
    one running maximum gives each left row its matching right row."""

    def merge(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[
            (by, "ascending"), ("_tsb", "ascending"), (on, "ascending"),
            (side_col, "descending")])
        t = g.take(order)
        new_seg = _seg_change(t, [by, "_tsb"])
        _check_segments(new_seg, max_group_rows, "asof merge (key,bucket)")
        side = np.asarray(t[side_col])
        grp_id = np.cumsum(new_seg) - 1
        latest = _latest_marker_index(grp_id, side == 1)
        li = np.flatnonzero(side == 0)
        mi = latest[li]
        hit = mi >= 0
        l = t.filter(pa.array(side == 0)).select(l_names)
        mi_c = np.clip(mi, 0, max(len(side) - 1, 0))
        for c in value_cols:
            col = t[f"_r_{c}"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = col.take(pa.array(mi_c))
            if not hit.all():
                vals = pc.if_else(pa.array(hit), vals,
                                  pa.scalar(None, vals.type))
            l = l.append_column(out_names[c], vals)
        return l

    return merge


def range_join(left, right, *, on: str, by: str, start_col: str,
               end_col: str, value_cols: list[str], suffix: str = "_right",
               bucket_seconds: float | None = 3600,
               max_group_rows: int | None = None):
    """Validity-interval (range) join: attach, to each left row,
    ``value_cols`` from the right interval ``[start_col, end_col)`` that
    CONTAINS ``left.on`` within the same ``by`` key (nulls when no interval
    covers it — left rows are always kept, so row count is stable).

    ASSUMPTION (documented per SURVEY §2 custom-operator guidance): right
    intervals are NON-OVERLAPPING per key — SCD-2 / validity-period
    semantics (dimension versions, price validity windows, campaign
    periods). Under that assumption the covering interval, when it exists,
    is exactly the one with the latest ``start <= on`` — so the operator
    composes as ``asof_join`` on the interval start (inheriting its
    (key, time-bucket) hot-key bound and cross-bucket carry rows for
    intervals that span buckets) followed by a vectorized ``end > on``
    validity filter. If intervals overlap, the latest-starting one wins
    silently — validate upstream when that matters."""
    _RJ_END = "_rj_end"
    if _schema_lost(left):
        return left
    l_names = list(left.schema().names)
    out_names = {c: (c + suffix if c in l_names else c) for c in value_cols}
    keep = [by, start_col, end_col] + value_cols

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep)
        return batch.rename_columns(
            [on if c == start_col else (_RJ_END if c == end_col else c)
             for c in keep])

    rt = right.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
    j = asof_join(left, rt, on=on, by=by,
                  value_cols=value_cols + [_RJ_END], suffix=suffix,
                  bucket_seconds=bucket_seconds,
                  max_group_rows=max_group_rows)

    def finalize(batch: pa.Table) -> pa.Table:
        end = pc.cast(batch[_RJ_END], pa.int64())
        pt = pc.cast(batch[on], pa.int64())
        ok = pc.greater(end, pt).fill_null(False)  # [start, end) exclusive
        if isinstance(ok, pa.ChunkedArray):
            ok = ok.combine_chunks()
        for c in value_cols:
            name = out_names[c]
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            batch = batch.set_column(
                batch.column_names.index(name), name,
                pc.if_else(ok, col, pa.scalar(None, col.type)))
        return batch.drop_columns([_RJ_END])

    return j.map_batches(finalize, batch_format="pyarrow",
                         zero_copy_batch=True)


def lag_lead(ds, *, key_col: str, order_col: str, value_cols: list[str],
             tiebreak_col: str | None = None,
             lag_suffix: str = "_lag", lead_suffix: str = "_lead",
             bucket_seconds: float | None = 3600,
             max_group_rows: int | None = None,
             carry_broadcast_bytes: int = 64 << 20):
    """SQL ``LAG(col, 1)`` / ``LEAD(col, 1)`` over
    ``PARTITION BY key ORDER BY order_col[, tiebreak_col]``: attach each
    row its per-key predecessor's and successor's ``value_cols`` (null at
    the key's edges). Ties in ``order_col`` need ``tiebreak_col`` for a
    deterministic order (SQL has the same requirement). Larger offsets
    compose by repeated application.

    Bounded composition per the module docstring: rows co-group on
    (key, time-bucket) hash partitions; each (key, bucket) segment
    additionally receives the LAST row of the key's previous non-empty
    bucket and the FIRST row of its next non-empty bucket as carry rows —
    one narrow row each — so the segment kernel (one sort + shifted
    gather) sees every cross-bucket neighbor. ``bucket_seconds=None``
    opts out into the single-shuffle whole-key mode."""
    side_col = "_ll_side"  # -1 carry-prev, 0 real, +1 carry-next
    if _schema_lost(ds):
        return ds
    l_schema = ds.schema()
    types = dict(zip(l_schema.names, l_schema.types))
    order_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    keep = list(dict.fromkeys(
        [key_col] + order_cols + value_cols))
    single_shuffle = bucket_seconds is None
    width = ((1 << 60) if single_shuffle
             else max(1, int(bucket_seconds * _ts_scale(types[order_col]))))

    def tag(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch[order_col], pa.int64()))
        batch = batch.append_column("_tsb", pa.array(ts // width))
        batch = batch.append_column(
            side_col, pa.array(np.zeros(batch.num_rows, np.int8)))
        h = hash64_columns(batch, [key_col, "_tsb"])
        return batch.append_column(
            "_wp", pa.array((h % np.uint64(_WINDOW_PARTITIONS))
                            .astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)

    def boundary_partial(batch: pa.Table) -> pa.Table:
        """Per-batch combiner: first + last row per (key, bucket), narrow
        (key, order cols, value cols only)."""
        b = batch.select(keep + ["_tsb"])
        sort_keys = ([(key_col, "ascending"), ("_tsb", "ascending")]
                     + [(c, "ascending") for c in order_cols])
        t = b.take(pc.sort_indices(b, sort_keys=sort_keys))
        new = _seg_change(t, [key_col, "_tsb"])
        last = np.roll(new, -1)
        if len(last):
            last[-1] = True
        return t.filter(pa.array(new | last))

    def make_carries(g: pa.Table) -> pa.Table:
        """Per key partition over boundary rows: previous bucket's last
        row rides forward (side -1), next bucket's first row rides
        backward (side +1), each retagged to the destination bucket."""
        sort_keys = ([(key_col, "ascending"), ("_tsb", "ascending")]
                     + [(c, "ascending") for c in order_cols])
        t = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        n = t.num_rows
        if n == 0:
            empty = t.append_column(side_col, pa.array([], pa.int8()))
            return empty.append_column("_wp", pa.array([], pa.int64()))
        new_bucket = _seg_change(t, [key_col, "_tsb"])
        new_key = _seg_change(t, [key_col])
        tsb = np.asarray(t["_tsb"])
        starts = np.flatnonzero(new_bucket)
        outs, sides, dest = [], [], []
        # carry-prev: for each bucket start (not first of key), row start-1
        src_prev = starts[~new_key[starts]] - 1
        if len(src_prev):
            outs.append(t.take(pa.array(src_prev)))
            sides.append(np.full(len(src_prev), -1, np.int8))
            dest.append(tsb[src_prev + 1])
        # carry-next: for each bucket's last row followed by a same-key
        # bucket, the NEXT bucket's first row rides back
        ends = np.append(starts[1:] - 1, n - 1)
        nxt = ends + 1
        ok = (nxt < n) & ~new_key[np.minimum(nxt, n - 1)]
        src_next = nxt[ok]
        if len(src_next):
            outs.append(t.take(pa.array(src_next)))
            sides.append(np.full(len(src_next), 1, np.int8))
            dest.append(tsb[src_next - 1])
        if not outs:
            empty = t.slice(0, 0).append_column(
                side_col, pa.array([], pa.int8()))
            return empty.append_column("_wp", pa.array([], pa.int64()))
        out = pa.concat_tables(outs)
        side = np.concatenate(sides)
        d = np.concatenate(dest)
        out = out.set_column(out.column_names.index("_tsb"), "_tsb",
                             pa.array(d))
        out = out.append_column(side_col, pa.array(side))
        h = hash64_columns(out, [key_col, "_tsb"])
        return out.append_column(
            "_wp", pa.array((h % np.uint64(_WINDOW_PARTITIONS))
                            .astype(np.int64)))

    def merge(g: pa.Table) -> pa.Table:
        # carry-prev sorts before / carry-next after every real row of the
        # destination segment: carries come from adjacent buckets, so their
        # order_col values lie strictly outside the segment's range
        sort_keys = ([(key_col, "ascending"), ("_tsb", "ascending")]
                     + [(c, "ascending") for c in order_cols]
                     + [(side_col, "ascending")])
        t = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        n = t.num_rows
        new_seg = _seg_change(t, [key_col, "_tsb"])
        _check_segments(new_seg, max_group_rows, "lag_lead (key,bucket)")
        side = np.asarray(t[side_col])
        idx = np.arange(n, dtype=np.int64)
        has_prev = ~new_seg
        prev = np.where(has_prev, idx - 1, 0)
        nxt_seg = np.roll(new_seg, -1)
        if n:
            nxt_seg[-1] = True
        has_next = ~nxt_seg
        nxt = np.where(has_next, idx + 1, 0)
        real = side == 0
        out = t.filter(pa.array(real))
        for c in value_cols:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lagv = pc.if_else(pa.array(has_prev), col.take(pa.array(prev)),
                              pa.scalar(None, col.type))
            leadv = pc.if_else(pa.array(has_next), col.take(pa.array(nxt)),
                               pa.scalar(None, col.type))
            out = out.append_column(c + lag_suffix,
                                    lagv.filter(pa.array(real)))
            out = out.append_column(c + lead_suffix,
                                    leadv.filter(pa.array(real)))
        return out.drop_columns(["_tsb", "_wp", side_col])

    if single_shuffle:
        return tagged.groupby("_wp").map_groups(merge,
                                                batch_format="pyarrow")
    import ray
    import ray.data as rd

    # tagged feeds both the boundary summaries and the final exchange —
    # materialize once instead of executing the tag lineage twice
    tagged = tagged.materialize()
    if tagged.count() == 0:
        # short-circuit: zero-row inputs still return the full output
        # schema (an empty groupby would lose it entirely)
        cols = {name: pa.array([], types[name]) for name in l_schema.names}
        for c in value_cols:
            cols[c + lag_suffix] = pa.array([], types[c])
            cols[c + lead_suffix] = pa.array([], types[c])
        return rd.from_arrow(pa.table(cols))
    boundaries = tagged.map_batches(boundary_partial,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    size = boundaries.size_bytes()
    if size is not None and size <= carry_broadcast_bytes:
        # first/last-per-(key,bucket,batch) summaries fit the budget: one
        # driver-side kernel pass replaces a full sort shuffle and the
        # carries enter the final exchange as a single dense block
        tabs = [t for t in ray.get(boundaries.to_arrow_refs())
                if t.num_rows]
        if tabs:
            carries_narrow = rd.from_arrow(make_carries(
                pa.concat_tables(tabs, promote_options="default")))
        else:
            # empty carries MUST still carry the full carry schema
            # (boundary columns + side + _wp) — reusing `boundaries`
            # (keep + _tsb only) would make widen's select KeyError on
            # any zero-row (rather than zero-block) materialization
            cols = {c: pa.array([], types[c]) for c in keep}
            cols["_tsb"] = pa.array([], pa.int64())
            cols[side_col] = pa.array([], pa.int8())
            cols["_wp"] = pa.array([], pa.int64())
            carries_narrow = rd.from_arrow(pa.table(cols))
    else:
        carries_narrow = (
            _key_partition(boundaries, key_col)
            .groupby("_kp")
            .map_groups(lambda g: make_carries(g.drop_columns(["_kp"])),
                        batch_format="pyarrow"))

    def widen(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        for name in l_schema.names:
            if name not in batch.column_names:
                batch = batch.append_column(name, pa.nulls(n, types[name]))
        return batch.select(list(l_schema.names)
                            + ["_tsb", side_col, "_wp"])

    carries = carries_narrow.map_batches(widen, batch_format="pyarrow",
                                         zero_copy_batch=True)
    aligned = tagged.map_batches(
        lambda b: b.select(list(l_schema.names) + ["_tsb", side_col, "_wp"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return aligned.union(carries).groupby("_wp").map_groups(
        merge, batch_format="pyarrow")


def topk_per_group(ds, *, group_col: str, order_col: str, k: int,
                   descending: bool = True, tiebreak_col: str | None = None):
    """Top-k rows per group. Stage 1 (map_batches combiner) keeps only the
    per-batch top-k of each group, so the shuffle ships <= k rows per
    (group, batch); stage 2 finalizes per group partition with one
    segmented rank pass. Pass a unique ``tiebreak_col`` (ascending) for
    deterministic results under ties."""
    direction = "descending" if descending else "ascending"
    order_keys = [(order_col, direction)]
    if tiebreak_col:
        order_keys.append((tiebreak_col, "ascending"))

    def ranked(batch: pa.Table) -> pa.Table:
        t = batch.take(pc.sort_indices(
            batch, sort_keys=[(group_col, "ascending")] + order_keys))
        n = t.num_rows
        first = _seg_change(t, [group_col])
        starts = np.flatnonzero(first)
        rank = np.arange(n) - np.repeat(starts, np.diff(
            np.concatenate([starts, [n]])))
        return t.filter(pa.array(rank < k))

    partials = ds.map_batches(ranked, batch_format="pyarrow",
                              zero_copy_batch=True)
    return (_key_partition(partials, group_col)
            .groupby("_kp")
            .map_groups(lambda g: ranked(g).drop_columns(["_kp"]),
                        batch_format="pyarrow"))


def sliding_window_agg(ds, *, ts_col: str = "ts", value_col: str = "value",
                       window_seconds: int = 7200, slide_seconds: int = 3600):
    """Sliding-window aggregate: every event lands in the
    ``window_seconds / slide_seconds`` windows covering it (window start
    epochs are multiples of ``slide_seconds``); per window emit
    ``n_events`` + ``sum_value``.

    Composition: a vectorized per-batch EXPLODE (each row repeated once per
    covering window with its ``window_start``) that PRE-AGGREGATES within
    the batch (one row per (window, batch) through the exchange, never the
    events), coalesced to a few blocks before the final sum-groupby — the
    partials are windows x batches sized at ANY corpus size, so the extra
    coalesce exchange is always summary-weight while cutting the sort
    shuffle's per-block scheduling cost (measured 2.6x at sf0.1). SQL
    twin: CROSS JOIN range(m) with the same window arithmetic."""
    from ray.data.aggregate import Sum

    if window_seconds % slide_seconds:
        raise ValueError("window_seconds must be a multiple of slide_seconds")
    m = window_seconds // slide_seconds

    def explode_partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        unit = {"s": 1, "ms": 1_000, "us": 1_000_000,
                "ns": 1_000_000_000}[ts.type.unit]
        epoch = np.asarray(pc.cast(ts, pa.int64())) // unit
        base = epoch // slide_seconds
        vals = np.asarray(batch[value_col])
        n = len(epoch)
        starts = ((np.repeat(base, m)
                   - np.tile(np.arange(m, dtype=np.int64), n))
                  * slide_seconds)
        t = pa.table({
            "window_start": pa.array(starts),
            value_col: pa.array(np.repeat(vals, m)),
        })
        g = t.group_by(["window_start"]).aggregate(
            [(value_col, "sum"), (value_col, "count")])
        return pa.table({
            "window_start": g["window_start"],
            "sum_value": g[f"{value_col}_sum"],
            "n_events": pc.cast(g[f"{value_col}_count"], pa.int64()),
        })

    return (
        ds.map_batches(explode_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(_SUMMARY_BLOCKS)
        .groupby("window_start")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
    )

def running_agg(ds, *, key_col: str, order_col: str, value_cols: list[str],
                tiebreak_col: str | None = None,
                cumsum_suffix: str = "_cumsum", rownum_col: str = "row_number",
                bucket_seconds: float | None = 3600,
                max_group_rows: int | None = None,
                carry_broadcast_bytes: int = 64 << 20):
    """SQL running aggregates: ``SUM(col) OVER (PARTITION BY key ORDER BY
    order_col[, tiebreak] ROWS UNBOUNDED PRECEDING)`` per ``value_cols``
    plus ``ROW_NUMBER()`` — each row annotated with its per-key prefix sums
    and 1-based rank. The NiFi reference had no ordered aggregation at all
    (queue order only, ExecuteRuleEngine.java:438-444); this is the
    engine-side equivalent built for scale.

    Bounded composition (module docstring): rows co-group on hash
    partitions of ``(key, time_bucket)``; a narrow per-(key,bucket) totals
    pass (per-batch combiner -> per-key exclusive prefix over ONE ROW PER
    BUCKET) computes each bucket's starting sums/count, which ride into the
    segment tasks as one extra row per (key,bucket). Inside a task the
    kernel is one sort + segmented cumsum — no per-group dispatch. A hot
    key therefore never concentrates: per-task input is bounded by the
    key's rows per bucket (+1). ``bucket_seconds=None`` opts out into the
    single-shuffle whole-key mode.

    Integer value columns accumulate in int64, floats in float64. Sums are
    exact for integers; float totals add per-bucket partials in bucket
    order (same left-to-right order as SQL up to per-batch combining).
    Null values contribute 0 (SQL's SUM-ignores-NULL); the cumsum column
    itself is never null — the one divergence from SQL is an all-null
    prefix, where SQL yields NULL and this yields 0.
    """
    side_col = "_ra_side"  # -1 offset row, 0 real
    if _schema_lost(ds):
        return ds
    l_schema = ds.schema()
    types = dict(zip(l_schema.names, l_schema.types))
    order_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    single_shuffle = bucket_seconds is None
    width = ((1 << 60) if single_shuffle
             else max(1, int(bucket_seconds * _ts_scale(types[order_col]))))
    off_names = {c: f"_off_{c}" for c in value_cols}

    def _acc_type(t: pa.DataType) -> pa.DataType:
        return pa.float64() if pa.types.is_floating(t) else pa.int64()

    def tag(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch[order_col], pa.int64()))
        batch = batch.append_column("_tsb", pa.array(ts // width))
        batch = batch.append_column(
            side_col, pa.array(np.zeros(batch.num_rows, np.int8)))
        h = hash64_columns(batch, [key_col, "_tsb"])
        return batch.append_column(
            "_wp", pa.array((h % np.uint64(_WINDOW_PARTITIONS))
                            .astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)

    def totals_partial(batch: pa.Table) -> pa.Table:
        """Per-batch combiner: one narrow row per (key, bucket) with the
        batch's contribution to each value sum and the row count."""
        b = batch.select([key_col, "_tsb"] + value_cols)
        t = b.take(pc.sort_indices(b, sort_keys=[(key_col, "ascending"),
                                                 ("_tsb", "ascending")]))
        new = _seg_change(t, [key_col, "_tsb"])
        starts = np.flatnonzero(new)
        if not len(starts):
            cols = {key_col: t[key_col], "_tsb": t["_tsb"],
                    "_cnt": pa.array([], pa.int64())}
            for c in value_cols:
                cols[off_names[c]] = pa.array(
                    [], _acc_type(types[c]))
            return pa.table(cols)
        cnt = np.diff(np.append(starts, t.num_rows))
        take = pa.array(starts)
        cols = {key_col: t[key_col].take(take), "_tsb": t["_tsb"].take(take),
                "_cnt": pa.array(cnt.astype(np.int64))}
        for c in value_cols:
            # null values contribute 0 (SUM-ignores-NULL running totals);
            # fill BEFORE asarray — int64-with-nulls converts via float64
            # NaN and .astype(int64) would turn NaN into garbage
            acc = np.asarray(pc.fill_null(t[c], 0)).astype(
                np.float64 if pa.types.is_floating(types[c]) else np.int64)
            cols[off_names[c]] = pa.array(np.add.reduceat(acc, starts))
        return pa.table(cols)

    def make_offsets(g: pa.Table) -> pa.Table:
        """Per key partition over totals rows: merge same-(key,bucket)
        partials, then EXCLUSIVE per-key prefix -> each bucket's starting
        sums and count. Input is one row per (key, bucket, batch)."""
        t = g.take(pc.sort_indices(g, sort_keys=[(key_col, "ascending"),
                                                 ("_tsb", "ascending")]))
        new_key = _seg_change(t, [key_col])
        new_b = new_key | _seg_change(t, ["_tsb"])
        bstart = np.flatnonzero(new_b)
        m = len(bstart)
        if not m:
            cols = {key_col: t[key_col], "_tsb": t["_tsb"],
                    "_offcnt": pa.array([], pa.int64())}
            for c in value_cols:
                cols[off_names[c]] = pa.array([], _acc_type(types[c]))
            cols["_wp"] = pa.array([], pa.int64())
            return pa.table(cols)
        kb_new_key = new_key[bstart]
        key_seg = np.cumsum(kb_new_key) - 1
        key_starts = np.flatnonzero(kb_new_key)

        def excl_prefix(per_bucket: np.ndarray) -> np.ndarray:
            cum = np.cumsum(per_bucket)
            excl = cum - per_bucket
            return excl - excl[key_starts][key_seg]

        cnt_b = np.add.reduceat(np.asarray(t["_cnt"], dtype=np.int64), bstart)
        take = pa.array(bstart)
        cols = {key_col: t[key_col].take(take), "_tsb": t["_tsb"].take(take),
                "_offcnt": pa.array(excl_prefix(cnt_b))}
        for c in value_cols:
            sum_b = np.add.reduceat(np.asarray(t[off_names[c]]), bstart)
            cols[off_names[c]] = pa.array(excl_prefix(sum_b))
        out = pa.table(cols)
        h = hash64_columns(out, [key_col, "_tsb"])
        return out.append_column(
            "_wp", pa.array((h % np.uint64(_WINDOW_PARTITIONS))
                            .astype(np.int64)))

    def merge(g: pa.Table) -> pa.Table:
        # offset rows (side -1) sort before the segment's real rows; their
        # order/tiebreak columns are null, and nulls sort last under
        # ascending — so sort side BEFORE the order columns.
        sort_keys = ([(key_col, "ascending"), ("_tsb", "ascending"),
                      (side_col, "ascending")]
                     + [(c, "ascending") for c in order_cols])
        t = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        n = t.num_rows
        new_seg = _seg_change(t, [key_col, "_tsb"])
        _check_segments(new_seg, max_group_rows, "running_agg (key,bucket)")
        side = np.asarray(t[side_col])
        marker = side == -1
        seg_id = np.cumsum(new_seg) - 1
        nseg = int(seg_id[-1]) + 1 if n else 0
        real = ~marker
        real_idx = np.flatnonzero(real)
        seg_real = seg_id[real_idx]
        new_real = np.ones(len(real_idx), dtype=bool)
        if len(real_idx) > 1:
            new_real[1:] = seg_real[1:] != seg_real[:-1]
        rstarts = np.flatnonzero(new_real)
        out = t.filter(pa.array(real))

        def seg_offset(col_name: str, dtype) -> np.ndarray:
            off = np.zeros(nseg, dtype=dtype)
            # real rows carry null in the offset columns — fill before
            # asarray so the int64 path never round-trips through float64
            vals = np.asarray(pc.fill_null(t[col_name], 0))
            off[seg_id[marker]] = vals[marker]
            return off

        # row_number: local 1-based index + bucket's starting count
        local = np.arange(len(real_idx), dtype=np.int64)
        local -= np.repeat(local[rstarts], np.diff(
            np.append(rstarts, len(real_idx))))
        offcnt = seg_offset("_offcnt", np.int64) if "_offcnt" in \
            t.column_names else np.zeros(nseg, np.int64)
        rn = local + 1 + offcnt[seg_real]
        for c in value_cols:
            np_t = (np.float64 if pa.types.is_floating(types[c])
                    else np.int64)
            # SUM() OVER ignores NULLs: null values contribute 0 to the
            # running sum (the cumsum column itself is never null — the
            # one documented divergence from SQL's null-until-first-value
            # edge). fill BEFORE asarray: int64-with-nulls converts via
            # float64 NaN and .astype(int64) turns NaN into garbage.
            vals = np.asarray(
                pc.fill_null(t[c].filter(pa.array(real)), 0)).astype(np_t)
            cs = np.cumsum(vals)
            # subtract each segment's preceding global cumsum
            seg_base = np.repeat(cs[rstarts] - vals[rstarts], np.diff(
                np.append(rstarts, len(real_idx))))
            local_cs = cs - seg_base
            off = (seg_offset(off_names[c], np_t)
                   if off_names[c] in t.column_names
                   else np.zeros(nseg, np_t))
            out = out.append_column(c + cumsum_suffix,
                                    pa.array(local_cs + off[seg_real]))
        out = out.append_column(rownum_col, pa.array(rn))
        drop = [x for x in ("_tsb", "_wp", side_col, "_offcnt",
                            *off_names.values()) if x in out.column_names]
        return out.drop_columns(drop)

    if single_shuffle:
        return tagged.groupby("_wp").map_groups(merge,
                                                batch_format="pyarrow")
    import ray
    import ray.data as rd

    # tagged feeds both the totals pass and the final exchange —
    # materialize once instead of executing the tag lineage twice
    tagged = tagged.materialize()
    if tagged.count() == 0:
        # short-circuit: zero-row inputs still return the full output
        # schema (an empty groupby would lose it entirely)
        cols = {name: pa.array([], types[name]) for name in l_schema.names}
        for c in value_cols:
            cols[c + cumsum_suffix] = pa.array([], _acc_type(types[c]))
        cols[rownum_col] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(cols))
    totals = tagged.map_batches(totals_partial, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    size = totals.size_bytes()
    if size is not None and size <= carry_broadcast_bytes:
        # per-(key,bucket,batch) totals fit the budget: one driver-side
        # kernel pass replaces a full sort shuffle, and the offset rows
        # enter the final exchange as a single dense block
        tabs = [t for t in ray.get(totals.to_arrow_refs()) if t.num_rows]
        if tabs:
            tbl = pa.concat_tables(tabs, promote_options="default")
        else:
            # build the empty totals table from locally known columns —
            # a fully-empty materialized dataset may have schema() None
            cols = {key_col: pa.array([], types[key_col]),
                    "_tsb": pa.array([], pa.int64()),
                    "_cnt": pa.array([], pa.int64())}
            for c in value_cols:
                cols[off_names[c]] = pa.array([], _acc_type(types[c]))
            tbl = pa.table(cols)
        offsets_narrow = rd.from_arrow(make_offsets(tbl))
    else:
        offsets_narrow = (
            _key_partition(totals, key_col)
            .groupby("_kp")
            .map_groups(lambda g: make_offsets(g.drop_columns(["_kp"])),
                        batch_format="pyarrow"))

    def widen(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        for name in l_schema.names:
            if name not in batch.column_names:
                batch = batch.append_column(name, pa.nulls(n, types[name]))
        batch = batch.append_column(
            side_col, pa.array(np.full(n, -1, np.int8)))
        return batch.select(list(l_schema.names)
                            + ["_tsb", "_offcnt",
                               *off_names.values(), side_col, "_wp"])

    offsets = offsets_narrow.map_batches(widen, batch_format="pyarrow",
                                         zero_copy_batch=True)

    def align(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column("_offcnt", pa.nulls(n, pa.int64()))
        for c in value_cols:
            batch = batch.append_column(
                off_names[c], pa.nulls(n, _acc_type(types[c])))
        return batch.select(list(l_schema.names)
                            + ["_tsb", "_offcnt",
                               *off_names.values(), side_col, "_wp"])

    aligned = tagged.map_batches(align, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return aligned.union(offsets).groupby("_wp").map_groups(
        merge, batch_format="pyarrow")
