"""Windowed / ordered operators the Dataset API lacks, composed
Ray-Data-first (SURVEY.md §2 "custom operators" guidance: composition of
map_batches + groupby().map_groups + sort where semantics allow).

* ``sessionize``     — gap-based session assignment per key (the streaming
  window the NiFi reference never had; queue order was its only notion of
  time, ExecuteRuleEngine.java:438-444).
* ``session_stats``  — one row per (key, session) with start/end/count.
* ``asof_join``      — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key (point-in-time lookup).
* ``topk_per_group`` — per-batch partial top-k combiner, then a small
  groupby merge — the shuffle ships at most ``k`` rows per (group, batch),
  never the full table.

Partitioning (the 100-TB bound, round-2 verdict #1): no operator here ever
groups an entire key's history into one task. ``sessionize`` /
``session_stats`` / ``asof_join`` shuffle on ``(key, time_bucket)`` —
``bucket = floor(ts / bucket_seconds)`` — so a hot key (Zipf user, popular
repo) fans out across its time buckets instead of concentrating in a single
unbounded ``groupby(key)`` group:

* sessionize: per-(key,bucket) local sessions, then a tiny per-key boundary
  pass over ONE ROW PER (key,bucket) computes each bucket's global session
  offset (a session spanning buckets merges when the cross-bucket gap is
  within ``gap_seconds``; chains across many buckets resolve in the same
  sequential scan). Offsets re-attach via a byte-budget-guarded broadcast
  join, falling back to a distributed hash join.
* session_stats: per-(key,bucket) session FRAGMENTS (one row per local
  session: start/end/count), then a per-key merge over fragments. Per-key
  merge input is bounded by the key's session/bucket count, not its event
  count — when a key genuinely has millions of sessions, that is the
  OUTPUT size and any engine pays it.
* asof_join: both sides co-group on (key, bucket); each left bucket
  additionally receives ONE carry row — the latest right row from any
  earlier bucket — computed from the per-(key,bucket) "last right row"
  summary (one row per bucket per key).

Pick ``bucket_seconds`` so one key's events per bucket stay task-sized (it
defaults to ``64 x gap`` / 1 hour). ``max_group_rows`` turns the bound into
a loud guard: any single group task exceeding it raises instead of silently
concentrating a hot key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_scale(t: pa.DataType) -> int:
    """Seconds -> time-axis units multiplier (1 for plain integer axes)."""
    if pa.types.is_timestamp(t):
        return {"s": 1, "ms": 1_000, "us": 1_000_000,
                "ns": 1_000_000_000}[t.unit]
    return 1


def _check_group(n: int, max_group_rows: int | None, what: str) -> None:
    if max_group_rows is not None and n > max_group_rows:
        raise ValueError(
            f"{what} task received {n} rows > max_group_rows="
            f"{max_group_rows}: shrink bucket_seconds so one key's rows per "
            "time bucket stay task-sized")


def _col_type(ds, name: str) -> pa.DataType:
    sch = ds.schema()
    return dict(zip(sch.names, sch.types))[name]


def _sessionize_parts(ds, *, key_col: str, ts_col: str, gap_i: int,
                      bucket_i: int, session_col: str,
                      max_group_rows: int | None):
    """Shared phase 1: rows labelled with ``_tsb`` (time bucket) and a
    bucket-LOCAL session index, grouped by (key, bucket) — bounded tasks."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch[ts_col], pa.int64()))
        return batch.append_column("_tsb", pa.array(ts // bucket_i))

    def per_bucket(group: pa.Table) -> pa.Table:
        _check_group(group.num_rows, max_group_rows, "sessionize (key,bucket)")
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
        g = group.take(order)
        ts = np.asarray(pc.cast(g[ts_col], pa.int64()))
        new = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new[1:] = (np.diff(ts) > gap_i).astype(np.int64)
        return g.append_column(session_col,
                               pa.array(np.cumsum(new) - 1, pa.int64()))

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([key_col, "_tsb"])
            .map_groups(per_bucket, batch_format="pyarrow"))


def _bucket_offsets(stat_partials, *, key_col: str, gap_i: int,
                    max_group_rows: int | None):
    """Per-key scan computing each bucket's global session offset,
    directly over PER-BATCH partial stats rows (several per bucket — they
    merge inside the same task, saving a dedicated combine shuffle):
    ``offset_b = sum_{b'<b} n_sessions_{b'} - (# boundary merges up to and
    including b)`` — a bucket whose first event is within ``gap`` of the
    previous non-empty bucket's last event continues that session (chains
    across buckets fold in the cumsum)."""

    def per_key(g: pa.Table) -> pa.Table:
        _check_group(g.num_rows, max_group_rows, "session offsets (buckets/key)")
        order = pc.sort_indices(g, sort_keys=[("_tsb", "ascending")])
        t = g.take(order)
        tsb_all = np.asarray(t["_tsb"])
        m_all = len(tsb_all)
        new_b = np.ones(m_all, dtype=bool)
        if m_all > 1:
            new_b[1:] = tsb_all[1:] != tsb_all[:-1]
        starts_i = np.flatnonzero(new_b)
        # merge per-batch partials of the same bucket in place
        n_sess = np.maximum.reduceat(
            np.asarray(t["_nmax"], dtype=np.int64), starts_i) + 1
        first = np.minimum.reduceat(np.asarray(t["_first"]), starts_i)
        last = np.maximum.reduceat(np.asarray(t["_last"]), starts_i)
        tsb = tsb_all[starts_i]
        m = len(tsb)
        merge = np.zeros(m, dtype=np.int64)
        if m > 1:
            merge[1:] = (first[1:] - last[:-1] <= gap_i).astype(np.int64)
        prev_cum = np.concatenate([[0], np.cumsum(n_sess)[:-1]])
        offset = prev_cum - np.cumsum(merge)
        return pa.table({key_col: t[key_col].take(pa.array(starts_i)),
                         "_tsb": pa.array(tsb),
                         "_offset": pa.array(offset, pa.int64())})

    return stat_partials.groupby(key_col).map_groups(per_key,
                                                     batch_format="pyarrow")


def sessionize(ds, *, key_col: str, ts_col: str, gap_seconds: float,
               session_col: str = "session_idx",
               bucket_seconds: float | None = None,
               max_group_rows: int | None = None,
               max_broadcast_bytes: int | None = None,
               num_partitions: int = 16):
    """Assign each row a per-key session index: a new session starts when
    the gap to the previous event of the SAME key exceeds ``gap_seconds``.

    Bounded composition (module docstring): (key, time-bucket) grouped
    local sessions -> tiny per-key offset scan -> offsets re-attached by a
    broadcast pyarrow join per batch (byte-guarded; distributed hash-join
    fallback past the budget)."""
    from .joins import DEFAULT_BROADCAST_BUDGET

    ts_type = _col_type(ds, ts_col)
    scale = _ts_scale(ts_type)
    gap_i = max(1, int(gap_seconds * scale))
    bucket_i = max(gap_i, int((bucket_seconds if bucket_seconds is not None
                               else gap_seconds * 64) * scale))

    part = _sessionize_parts(
        ds, key_col=key_col, ts_col=ts_col, gap_i=gap_i, bucket_i=bucket_i,
        session_col=session_col, max_group_rows=max_group_rows,
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
    offsets = _bucket_offsets(stat_partials, key_col=key_col, gap_i=gap_i,
                              max_group_rows=max_group_rows).materialize()

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
            return j.drop_columns(["_tsb", "_offset"])

        return part.map_batches(attach, batch_format="pyarrow",
                                zero_copy_batch=True)

    joined = part.join(offsets, join_type="inner",
                       num_partitions=num_partitions,
                       on=(key_col, "_tsb"))

    def attach_joined(batch: pa.Table) -> pa.Table:
        sid = pc.cast(pc.add(batch[session_col], batch["_offset"]), pa.int64())
        batch = batch.set_column(batch.column_names.index(session_col),
                                 session_col, sid)
        return batch.drop_columns(["_tsb", "_offset"])

    return joined.map_batches(attach_joined, batch_format="pyarrow",
                              zero_copy_batch=True)


def session_stats(ds, *, key_col: str, ts_col: str, gap_seconds: float,
                  bucket_seconds: float | None = None,
                  max_group_rows: int | None = None):
    """Sessionize then reduce to one row per (key, session): start/end
    timestamps and event count.

    Bounded composition: per-(key,bucket) session FRAGMENTS (already
    aggregated — one narrow row per local session), then one per-key merge
    over fragments. The heavy shuffle carries event rows grouped by
    (key, bucket); the per-key step sees fragments only."""
    ts_type = _col_type(ds, ts_col)
    scale = _ts_scale(ts_type)
    gap_i = max(1, int(gap_seconds * scale))
    bucket_i = max(gap_i, int((bucket_seconds if bucket_seconds is not None
                               else gap_seconds * 64) * scale))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch[ts_col], pa.int64()))
        return batch.append_column("_tsb", pa.array(ts // bucket_i))

    def frags(group: pa.Table) -> pa.Table:
        _check_group(group.num_rows, max_group_rows,
                     "session_stats (key,bucket)")
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
        g = group.take(order)
        ts = np.asarray(pc.cast(g[ts_col], pa.int64()))
        n = len(ts)
        new = np.ones(n, dtype=np.int64)
        if n > 1:
            new[1:] = (np.diff(ts) > gap_i).astype(np.int64)
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [n]]) - 1
        return pa.table({
            key_col: g[key_col].take(pa.array(starts)),
            "_tsb": g["_tsb"].take(pa.array(starts)),
            "_sid": pa.array(np.arange(len(starts)), pa.int64()),
            "_start": pa.array(ts[starts], pa.int64()),
            "_end": pa.array(ts[ends], pa.int64()),
            "_n": pa.array(ends - starts + 1, pa.int64()),
        })

    def merge(g: pa.Table) -> pa.Table:
        _check_group(g.num_rows, max_group_rows,
                     "session_stats merge (fragments/key)")
        order = pc.sort_indices(g, sort_keys=[("_tsb", "ascending"),
                                              ("_sid", "ascending")])
        t = g.take(order)
        sid = np.asarray(t["_sid"])
        starts = np.asarray(t["_start"])
        ends = np.asarray(t["_end"])
        cnt = np.asarray(t["_n"])
        m = len(sid)
        new = np.ones(m, dtype=bool)
        if m > 1:
            # a bucket's FIRST fragment (sid 0) continues the previous
            # bucket's last session when the boundary gap is within range;
            # later fragments are real in-bucket gaps -> always new
            new[1:] = ~((sid[1:] == 0) & (starts[1:] - ends[:-1] <= gap_i))
        firsts = np.flatnonzero(new)
        k = len(firsts)
        return pa.table({
            key_col: t[key_col].take(pa.array(firsts)),
            "session_idx": pa.array(np.arange(k), pa.int64()),
            "session_start": pc.cast(pa.array(starts[firsts]), ts_type),
            "session_end": pc.cast(
                pa.array(np.maximum.reduceat(ends, firsts) if k else
                         np.empty(0, np.int64)), ts_type),
            "n_events": pa.array(
                np.add.reduceat(cnt, firsts) if k else np.empty(0, np.int64),
                pa.int64()),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([key_col, "_tsb"])
            .map_groups(frags, batch_format="pyarrow")
            .groupby(key_col)
            .map_groups(merge, batch_format="pyarrow"))


def asof_join(left, right, *, on: str, by: str, value_cols: list[str],
              suffix: str = "_right", bucket_seconds: float = 3600,
              max_group_rows: int | None = None):
    """Point-in-time join: attach, to each left row, ``value_cols`` from
    the latest right row with ``right.on <= left.on`` within the same
    ``by`` key (nulls when none).

    Bounded composition (module docstring): both sides co-group on
    ``(by, time_bucket)`` — never a whole key — and each left bucket gets
    ONE extra "carry" right row (the latest right row from any earlier
    bucket), derived from a per-(key,bucket) last-row summary plus a tiny
    per-key scan. Heavy shuffle groups are bounded by one key's rows in one
    ``bucket_seconds`` window."""
    side_col = "_asof_side"

    l_schema, r_schema = left.schema(), right.schema()
    keep_right = [by, on] + value_cols
    r_types = dict(zip(r_schema.names, r_schema.types))
    l_names = list(l_schema.names)
    out_names = {c: (c + suffix if c in l_names else c) for c in value_cols}
    on_type = dict(zip(l_schema.names, l_schema.types))[on]
    width = max(1, int(bucket_seconds * _ts_scale(on_type)))

    unified: dict[str, pa.DataType] = {n: t for n, t in
                                       zip(l_schema.names, l_schema.types)}
    for c in value_cols:
        unified[f"_r_{c}"] = r_types[c]
    unified["_tsb"] = pa.int64()
    cols_sorted = sorted(unified)

    def _pad(batch: pa.Table, side: int) -> pa.Table:
        n = batch.num_rows
        for name, typ in unified.items():
            if name not in batch.column_names:
                batch = batch.append_column(name, pa.nulls(n, typ))
        batch = batch.select(cols_sorted)
        return batch.append_column(
            side_col, pa.array(np.full(n, side, dtype=np.int8)))

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

    def _keep_last(t: pa.Table) -> pa.Table:
        """One row per (by, _tsb): the max-``on`` one (vectorized)."""
        n = t.num_rows
        if n <= 1:
            return t
        narrow = t.select([by, "_tsb", on])
        idx = pc.sort_indices(narrow, sort_keys=[
            (by, "ascending"), ("_tsb", "ascending"), (on, "descending")])
        first = np.zeros(n, dtype=bool)
        first[0] = True
        for k in (by, "_tsb"):
            arr = pc.take(narrow[k], idx).combine_chunks()
            neq = pc.invert(pc.equal(arr.slice(1), arr.slice(0, n - 1)))
            first[1:] |= np.asarray(neq.fill_null(True))
        return t.take(pa.array(np.asarray(idx)[first]))

    # per-batch combiners feed ONE per-key shuffle that computes the carry
    # rows directly (narrow summaries only: one right row per (by, bucket)
    # per batch + one slim left row per (by, bucket) per batch)
    rights_partial = rt.map_batches(_keep_last, batch_format="pyarrow",
                                    zero_copy_batch=True)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        slim = batch.select([by, "_tsb"]).group_by([by, "_tsb"]).aggregate([])
        return _pad(slim, 0)

    left_partial = lt.map_batches(distinct_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def make_carries(group: pa.Table) -> pa.Table:
        _check_group(group.num_rows, max_group_rows,
                     "asof carries (buckets/key)")
        side = np.asarray(group[side_col])
        r = group.filter(pa.array(side == 1))
        l = group.filter(pa.array(side == 0))
        if r.num_rows == 0 or l.num_rows == 0:
            return group.slice(0, 0)
        # collapse per-batch partials: keep the max-`on` row per bucket
        r = r.take(pc.sort_indices(
            r, sort_keys=[("_tsb", "ascending"), (on, "ascending")]))
        r_tsb = np.asarray(r["_tsb"])
        last_of = np.ones(len(r_tsb), dtype=bool)
        last_of[:-1] = r_tsb[1:] != r_tsb[:-1]
        r = r.filter(pa.array(last_of))
        r_tsb = r_tsb[last_of]
        l_tsb = np.unique(np.asarray(l["_tsb"]))
        idx = np.searchsorted(r_tsb, l_tsb, side="left") - 1
        valid = idx >= 0
        if not valid.any():
            return group.slice(0, 0)
        out = r.take(pa.array(idx[valid]))
        return out.set_column(out.column_names.index("_tsb"), "_tsb",
                              pa.array(l_tsb[valid]))

    carries = (rights_partial.union(left_partial)
               .groupby(by)
               .map_groups(make_carries, batch_format="pyarrow"))

    both = lt.union(rt).union(carries)

    def merge(group: pa.Table) -> pa.Table:
        _check_group(group.num_rows, max_group_rows, "asof merge (key,bucket)")
        side = np.asarray(group[side_col])
        l = group.filter(pa.array(side == 0)).select(l_names)
        r = group.filter(pa.array(side == 1))
        if l.num_rows == 0:
            for c in value_cols:
                l = l.append_column(out_names[c], pa.nulls(0, r_types[c]))
            return l
        r = r.take(pc.sort_indices(r, sort_keys=[(on, "ascending")]))
        r_on = np.asarray(pc.cast(r[on], pa.int64())) if r.num_rows else \
            np.empty(0, np.int64)
        l_on = np.asarray(pc.cast(l[on], pa.int64()))
        idx = np.searchsorted(r_on, l_on, side="right") - 1
        hit = idx >= 0
        idx_c = np.clip(idx, 0, max(len(r_on) - 1, 0))
        for c in value_cols:
            if r.num_rows:
                vals = r[f"_r_{c}"].take(pa.array(idx_c))
                if not hit.all():
                    vals = pc.if_else(pa.array(hit), vals,
                                      pa.scalar(None, vals.type))
            else:
                vals = pa.nulls(l.num_rows, r_types[c])
            l = l.append_column(out_names[c], vals)
        return l

    return both.groupby([by, "_tsb"]).map_groups(merge, batch_format="pyarrow")


def topk_per_group(ds, *, group_col: str, order_col: str, k: int,
                   descending: bool = True, tiebreak_col: str | None = None):
    """Top-k rows per group. Stage 1 (map_batches combiner) keeps only the
    per-batch top-k of each group, so the shuffle ships <= k rows per
    (group, batch); stage 2 finalizes per group. Pass a unique
    ``tiebreak_col`` (ascending) for deterministic results under ties."""
    direction = "descending" if descending else "ascending"
    order_keys = [(order_col, direction)]
    if tiebreak_col:
        order_keys.append((tiebreak_col, "ascending"))

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.take(pc.sort_indices(
            batch, sort_keys=[(group_col, "ascending")] + order_keys))
        grp = t[group_col].combine_chunks()
        n = t.num_rows
        first = np.zeros(n, dtype=bool)
        if n:
            first[0] = True
            neq = pc.invert(pc.equal(grp.slice(1), grp.slice(0, n - 1)))
            first[1:] = np.asarray(neq.fill_null(True))
        starts = np.flatnonzero(first)
        rank = np.arange(n) - np.repeat(starts, np.diff(
            np.concatenate([starts, [n]])))
        return t.filter(pa.array(rank < k))

    def final(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(group, sort_keys=order_keys))
        return t.slice(0, k)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby(group_col).map_groups(final, batch_format="pyarrow")


def sliding_window_agg(ds, *, ts_col: str = "ts", value_col: str = "value",
                       window_seconds: int = 7200, slide_seconds: int = 3600):
    """Sliding-window aggregate: every event lands in the
    ``window_seconds / slide_seconds`` windows covering it (window start
    epochs are multiples of ``slide_seconds``); per window emit
    ``n_events`` + ``sum_value``.

    Composition: a vectorized per-batch EXPLODE (each row repeated once per
    covering window with its ``window_start``) followed by one groupby —
    the fan-out factor is the small constant ``m``, so the shuffle carries
    ``m × (window_start, value)`` narrow rows, never the full event
    payload. SQL twin: CROSS JOIN range(m) with the same window arithmetic.
    """
    from ray.data.aggregate import Count, Sum

    if window_seconds % slide_seconds:
        raise ValueError("window_seconds must be a multiple of slide_seconds")
    m = window_seconds // slide_seconds

    def explode(batch: pa.Table) -> pa.Table:
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
        return pa.table({
            "window_start": pa.array(starts),
            value_col: pa.array(np.repeat(vals, m)),
        })

    return (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"),
                   Sum(value_col, alias_name="sum_value"))
    )
