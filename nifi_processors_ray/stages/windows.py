"""Windowed / ordered operators the Dataset API lacks, composed
Ray-Data-first (SURVEY.md §2 "custom operators" guidance: composition of
map_batches + groupby().map_groups + sort where semantics allow).

* ``sessionize``     — gap-based session assignment per key (the streaming
  window the NiFi reference never had; queue order was its only notion of
  time, ExecuteRuleEngine.java:438-444).
* ``asof_join``      — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key (point-in-time lookup).
* ``topk_per_group`` — per-batch partial top-k combiner, then a small
  groupby merge — the shuffle ships at most ``k`` rows per (group, batch),
  never the full table.

Partitioning assumptions (documented per the build brief): ``sessionize``
and ``asof_join`` shuffle by the session/join key and sort *within key
groups only* — valid because sessions and as-of semantics are per-key;
there is no global order requirement. Skewed keys concentrate one group's
work; at scale, salt hot keys upstream or bound group size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(ds, *, key_col: str, ts_col: str, gap_seconds: float,
               session_col: str = "session_idx"):
    """Assign each row a per-key session index: a new session starts when
    the gap to the previous event of the SAME key exceeds ``gap_seconds``.
    One groupby shuffle; per-group work is a vectorized sort + cumsum."""
    gap_us = int(gap_seconds * 1_000_000)

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
        g = group.take(order)
        ts = np.asarray(pc.cast(g[ts_col], pa.int64()))
        new = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        return g.append_column(session_col,
                               pa.array(np.cumsum(new) - 1, pa.int64()))

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def session_stats(ds, *, key_col: str, ts_col: str, gap_seconds: float):
    """Sessionize then reduce to one row per (key, session): start/end
    timestamps and event count. The reduction happens inside the same
    per-key group task — no second shuffle."""
    gap_us = int(gap_seconds * 1_000_000)

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
        g = group.take(order)
        ts = np.asarray(pc.cast(g[ts_col], pa.int64()))
        n = len(ts)
        new = np.ones(n, dtype=np.int64)
        if n > 1:
            new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [n]]) - 1
        ts_type = g[ts_col].type
        return pa.table({
            key_col: pa.array([g[key_col][0].as_py()] * len(starts),
                              g[key_col].type),
            "session_idx": pa.array(sid[starts], pa.int64()),
            "session_start": pc.cast(pa.array(ts[starts]), ts_type),
            "session_end": pc.cast(pa.array(ts[ends]), ts_type),
            "n_events": pa.array(ends - starts + 1, pa.int64()),
        })

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def asof_join(left, right, *, on: str, by: str, value_cols: list[str],
              suffix: str = "_right"):
    """Point-in-time join: attach, to each left row, ``value_cols`` from
    the latest right row with ``right.on <= left.on`` within the same
    ``by`` key (nulls when none). ONE shuffle: both sides are tagged and
    co-grouped by key, then a per-group vectorized searchsorted merge —
    the composition (b) pattern for operators Ray Data lacks natively."""
    side_col = "_asof_side"

    l_schema, r_schema = left.schema(), right.schema()
    keep_right = [by, on] + value_cols
    r_types = dict(zip(r_schema.names, r_schema.types))
    l_names = list(l_schema.names)
    out_names = {c: (c + suffix if c in l_names else c) for c in value_cols}

    def tag(side: int, cols: list[str], all_cols: dict[str, pa.DataType]):
        def f(batch: pa.Table) -> pa.Table:
            batch = batch.select([c for c in cols if c in batch.column_names])
            n = batch.num_rows
            for name, typ in all_cols.items():
                if name not in batch.column_names:
                    batch = batch.append_column(name, pa.nulls(n, typ))
            batch = batch.select(sorted(all_cols))
            return batch.append_column(
                side_col, pa.array(np.full(n, side, dtype=np.int8)))
        return f

    unified: dict[str, pa.DataType] = {n: t for n, t in
                                       zip(l_schema.names, l_schema.types)}
    for c in keep_right:
        if c not in (by, on):
            unified[f"_r_{c}"] = r_types[c]

    def tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep_right)
        batch = batch.rename_columns(
            [c if c in (by, on) else f"_r_{c}" for c in keep_right])
        n = batch.num_rows
        for name, typ in unified.items():
            if name not in batch.column_names:
                batch = batch.append_column(name, pa.nulls(n, typ))
        batch = batch.select(sorted(unified))
        return batch.append_column(
            side_col, pa.array(np.full(n, 1, dtype=np.int8)))

    lt = left.map_batches(tag(0, l_names, unified), batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow",
                           zero_copy_batch=True)
    both = lt.union(rt)

    def merge(group: pa.Table) -> pa.Table:
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

    return both.groupby(by).map_groups(merge, batch_format="pyarrow")


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
