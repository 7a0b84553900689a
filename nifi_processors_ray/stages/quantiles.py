"""Grouped quantiles, Ray-Data-first — two deliberate operating points:

* ``grouped_quantiles``        — EXACT linear-interpolation quantiles
  (numpy/DuckDB ``quantile_cont`` semantics). One hash-partition shuffle;
  each task sorts its partition once and reads every group's quantiles
  with a segmented gather — no per-group dispatch, no Python rows. A
  group's rows must fit one task (``max_group_rows`` guards loudly): the
  right tool when group cardinality is high relative to group size.
  (Ray's built-in ``aggregate.Quantile`` accumulates each group as a
  Python LIST on the reducer and rounds at 5dp — neither survives a
  100-TB group nor matches SQL.)
* ``grouped_quantiles_sketch`` — APPROXIMATE fixed-bin histogram sketch
  for groups of unbounded size: per-batch partial histograms (``n_bins``
  tiny rows per (group, batch) regardless of data size), one sum-groupby,
  then per-group inverse-CDF interpolation. Error is bounded by one bin
  width of the value range; accuracy pinned in pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .windows import _check_segments, _key_partition, _seg_change


def _q_cols(qs) -> list[str]:
    return [f"p{str(round(q * 100, 4)).rstrip('0').rstrip('.')}" for q in qs]


def grouped_quantiles(ds, *, group_col: str, value_col: str,
                      qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                      max_group_rows: int | None = None,
                      small_bytes: int | None = None):
    """Exact per-group quantiles (linear interpolation on (n-1)*q, the
    numpy default == DuckDB ``quantile_cont``). Nulls are ignored."""
    qs = tuple(qs)
    names = _q_cols(qs)

    def per_partition(g: pa.Table) -> pa.Table:
        g = g.filter(pc.is_valid(g[value_col]))
        if g.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], g.schema.field(group_col).type),
                 **{nm: pa.array([], pa.float64()) for nm in names}})
        order = pc.sort_indices(g, sort_keys=[(group_col, "ascending"),
                                              (value_col, "ascending")])
        t = g.take(order)
        new = _seg_change(t, [group_col])
        _check_segments(new, max_group_rows, "grouped_quantiles")
        vals = np.asarray(pc.cast(t[value_col], pa.float64()))
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(vals)))
        cols = {group_col: t[group_col].take(pa.array(starts))}
        for q, nm in zip(qs, names):
            k = (counts - 1) * q
            f = np.floor(k).astype(np.int64)
            c = np.ceil(k).astype(np.int64)
            lo = vals[starts + f]
            hi = vals[starts + c]
            # lo + (hi-lo)*frac, the same expression form DuckDB's
            # quantile_cont evaluates — algebraically equal alternatives
            # differ in the last ulp, which a 6dp-rounded value-hash
            # oracle can straddle
            cols[nm] = pa.array(
                np.where(f == c, lo, lo + (hi - lo) * (k - f)), pa.float64())
        return pa.table(cols)

    from .similarity import _try_gather_small

    small = _try_gather_small(
        ds, small_bytes) if small_bytes is not None else _try_gather_small(ds)
    if small is not None:
        if group_col not in small.column_names:
            return ds  # zero rows with unrecoverable schema: pass through
        # driver fast path: the partition kernel handles MANY group
        # segments, and _kp is a function of the group — whole-table
        # per_partition equals the union of the per-partition results
        import ray.data as rd

        return rd.from_arrow(per_partition(small))
    return (_key_partition(ds, group_col)
            .groupby("_kp")
            .map_groups(per_partition, batch_format="pyarrow"))


def grouped_quantiles_sketch(ds, *, group_col: str, value_col: str,
                             qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                             n_bins: int = 2048,
                             vmin: float | None = None,
                             vmax: float | None = None):
    """Approximate per-group quantiles via mergeable fixed-bin histograms.

    When ``vmin``/``vmax`` are not given, one cheap streaming aggregate
    pass finds the global value range first (two passes total, nothing
    materialized). The shuffle then carries at most ``n_bins`` tiny
    (group, bin, n) rows per (group, batch) — a group of 10^12 rows costs
    the same as one of 10^3. Error <= ~2 bin widths of (vmax-vmin)/n_bins
    (one from in-bin interpolation, one more when the mass rank straddles
    a bin boundary).
    """
    from ray.data.aggregate import Max, Min

    qs = tuple(qs)
    names = _q_cols(qs)
    if vmin is None or vmax is None:
        rng = ds.aggregate(Min(value_col, alias_name="lo"),
                           Max(value_col, alias_name="hi"))
        vmin = float(rng["lo"]) if vmin is None else vmin
        vmax = float(rng["hi"]) if vmax is None else vmax
    span = max(vmax - vmin, 1e-300)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[value_col]))
        vals = np.asarray(pc.cast(batch[value_col], pa.float64()))
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        enc = pc.dictionary_encode(grp)
        ginv = np.asarray(enc.indices, dtype=np.int64)
        uniq = enc.dictionary
        bins = np.clip(((vals - vmin) / span * n_bins).astype(np.int64),
                       0, n_bins - 1)
        flat = ginv * n_bins + bins
        counts = np.bincount(flat, minlength=len(uniq) * n_bins)
        nz = np.flatnonzero(counts)
        return pa.table({
            group_col: uniq.take(pa.array(nz // n_bins)),
            "_bin": pa.array(nz % n_bins, pa.int64()),
            "_n": pa.array(counts[nz], pa.int64()),
        })

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)

    def finalize(g: pa.Table) -> pa.Table:
        # the per-(group, bin, batch) partials land here directly (no
        # intermediate groupby shuffle): fold duplicate (group, bin) rows
        # with one segmented reduceat, then take quantiles per group
        order = pc.sort_indices(g, sort_keys=[(group_col, "ascending"),
                                              ("_bin", "ascending")])
        t = g.take(order)
        gb_new = _seg_change(t, [group_col, "_bin"])
        gb_starts = np.flatnonzero(gb_new)
        bins = np.asarray(t["_bin"])[gb_starts]
        ns = (np.add.reduceat(np.asarray(t["_n"], dtype=np.float64),
                              gb_starts)
              if len(gb_starts) else np.empty(0))
        new = _seg_change(t, [group_col])[gb_starts]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(bins))
        t = t.take(pa.array(gb_starts))
        cols = {group_col: t[group_col].take(pa.array(starts))}
        res = {nm: np.empty(len(starts)) for nm in names}
        edges = vmin + (np.arange(n_bins + 1) / n_bins) * span
        for i, (s, e) in enumerate(zip(starts, ends)):  # per group: <=
            b, n = bins[s:e], ns[s:e]                   # n_bins tiny rows
            cum = np.cumsum(n)
            total = cum[-1]
            for q, nm in zip(qs, names):
                target = q * total
                j = int(np.searchsorted(cum, target))
                j = min(j, len(b) - 1)
                prev = cum[j] - n[j]
                frac = 0.5 if n[j] == 0 else np.clip(
                    (target - prev) / n[j], 0.0, 1.0)
                lo, hi = edges[b[j]], edges[b[j] + 1]
                res[nm][i] = lo + frac * (hi - lo)
        for nm in names:
            cols[nm] = pa.array(res[nm], pa.float64())
        return pa.table(cols)

    return (_key_partition(hist, group_col)
            .groupby("_kp")
            .map_groups(finalize, batch_format="pyarrow"))
