"""OLAP-style multi-level aggregation stages.

ROLLUP / pivot re-expressed Ray-Data-first: the corpus is shuffled ONCE at
the finest grouping (Ray's hash aggregate already combines per block before
the exchange); every coarser level then re-aggregates the materialized fine
AGGREGATE — group-cardinality-sized, not corpus-sized — so an n-level
rollup costs one wide shuffle plus n tiny ones. The NiFi analog is a fan of
per-level aggregate processors over one upstream stream; here levels share
the fine pass instead of re-reading the input.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["rollup_agg", "pivot_agg"]


def _null_col(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, type=typ)


def rollup_agg(ds, *, group_cols: list[str], value_col: str):
    """SQL ``GROUP BY ROLLUP(group_cols)`` over a Dataset: every prefix
    level of ``group_cols`` (finest -> grand total), each row carrying
    ``sum_<value_col>``, ``n_rows`` and ``grouping_id`` — the standard
    GROUPING() bitmask (bit i set when the i-th group col, MSB-first, is
    aggregated out), which disambiguates rollup NULLs from genuine NULL
    group values exactly like the SQL twin.

    Scale shape: one corpus-wide hash aggregate at the finest level; the
    coarser levels fold the fine aggregate (SUM of sums / SUM of counts —
    algebraic, so re-aggregation is exact). When the fine aggregate fits
    the standard byte budget every coarser level folds in driver-side
    Arrow kernels and the call returns a ``pyarrow.Table`` (one execution
    total); past the budget the levels run as group-cardinality-sized
    distributed shuffles over the materialized fine Dataset."""
    from ray.data.aggregate import Count, Sum

    sum_col = f"sum_{value_col}"
    k = len(group_cols)
    if k == 0:
        raise ValueError("group_cols must be non-empty")

    fine = (ds.groupby(group_cols)
            .aggregate(Sum(value_col, alias_name=sum_col),
                       Count(alias_name="n_rows")))

    from .similarity import _try_gather_small

    small = _try_gather_small(fine)
    # zero-row: fall through so the empty-input shape matches the
    # distributed path (no rollup rows), not a null grand-total row
    if (small is not None and small.num_rows
            and set(group_cols) <= set(small.column_names)):
        types = {c: small.schema.field(c).type for c in group_cols}

        def level_tab(src: pa.Table, level: int) -> pa.Table:
            gid = (1 << level) - 1
            kept = group_cols[: k - level]
            n = src.num_rows
            cols = {c: (src[c] if c in kept else _null_col(n, types[c]))
                    for c in group_cols}
            cols[sum_col] = src[sum_col]
            cols["n_rows"] = src["n_rows"]
            cols["grouping_id"] = pa.array([gid] * n, pa.int64())
            return pa.table(cols)

        pieces = [level_tab(small, 0)]
        for level in range(1, k + 1):
            kept = group_cols[: k - level]
            if kept:
                g = small.group_by(kept).aggregate(
                    [(sum_col, "sum"), ("n_rows", "sum")])
                g = g.rename_columns(
                    [{f"{sum_col}_sum": sum_col,
                      "n_rows_sum": "n_rows"}.get(c, c)
                     for c in g.column_names])
            else:
                import pyarrow.compute as pc

                g = pa.table({
                    sum_col: pa.array([pc.sum(small[sum_col]).as_py()],
                                      small.schema.field(sum_col).type),
                    "n_rows": pa.array([pc.sum(small["n_rows"]).as_py()],
                                       pa.int64()),
                })
            pieces.append(level_tab(g, level))
        return pa.concat_tables(pieces, promote_options="default")

    fine = fine.materialize()
    types = {c: fine.schema().base_schema.field(c).type for c in group_cols}

    def finalize(level: int):
        """level = number of trailing group cols aggregated out."""
        gid = (1 << level) - 1
        kept = group_cols[: k - level]

        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {c: (batch[c] if c in kept else _null_col(n, types[c]))
                    for c in group_cols}
            cols[sum_col] = batch[sum_col]
            cols["n_rows"] = batch["n_rows"]
            cols["grouping_id"] = pa.array([gid] * n, pa.int64())
            return pa.table(cols)

        return f

    pieces = [fine.map_batches(finalize(0), batch_format="pyarrow",
                               zero_copy_batch=True)]
    for level in range(1, k + 1):
        kept = group_cols[: k - level]
        if kept:
            coarse = (fine.groupby(kept)
                      .aggregate(Sum(sum_col, alias_name=sum_col),
                                 Sum("n_rows", alias_name="n_rows")))
        else:
            # grand total: constant key, input is the tiny fine aggregate
            coarse = (fine.map_batches(
                lambda b: b.append_column("_one", pa.array([0] * b.num_rows,
                                                           pa.int8())),
                batch_format="pyarrow", zero_copy_batch=True)
                .groupby("_one")
                .aggregate(Sum(sum_col, alias_name=sum_col),
                           Sum("n_rows", alias_name="n_rows")))
            coarse = coarse.map_batches(
                lambda b: b.drop_columns(["_one"]),
                batch_format="pyarrow", zero_copy_batch=True)
        pieces.append(coarse.map_batches(finalize(level),
                                         batch_format="pyarrow",
                                         zero_copy_batch=True))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def pivot_agg(ds, *, row_col: str, pivot_col: str, value_col: str,
              pivot_values: list):
    """Crosstab: one output row per ``row_col`` value, one
    ``sum_<value_col>_<pv>`` column per pivoted value (missing combos are
    0, the SQL conditional-aggregation convention). ``pivot_values`` is
    explicit — at scale the pivoted domain must be known and small (it
    becomes the schema); discover it upstream with ``distinct`` if needed.

    Scale shape: the per-batch combiner widens rows BEFORE the exchange
    (one row per (row_col, batch) with one column per pivot value), so the
    single shuffle carries the crosstab shape, never the raw events."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    out_cols = {pv: f"sum_{value_col}_{pv}" for pv in pivot_values}

    def widen(batch: pa.Table) -> pa.Table:
        cols = {row_col: batch[row_col]}
        val = pc.cast(batch[value_col], pa.float64())
        for pv, name in out_cols.items():
            mask = pc.equal(batch[pivot_col], pv)
            cols[name] = pc.if_else(mask, val, pa.scalar(0.0, pa.float64()))
        t = pa.table(cols)
        g = t.group_by([row_col]).aggregate(
            [(name, "sum") for name in out_cols.values()])
        return pa.table({row_col: g[row_col],
                         **{name: g[f"{name}_sum"]
                            for name in out_cols.values()}})

    partial = ds.map_batches(widen, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partial.groupby(row_col).aggregate(
        *[Sum(name, alias_name=name) for name in out_cols.values()])
