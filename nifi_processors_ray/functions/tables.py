"""Arrow-native driver-side gathering for SMALL, guarded datasets.

Every call site of :func:`gather_table` is count- and/or byte-guarded: it
exists for the "small side" of a broadcast (candidate pair lists, sampled
training rows, sketch partials) — never for corpus-scale data. The point
of routing them through one helper is dtype fidelity: a
``Dataset.to_pandas()`` round-trip silently coerces Arrow types (the
round-1 user_sessions HUGEINT incident, pipelines/registry.py:80-97), so
blocks are gathered as Arrow refs and concatenated with schema
unification instead — zero pandas anywhere on the path.
"""

from __future__ import annotations

import pyarrow as pa


def gather_table(ds_or_tbl) -> pa.Table:
    """Materialize a (small, guarded) ``ray.data.Dataset`` — or pass a
    ``pyarrow.Table`` through — as one Arrow table, no pandas round-trip."""
    if isinstance(ds_or_tbl, pa.Table):
        return ds_or_tbl
    import ray

    tables = ray.get(ds_or_tbl.to_arrow_refs())
    nonempty = [t.combine_chunks() for t in tables if t.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty, promote_options="default")
    if tables:
        return tables[0]
    sch = ds_or_tbl.schema()
    if sch is None:  # fully-empty materialized dataset
        return pa.table({})
    return pa.schema(list(zip(sch.names, sch.types))).empty_table()
