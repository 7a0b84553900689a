"""Small per-record operators rounding out the reference's transform set.

* ``join_fields``     — fields -> separator-joined line (the inverse of
  split_fields; ExecuteRuleEngine.java:975-992 ``getResultRow`` + header
  prepend ``:641-650``).
* ``normalize_values``— strip line separators / trim inside value columns
  (SplitToAttribute.java:188, MergeTemplate.java:253).
* ``extract_json_field`` — pull a scalar field out of a JSON-string column
  (the NiFi EvaluateJsonPath analog for flat props), vectorized regex.
* ``add_arity_route`` — quarantine routing for malformed delimited rows:
  rows whose field count != expected get route='quarantine'
  (reference analog: per-row failure relationship,
  ExecuteRuleEngine.java:559-564 — errors never abort the batch).
* ``deterministic_sample`` — reproducible sampling by a key predicate
  (``key % m < k``), the shuffle-free sampling idiom for huge tables.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def join_fields(batch: pa.Table, cols: list[str], *, separator: str = ";",
                output_col: str = "content", keep_inputs: bool = False,
                null_as: str = "") -> pa.Table:
    parts = []
    for c in cols:
        col = batch[c]
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(col.fill_null(null_as))
    line = pc.binary_join_element_wise(*parts, separator)
    if keep_inputs:
        return batch.append_column(output_col, line)
    out = batch.drop_columns([c for c in cols if c in batch.column_names])
    return out.append_column(output_col, line)


def header_line(cols: list[str], separator: str = ";") -> str:
    """The header row the reference prepends to result content
    (ExecuteRuleEngine.java:641-650)."""
    return separator.join(cols)


def normalize_values(batch: pa.Table, cols: list[str] | None = None, *,
                     strip_newlines: bool = True, trim: bool = False) -> pa.Table:
    for c in cols or batch.column_names:
        col = batch[c]
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            continue
        if strip_newlines:
            col = pc.replace_substring(col, "\r", "")
            col = pc.replace_substring(col, "\n", "")
        if trim:
            col = pc.utf8_trim_whitespace(col)
        batch = batch.set_column(batch.column_names.index(c), c, col)
    return batch


def extract_json_field(batch: pa.Table, json_col: str, field: str, *,
                       out_col: str | None = None,
                       out_type: pa.DataType | None = None) -> pa.Table:
    """Extract ``"field": <scalar>`` from a flat JSON-object string column.
    Handles number / quoted-string values; absent field -> null. For nested
    JSON use a real parser inside an actor stage — this is the vectorized
    fast path for flat props columns."""
    # two passes: quoted-string form, then bare-number form (RE2 alternation
    # can't signal which branch matched — non-participating groups extract
    # as "" rather than null)
    s = pc.struct_field(
        pc.extract_regex(batch[json_col], f'"{field}"\\s*:\\s*"(?P<v>[^"]*)"'),
        "v",
    )
    n = pc.struct_field(
        pc.extract_regex(batch[json_col],
                         f'"{field}"\\s*:\\s*(?P<v>-?[0-9][0-9.eE+-]*)'),
        "v",
    )
    val = pc.if_else(pc.is_valid(s), s, n)
    if out_type is not None:
        val = pc.cast(val, out_type)
    return batch.append_column(out_col or field, val)


def add_arity_route(batch: pa.Table, content_col: str, separator: str,
                    expected_fields: int, *, route_col: str = "route") -> pa.Table:
    """route = 'success' where the delimited line has exactly
    ``expected_fields`` fields (and is non-null), else 'quarantine'."""
    content = batch[content_col]
    n_fields = pc.add(
        pc.count_substring(content, separator), pa.scalar(1, pa.int32())
    )
    ok = pc.and_kleene(
        pc.is_valid(content), pc.equal(n_fields, expected_fields)
    )
    route = pc.if_else(ok.fill_null(False), pa.scalar("success"),
                       pa.scalar("quarantine"))
    return batch.append_column(route_col, route)


def deterministic_sample(batch: pa.Table, key_col: str, *, modulus: int = 20,
                         keep: int = 1) -> pa.Table:
    """Keep rows where ``key % modulus < keep`` — reproducible, shuffle-free
    sampling that any SQL oracle can mirror exactly."""
    import numpy as np

    k = np.asarray(pc.cast(batch[key_col], pa.int64()))
    return batch.filter(pa.array((k % modulus) < keep))


def stratified_sample(ds, *, group_col: str, id_col: str, n: int,
                      hash_mult: int = 2654435761, hash_mod: int = 1 << 32):
    """Deterministic fixed-quota per-group sample: keep the ``n`` rows of
    each group whose Knuth multiplicative hash of ``id_col`` is smallest —
    a reproducible stratified sample (per-language / per-source quotas for
    a training-data mix) with an exact SQL twin::

        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY group ORDER BY (id * 2654435761) % 4294967296, id
        ) <= n

    Scale: composed on ``topk_per_group`` — the per-batch combiner keeps
    <= n rows per (group, batch), so the shuffle never ships a group's full
    membership; int64 ids up to ~3.4e9 multiply without overflow."""
    import numpy as np

    from .windows import topk_per_group

    def add_h(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch[id_col], pa.int64()))
        h = (ids * np.int64(hash_mult)) % np.int64(hash_mod)
        return batch.append_column("_ss_h", pa.array(h))

    tagged = ds.map_batches(add_h, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = topk_per_group(tagged, group_col=group_col, order_col="_ss_h",
                         k=n, descending=False, tiebreak_col=id_col)
    return out.map_batches(lambda b: b.drop_columns(["_ss_h"]),
                           batch_format="pyarrow", zero_copy_batch=True)
