"""split_fields — the SplitToAttribute (O1) analog.

Reference behavior (SplitToAttribute.java:144-210): one CSV line of FlowFile
content is split on a separator and each positional field is emitted as an
attribute named ``prefix + DecimalFormat(index)`` (default ``column_0000``),
with line separators stripped from values (SplitToAttribute.java:188).

Ray-Data-first re-expression: the content is a string column; the split is a
single vectorized ``pyarrow.compute.split_pattern`` producing a list array,
and each positional element becomes a real typed column. Deviations from the
reference, pinned deliberately (SURVEY.md §2.3):

* separators are LITERAL strings by default (the reference's
  ``String.split`` regex semantics are an accident of the Java API);
  inputs that relied on them opt in with ``separator_is_regex=True``
  (RE2 syntax via ``pc.split_pattern_regex`` — SplitToAttribute.java:177);
* blank fields become NULL columns instead of being silently skipped (the
  reference's skip leaks stale attributes across rows);
* trailing empty fields are preserved.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def field_name(prefix: str, index: int, width: int = 4) -> str:
    """``prefix + zero-padded index`` — DecimalFormat('0000') analog
    (SplitToAttribute.java:96,191)."""
    return f"{prefix}{index:0{width}d}"


def split_fields(
    batch: pa.Table,
    *,
    content_col: str = "content",
    separator: str = ";",
    prefix: str = "column_",
    width: int = 4,
    num_fields: int | None = None,
    blank_is_null: bool = True,
    strip_newlines: bool = True,
    keep_content: bool = False,
    separator_is_regex: bool = False,
) -> pa.Table:
    """Split ``content_col`` into positional columns ``prefix0000..``.

    ``num_fields``: fixed output arity (rows with fewer fields get nulls,
    extra fields are ignored). When None, the arity is the max field count
    observed in this batch — fine for homogeneous inputs; pass it explicitly
    for schema stability across batches.
    """
    content = batch[content_col]
    if strip_newlines:
        content = pc.replace_substring(content, "\r", "")
        content = pc.replace_substring(content, "\n", "")
    if separator_is_regex:
        parts = pc.split_pattern_regex(content, separator)
    else:
        parts = pc.split_pattern(content, separator)
    if num_fields is None:
        n = pc.max(pc.list_value_length(parts)).as_py() or 0
    else:
        n = num_fields

    out = batch if keep_content else batch.drop_columns([content_col])
    for i in range(n):
        col = pc.list_flatten(pc.list_slice(parts, i, i + 1, return_fixed_size_list=True))
        if blank_is_null:
            col = pc.if_else(pc.equal(col, ""), pa.scalar(None, pa.string()), col)
        out = out.append_column(field_name(prefix, i, width), col)
    return out


class SplitFieldsStage:
    """Callable-class form for ``ds.map_batches(SplitFieldsStage(...), ...)``
    with a frozen arity, so every batch yields the same schema."""

    def __init__(self, **kwargs):
        if kwargs.get("num_fields") is None:
            raise ValueError("SplitFieldsStage requires num_fields for schema stability")
        self.kwargs = kwargs

    def __call__(self, batch: pa.Table) -> pa.Table:
        return split_fields(batch, **self.kwargs)
