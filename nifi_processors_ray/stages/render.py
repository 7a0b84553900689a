"""render_template — the MergeTemplate (O2) analog.

Reference behavior (MergeTemplate.java:216-292): FlowFile attributes whose
keys match a regex filter (default ``.*``, MergeTemplate.java:129,149-155)
are substituted into a Velocity template's ``$name`` / ``${name}``
placeholders (template loaded once in @OnScheduled, ``:167-191``); the
rendered text replaces the content; both ``merged`` and a cloned
``original`` are emitted. Line separators inside attribute values are
removed before substitution (``:253``).

Ray-Data-first re-expression: the template is parsed ONCE (per actor, in
``__init__``) into literal/field segments, and each batch renders with a
single ``pyarrow.compute.binary_join_element_wise`` call — fully vectorized,
no per-row Python. The ``original`` edge needs no clone: the upstream
Dataset is immutable and can simply be consumed again.

Unresolvable placeholders render as the empty string (the reference routes a
template failure to empty content, MergeTemplate.java:267-272; per-row we
degrade to "" instead of failing the batch). Columns whose name does not
match ``attribute_filter`` are invisible to the template.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# $name or ${name} — Velocity-style references (identifier chars only)
_PLACEHOLDER = re.compile(r"\$(?:\{([A-Za-z_][\w.-]*)\}|([A-Za-z_][\w]*))")


def parse_template(template: str) -> list[tuple[str, str]]:
    """-> [('lit', text) | ('field', name), ...]"""
    out: list[tuple[str, str]] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            out.append(("lit", template[pos : m.start()]))
        out.append(("field", m.group(1) or m.group(2)))
        pos = m.end()
    if pos < len(template):
        out.append(("lit", template[pos:]))
    return out


class RenderTemplateStage:
    """``ds.map_batches(RenderTemplateStage(template), batch_format="pyarrow",
    concurrency=N)`` — template compiled once per actor."""

    def __init__(
        self,
        template: str,
        *,
        attribute_filter: str = ".*",
        output_col: str = "content",
        strip_newlines: bool = True,
        keep_input_cols: bool = True,
    ):
        self.segments = parse_template(template)
        self.filter = re.compile(attribute_filter)
        self.output_col = output_col
        self.strip_newlines = strip_newlines
        self.keep_input_cols = keep_input_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        visible = {c for c in batch.column_names if self.filter.fullmatch(c)}
        parts = []
        for kind, val in self.segments:
            if kind == "lit":
                parts.append(pa.scalar(val, pa.string()))
            else:
                if val in visible:
                    col = batch[val]
                    if not pa.types.is_string(col.type) and not pa.types.is_large_string(
                        col.type
                    ):
                        col = pc.cast(col, pa.string())
                    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                    if self.strip_newlines:
                        col = pc.replace_substring(col, "\r", "")
                        col = pc.replace_substring(col, "\n", "")
                    # null attribute -> empty string (degrade, don't fail)
                    parts.append(col.fill_null(""))
                else:
                    parts.append(pa.scalar("", pa.string()))
        if parts:
            rendered = pc.binary_join_element_wise(*parts, "")
        else:
            rendered = pa.nulls(n, pa.string()).fill_null("")
        if isinstance(rendered, pa.Scalar):  # all-literal template
            rendered = pa.array([rendered.as_py()] * n, pa.string())
        if not self.keep_input_cols:
            return pa.table({self.output_col: rendered})
        out = batch
        if self.output_col in out.column_names:
            out = out.set_column(
                out.column_names.index(self.output_col), self.output_col, rendered
            )
        else:
            out = out.append_column(self.output_col, rendered)
        return out
