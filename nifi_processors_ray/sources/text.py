"""Line-oriented delimited-text sources — the reference's native input.

The example NiFi flow reads CSV/TSV files line-by-line
(GetFile -> SplitText -> per-row processors, ExecuteRuleEngine_Example.xml:18-23;
line iteration at ExecuteRuleEngine.java:407-414, header capture :417-435).
Ray-Data-first re-expression: ``ray.data.read_text`` streams lines as a
``text`` column; parsing is the vectorized ``split_fields`` stage; a header
line (or explicit ``field_names``, the `Field Names` property analog,
ExecuteRuleEngine.java:197-202) names the columns.

Scale note: ``read_text`` parallelizes by file and splits large files into
blocks, so a directory of shard files streams with per-file parallelism —
the SplitText pre-chunking advice from the reference docs is subsumed by
block splitting.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.split_fields import split_fields


def read_delimited_text(
    paths,
    *,
    separator: str = ";",
    field_names: list[str] | None = None,
    header: bool = False,
    num_fields: int | None = None,
    prefix: str = "column_",
    keep_line: bool = False,
):
    """Read delimited text file(s) into a Dataset of typed string columns.

    ``header=True``: the first line of the FIRST file names the columns
    (read driver-side — one small read, the rest streams). Otherwise
    ``field_names`` names them, or positional ``column_0000...`` names are
    generated (the SplitToAttribute default, SplitToAttribute.java:90-96).

    Header removal is by value (any line equal to the header is dropped) —
    ``read_text`` has no per-file line numbers; a data row that exactly
    equals the header line would also be dropped.
    """
    import ray.data as rd

    names = field_names
    skip_first: str | None = None
    if header and names is None:
        first_path = paths[0] if isinstance(paths, (list, tuple)) else paths
        with open(first_path, "r", encoding="utf-8") as f:
            head = f.readline().rstrip("\r\n")
        names = head.split(separator)
        skip_first = head

    if names is not None and num_fields is None:
        num_fields = len(names)

    ds = rd.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        t = batch
        if skip_first is not None:
            import pyarrow.compute as pc

            t = t.filter(pc.not_equal(t["text"], skip_first))
        out = split_fields(t, content_col="text", separator=separator,
                           prefix=prefix, num_fields=num_fields,
                           keep_content=keep_line)
        if names is not None:
            gen = [f"{prefix}{i:04d}" for i in range(len(names))]
            mapping = dict(zip(gen, names))
            out = out.rename_columns(
                [mapping.get(c, c) for c in out.column_names])
        return out

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
