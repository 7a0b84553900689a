"""generate_rows — the GenerateData (O4) analog.

Reference behavior (GenerateData.java:180-233): a source processor (input
forbidden) generating N separator-joined CSV rows per trigger from a
"rowlayout" spec whose fields draw from word-list category files, regex
patterns, or pure random values (datagenerator library; docs
``GenerateData/additionalDetails.html``), plus random dates between
min/max year (GenerateData.java:118-132).

Ray-Data-first re-expression: a declarative field-spec list compiled into a
counter-based deterministic generator (same splitmix64 construction as the
change stream — identical output for any block partitioning), run as
``ray.data.range(n) -> map_batches``. Same seed => identical rows, which the
reference never guaranteed; determinism is what makes our fixtures and
exactly-once tests possible.

Field spec::

    {"name": "city",   "kind": "wordlist", "words": ["Berlin", "Paris", ...]}
    {"name": "code",   "kind": "pattern",  "pattern": "[A-Z]{3}[0-9]{2}"}
    {"name": "token",  "kind": "random",   "length": 8}
    {"name": "date",   "kind": "date",     "min_year": 2000, "max_year": 2099}
    {"name": "id",     "kind": "sequence"}

``pattern`` supports the subset the reference's datagenerator used in
practice: literal chars plus character classes ``[A-Z] [a-z] [0-9]`` with an
optional ``{n}`` repeat.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .changestream import _rand_u64

_CLASS = {"A-Z": "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
          "a-z": "abcdefghijklmnopqrstuvwxyz",
          "0-9": "0123456789"}
_PATTERN_TOKEN = re.compile(r"\[([A-Za-z0-9]-[A-Za-z0-9])\](?:\{(\d+)\})?|(.)")
_RANDOM_ALPHABET = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))

_DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _expand_pattern(pattern: str) -> list[str | None | str]:
    """-> list of per-char alphabets (str) or literal chars wrapped as
    1-char alphabets."""
    slots: list[str] = []
    for m in _PATTERN_TOKEN.finditer(pattern):
        if m.group(1):
            alpha = _CLASS.get(m.group(1))
            if alpha is None:
                raise ValueError(f"unsupported class [{m.group(1)}]")
            repeat = int(m.group(2) or 1)
            slots.extend([alpha] * repeat)
        else:
            slots.append(m.group(3))
    return slots


class RowLayout:
    def __init__(self, fields: list[dict], *, seed: int = 42):
        self.fields = fields
        self.seed = seed
        for f in fields:
            if f["kind"] == "pattern":
                f["_slots"] = _expand_pattern(f["pattern"])

    def generate(self, start: int, count: int) -> pa.Table:
        idx = np.arange(start, start + count, dtype=np.int64)
        cols: dict[str, pa.Array] = {}
        for fi, f in enumerate(self.fields):
            stream_base = (fi + 1) * 1000
            kind = f["kind"]
            if kind == "sequence":
                cols[f["name"]] = pa.array(idx)
            elif kind == "wordlist":
                words = np.asarray(f["words"])
                pick = _rand_u64(idx, self.seed, stream_base) % np.uint64(len(words))
                cols[f["name"]] = pa.array(words[pick.astype(np.int64)].tolist(),
                                           pa.string())
            elif kind == "pattern":
                slots = f["_slots"]
                chars = []
                for si, alpha in enumerate(slots):
                    if len(alpha) == 1:
                        chars.append(np.full(count, alpha, dtype=f"U1"))
                    else:
                        a = np.array(list(alpha))
                        pick = _rand_u64(idx, self.seed, stream_base + si) % np.uint64(
                            len(a)
                        )
                        chars.append(a[pick.astype(np.int64)])
                joined = chars[0]
                for c in chars[1:]:
                    joined = np.char.add(joined, c)
                cols[f["name"]] = pa.array(joined.tolist(), pa.string())
            elif kind == "random":
                length = int(f.get("length", 8))
                chars = []
                for si in range(length):
                    pick = _rand_u64(idx, self.seed, stream_base + si) % np.uint64(
                        len(_RANDOM_ALPHABET)
                    )
                    chars.append(_RANDOM_ALPHABET[pick.astype(np.int64)])
                joined = chars[0]
                for c in chars[1:]:
                    joined = np.char.add(joined, c)
                cols[f["name"]] = pa.array(joined.tolist(), pa.string())
            elif kind == "date":
                y0 = int(f.get("min_year", 2000))
                y1 = int(f.get("max_year", 2099))
                year = y0 + (_rand_u64(idx, self.seed, stream_base) %
                             np.uint64(y1 - y0 + 1)).astype(np.int64)
                month = 1 + (_rand_u64(idx, self.seed, stream_base + 1) %
                             np.uint64(12)).astype(np.int64)
                dmax = np.array(_DAYS_IN_MONTH)[month - 1]
                day = 1 + (_rand_u64(idx, self.seed, stream_base + 2).astype(np.int64)
                           % dmax)
                vals = [f"{y:04d}-{m:02d}-{d:02d}" for y, m, d in
                        zip(year.tolist(), month.tolist(), day.tolist())]
                cols[f["name"]] = pa.array(vals, pa.string())
            else:
                raise ValueError(f"unknown field kind {kind}")
        return pa.table(cols)

    def as_csv_rows(self, table: pa.Table, separator: str = ";") -> pa.Array:
        """Fields -> one separator-joined content line per row — the
        reference's output form (GenerateData.java:197-216) and the inverse
        of split_fields (ExecuteRuleEngine.java:975-992 getResultRow)."""
        parts = []
        for c in table.column_names:
            col = table[c]
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            parts.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        return pc.binary_join_element_wise(*parts, separator)


def generate_rows(n: int, fields: list[dict], *, seed: int = 42,
                  num_blocks: int | None = None, as_content: bool = False,
                  separator: str = ";"):
    """Deterministic source Dataset of ``n`` rows from a rowlayout spec."""
    import ray.data as rd

    layout = RowLayout(fields, seed=seed)
    kwargs = {"override_num_blocks": num_blocks} if num_blocks else {}

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"]
        lo = pc.min(ids).as_py()
        n_b = len(ids)
        assert pc.max(ids).as_py() - lo + 1 == n_b, "non-contiguous range block"
        tbl = layout.generate(lo, n_b)
        if as_content:
            return pa.table({"content": layout.as_csv_rows(tbl, separator)})
        return tbl

    return rd.range(n, **kwargs).map_batches(gen, batch_format="pyarrow",
                                             zero_copy_batch=True)


def load_rowlayout(xml_path: str, *, wordlists_dir: str | None = None,
                   min_year: int | None = None,
                   max_year: int | None = None) -> list[dict]:
    """Parse a datagenerator rowlayout XML + ``.category`` word-list files
    into the field-spec list ``generate_rows`` consumes.

    The reference points its DataCreator at a rowlayout XML and a folder of
    ``*.category`` files (one word per line; GenerateData.java:163-175,
    docs ``GenerateData/additionalDetails.html``). Field elements are
    mapped by their ``type`` attribute:

    * ``category`` / ``wordlist`` — words loaded from
      ``<wordlists_dir>/<category>.category``;
    * ``regularexpression`` / ``regex`` / ``pattern`` — the ``pattern``
      attribute (same subset as the ``pattern`` kind);
    * ``random`` — pure random token (``length`` attr, default 8);
    * ``datetime`` / ``date`` — random date; ``min_year``/``max_year``
      arguments mirror the processor's Minimum/Maximum Year properties
      (GenerateData.java:118-132) and fall back to per-field attributes;
    * ``sequence`` — monotonically increasing id.

    Unknown types raise (loudly, at load time)."""
    import os
    import xml.etree.ElementTree as ET

    root = ET.parse(xml_path).getroot()
    fields: list[dict] = []
    for i, el in enumerate(root.iter("field")):
        ftype = (el.get("type") or "").strip().lower()
        name = el.get("name") or el.get("id") or f"field_{i}"
        if ftype in ("category", "wordlist"):
            category = el.get("category") or name
            if wordlists_dir is None:
                raise ValueError(
                    f"field {name!r} needs a word list but no wordlists_dir "
                    "was given")
            path = os.path.join(wordlists_dir, f"{category}.category")
            with open(path, encoding="utf-8") as f:
                words = [w.strip() for w in f if w.strip()]
            if not words:
                raise ValueError(f"empty category file: {path}")
            fields.append({"name": name, "kind": "wordlist", "words": words})
        elif ftype in ("regularexpression", "regex", "pattern"):
            fields.append({"name": name, "kind": "pattern",
                           "pattern": el.get("pattern") or el.text or ""})
        elif ftype == "random":
            fields.append({"name": name, "kind": "random",
                           "length": int(el.get("length") or 8)})
        elif ftype in ("datetime", "date"):
            fields.append({
                "name": name, "kind": "date",
                "min_year": int(min_year if min_year is not None
                                else el.get("min_year") or 2000),
                "max_year": int(max_year if max_year is not None
                                else el.get("max_year") or 2099),
            })
        elif ftype == "sequence":
            fields.append({"name": name, "kind": "sequence"})
        else:
            raise ValueError(
                f"unsupported rowlayout field type {ftype!r} (field {name!r})")
    if not fields:
        raise ValueError(f"no <field> elements found in {xml_path!r}")
    return fields
