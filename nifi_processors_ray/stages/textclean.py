"""Text-cleaning stages for training-data pipelines — the scrub/normalize
steps that precede dedup and quality filtering at corpus scale.

All pure Arrow kernels (``pc.utf8_normalize`` + RE2 ``replace_substring_regex``)
inside ``map_batches`` — no Python over rows, nothing stateful. Both DuckDB
and Arrow use RE2 and Unicode normalization, so every stage here has an
exact SQL twin in the registry (full value-hash oracles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# C0 control characters except \t \n \r (which whitespace-collapse handles)
_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
_WS_RE = r"\s+"

# deliberately simple, RE2-portable patterns (same engine in DuckDB)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def _nfc(col):
    """True NFC (canonical composition included). This pyarrow's
    ``utf8_normalize(form="NFC")`` decomposes but does NOT re-compose
    (``e + U+0301`` stays two codepoints; DuckDB's ``nfc_normalize``
    composes to ``é``), so it can't be the oracle twin. Instead: ASCII-only
    rows are NFC by definition and skip everything (the vectorized fast
    path — code corpora are overwhelmingly ASCII); only rows containing
    non-ASCII take a Python ``unicodedata.normalize`` cold path, scattered
    back with ``replace_with_mask``."""
    import unicodedata

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mask = pc.match_substring_regex(col, r"[^\x00-\x7F]").fill_null(False)
    if not pc.any(mask).as_py():
        return col
    flagged = col.filter(mask)
    fixed = pa.array([None if s is None else unicodedata.normalize("NFC", s)
                      for s in flagged.to_pylist()], type=col.type)
    return pc.replace_with_mask(col, mask, fixed)


def normalize_text(batch: pa.Table, *, text_col: str = "text",
                   out_col: str = "text_norm") -> pa.Table:
    """Unicode NFC normalization + control-char strip + whitespace collapse
    + trim. NFC (not NFKC) so the DuckDB twin (``nfc_normalize``) states
    the identical transform."""
    col = _nfc(batch[text_col])
    col = pc.replace_substring_regex(col, _CONTROL_RE, "")
    col = pc.replace_substring_regex(col, _WS_RE, " ")
    col = pc.utf8_trim_whitespace(col)
    return batch.append_column(out_col, col)


def scrub_pii(batch: pa.Table, *, text_col: str = "text",
              out_col: str = "text_scrubbed",
              patterns: list[tuple[str, str]] | None = None) -> pa.Table:
    """Redact PII-looking spans (emails, IPv4s, phone-ish digit runs) with
    typed placeholders. Patterns apply in order (email before phone so a
    numeric local-part can't be half-eaten)."""
    col = batch[text_col]
    for pat, repl in (patterns if patterns is not None else PII_PATTERNS):
        col = pc.replace_substring_regex(col, pat, repl)
    return batch.append_column(out_col, col)


def chunk_text(batch: pa.Table, *, id_col: str = "doc_id",
               text_col: str = "text", size: int = 500,
               overlap: int = 0) -> pa.Table:
    """Split each document into fixed-width overlapping character windows
    — the context-window chunking step that precedes tokenization /
    embedding in a training or RAG pipeline. Chunk ``j`` covers codepoints
    ``[j*stride, j*stride + size)`` with ``stride = size - overlap``; a doc
    of ``L`` chars yields ``max(1, ceil(L / stride))`` chunks (empty docs
    yield one empty chunk, so no row silently disappears).

    Scale shape: a per-batch explode vectorized per chunk ORDINAL — the
    Python loop runs ``max chunks per doc in the batch`` times (bounded by
    longest-doc/stride, not rows), each iteration a zero-copy ``take`` +
    one ``utf8_slice_codeunits`` kernel. Codepoint slicing matches SQL
    ``substring`` semantics exactly, so the registry twin is a full
    value-hash oracle."""
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = text.fill_null("")
    lens = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.maximum((lens + stride - 1) // stride, 1)
    ids = batch[id_col]
    parts = []
    for j in range(int(n.max()) if len(n) else 0):
        idx = pa.array(np.nonzero(n > j)[0])
        parts.append(pa.table({
            id_col: pc.take(ids, idx),
            "chunk_id": pa.array(np.full(len(idx), j, np.int64)),
            "chunk": pc.utf8_slice_codeunits(
                pc.take(text, idx), start=j * stride, stop=j * stride + size),
        }))
    if not parts:
        return pa.table({id_col: ids, "chunk_id": pa.array([], pa.int64()),
                         "chunk": pa.array([], pa.string())})
    return pa.concat_tables(parts)


# markup stripping (web-corpus text extraction): order matters — script/
# style bodies go first (their content is not text), then comments, then
# tags, then the few entities that matter for plain text, then whitespace
_MARKUP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
]
_ENTITY_STEPS: list[tuple[str, str]] = [
    (r"&lt;", "<"), (r"&gt;", ">"), (r"&quot;", "\""),
    (r"&#39;", "'"), (r"&nbsp;", " "), (r"&amp;", "&"),
]


def strip_markup(batch: pa.Table, *, text_col: str = "text",
                 out_col: str = "text_plain") -> pa.Table:
    """HTML/XML -> plain text: drop script/style bodies and comments,
    strip tags, decode the common entities, collapse whitespace — the
    standard web-corpus text-extraction step, as chained RE2 kernels with
    an exact DuckDB twin (same engine, same patterns). Not a full HTML5
    parser (malformed markup degrades gracefully to tag-stripping), which
    matches what regexp-based SQL extraction can state."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = col.fill_null("")
    for pat, rep in _MARKUP_STEPS:
        out = pc.replace_substring_regex(out, pat, rep)
    for pat, rep in _ENTITY_STEPS:
        out = pc.replace_substring_regex(out, pat, rep)
    out = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(out, _WS_RE, " "))
    return batch.append_column(out_col, out)
