"""Deterministic vectorized hashing helpers.

All hashes here must be stable across processes and machines (they key the
CDC shuffle partitioning and the exactly-once file layout), so Python's
salted ``hash()`` is never used. Column hashing uses
``pandas.util.hash_pandas_object`` (fixed-key SipHash, vectorized C);
content fingerprints use hashlib sha256.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash64(series_like) -> np.ndarray:
    """uint64 deterministic hash of an Arrow array / pandas Series."""
    if isinstance(series_like, (pa.Array, pa.ChunkedArray)):
        series_like = series_like.to_pandas()
    return pd.util.hash_pandas_object(series_like, index=False).to_numpy()


def hash64_columns(table: pa.Table, cols: list[str]) -> np.ndarray:
    """Combined uint64 hash of several columns of an Arrow table.

    Combines per-column SipHashes with the boost-style mix so that
    ``hash(a, b)`` differs from ``hash(b, a)`` and from ``hash(a + b)``.
    Used to derive the CDC partition id ``pid = hash64(repo, path) % P``.
    """
    out = np.zeros(len(table), dtype=np.uint64)
    for c in cols:
        h = stable_hash64(table[c])
        # 64-bit variant of boost::hash_combine
        out ^= h + np.uint64(0x9E3779B97F4A7C15) + (out << np.uint64(6)) + (out >> np.uint64(2))
    return out


def sha256_column(arr) -> list[str]:
    """Hex sha256 per string element (None -> None). hashlib releases the
    GIL-heavy work to C; this is the per-row content invariant used by the
    north-rule final-state verification."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_pylist()
    out: list[str | None] = []
    for s in arr:
        if s is None:
            out.append(None)
        else:
            if isinstance(s, str):
                s = s.encode("utf-8")
            out.append(hashlib.sha256(s).hexdigest())
    return out
