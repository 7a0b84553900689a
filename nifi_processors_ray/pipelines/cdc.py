"""CDC flagship pipeline: change-event tail -> exactly-once lake upsert.

Composition of the engine's pieces (north star of BASELINE.json):

    change_stream / read_parquet           (binlog-style tail, epoch slices)
      -> LakeTable.apply_epoch             (combiner + scatter fragment write)
      -> LakeTable.compact / read          (LWW merge-on-read, tombstone drop)
      -> snapshot_hashes                   (per-row sha256(content) invariant)

The reference analog of the whole chain is the example NiFi flow
(ExecuteRuleEngine_Example.xml:18-23): source -> per-record transform ->
route -> sink — re-expressed as streaming Dataset stages.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import sha256_column
from ..state.lake import LakeTable


def ingest_stream(
    lake: LakeTable,
    epochs: list,
    *,
    start_epoch: int = 0,
    batch_size: int | None = None,
    max_in_flight: int = 1,
) -> list[dict]:
    """Apply a sequence of epoch Datasets to the lake, resuming past any
    already-committed epoch (checkpoint-resume contract). ``epochs`` is a
    list of ``ray.data.Dataset`` or zero-arg factories returning one (so a
    resumed run doesn't even build the skipped epoch's pipeline).

    ``max_in_flight > 1`` applies that many epochs CONCURRENTLY (driver
    threads, each owning its own Dataset pipeline). This is correct because
    epochs commit independently and LWW-by-``seq`` makes the final state
    replay-order-independent; it removes the per-epoch pipeline barrier,
    which otherwise caps cluster utilization when a single epoch has fewer
    tasks than cores."""
    import threading

    committed = set(lake.committed_epochs())
    # Dataset CONSTRUCTION must be serialized across threads: Ray's path
    # resolution lazily imports fsspec.implementations.http per read_* call
    # (and with aiohttp absent that import legitimately fails every time);
    # two threads racing it can observe a partially-imported module and die
    # with "cannot import name HTTPFileSystem". Construction is cheap —
    # only execution (inside apply_epoch) needs to overlap.
    build_lock = threading.Lock()

    def apply_one(i_e):
        i, e = i_e
        eid = start_epoch + i
        if eid in committed:
            return lake.apply_epoch(None, eid)  # returns stored manifest
        with build_lock:
            ds = e() if callable(e) else e
        return lake.apply_epoch(ds, eid, batch_size=batch_size)

    if max_in_flight <= 1:
        return [apply_one(ie) for ie in enumerate(epochs)]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_in_flight) as pool:
        return list(pool.map(apply_one, enumerate(epochs)))


def snapshot_hashes(lake: LakeTable):
    """Streaming per-row content fingerprint of the current table state:
    ``(key_cols..., seq, content_sha256)`` — the scale-safe form of the
    north rule's sha256 verification (never materializes content on the
    driver)."""
    key_cols = list(lake.key_cols)
    seq_col = lake.seq_col

    def fingerprint(batch: pa.Table) -> pa.Table:
        out = batch.select([c for c in key_cols + [seq_col] if c in batch.column_names])
        return out.append_column(
            "content_sha256", pa.array(sha256_column(batch["content"]), pa.string())
        )

    # column-pruned merge-on-read: only keys + seq + content leave storage
    src = lake.read(columns=key_cols + [seq_col, "content"])
    return src.map_batches(fingerprint, batch_format="pyarrow",
                           zero_copy_batch=True)


def replay_verify(lake: LakeTable, expected: pa.Table) -> bool:
    """Compare the lake's current state against an independently computed
    snapshot (``sources.changestream.expected_snapshot``) by per-row
    sha256(content) equality on the key. Intended for test scales.
    Arrow-native end to end — no pandas round-trip on the comparison
    surface (dtype-coercion hazard, see functions.tables)."""
    from ..functions.tables import gather_table

    keys = list(lake.key_cols)
    cols = keys + [lake.seq_col, "content_sha256"]
    sort = [(k, "ascending") for k in keys]
    got = gather_table(snapshot_hashes(lake)).select(cols).sort_by(sort)
    exp = expected.select(keys + [lake.seq_col, "content"])
    exp = exp.append_column(
        "content_sha256", pa.array(sha256_column(exp["content"]), pa.string())
    ).select(cols).sort_by(sort)
    if got.num_rows != exp.num_rows:
        return False
    # unify representation (string vs large_string, chunking) before
    # equals — permissive promotion is REQUIRED: default unify_schemas
    # raises ArrowTypeError on exactly the string/large_string divergence
    # this line exists to normalize
    exp = exp.cast(pa.unify_schemas([got.schema, exp.schema],
                                    promote_options="permissive"))
    got = got.cast(exp.schema)
    return got.combine_chunks().equals(exp.combine_chunks())
