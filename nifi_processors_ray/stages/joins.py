"""Join strategies, Ray-Data-first.

* ``broadcast_lookup`` — small dimension side shipped once via ``ray.put``,
  looked up per batch (no shuffle). The right answer whenever one side fits
  in a worker's heap; at 100 TB that's dimension tables, vocabularies,
  blocklists.
* ``bucket_join`` — both sides large: tag + union the two datasets, ONE
  hash shuffle on ``bucket = hash(key) % B``, then a pyarrow hash join per
  bucket inside ``map_groups``. This is the portable partitioned hash join;
  Ray's built-in ``Dataset.join`` is also supported by callers — at sandbox
  scales this variant avoids its per-aggregator actor startup cost.

Skew note: a hot join key concentrates one bucket; pick B well above the
worker count and salt known-hot keys into ``bucket + hash(salt_col)`` at
the call site (the CDC lake's delta writer shows the same pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64

_SIDE_COL = "_join_side"
_BUCKET_COL = "_join_bucket"

#: default byte budget for a broadcast side: it must fit comfortably in a
#: worker heap next to the batch being processed
DEFAULT_BROADCAST_BUDGET = 256 * 1024 * 1024


def check_broadcast_budget(nbytes: int, *, what: str = "lookup table",
                           max_broadcast_bytes: int = DEFAULT_BROADCAST_BUDGET
                           ) -> bool:
    """-> True if ``nbytes`` fits the broadcast budget; False otherwise.
    Callers fall back to ``bucket_join`` (or Ray's hash join) when it
    doesn't — broadcasting an unbounded dimension side is how 'small side'
    joins melt at 100 TB."""
    return nbytes <= max_broadcast_bytes


def parquet_projected_bytes(path: str, columns: list[str] | None = None) -> int:
    """Uncompressed byte estimate of a parquet projection, from metadata
    only (no data read) — the cheap input to ``check_broadcast_budget``."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    want = set(columns) if columns is not None else None
    total = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema.split(".")[0]
            if want is None or name in want:
                total += c.total_uncompressed_size
    return total


def broadcast_lookup(ds, lookup_ref, key_col: str, value_cols: dict[str, str]):
    """Attach columns from a broadcast (sorted-key) lookup table.

    ``lookup_ref``: ``ray.put((sorted_keys: np.ndarray, {out_name: values
    np.ndarray}))``; rows whose key is absent get nulls (left join).
    The caller sizes the lookup against ``check_broadcast_budget`` before
    ``ray.put`` and switches to ``bucket_join`` when it doesn't fit.
    """
    import ray

    class Attach:
        def __init__(self):
            self.keys, self.values = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = np.asarray(batch[key_col])
            idx = np.searchsorted(self.keys, k)
            idx_c = np.clip(idx, 0, len(self.keys) - 1)
            hit = self.keys[idx_c] == k
            for out_name, src in value_cols.items():
                vals = self.values[src][idx_c]
                # numeric/bool numpy gathers convert zero-copy; only object
                # dtype (strings) needs the Python-list path
                arr = (pa.array(vals) if vals.dtype != object
                       else pa.array(vals.tolist()))
                if not hit.all():
                    arr = pc.if_else(pa.array(hit), arr, pa.scalar(None, arr.type))
                batch = batch.append_column(out_name, arr)
            return batch

    from ..functions.scale import cluster_cpus

    return ds.map_batches(Attach, batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=(1, max(2, cluster_cpus())),
                          max_restarts=0)


def bucket_join(
    left,
    right,
    *,
    left_on: str,
    right_on: str,
    num_buckets: int | None = None,
    join_type: str = "inner",
):
    """Partitioned hash join of two Datasets: one shuffle, per-bucket
    ``pyarrow.Table.join``. Column-name collisions (other than the keys)
    must be resolved by the caller beforehand. ``num_buckets`` defaults to
    a cluster-sized count (functions.scale)."""
    from ..functions.scale import default_partitions

    num_buckets = default_partitions(num_buckets, 32)

    l_schema, r_schema = left.schema(), right.schema()
    left_names = list(l_schema.names)
    right_names = list(r_schema.names)
    all_fields = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    for n, t in zip(r_schema.names, r_schema.types):
        all_fields.setdefault(n, t)
    ordered = sorted(all_fields)

    def tag(side: int, key: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            # null-pad to the unified schema so union() sees one layout
            for name in ordered:
                if name not in batch.column_names:
                    batch = batch.append_column(
                        name, pa.nulls(n, all_fields[name])
                    )
            batch = batch.select(ordered)
            h = stable_hash64(batch[key]) % np.uint64(num_buckets)
            batch = batch.append_column(_BUCKET_COL, pa.array(h.astype(np.int64)))
            return batch.append_column(
                _SIDE_COL, pa.array(np.full(n, side, dtype=np.int8))
            )

        return f

    lt = left.map_batches(tag(0, left_on), batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.map_batches(tag(1, right_on), batch_format="pyarrow",
                           zero_copy_batch=True)
    both = lt.union(rt)

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group[_SIDE_COL]
        l_mask = pc.equal(side, 0)
        lt_ = group.filter(l_mask).select(left_names)
        rt_ = group.filter(pc.invert(l_mask)).select(right_names)
        return lt_.join(rt_, keys=[left_on], right_keys=[right_on],
                        join_type=join_type)

    return both.groupby(_BUCKET_COL).map_groups(join_bucket,
                                                batch_format="pyarrow")


def broadcast_membership_filter(ds, keys_ref, key_col: str, *,
                                mode: str = "semi", concurrency=None):
    """Semi/anti join against a broadcast key set: ``keys_ref =
    ray.put(np.sort(keys))`` ships ONCE via the object store; each batch
    tests membership with one searchsorted — the no-shuffle form of
    ``WHERE key [NOT] IN (SELECT ...)`` for blocklists / allowlists /
    decontamination id sets. ``mode='semi'`` keeps members, ``'anti'``
    drops them. The caller byte-budgets the key set with
    ``check_broadcast_budget`` and falls back to ``bucket_join`` when the
    set is no longer 'small'."""
    import ray

    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")

    class Member:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = np.asarray(batch[key_col])
            if len(self.keys):
                idx = np.clip(np.searchsorted(self.keys, k), 0,
                              len(self.keys) - 1)
                hit = self.keys[idx] == k
            else:
                hit = np.zeros(len(k), dtype=bool)
            keep = hit if mode == "semi" else ~hit
            return batch.filter(pa.array(keep))

    if concurrency is None:
        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4))))
    return ds.map_batches(Member, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency,
                          max_restarts=0)
