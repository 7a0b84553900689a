"""Distributed sketches — bounded-memory approximations whose partials
merge associatively, so the shuffle carries a fixed-size sketch per batch
instead of the data.

* ``approx_distinct`` — HyperLogLog cardinality: each batch reduces to an
  ``m``-register sketch (vectorized: hash -> register index from the top
  ``p`` bits, rank = leading-zero count of the rest); partial sketches
  merge with a per-register MAX groupby; the driver applies the standard
  HLL estimator (with the small-range linear-counting correction) to the
  final ``m`` rows. Shuffle volume: ``m`` tiny rows per batch, independent
  of data size — the 100-TB shape for COUNT(DISTINCT).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64
from ..functions.tables import gather_table


def _hll_partial(batch: pa.Table, col: str, p: int) -> pa.Table:
    """One batch -> (register, rank) partial sketch (registers with rank 0
    omitted — the merge treats absence as 0)."""
    values = batch[col]
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    h = stable_hash64(values)
    m = 1 << p
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    # rank = leading zeros of `rest` + 1, capped at 64 - p + 1
    rank = np.ones(len(h), dtype=np.int64)
    probe = rest
    for shift in (32, 16, 8, 4, 2, 1):
        top = probe >> np.uint64(64 - shift)
        is_zero = top == 0
        rank += np.where(is_zero, shift, 0)
        probe = np.where(is_zero, probe << np.uint64(shift), probe)
    rank = np.minimum(rank, 64 - p + 1)
    # per-register max within the batch (lexsort keep-last)
    order = np.lexsort((rank, reg))
    r, k = reg[order], rank[order]
    last = np.ones(len(r), dtype=bool)
    last[:-1] = r[1:] != r[:-1]
    return pa.table({"register": pa.array(r[last]),
                     "rank": pa.array(k[last])})


def approx_distinct(ds, col: str, *, p: int = 12,
                    small_bytes: int | None = None) -> float:
    """Approximate COUNT(DISTINCT col) via HyperLogLog with ``m = 2^p``
    registers (standard error ~= 1.04/sqrt(m); ~1.6% at the default
    p=12). Returns the corrected estimate as a float.

    The per-batch partials are summary-sized (<= m rows each); under the
    standard 64 MB byte guard they merge on the driver with a vectorized
    per-register max instead of paying a Ray sort-shuffle for kilobytes.
    Past the guard the distributed groupby merge runs unchanged."""
    from ray.data.aggregate import Max

    from .similarity import _try_gather_small

    m = 1 << p
    partials = ds.map_batches(lambda b: _hll_partial(b, col, p),
                              batch_format="pyarrow", zero_copy_batch=True)
    small = _try_gather_small(
        partials, (64 << 20) if small_bytes is None else small_bytes)
    regs = np.zeros(m, dtype=np.int64)
    if small is not None:
        if small.num_rows:
            np.maximum.at(regs, np.asarray(small["register"], np.int64),
                          np.asarray(small["rank"], np.int64))
    else:
        merged = gather_table(
            partials.groupby("register")
            .aggregate(Max("rank", alias_name="rank"))
        )
        regs[np.asarray(merged["register"])] = np.asarray(merged["rank"])
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for the small range
    return float(est)


def approx_heavy_hitters(ds, col: str, *, k: int = 20,
                         capacity: int | None = None,
                         small_bytes: int | None = None):
    """Approximate top-k frequent values (Misra-Gries / space-saving
    family): each batch reduces to at most ``capacity`` (value,
    deficient-count) rows — exact batch counts minus the (capacity+1)-th
    count, the standard Misra-Gries reduction — so per-item undercount
    after the merge is bounded by N/(capacity+1) while the shuffle carries
    a fixed-size summary per batch regardless of how many distinct values
    a batch holds (the bound ``token_frequencies`` lacks on heavy-tailed
    columns). Merge = Sum groupby on the value; returns the top ``k`` by
    estimated (lower-bound) count, deterministic (count desc, value asc).

    A value with true frequency > N/(capacity+1) is GUARANTEED to survive
    into the merged summary; accuracy pinned in tests/test_sketches.py.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    cap = capacity or 8 * k

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vc = pc.value_counts(vals)
        counts = np.asarray(vc.field("counts"), dtype=np.int64)
        if len(counts) > cap:
            order = np.argsort(-counts, kind="stable")
            thresh = counts[order[cap]]
            keep = order[:cap]
            adj = counts[keep] - thresh
            pos = adj > 0
            return pa.table({col: vc.field("values").take(pa.array(keep[pos])),
                             "_n": pa.array(adj[pos])})
        return pa.table({col: vc.field("values"), "_n": pa.array(counts)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    # Partials are <= `cap` rows per batch — summary-sized. Merge on the
    # driver under the standard byte guard (Arrow hash-groupby sum), with
    # the distributed sort-shuffle groupby kept as the over-budget path.
    from .similarity import _try_gather_small

    small = _try_gather_small(
        partials, (64 << 20) if small_bytes is None else small_bytes)
    if small is not None:
        agg = pa.TableGroupBy(small, col).aggregate([("_n", "sum")])
        merged_t = pa.table({col: agg[col],
                             "est_count": agg["_n_sum"].cast(pa.int64())})
        order = pc.sort_indices(
            merged_t, sort_keys=[("est_count", "descending"),
                                 (col, "ascending")])
        return merged_t.take(order[:k])

    merged = partials.groupby(col).aggregate(
        Sum("_n", alias_name="est_count"))
    return merged.sort(["est_count", col],
                       descending=[True, False]).limit(k)
