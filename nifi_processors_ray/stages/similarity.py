"""Similarity search over an embedding column (``list<float>``).

* ``BruteForceTopK`` — exact cosine top-k per batch against a broadcast
  query matrix (the baseline): each task computes one numpy matmul per
  batch, emits only (query_id, vec_id, score) partials; a tiny driver-side
  merge keeps the global top-k. The query matrix rides the object store via
  ``ray.put`` — shipped once per node, not per batch.
* ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH buckets both
  sides, searches only matching buckets (with multi-probe by flipping one
  bit), so each query scans ~corpus/2^bits instead of everything.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tables import gather_table


def _to_matrix(col) -> np.ndarray:
    """list<float> Arrow column -> (n, d) float64 matrix (zero-copy where
    the list array is non-ragged)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.values, dtype=np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def _pack_vecs(m: np.ndarray) -> pa.Array:
    """(n, d) float64 -> fixed_size_binary(8*d) Arrow array. Acero hash
    joins can't carry list<double> payload columns; a fixed-width binary
    column round-trips the same bytes and joins fine."""
    n, d = m.shape
    return pa.Array.from_buffers(
        pa.binary(8 * d), n,
        [None, pa.py_buffer(np.ascontiguousarray(m, dtype=np.float64).tobytes())],
    )


def _unpack_vecs(col) -> np.ndarray:
    """fixed_size_binary(8*d) column -> (n, d) float64 (zero-copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.type.byte_width // 8
    if len(col) == 0:
        return np.empty((0, d), dtype=np.float64)
    flat = np.frombuffer(col.buffers()[1], dtype=np.float64)
    start = col.offset * d
    return flat[start:start + len(col) * d].reshape(len(col), d)


class BruteForceTopK:
    """Actor-pool stage: per batch, cosine scores of every row against the
    broadcast query matrix; emits per-(query, batch) top-k partial rows."""

    def __init__(self, queries_ref, *, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 10):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.q_ids, q_mat = q
        self.q = _normalize(np.asarray(q_mat, dtype=np.float64))
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]))
        ids = np.asarray(batch[self.id_col])
        scores = m @ self.q.T  # (n, q)
        # k+1 partials so a later self-exclusion can never starve the top-k
        k = min(self.k + 1, len(ids))
        part = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, q)
        nq = self.q.shape[0]
        sel = part.T.reshape(-1)                            # q-major flatten
        qcol = np.repeat(np.arange(nq, dtype=np.int64), k)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(
                    np.asarray(self.q_ids, dtype=np.int64), k)),
                self.id_col: pa.array(ids[sel]),
                "score": pa.array(scores[sel, qcol]),
            }
        )


def _rank_topk(qid: np.ndarray, vid: np.ndarray, sc: np.ndarray, k: int
               ) -> np.ndarray:
    """Boolean mask selecting, per query, the k best (score desc, id asc)
    rows — vectorized lexsort + per-group rank. Rows arrive in the mask's
    sorted order via the returned (mask, order) pair's composition, so
    callers index with ``order[mask]``."""
    order = np.lexsort((vid, -sc, qid))
    qs = qid[order]
    new_q = np.ones(len(qs), dtype=bool)
    new_q[1:] = qs[1:] != qs[:-1]
    rank = np.arange(len(qs)) - np.maximum.accumulate(
        np.where(new_q, np.arange(len(qs)), 0))
    return order[rank < k]


#: small-side fast-path budget for the ANN entry points: when the WHOLE
#: corpus streams in under this many bytes, the identical ranking math
#: runs in one driver-side numpy pass instead of paying actor-pool +
#: pipeline fixed costs (measured 8-16s for a 2001-row corpus). At 100 TB
#: the peek costs at most this many bytes before the distributed path
#: takes over.
SMALL_CORPUS_BYTES = 64 << 20


def _estimated_input_bytes(ds) -> "int | None":
    """Metadata-only size estimate of the dataset's READ inputs (no
    execution): sum of each read op's datasource estimate. None when the
    plan has no estimable reads (from_arrow lineage, internal API drift).
    This is the size BEFORE any downstream projection — an upper bound on
    nothing and a lower bound on nothing either in general, but when even
    the raw inputs are orders of magnitude over a byte budget the peek is
    hopeless and can be skipped."""
    try:
        total, found = 0, False
        seen = set()
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            if id(op) in seen:
                continue
            seen.add(id(op))
            src = getattr(op, "_datasource", None)
            if src is not None:
                est = src.estimate_inmemory_data_size()
                if est is not None:
                    total += int(est)
                    found = True
            stack.extend(getattr(op, "input_dependencies", ()))
        return total if found else None
    except Exception:  # pragma: no cover - internal-API drift
        return None


def _try_gather_small(ds, budget_bytes: int = SMALL_CORPUS_BYTES):
    """Streaming peek: if the dataset fits ``budget_bytes``, return it as
    one Arrow table (the data is already on the driver — nothing extra is
    paid); else None, and the caller runs the distributed path (which
    re-executes; the abandoned peek's cost is bounded by the budget).

    Before peeking, a metadata-only short-circuit skips the peek entirely
    when the plan's raw READ inputs are >=64x over budget — downstream
    stages can legitimately project a wide input down to sketch-sized
    columns (the simhash path gathers 16 bytes/row), so only a hopeless
    margin disables the fast path without executing anything."""
    if budget_bytes <= 0:
        return None
    est = _estimated_input_bytes(ds)
    if est is not None and est > 64 * budget_bytes:
        return None
    tabs, total = [], 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        total += b.nbytes
        if total > budget_bytes:
            return None
        tabs.append(b)
    if not tabs:
        sch = ds.schema()
        if sch is None:
            return pa.table({})
        return pa.schema(list(zip(sch.names, sch.types))).empty_table()
    return pa.concat_tables(tabs, promote_options="default")


def _driver_topk(ids: np.ndarray, mat: np.ndarray, q_ids, q_mat,
                 k: int, exclude_self: bool, id_col: str) -> pa.Table:
    """One-pass exact cosine top-k on the driver — the same ranking math
    (normalize, matmul, _rank_topk) as the distributed path, so results
    are identical."""
    q_ids = np.asarray(q_ids, dtype=np.int64)
    q = _normalize(np.asarray(q_mat, dtype=np.float64))
    m = _normalize(mat)
    if len(ids) == 0 or len(q_ids) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    scores = m @ q.T  # (n, q)
    nq = len(q_ids)
    qid = np.repeat(q_ids, len(ids))
    vid = np.tile(ids, nq)
    sc = scores.T.reshape(-1)
    if exclude_self:
        keep = vid != qid
        qid, vid, sc = qid[keep], vid[keep], sc[keep]
    sel = _rank_topk(qid, vid, sc, k)
    return pa.table({"query_id": pa.array(qid[sel]),
                     id_col: pa.array(vid[sel]),
                     "score": pa.array(sc[sel])})


def _resolve_concurrency(concurrency):
    """Actor-pool sizing: an explicit int/tuple passes through; None
    autoscales to (1, cluster CPUs) so the pool can use the whole fleet
    instead of a hardcoded cap (a fixed small pool idles a multi-node
    cluster)."""
    if concurrency is not None:
        return concurrency
    import ray

    upper = max(2, int(ray.cluster_resources().get("CPU", 4)))
    return (1, upper)


def knn_topk(ds, query_ids, query_matrix, *, id_col: str = "vec_id",
             vec_col: str = "embedding", k: int = 10,
             exclude_self: bool = True, concurrency=None,
             small_bytes: int = SMALL_CORPUS_BYTES) -> pa.Table:
    """Exact cosine top-k: distributed per-batch partials, a SHUFFLE-FREE
    intermediate combine pass (per ~64Ki partial rows keep k+1 per query —
    bounds what reaches the driver even when the corpus has millions of
    blocks), then a tiny driver merge. Returns (query_id, vec_id, score)
    with per-query k rows, score-desc, ties broken by ascending vec_id
    (deterministic). Corpora under ``small_bytes`` compute in one
    driver-side pass of the SAME math (see _try_gather_small)."""
    import ray

    small = _try_gather_small(ds, small_bytes)
    if small is not None:
        return _driver_topk(np.asarray(small[id_col], dtype=np.int64),
                            _to_matrix(small[vec_col]), query_ids,
                            query_matrix, k, exclude_self, id_col)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64),
                   np.asarray(query_matrix, dtype=np.float64)))

    def combine(batch: pa.Table) -> pa.Table:
        sel = _rank_topk(np.asarray(batch["query_id"], dtype=np.int64),
                         np.asarray(batch[id_col], dtype=np.int64),
                         np.asarray(batch["score"], dtype=np.float64),
                         k + 1)
        return batch.take(pa.array(sel))

    partials = gather_table(
        ds.map_batches(
            BruteForceTopK,
            fn_constructor_args=(ref,),
            fn_constructor_kwargs={"id_col": id_col, "vec_col": vec_col,
                                   "k": k},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=_resolve_concurrency(concurrency),
        )
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=65536))
    qid = np.asarray(partials["query_id"], dtype=np.int64)
    vid = np.asarray(partials[id_col], dtype=np.int64)
    sc = np.asarray(partials["score"], dtype=np.float64)
    if exclude_self:
        keep = vid != qid
        qid, vid, sc = qid[keep], vid[keep], sc[keep]
    sel = _rank_topk(qid, vid, sc, k)
    return pa.table(
        {
            "query_id": pa.array(qid[sel]),
            id_col: pa.array(vid[sel]),
            "score": pa.array(sc[sel]),
        }
    )


def lsh_bucket_topk(ds, query_ids, query_matrix, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", k: int = 10, n_bits: int = 8,
                    seed: int = 77, multiprobe: bool = True,
                    exclude_self: bool = True, concurrency=None,
                    small_bytes: int = SMALL_CORPUS_BYTES) -> pa.Table:
    """Approximate top-k via random-hyperplane LSH.

    Corpus rows are bucketed by the sign pattern of ``n_bits`` random
    hyperplanes (one vectorized matmul per batch); each query searches its
    own bucket plus (multi-probe) all buckets at Hamming distance 1 —
    scanning ~``(n_bits+1)/2^n_bits`` of the corpus. Same output shape as
    ``knn_topk``; recall < 1 by construction (documented approximation).
    """
    import ray

    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    d = q.shape[1]
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((d, n_bits))
    q_codes = (q @ planes > 0) @ (1 << np.arange(n_bits))
    wanted = set()
    for code in q_codes.tolist():
        wanted.add(int(code))
        if multiprobe:
            for b in range(n_bits):
                wanted.add(int(code) ^ (1 << b))
    wanted_arr = np.array(sorted(wanted), dtype=np.int64)

    small = _try_gather_small(ds, small_bytes)
    if small is not None:
        # identical candidate set: the bucket filter is per-row
        # deterministic, so driver-side filtering == distributed filtering
        m = _normalize(_to_matrix(small[vec_col]))
        codes = (m @ planes > 0) @ (1 << np.arange(n_bits))
        keep = np.isin(codes, wanted_arr)
        return _driver_topk(
            np.asarray(small[id_col], dtype=np.int64)[keep],
            _to_matrix(small[vec_col])[keep], query_ids, query_matrix, k,
            exclude_self, id_col)
    planes_ref = ray.put(planes)
    wanted_ref = ray.put(wanted_arr)

    def bucket_filter(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        want = ray.get(wanted_ref)
        m = _normalize(_to_matrix(batch[vec_col]))
        codes = (m @ pl > 0) @ (1 << np.arange(pl.shape[1]))
        keep = np.isin(codes, want)
        return batch.filter(pa.array(keep))

    candidates = ds.map_batches(bucket_filter, batch_format="pyarrow",
                                zero_copy_batch=True)
    return knn_topk(candidates, query_ids, query_matrix, id_col=id_col,
                    vec_col=vec_col, k=k, exclude_self=exclude_self,
                    concurrency=concurrency, small_bytes=0)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over uint64 (numpy<2 has no bitwise_count)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8).sum(
        axis=1).astype(np.int64)


def _sketch_hamming_cutoff(threshold: float, sketch_bits: int) -> int:
    """Loose Hamming cutoff on a random-hyperplane sketch that keeps
    essentially all pairs with cosine >= threshold: expected Hamming is
    bits * angle/pi; allow +4 sigma of slack (binomial)."""
    p = np.arccos(min(1.0, max(-1.0, threshold))) / np.pi
    mu = sketch_bits * p
    sigma = np.sqrt(sketch_bits * p * (1 - p)) if 0 < p < 1 else 0.0
    return int(np.ceil(mu + 4 * sigma))


def embedding_neardup(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                      threshold: float = 0.95, n_bits: int = 6,
                      seed: int = 99, max_bucket_size: int = 4096,
                      max_broadcast_ids: int = 500_000,
                      num_partitions: int | None = None,
                      small_bytes: int = SMALL_CORPUS_BYTES) -> pa.Table:
    """Embedding-cosine near-duplicate pairs.

    Candidate generation shuffles ONLY ``(bucket, id, sketch64)`` rows —
    24 bytes/row; full vectors never enter the all-to-all (vs shipping
    (id, vec) per probe: >20x fewer shuffled bytes at dim>=64). Each vector
    lands in its home LSH bucket once plus one probe per SET bit of its
    code (clearing the bit). Clearing-only ("downward") probes cover
    exactly the same pairs as probing every Hamming-1 neighbor on both
    sides: a pair at Hamming distance 1 meets in the lower code's home
    bucket, and a pair at distance 2 meets in the bucket whose code has
    both differing bits cleared (which is < both homes).

    Inside each (size-capped) bucket, candidate pairs are pre-filtered by
    Hamming distance on a 64-bit hyperplane sketch (a +4-sigma cutoff for
    the target cosine — keeps ~all true near-dups, rejects ~all random
    pairs, so dense buckets don't emit O(cap^2) candidates). Survivors are
    deduped distributed, their vectors attached once (broadcast-filter +
    hash-join; fixed-size-binary packed, since Acero can't carry
    list<double>), and exact cosine confirms. Returns (a, b, cosine) pairs
    with cosine >= threshold, sorted by (a, b).
    """
    import ray

    from ..functions.scale import default_partitions

    num_partitions = default_partitions(num_partitions, 8)

    ham_cut = _sketch_hamming_cutoff(threshold, 64)

    def to_buckets(batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[vec_col]))
        d = m.shape[1]
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((d, n_bits))
        sk_planes = rng.standard_normal((d, 64))
        codes = ((m @ planes > 0) @ (1 << np.arange(n_bits))).astype(np.int64)
        bits = (m @ sk_planes > 0).astype(np.uint64)
        sketch = (bits << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64).view(np.int64)
        ids = np.asarray(batch[id_col])
        all_codes, all_ids, all_sk = [codes], [ids], [sketch]
        for b in range(n_bits):
            has_bit = (codes >> b) & 1 == 1
            all_codes.append(codes[has_bit] ^ (1 << b))
            all_ids.append(ids[has_bit])
            all_sk.append(sketch[has_bit])
        bucket = np.concatenate(all_codes)
        # pair tasks group on a hash PARTITION of the bucket (many buckets
        # per task, segmented kernel) — per-bucket map_groups would
        # dispatch a Python call per bucket at large n_bits
        part = ((bucket.astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(256)
                ).astype(np.int64)
        return pa.table({"bucket": pa.array(bucket),
                         "_part": pa.array(part),
                         id_col: pa.array(np.concatenate(all_ids)),
                         "sketch": pa.array(np.concatenate(all_sk))})

    def _segment_pairs(ids_seg: np.ndarray, sk_seg: np.ndarray,
                       out_a: list, out_b: list) -> None:
        uniq_all, uidx_all = np.unique(ids_seg, return_index=True)
        m = len(uniq_all)
        if m < 2:
            return
        uniq, uidx = uniq_all[:max_bucket_size], uidx_all[:max_bucket_size]
        n = len(uniq)
        sk = sk_seg[uidx]
        # row-block sketch-Hamming filter: bounded memory even at the cap
        blk = 256
        for s in range(0, n - 1, blk):
            e = min(s + blk, n - 1)
            x = sk[s:e, None] ^ sk[None, :]            # (blk, n)
            ham = _popcount64(x.reshape(-1)).reshape(e - s, n)
            ii, jj = np.nonzero(ham <= ham_cut)
            keep = jj > (ii + s)                        # upper triangle only
            out_a.append(uniq[ii[keep] + s])
            out_b.append(uniq[jj[keep]])
        if m > max_bucket_size:
            # oversized bucket: degrade to a (sketch, id)-sorted chain —
            # identical vectors share the 64-bit sketch exactly, so
            # exact-duplicate recall survives any bucket size (truncation
            # was a scale-dependent recall hole); near-dup recall in
            # monster buckets degrades gracefully, precision is exact
            # (cosine verification downstream).
            sv = sk_seg[uidx_all]
            order = np.lexsort((uniq_all, sv))
            cu, cs = uniq_all[order], sv[order]
            ch = _popcount64(cs[:-1] ^ cs[1:])
            keep_c = ch <= ham_cut
            x, y = cu[:-1][keep_c], cu[1:][keep_c]
            out_a.append(np.minimum(x, y))
            out_b.append(np.maximum(x, y))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # many buckets per partition task: sort once, loop bucket segments
        buckets = np.asarray(group["bucket"])
        ids_all = np.asarray(group[id_col])
        sk_all = np.asarray(group["sketch"]).astype(np.uint64)
        order = np.lexsort((ids_all, buckets))
        buckets, ids_all, sk_all = (buckets[order], ids_all[order],
                                    sk_all[order])
        new = np.ones(len(buckets), dtype=bool)
        if len(buckets) > 1:
            new[1:] = buckets[1:] != buckets[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(buckets))
        out_a: list = []
        out_b: list = []
        for s, e in zip(starts, ends):
            _segment_pairs(ids_all[s:e], sk_all[s:e], out_a, out_b)
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(out_a)),
                         "b": pa.array(np.concatenate(out_b))})

    _empty_out = pa.table({"a": pa.array([], pa.int64()),
                           "b": pa.array([], pa.int64()),
                           "cosine": pa.array([], pa.float64())})

    # small-corpus fast path: the SAME kernels run once on the driver —
    # to_buckets is per-row deterministic and bucket_pairs handles every
    # bucket segment of its input, so feeding the whole (gathered) table
    # produces the identical candidate set the per-_part groups would
    # (equivalence pytest forces small_bytes=0 and compares)
    small = _try_gather_small(ds, small_bytes)
    if small is not None:
        if small.num_rows == 0:
            return _empty_out
        pairs = bucket_pairs(to_buckets(small))
        if pairs.num_rows == 0:
            return _empty_out
        arr = np.unique(np.stack([np.asarray(pairs["a"]),
                                  np.asarray(pairs["b"])], axis=1), axis=0)
        ids = np.asarray(small[id_col], dtype=np.int64)
        order = np.argsort(ids)
        m = _normalize(_to_matrix(small[vec_col]))[order]
        ia = np.searchsorted(ids[order], arr[:, 0])
        ib = np.searchsorted(ids[order], arr[:, 1])
        s = np.einsum("ij,ij->i", m[ia], m[ib])
        keep = s >= threshold
        return pa.table({"a": pa.array(arr[keep, 0]),
                         "b": pa.array(arr[keep, 1]),
                         "cosine": pa.array(s[keep], pa.float64())})

    # candidates may repeat across buckets (a pair can co-occur in several
    # probe buckets); exact verification is idempotent, so duplicates are
    # carried through and collapsed once on the (tiny) verified result
    # rather than paying a dedicated dedup shuffle.
    cand = (
        ds.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    ).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return _empty_out

    cand_ids = None
    if n_cand <= max_broadcast_ids:
        cand_tbl = gather_table(cand.select_columns(["a", "b"]))
        cand_ids = np.unique(np.concatenate([
            np.asarray(cand_tbl["a"]), np.asarray(cand_tbl["b"]),
        ]))
    use_broadcast = cand_ids is not None and len(cand_ids) <= max_broadcast_ids
    if use_broadcast:
        # small candidate set: gather its vectors once, broadcast the
        # normalized matrix via the object store, verify with one
        # map_batches over the pairs — no further shuffles.
        from .joins import DEFAULT_BROADCAST_BUDGET

        ids_ref = ray.put(cand_ids)

        def pick(batch: pa.Table) -> pa.Table:
            want = ray.get(ids_ref)
            mask = pc.is_in(batch[id_col], value_set=pa.array(want))
            return batch.filter(mask).select([id_col, vec_col])

        # one corpus scan into the (spillable) object store, then a
        # metadata byte check before anything reaches the driver (dim is
        # data-dependent; the id-count guard alone doesn't bound bytes)
        picked_ds = ds.map_batches(pick, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
        if picked_ds.size_bytes() > DEFAULT_BROADCAST_BUDGET:
            use_broadcast = False
    if use_broadcast:
        picked = gather_table(picked_ds)
        pids = np.asarray(picked[id_col])
        order = np.argsort(pids)
        mat = _normalize(_to_matrix(picked[vec_col]))[order]
        mat_ref = ray.put((pids[order], mat))

        def verify(batch: pa.Table) -> pa.Table:
            ids_sorted, m = ray.get(mat_ref)
            a = np.asarray(batch["a"])
            b = np.asarray(batch["b"])
            ia = np.searchsorted(ids_sorted, a)
            ib = np.searchsorted(ids_sorted, b)
            s = np.einsum("ij,ij->i", m[ia], m[ib])
            keep = s >= threshold
            return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                             "cosine": pa.array(s[keep], pa.float64())})

        tbl = gather_table(
            cand.map_batches(verify, batch_format="pyarrow",
                             zero_copy_batch=True))
    else:
        # large candidate set: stay fully distributed — hash-join packed
        # vectors onto each pair side, verify vectorized per batch.
        from .dedup import _repack

        def side(name):
            def project(batch: pa.Table) -> pa.Table:
                packed = _pack_vecs(_normalize(_to_matrix(batch[vec_col])))
                return pa.table({f"__{name}_id": batch[id_col],
                                 f"vec_{name}": packed})

            return ds.map_batches(project, batch_format="pyarrow",
                                  zero_copy_batch=True)

        j = _repack(cand, n_cand, num_partitions).join(
            side("a"), join_type="inner", num_partitions=num_partitions,
            on=("a",), right_on=("__a_id",))
        j = _repack(j, n_cand, num_partitions).join(
            side("b"), join_type="inner", num_partitions=num_partitions,
            on=("b",), right_on=("__b_id",))

        def cosine(batch: pa.Table) -> pa.Table:
            ma = _unpack_vecs(batch["vec_a"])
            mb = _unpack_vecs(batch["vec_b"])
            s = np.einsum("ij,ij->i", ma, mb)
            keep = s >= threshold
            return pa.table(
                {"a": batch["a"].combine_chunks().filter(pa.array(keep)),
                 "b": batch["b"].combine_chunks().filter(pa.array(keep)),
                 "cosine": pa.array(s[keep], pa.float64())})

        tbl = gather_table(
            j.map_batches(cosine, batch_format="pyarrow",
                          zero_copy_batch=True))
    if tbl.num_rows == 0:
        return _empty_out
    # collapse multi-bucket duplicates + canonical (a, b) order
    arr = np.stack([np.asarray(tbl["a"]), np.asarray(tbl["b"])], axis=1)
    uniq, uidx = np.unique(arr, axis=0, return_index=True)
    return pa.table({
        "a": pa.array(uniq[:, 0]),
        "b": pa.array(uniq[:, 1]),
        "cosine": pa.array(np.asarray(tbl["cosine"])[uidx], pa.float64()),
    })


def train_ivf_centroids(ds, *, vec_col: str = "embedding",
                        n_centroids: int = 64, sample_rows: int = 65536,
                        n_iters: int = 10, seed: int = 33) -> np.ndarray:
    """Train an IVF coarse quantizer: spherical k-means on a bounded sample.

    Sampling is a streaming per-batch slice (the first rows of each batch
    up to a per-batch budget) — no full materialization; the k-means itself
    runs driver-side over <= ``sample_rows`` vectors (bounded, deterministic
    seed). At 100 TB the training set is still one small sample; only the
    ASSIGNMENT pass touches the full corpus, and that stays distributed in
    ``ivf_topk``. Returns (n_centroids, d) L2-normalized centroids."""

    def take_some(batch: pa.Table) -> pa.Table:
        # deterministic slice; budget spread over ~expected batch count
        return batch.slice(0, max(1, sample_rows // 64))

    sampled = gather_table(
        ds.map_batches(take_some, batch_format="pyarrow",
                       zero_copy_batch=True).limit(sample_rows))
    m = _normalize(_to_matrix(sampled[vec_col]))
    rng = np.random.Generator(np.random.PCG64(seed))
    k = min(n_centroids, len(m))
    cent = m[rng.choice(len(m), size=k, replace=False)]
    for _ in range(n_iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(ds, query_ids, query_matrix, *, id_col: str = "vec_id",
             vec_col: str = "embedding", k: int = 10, n_centroids: int = 64,
             nprobe: int = 8, seed: int = 33,
             exclude_self: bool = True, concurrency=None,
             small_bytes: int = SMALL_CORPUS_BYTES) -> pa.Table:
    """Approximate top-k via an IVF coarse quantizer (the k-means sibling of
    ``lsh_bucket_topk``): corpus rows are assigned to their nearest centroid
    (one matmul per batch against the broadcast centroid matrix); each query
    probes its ``nprobe`` nearest centroids and scans only those lists —
    ~``nprobe/n_centroids`` of the corpus. Recall < 1 by construction.
    Same output shape as ``knn_topk``."""
    import ray

    small = _try_gather_small(ds, small_bytes)
    if small is not None:
        # train + assign + rank in one driver pass. Centroids differ from
        # the distributed run only the way they already differ between any
        # two block layouts (the training sample is batching-dependent by
        # design); the planted-duplicate oracle is layout-independent.
        m_all = _to_matrix(small[vec_col])
        m = _normalize(m_all)
        rng = np.random.Generator(np.random.PCG64(seed))
        kc = min(n_centroids, len(m)) if len(m) else 0
        if kc == 0:
            return _driver_topk(np.empty(0, np.int64), m_all, query_ids,
                                query_matrix, k, exclude_self, id_col)
        cent = m[rng.choice(len(m), size=kc, replace=False)]
        for _ in range(10):
            assign = (m @ cent.T).argmax(axis=1)
            for c in range(kc):
                members = m[assign == c]
                if len(members):
                    cent[c] = members.sum(axis=0)
            cent = _normalize(cent)
        q = _normalize(np.asarray(query_matrix, dtype=np.float64))
        probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
        keep = np.isin((m @ cent.T).argmax(axis=1), np.unique(probes))
        return _driver_topk(
            np.asarray(small[id_col], dtype=np.int64)[keep], m_all[keep],
            query_ids, query_matrix, k, exclude_self, id_col)

    cent = train_ivf_centroids(ds, vec_col=vec_col, n_centroids=n_centroids,
                               seed=seed)
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    wanted = np.unique(probes)
    cent_ref = ray.put((cent, wanted))

    def centroid_filter(batch: pa.Table) -> pa.Table:
        c, want = ray.get(cent_ref)
        m = _normalize(_to_matrix(batch[vec_col]))
        assign = (m @ c.T).argmax(axis=1)
        return batch.filter(pa.array(np.isin(assign, want)))

    candidates = ds.map_batches(centroid_filter, batch_format="pyarrow",
                                zero_copy_batch=True)
    return knn_topk(candidates, query_ids, query_matrix, id_col=id_col,
                    vec_col=vec_col, k=k, exclude_self=exclude_self,
                    concurrency=concurrency, small_bytes=0)
