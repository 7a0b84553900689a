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

import heapq

import numpy as np
import pyarrow as pa


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
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            sel = part[:, qi]
            out_q.append(np.full(k, self.q_ids[qi], dtype=np.int64))
            out_id.append(ids[sel])
            out_s.append(scores[sel, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


def knn_topk(ds, query_ids, query_matrix, *, id_col: str = "vec_id",
             vec_col: str = "embedding", k: int = 10,
             exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k: distributed partials + tiny driver merge.
    Returns (query_id, vec_id, score) with per-query k rows, score-desc,
    ties broken by ascending vec_id (deterministic)."""
    import ray

    ref = ray.put((np.asarray(query_ids, dtype=np.int64),
                   np.asarray(query_matrix, dtype=np.float64)))
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"id_col": id_col, "vec_col": vec_col, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=4,
    ).to_pandas()
    heaps: dict[int, list] = {}
    for qid, vid, s in partials.itertuples(index=False):
        if exclude_self and vid == qid:
            continue
        h = heaps.setdefault(int(qid), [])
        item = (float(s), -int(vid))
        if len(h) < k:
            heapq.heappush(h, item)
        else:
            heapq.heappushpop(h, item)
    rows = []
    for qid in sorted(heaps):
        best = sorted(heaps[qid], key=lambda t: (-t[0], -t[1]))
        for s, nvid in best:
            rows.append((qid, -nvid, s))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            id_col: pa.array([r[1] for r in rows], pa.int64()),
            "score": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def lsh_bucket_topk(ds, query_ids, query_matrix, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", k: int = 10, n_bits: int = 8,
                    seed: int = 77, multiprobe: bool = True,
                    exclude_self: bool = True) -> pa.Table:
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
                    vec_col=vec_col, k=k, exclude_self=exclude_self)


def embedding_neardup(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                      threshold: float = 0.95, n_bits: int = 6,
                      seed: int = 99) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: LSH-bucket (groupby shuffle of
    (bucket, id, vec) triples) then exact cosine within bucket. Multi-probe
    at Hamming distance 1 keeps recall high for near-identical vectors.
    Returns (a, b, cosine) pairs with cosine >= threshold."""

    def to_buckets(batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[vec_col]))
        d = m.shape[1]
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((d, n_bits))
        codes = ((m @ planes > 0) @ (1 << np.arange(n_bits))).astype(np.int64)
        ids = np.asarray(batch[id_col])
        n, probes = len(ids), [codes]
        for b in range(n_bits):
            probes.append(codes ^ (1 << b))
        all_codes = np.concatenate(probes)
        all_ids = np.tile(ids, n_bits + 1)
        all_vecs = np.tile(m, (n_bits + 1, 1))
        return pa.table(
            {
                "bucket": pa.array(all_codes),
                id_col: pa.array(all_ids),
                "vec": pa.array(list(all_vecs), pa.list_(pa.float64())),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col])
        uniq, idx = np.unique(ids, return_index=True)
        if len(uniq) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        m = _to_matrix(group["vec"])[idx]
        sims = m @ m.T
        ai, bi = np.triu_indices(len(uniq), k=1)
        s = sims[ai, bi]
        keep = s >= threshold
        return pa.table({"a": pa.array(uniq[ai][keep]),
                         "b": pa.array(uniq[bi][keep]),
                         "cosine": pa.array(s[keep])})

    pairs = (
        ds.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    tbl = pa.table(pairs.to_pandas())
    if tbl.num_rows == 0:
        return tbl
    import pandas as pd

    df = tbl.to_pandas().drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    return pa.Table.from_pandas(df.reset_index(drop=True))
