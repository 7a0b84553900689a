"""Deduplication operators for training-data pipelines, Ray-Data-first.

* exact_dedup       — content-hash groupby, keep first by a tiebreak key
* MinHashStage      — word-shingle MinHash signatures + LSH band keys
* minhash_dedup     — full MinHash+LSH pipeline -> duplicate clusters
* simhash_dedup     — SimHash banding -> Hamming-verified near-dup pairs
* ngram_jaccard     — exact Jaccard verification kernel (used by LSH paths)
* embedding_neardup — cosine near-dup over an embedding column

Scale notes (the design assumption at 10^10 docs): every pipeline shuffles
only (key, id) pairs — never content — after the per-batch signature stage;
signatures are fixed-width; candidate buckets are size-capped
(``max_bucket_size``) so a degenerate band key cannot produce O(b^2) pairs;
candidate-pair dedup and exact-Jaccard verification are distributed
(groupby + hash-join + vectorized ``pairwise_shingle_jaccard``); connected
components use iterated min-label propagation over Dataset ops
(``label_propagation_components``), with a driver-side union-find fast path
only when the VERIFIED pair set is provably small (``max_driver_pairs`` —
beyond it the code falls back to label propagation, it does not raise).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64
from ..functions.scale import default_partitions
from ..functions.tables import gather_table

_M = np.uint64(0xFFFFFFFFFFFFFFFF)
_MERSENNE = np.uint64((1 << 61) - 1)


def _tokenize(text: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """-> (flat tokens, per-row token counts), trim/split on whitespace."""
    tokens = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(text.fill_null("")), r"\s+"
    )
    flat = pc.list_flatten(tokens)
    flat = flat.filter(pc.not_equal(flat, ""))
    counts = np.asarray(
        pc.cast(pc.count_substring_regex(text.fill_null(""), r"\S+"), pa.int64())
    )
    return flat, counts


def _shingle_hashes(text: pa.Array, k: int, *, short_row_fallback: bool = True
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Word k-shingle 64-bit hashes per row (rolling window over token
    hashes), FULLY vectorized: hash each token once, combine k consecutive
    token hashes with position-mixed multiplies via k global shifted adds
    (no Python loop over rows — the round-2 version looped per row, which
    melted on large candidate-pair verification batches).

    -> (flat shingle hashes, per-row shingle counts). With
    ``short_row_fallback`` (the MinHash convention) rows with 0 < tokens
    < k contribute ONE shingle over their full token run; without it they
    contribute none (the SQL k-gram convention).
    """
    flat, counts = _tokenize(text)
    tok = stable_hash64(flat) if len(flat) else np.empty(0, np.uint64)
    counts = counts.astype(np.int64)
    if k == 1:
        return tok, counts
    n = len(counts)
    L = len(tok)
    if short_row_fallback:
        n_sh = np.maximum(counts - (k - 1), np.minimum(counts, 1))
    else:
        n_sh = np.maximum(counts - (k - 1), 0)
    total = int(n_sh.sum())
    out = np.empty(total, dtype=np.uint64)
    if total == 0:
        return out, n_sh
    mults = (np.uint64(0x9E3779B97F4A7C15) ** np.arange(k, dtype=np.uint64)) & _M
    rows_flat = np.repeat(np.arange(n, dtype=np.int64), counts)
    # full windows: every global start g whose window stays inside one row
    if L >= k:
        acc = np.zeros(L - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = (acc + tok[j : L - k + 1 + j] * mults[j]) & _M
        full = acc[rows_flat[: L - k + 1] == rows_flat[k - 1 :]]
    else:
        full = np.empty(0, np.uint64)
    if not short_row_fallback:
        return full, n_sh
    # short rows (0 < c < k): one shingle = position-weighted token sum
    short = (counts > 0) & (counts < k)
    if short.any():
        row_starts = np.cumsum(counts) - counts
        pos_in_row = np.arange(L, dtype=np.int64) - row_starts[rows_flat]
        in_short = short[rows_flat]
        w = np.zeros(L, dtype=np.uint64)
        w[in_short] = (tok[in_short] * mults[pos_in_row[in_short]]) & _M
        nz = counts > 0
        seg = np.add.reduceat(w, row_starts[nz]) & _M  # per non-empty row
        short_sh = seg[short[nz]]
        out_rows = np.repeat(np.arange(n, dtype=np.int64), n_sh)
        is_short_out = short[out_rows]
        out[is_short_out] = short_sh
        out[~is_short_out] = full
        return out, n_sh
    return full, n_sh


class MinHashStage:
    """Per-batch MinHash signatures + LSH band keys.

    ``num_perm`` permutations via the standard ``(a*h + b) mod p`` universal
    hash family over 64-bit shingle hashes (a, b drawn from a fixed seed —
    identical across actors); ``bands`` bands of ``num_perm // bands`` rows
    hashed to one band key each. Output: input id column + ``band``/
    ``band_key`` rows (exploded), ready for a groupby shuffle that moves
    only (band, band_key, id) — never the text.
    """

    def __init__(self, *, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 128, bands: int = 16, shingle_k: int = 3,
                 seed: int = 1234):
        assert num_perm % bands == 0
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def _shingles(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return _shingle_hashes(text, self.k)

    def signatures(self, batch: pa.Table,
                   shingles: tuple[np.ndarray, np.ndarray] | None = None
                   ) -> np.ndarray:
        """(n_rows, num_perm) uint64 MinHash signature matrix."""
        sh, n_sh = shingles if shingles is not None else self._shingles(batch)
        n = batch.num_rows
        sig = np.full((n, self.num_perm), _MERSENNE, dtype=np.uint64)
        if len(sh) == 0:
            return sig
        # (S, P) permuted hashes; S = total shingles in batch. Chunk the
        # permutation axis to bound memory at large batches.
        ends = np.cumsum(n_sh)
        starts = ends - n_sh
        hv = ((sh % _MERSENNE)[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        valid = n_sh > 0
        if valid.any():
            # segmented min via reduceat over non-empty segments only
            # (strictly increasing offsets => well-defined segments)
            sig[valid] = np.minimum.reduceat(hv, starts[valid], axis=0)
        return sig

    def set_hashes(self, batch: pa.Table,
                   shingles: tuple[np.ndarray, np.ndarray] | None = None
                   ) -> np.ndarray:
        """Per-row order-independent hash of the DISTINCT shingle set
        (wrap-sum of distinct shingle hashes): equal sets -> equal hash."""
        h, n_sh = shingles if shingles is not None else self._shingles(batch)
        n = batch.num_rows
        rows = np.repeat(np.arange(n, dtype=np.int64), n_sh)
        out = np.zeros(n, dtype=np.uint64)
        if len(h):
            order = np.lexsort((h, rows))
            hs, rs = h[order], rows[order]
            firstm = np.ones(len(hs), dtype=bool)
            firstm[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
            hd, rd = hs[firstm], rs[firstm]
            starts = np.flatnonzero(
                np.concatenate([[True], rd[1:] != rd[:-1]]))
            out[rd[starts]] = np.add.reduceat(hd, starts)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        shingles = self._shingles(batch)  # hashed once, used twice
        sig = self.signatures(batch, shingles)
        n = batch.num_rows
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keys = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            chunk = sig[:, b * self.rows_per_band : (b + 1) * self.rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(self.rows_per_band):
                acc = (
                    (acc ^ chunk[:, j])
                    * np.uint64(0x100000001B3)
                ) & _M
            keys[:, b] = acc
        # content-level SET HASH (sum of distinct shingle hashes, order-
        # independent): identical shingle sets share it exactly, and it is
        # strictly finer than any banding of the minhash signature — the
        # adjacency key for the oversized-bucket chain fallback. (Folding
        # the signature instead is NOT finer: with bands=1 it EQUALS the
        # bucket key, collapsing the chain order to plain id order.)
        full = self.set_hashes(batch, shingles)
        # ids tiled per band (id varies fastest within a band)
        id_np = np.asarray(ids)
        return pa.table(
            {
                self.id_col: pa.array(np.tile(id_np, self.bands)),
                "band": pa.array(
                    np.repeat(np.arange(self.bands, dtype=np.int64), n)
                ),
                "band_key": pa.array(keys.T.reshape(-1).astype(np.int64)),
                "sig": pa.array(np.tile(full.astype(np.int64), self.bands)),
            }
        )


def _distinct_per_row(rows: np.ndarray, hashes: np.ndarray, n: int) -> np.ndarray:
    """Count distinct hashes per row id (vectorized lexsort + adjacent-diff)."""
    if len(rows) == 0:
        return np.zeros(n, dtype=np.int64)
    order = np.lexsort((hashes, rows))
    r, h = rows[order], hashes[order]
    new = np.ones(len(r), dtype=bool)
    new[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
    return np.bincount(r[new], minlength=n).astype(np.int64)


def pairwise_shingle_jaccard(
    batch: pa.Table, text_a: str, text_b: str, *, k: int = 1,
    out_col: str = "jaccard",
) -> pa.Table:
    """Exact word-k-shingle Jaccard per row between two text columns —
    fully vectorized (token hashing + lexsort distinct counts), no Python
    loop over rows. The verification stage for candidate pairs produced by
    MinHash/SimHash banding; with ``k=1`` this is distinct-token-set
    Jaccard, which a SQL oracle can mirror exactly."""
    ta = batch[text_a]
    tb = batch[text_b]
    if isinstance(ta, pa.ChunkedArray):
        ta = ta.combine_chunks()
    if isinstance(tb, pa.ChunkedArray):
        tb = tb.combine_chunks()
    n = batch.num_rows
    ha, ca = _shingle_hashes(ta, k)
    hb, cb = _shingle_hashes(tb, k)
    ra = np.repeat(np.arange(n), ca)
    rb = np.repeat(np.arange(n), cb)
    na = _distinct_per_row(ra, ha, n)
    nb = _distinct_per_row(rb, hb, n)
    nu = _distinct_per_row(np.concatenate([ra, rb]),
                           np.concatenate([ha, hb]), n)
    inter = na + nb - nu
    jac = np.where(nu == 0, 1.0, inter / np.maximum(nu, 1))
    return batch.append_column(out_col, pa.array(jac, pa.float64()))


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-shingle Jaccard similarity (verification kernel)."""
    ta, tb = a.split(), b.split()
    sa = {tuple(ta[i : i + k]) for i in range(max(1, len(ta) - k + 1))}
    sb = {tuple(tb[i : i + k]) for i in range(max(1, len(tb) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def exact_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int | None = None,
                small_bytes: int | None = None):
    """Exact dedup: vectorized content hash per batch, then ONE groupby on
    a hash PARTITION of the content hash — each task keeps the min-id row
    per content hash for its whole partition with a single lexsort (a
    per-content-group map_groups would dispatch a Python call per distinct
    document, i.e. per row at 100 TB). Only (hash, id) plus the surviving
    rows move through the shuffle.

    Inputs that stream in under ``small_bytes`` (default 64 MB) run the
    SAME kernels in one driver pass — the hash partition is a function of
    the content hash, so whole-table keep_first equals the union of the
    per-partition results (equivalence pytest); the sort-shuffle's
    multi-second fixed cost is skipped entirely."""
    num_partitions = default_partitions(num_partitions, 64)

    def add_hash(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h = stable_hash64(text)
        batch = batch.append_column("_content_hash",
                                    pa.array(h.astype(np.int64)))
        return batch.append_column(
            "_part", pa.array((h % np.uint64(num_partitions))
                              .astype(np.int64)))

    def keep_first(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col])
        hs = np.asarray(group["_content_hash"])
        order = np.lexsort((ids, hs))
        hs_s = hs[order]
        first = np.ones(len(hs_s), dtype=bool)
        if len(hs_s) > 1:
            first[1:] = hs_s[1:] != hs_s[:-1]
        return group.take(pa.array(order[first])).drop_columns(
            ["_content_hash", "_part"])

    from .similarity import _try_gather_small

    small = _try_gather_small(
        ds, (64 << 20) if small_bytes is None else small_bytes)
    if small is not None:
        if small.num_rows == 0:
            return ds  # zero rows pass through (schema may be lost)
        import ray.data as rd

        return rd.from_arrow(keep_first(add_hash(small)))
    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(keep_first, batch_format="pyarrow")
    )


def _connected_components(pairs: np.ndarray) -> dict[int, int]:
    """Driver-side union-find over a small candidate pair set -> {id: root}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


_EMPTY_PAIRS = pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})


def dedup_pairs(pairs_ds, *, value_cols: tuple[str, ...] = ()):
    """Distributed (a, b) pair dedup: per-batch ``np.unique`` PARTIAL
    combiner, then ONE vectorized hash-aggregate groupby. Never a
    per-group ``map_groups`` — that dispatches a Python call per distinct
    pair, which is minutes of pure overhead at millions of pairs.
    ``value_cols`` carry through via Min (exact whenever the value is a
    function of the pair, e.g. hamming distance)."""
    from ray.data.aggregate import Count, Min

    def partial(batch: pa.Table) -> pa.Table:
        arr = np.stack([np.asarray(batch["a"], dtype=np.int64),
                        np.asarray(batch["b"], dtype=np.int64)], axis=1)
        _, idx = np.unique(arr, axis=0, return_index=True)
        return batch.take(pa.array(np.sort(idx)))

    deduped = pairs_ds.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
    if value_cols:
        return deduped.groupby(["a", "b"]).aggregate(
            *[Min(c, alias_name=c) for c in value_cols])
    return (deduped.groupby(["a", "b"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["a", "b"]))


#: pair count under which MinHash text verification runs driver-side in
#: the small-corpus fast path; past it the verify map stays distributed
#: (it is the compute-heavy stage — serializing it on the driver was a
#: measured 3x regression at 36k pairs)
_DRIVER_VERIFY_PAIRS = 2048

#: pair-generation tasks process many LSH buckets per call (hash-partition
#: on the bucket key) — per-group map_groups dispatch costs a Python call
#: + block build per bucket, which dominates wall at >10^4 buckets
_PAIR_PARTITIONS = 256


def _pairs_over_key_segments(group: pa.Table, key_cols: list[str],
                             id_col: str, gen_pairs_per_segment) -> pa.Table:
    """Sort ``group`` by the bucket key columns, segment, and hand the
    (sorted table, segment bounds) to the caller's pair kernel. Pure —
    shared verbatim between the distributed per-partition tasks and the
    small-corpus driver path, so the two produce identical candidates."""
    keys = [np.asarray(group[c]) for c in key_cols]
    ids = np.asarray(group[id_col])
    order = np.lexsort(tuple([ids] + keys[::-1]))
    keys = [k[order] for k in keys]
    n = len(ids)
    new = np.ones(n, dtype=bool)
    if n > 1:
        diff = np.zeros(n - 1, dtype=bool)
        for k in keys:
            diff |= k[1:] != k[:-1]
        new[1:] = diff
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    return gen_pairs_per_segment(group.take(pa.array(order)), starts, ends)


def _bucketed_pair_partition(ds, key_cols: list[str], id_col: str,
                             gen_pairs_per_segment):
    """Shared shape for LSH-style candidate generation: hash the bucket
    key columns to ``_part``, group by the PARTITION (not the bucket), and
    inside each task sort once + loop bucket segments with small numpy
    kernels. Per-task input is ~rows/_PAIR_PARTITIONS plus the largest
    single bucket (itself size-capped by callers)."""

    def add_part(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in key_cols:
            h = (h * np.uint64(0x100000001B3)
                 + np.asarray(batch[c]).astype(np.uint64))
        return batch.append_column(
            "_part", pa.array((h % np.uint64(_PAIR_PARTITIONS))
                              .astype(np.int64)))

    def per_partition(group: pa.Table) -> pa.Table:
        return _pairs_over_key_segments(group, key_cols, id_col,
                                        gen_pairs_per_segment)

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_part")
            .map_groups(per_partition, batch_format="pyarrow"))


def _repack(ds, n_rows: int, num_partitions: int):
    """Rebuild a (small) Dataset into <= num_partitions all-nonempty blocks.

    Workaround for a Ray 2.49 hash-join defect: when the first block the
    join shuffle receives on a side is EMPTY (a zero-row table — e.g. an
    inner-join partition with no matches, or an LSH bucket that emitted no
    pairs), the downstream aggregator finalizes against a degenerate
    partition and pyarrow raises ``No match ... for key field reference``.
    Empty blocks bypass map operators entirely, so the only reliable fix is
    a repartition sized so every output block holds >= 1 row."""
    return ds.repartition(max(1, min(num_partitions, n_rows)))


def attach_texts(pairs_ds, n_pairs: int, docs_ds, *, id_col: str,
                 text_col: str, num_partitions: int | None = None):
    """Hash-join the corpus text onto each side of a candidate-pair Dataset
    -> columns (a, b, text_a, text_b). Fully distributed: the pair set and
    the (id, text) projection of the corpus are the only things shuffled.
    ``n_pairs`` (the known pair count) sizes the anti-empty-block repack —
    see ``_repack``."""
    num_partitions = default_partitions(num_partitions, 8)

    def side(name):
        def project(batch: pa.Table) -> pa.Table:
            return pa.table({f"__{name}_id": batch[id_col],
                             f"text_{name}": batch[text_col]})

        return docs_ds.map_batches(project, batch_format="pyarrow",
                                   zero_copy_batch=True)

    j = _repack(pairs_ds, n_pairs, num_partitions).join(
        side("a"), join_type="inner", num_partitions=num_partitions,
        on=("a",), right_on=("__a_id",))
    # inner-join against a unique corpus id keeps exactly n_pairs rows
    j = _repack(j, n_pairs, num_partitions).join(
        side("b"), join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("__b_id",))
    return j.select_columns(["a", "b", "text_a", "text_b"])


def label_propagation_components(edges_ds, *, id_col: str = "doc_id",
                                 num_partitions: int | None = None,
                                 max_iters: int = 50):
    """Connected components over an (a, b) edge Dataset via iterated
    min-label propagation — the multi-node path (no driver union-find).

    Each iteration is one hash-join (edge endpoint -> current label) plus one
    min-groupby; labels only ever decrease, so the sum of labels is a
    monotone convergence metric and the loop stops the first iteration it is
    unchanged. Cluster diameter bounds the iteration count (near-dup
    clusters are shallow, so a handful of rounds in practice).

    Returns a Dataset with (id_col, cluster_id = min member id) for every id
    that appears in an edge.
    """
    from ray.data.aggregate import Min, Sum

    num_partitions = default_partitions(num_partitions, 8)

    def symmetrize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([
                pc.cast(c, pa.int64()) for c in
                (batch["a"].combine_chunks(), batch["b"].combine_chunks())
            ]),
            "dst": pa.concat_arrays([
                pc.cast(c, pa.int64()) for c in
                (batch["b"].combine_chunks(), batch["a"].combine_chunks())
            ]),
        })

    sym = edges_ds.map_batches(symmetrize, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    sym = _repack(sym, sym.count(), num_partitions).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch["src"], "label": batch["src"]})

    labels = (sym.map_batches(init_labels, batch_format="pyarrow",
                              zero_copy_batch=True)
              .groupby("id").aggregate(Min("label", alias_name="label"))
              .materialize())
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
    for _ in range(max_iters):
        prop = sym.join(_repack(labels, labels.count(), num_partitions),
                        join_type="inner", num_partitions=num_partitions,
                        on=("src",), right_on=("id",))

        def to_cand(batch: pa.Table) -> pa.Table:
            return pa.table({"id": batch["dst"], "label": batch["label"]})

        cand = prop.map_batches(to_cand, batch_format="pyarrow",
                                zero_copy_batch=True)
        labels = (cand.union(labels)
                  .groupby("id").aggregate(Min("label", alias_name="label"))
                  .materialize())
        cur_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch["id"], "cluster_id": batch["label"]})

    return labels.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)


def minhash_dedup(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket_size: int = 512,
    max_broadcast_docs: int = 500_000,
    max_driver_pairs: int = 2_000_000,
    small_bytes: int | None = None,
):
    """MinHash+LSH near-duplicate clustering.

    Pipeline (distributed end to end): signature+band explode (map_batches)
    -> groupby(band, band_key) -> size-capped candidate pairs within each
    bucket -> exact-Jaccard verification with the vectorized
    ``pairwise_shingle_jaccard`` kernel -> connected components. Returns
    ``(id_col, cluster_id)`` for documents that belong to a near-dup
    cluster (cluster_id = min member id).

    ``max_bucket_size`` caps each LSH bucket (deterministically: the lowest
    ids win) so a degenerate band key — e.g. millions of empty documents —
    emits at most O(cap^2) pairs instead of O(b^2). Pair generation runs
    per hash PARTITION of buckets (many buckets per task — per-bucket
    map_groups dispatch is a Python call per bucket), and the raw pair
    stream is deduped (``dedup_pairs``, narrow hash-aggregate) before
    verification: a true near-dup pair matches in many of its bands, so
    verifying duplicates would multiply the expensive text stage ~bands x.

    Verification fetches candidate texts once: when the candidate id set
    is under ``max_broadcast_docs`` their texts broadcast via the object
    store and ONE map over the pairs verifies (no further shuffles); larger
    sets fall back to a distributed double hash-join (``attach_texts``).
    Components run as a driver union-find only when the verified pair count
    is under ``max_driver_pairs``; larger graphs fall back to the
    distributed ``label_propagation_components`` (result then arrives as a
    Dataset).
    """
    import ray

    stage = MinHashStage(id_col=id_col, text_col=text_col, num_perm=num_perm,
                         bands=bands, shingle_k=shingle_k)
    banded = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    def gen_pairs(sorted_group: pa.Table, starts: np.ndarray,
                  ends: np.ndarray) -> pa.Table:
        ids = np.asarray(sorted_group[id_col])
        sigs = np.asarray(sorted_group["sig"])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            u, uidx = np.unique(ids[s:e], return_index=True)
            m = len(u)
            if m < 2:
                continue
            cap = u[:max_bucket_size]
            ai, bi = np.triu_indices(len(cap), k=1)
            out_a.append(cap[ai])
            out_b.append(cap[bi])
            if m > max_bucket_size:
                # oversized bucket: DEGRADE, never truncate — chain members
                # adjacent in (full-signature, id) order (m-1 pairs).
                # Identical shingle sets share the signature hash, so they
                # sort contiguous and the chain links every equal-content
                # run completely: exact-duplicate recall survives any
                # bucket size (truncation silently dropped members beyond
                # the cap — a scale-dependent recall hole); near-dup
                # recall inside monster buckets degrades gracefully and
                # verification keeps precision exact either way.
                sg = sigs[s:e][uidx]
                order = np.lexsort((u, sg))
                cu = u[order]
                x, y = cu[:-1], cu[1:]
                out_a.append(np.minimum(x, y))
                out_b.append(np.maximum(x, y))
        if not out_a:
            return _EMPTY_PAIRS
        return pa.table({"a": pa.array(np.concatenate(out_a)),
                         "b": pa.array(np.concatenate(out_b))})

    # at threshold >= 1.0 only equal shingle SETS can verify, so candidate
    # segments additionally split on the content set-hash — the candidate
    # stream collapses to (essentially) the true pairs instead of paying
    # text verification for every signature-collision pair
    pair_keys = (["band", "band_key", "sig"] if threshold >= 1.0
                 else ["band", "band_key"])
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})

    # small-corpus fast path: SAME kernels (MinHashStage, the shared
    # segment-pair generator, pairwise_shingle_jaccard, union-find) in one
    # driver pass — the _part grouping is a function of the bucket key, so
    # whole-table segmentation produces the identical candidate set
    # (equivalence pytest forces small_bytes=0 and compares)
    from .similarity import _try_gather_small

    small = _try_gather_small(
        ds, (64 << 20) if small_bytes is None else small_bytes)
    cand = None
    if small is not None:
        if small.num_rows == 0:
            return empty
        cand_t = _pairs_over_key_segments(stage(small), pair_keys, id_col,
                                          gen_pairs)
        if cand_t.num_rows == 0:
            return empty
        arr = np.unique(np.stack([np.asarray(cand_t["a"], dtype=np.int64),
                                  np.asarray(cand_t["b"], dtype=np.int64)],
                                 axis=1), axis=0)
        if len(arr) <= _DRIVER_VERIFY_PAIRS:
            # few candidates: verify + cluster right here
            ids_all = np.asarray(small[id_col], dtype=np.int64)
            order = np.argsort(ids_all)
            texts = small[text_col].combine_chunks() if isinstance(
                small[text_col], pa.ChunkedArray) else small[text_col]
            texts = texts.take(pa.array(order))
            ia = np.searchsorted(ids_all[order], arr[:, 0])
            ib = np.searchsorted(ids_all[order], arr[:, 1])
            vt = pa.table({"a": pa.array(arr[:, 0]), "b": pa.array(arr[:, 1]),
                           "text_a": texts.take(pa.array(ia)),
                           "text_b": texts.take(pa.array(ib))})
            vt = pairwise_shingle_jaccard(vt, "text_a", "text_b",
                                          k=shingle_k)
            keep = np.asarray(vt["jaccard"]) >= threshold
            pairs = np.unique(np.stack([arr[keep, 0], arr[keep, 1]],
                                       axis=1), axis=0)
            if len(pairs) == 0:
                return empty
            if len(pairs) > max_driver_pairs:
                # honor the driver guard's API contract: past the cap,
                # components run distributed and arrive as a Dataset —
                # exactly like the fully distributed pipeline
                import ray.data as _rd

                verified = _rd.from_arrow(pa.table(
                    {"a": pa.array(pairs[:, 0]),
                     "b": pa.array(pairs[:, 1])}))
                return label_propagation_components(verified, id_col=id_col)
            comp = _connected_components(pairs)
            items = sorted(comp.items())
            return pa.table({
                id_col: pa.array([k for k, _ in items], pa.int64()),
                "cluster_id": pa.array([v for _, v in items], pa.int64()),
            })
        # many candidates: text verification is the COMPUTE-heavy stage —
        # keep it distributed (one map over the pair Dataset with the
        # broadcast texts); only the two candidate shuffles were skipped
        import ray.data as _rd

        cand = _rd.from_arrow(pa.table({"a": pa.array(arr[:, 0]),
                                        "b": pa.array(arr[:, 1])})
                              ).repartition(default_partitions(None, 8)
                                            ).materialize()
        n_cand = len(arr)
    if cand is None:
        cand_raw = _bucketed_pair_partition(
            banded, pair_keys, id_col, gen_pairs).materialize()
        if cand_raw.count() == 0:
            return empty
        # a near-dup pair matches in MANY of its bands by construction, so
        # the raw candidate stream is heavily duplicated — dedup the narrow
        # pairs BEFORE text verification (a pair-dedup shuffle of 16 B/row
        # vs verifying each duplicate against full texts)
        cand = dedup_pairs(cand_raw).materialize()
        n_cand = cand.count()
    if n_cand == 0:
        return empty

    cand_ids = None
    if n_cand <= max_broadcast_docs:
        cand_tbl = gather_table(cand.select_columns(["a", "b"]))
        cand_ids = np.unique(np.concatenate([
            np.asarray(cand_tbl["a"]), np.asarray(cand_tbl["b"]),
        ]))
    use_broadcast = cand_ids is not None and len(cand_ids) <= max_broadcast_docs
    if use_broadcast:
        from .joins import DEFAULT_BROADCAST_BUDGET

        ids_ref = ray.put(cand_ids)

        def pick(batch: pa.Table) -> pa.Table:
            want = ray.get(ids_ref)
            mask = pc.is_in(batch[id_col], value_set=pa.array(want))
            return batch.filter(mask).select([id_col, text_col])

        # one corpus scan into the (spillable) object store, then a
        # metadata byte check before anything reaches the driver — a count
        # guard alone doesn't bound text bytes
        picked_ds = ds.map_batches(pick, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
        if picked_ds.size_bytes() > DEFAULT_BROADCAST_BUDGET:
            use_broadcast = False
    if use_broadcast:
        picked = gather_table(picked_ds)
        pids = np.asarray(picked[id_col])
        order = np.argsort(pids)
        texts = picked[text_col].combine_chunks().take(pa.array(order))
        texts_ref = ray.put((pids[order], texts))

        def verify(batch: pa.Table) -> pa.Table:
            ids_sorted, txt = ray.get(texts_ref)
            a = np.asarray(batch["a"])
            b = np.asarray(batch["b"])
            t = pa.table({"a": batch["a"], "b": batch["b"],
                          "text_a": txt.take(pa.array(
                              np.searchsorted(ids_sorted, a))),
                          "text_b": txt.take(pa.array(
                              np.searchsorted(ids_sorted, b)))})
            t = pairwise_shingle_jaccard(t, "text_a", "text_b", k=shingle_k)
            keep = np.asarray(t["jaccard"]) >= threshold
            return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

        verified = cand.map_batches(verify, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    else:
        with_texts = attach_texts(cand, n_cand, ds, id_col=id_col,
                                  text_col=text_col)
        verified = with_texts.map_batches(
            lambda t: pairwise_shingle_jaccard(t, "text_a", "text_b",
                                               k=shingle_k),
            batch_format="pyarrow", zero_copy_batch=True,
        ).filter(expr=f"jaccard >= {threshold!r}") \
         .select_columns(["a", "b"]).materialize()

    n_pairs = verified.count()
    if n_pairs == 0:
        return empty
    if n_pairs > max_driver_pairs:
        return label_propagation_components(verified, id_col=id_col)
    arr = gather_table(verified)
    pairs = np.unique(np.stack([np.asarray(arr["a"], dtype=np.int64),
                                np.asarray(arr["b"], dtype=np.int64)],
                               axis=1), axis=0)
    comp = _connected_components(pairs)
    items = sorted(comp.items())
    return pa.table(
        {
            id_col: pa.array([k for k, _ in items], pa.int64()),
            "cluster_id": pa.array([v for _, v in items], pa.int64()),
        }
    )


def simhash_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, max_bucket_size: int = 4096,
                  max_driver_pairs: int = 2_000_000,
                  small_bytes: int | None = None):
    """SimHash near-dup: 4 bands of 16 bits (any identical band is a
    candidate — guaranteed to catch all pairs with Hamming distance <= 3),
    verified by exact Hamming distance inside the bucket task. Returns
    verified pairs (a, b, hamming).

    Buckets are size-capped (lowest ids win, deterministic) and the
    multi-band pair dedup runs distributed (groupby on the pair); the final
    result only reaches the driver after a ``max_driver_pairs`` count guard
    — beyond it the verified-pair Dataset is returned instead of a table."""
    from .textstats import FingerprintStage

    fp = FingerprintStage(text_col=text_col)

    def fingerprint_ids(batch: pa.Table) -> pa.Table:
        """Distributed fingerprint stage: only the 16-byte/row
        (id, simhash64) projection leaves the worker — content never
        ships downstream (and never reaches the driver on the fast
        path either)."""
        return fp(batch).select([id_col, "simhash64"])

    def to_bands(batch: pa.Table) -> pa.Table:
        sim = np.asarray(batch["simhash64"]).astype(np.uint64)
        ids = np.asarray(batch[id_col])
        n = len(ids)
        out_id, out_band, out_key, out_sim = [], [], [], []
        for b in range(4):
            key = ((sim >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_id.append(ids)
            out_band.append(np.full(n, b, dtype=np.int64))
            out_key.append(key)
            out_sim.append(sim.astype(np.int64))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "band": pa.array(np.concatenate(out_band)),
                "band_key": pa.array(np.concatenate(out_key)),
                "simhash": pa.array(np.concatenate(out_sim)),
            }
        )

    def gen_pairs(sorted_group: pa.Table, starts: np.ndarray,
                  ends: np.ndarray) -> pa.Table:
        from .similarity import _popcount64

        ids = np.asarray(sorted_group[id_col])
        sims = np.asarray(sorted_group["simhash"]).astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            uniq_all, idx_all = np.unique(ids[s:e], return_index=True)
            m = len(uniq_all)
            if m < 2:
                continue
            uniq, idx = uniq_all[:max_bucket_size], idx_all[:max_bucket_size]
            sv = sims[s:e][idx]
            ai, bi = np.triu_indices(len(uniq), k=1)
            ham = _popcount64(sv[ai] ^ sv[bi])
            keep = ham <= max_hamming
            out_a.append(uniq[ai][keep])
            out_b.append(uniq[bi][keep])
            out_h.append(ham[keep])
            if m > max_bucket_size:
                # oversized bucket: degrade to a (simhash, id)-sorted chain
                # (see minhash gen_pairs) — identical simhashes sort
                # adjacent, so Hamming-0 recall survives any bucket size
                sv_all = sims[s:e][idx_all]
                order = np.lexsort((uniq_all, sv_all))
                cu, cs = uniq_all[order], sv_all[order]
                ch = _popcount64(cs[:-1] ^ cs[1:])
                keep_c = ch <= max_hamming
                x, y = cu[:-1][keep_c], cu[1:][keep_c]
                out_a.append(np.minimum(x, y))
                out_b.append(np.maximum(x, y))
                out_h.append(ch[keep_c])
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(out_a)),
                         "b": pa.array(np.concatenate(out_b)),
                         "hamming": pa.array(np.concatenate(out_h))})

    # Fingerprint FIRST, distributed, on the actor/task pool — the
    # driver only ever sees the tiny (id, simhash64) projection. The
    # r4 regression (21.7s driver-side FingerprintStage on 5k docs)
    # came from gathering raw text and fingerprinting single-threaded.
    fph = ds.map_batches(fingerprint_ids, batch_format="pyarrow",
                         zero_copy_batch=True)

    # small-corpus fast path: band/pair kernels in one driver pass over
    # the 16-byte/row projection (the _part grouping is a function of
    # the band key); 64 MB of (id, simhash64) covers ~4M docs
    from .similarity import _try_gather_small

    small = _try_gather_small(
        fph, (64 << 20) if small_bytes is None else small_bytes)
    if small is not None:
        if small.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        cand_t = _pairs_over_key_segments(to_bands(small),
                                          ["band", "band_key"], id_col,
                                          gen_pairs)  # small == (id, simhash64)
        if cand_t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        # multi-band dedup with Min(hamming) — hamming is a function of
        # the pair, so any representative is exact
        arr = np.stack([np.asarray(cand_t["a"], np.int64),
                        np.asarray(cand_t["b"], np.int64)], axis=1)
        ham = np.asarray(cand_t["hamming"], np.int64)
        uniq, inv = np.unique(arr, axis=0, return_inverse=True)
        hmin = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(hmin, inv, ham)
        out = pa.table({"a": pa.array(uniq[:, 0]),
                        "b": pa.array(uniq[:, 1]),
                        "hamming": pa.array(hmin)})
        if out.num_rows > max_driver_pairs:
            # honor the driver guard's API contract: past the cap the
            # caller gets a (sorted) Dataset, exactly like the
            # distributed path
            import ray.data as _rd

            return _rd.from_arrow(out).sort(["a", "b"])
        return out

    # multi-bucket pair generation per hash partition, then distributed
    # pair dedup (hamming is a function of (a, b) -> Min carries it exact)
    banded = fph.map_batches(to_bands, batch_format="pyarrow",
                             zero_copy_batch=True)
    deduped = dedup_pairs(
        _bucketed_pair_partition(banded, ["band", "band_key"], id_col,
                                 gen_pairs),
        value_cols=("hamming",),
    ).materialize()
    if deduped.count() > max_driver_pairs:
        return deduped.sort(["a", "b"])
    tbl = gather_table(deduped)
    if tbl.num_rows == 0:
        return tbl
    order = np.lexsort((np.asarray(tbl["b"]), np.asarray(tbl["a"])))
    return tbl.take(order)


class ContaminationStage:
    """Benchmark-decontamination stage: flag corpus documents whose
    word-``k``-shingle sets overlap a benchmark/eval set — the standard
    pre-training hygiene step (don't train on the test set).

    The benchmark's distinct shingle hashes are built ONCE in ``__init__``
    (per actor) from a broadcast ``ray.put`` ref — a fixed-width uint64
    array, tiny next to the corpus — and each batch computes, fully
    vectorized, the fraction of every document's distinct shingles that
    appear in it (sorted-array ``searchsorted`` membership + lexsort
    distinct counts; no Python over rows). Emits ``n_shingles``,
    ``n_overlap``, ``overlap_frac`` and the boolean ``contaminated``.
    """

    def __init__(self, bench_ref, *, text_col: str = "text", k: int = 1,
                 threshold: float = 0.5):
        import ray

        bench = (ray.get(bench_ref)
                 if not isinstance(bench_ref, np.ndarray) else bench_ref)
        self.bench = np.sort(np.asarray(bench, dtype=np.uint64))
        self.text_col = text_col
        self.k = k
        self.threshold = threshold

    @staticmethod
    def bench_shingles(texts, k: int = 1) -> np.ndarray:
        """Benchmark text array -> distinct shingle-hash set (driver-side;
        the benchmark is small by definition)."""
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(list(texts), pa.string())
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h, _ = _shingle_hashes(texts, k)
        return np.unique(h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = batch.num_rows
        h, counts = _shingle_hashes(text, self.k)
        rows = np.repeat(np.arange(n), counts)
        n_distinct = _distinct_per_row(rows, h, n)
        idx = np.searchsorted(self.bench, h)
        idx_c = np.clip(idx, 0, max(0, len(self.bench) - 1))
        hit = (self.bench[idx_c] == h) if len(self.bench) else np.zeros(
            len(h), dtype=bool)
        n_overlap = _distinct_per_row(rows[hit], h[hit], n)
        frac = np.where(n_distinct > 0, n_overlap / np.maximum(n_distinct, 1),
                        0.0)
        out = batch.append_column("n_shingles", pa.array(n_distinct))
        out = out.append_column("n_overlap", pa.array(n_overlap))
        out = out.append_column("overlap_frac", pa.array(frac, pa.float64()))
        return out.append_column("contaminated",
                                 pa.array(frac >= self.threshold))


# ---------------------------------------------------------------------------
# paragraph-level exact dedup (C4 / CCNet-style)
# ---------------------------------------------------------------------------


def paragraph_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    sep: str = "\n\n", num_partitions: int | None = None,
                    doc_partitions: int | None = None,
                    small_bytes: int | None = None):
    """C4/CCNet-style paragraph-level exact dedup: split each document on
    ``sep``, keep only the GLOBALLY FIRST occurrence of every distinct
    paragraph (first = lexicographically least ``(id, paragraph_index)``),
    and reassemble each document from its surviving paragraphs in order.
    Returns ``(id_col, text_col)``; a document whose every paragraph is a
    duplicate keeps its row with an empty string (stable row count).

    Scale shape (10^10-doc design point): TWO narrow shuffles and zero
    content movement until the final doc-partitioned rebuild —
    1. explode to ``(id, idx, hash64(paragraph))`` per batch (content never
       leaves the task), shuffle ``(hash, id, idx)`` partitioned by hash;
    2. winners per hash partition via one lexsort (no per-paragraph
       dispatch), shuffle the KEPT ``(id, idx)`` pairs partitioned by id;
    3. rebuild per id partition: original docs co-partitioned with their
       kept indices, re-split locally, gather + join — vectorized with one
       flat paragraph array per group.
    Paragraph identity is the 64-bit content hash (same collision stance
    as ``exact_dedup``). Real corpora split on blank lines (the default
    ``sep``); any literal separator works."""
    num_partitions = default_partitions(num_partitions, 64)
    doc_partitions = default_partitions(doc_partitions, 64)
    id_t = None  # resolved from the first batch

    def explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        parts = pc.split_pattern(text, sep)
        flat = pc.list_flatten(parts)
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts).astype(np.int64)
        offsets = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        idx = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(
            offsets[:-1], counts)
        ids = pc.take(batch[id_col],
                      pa.array(np.repeat(np.arange(len(counts)), counts)))
        ph = stable_hash64(flat)
        return pa.table({
            id_col: ids,
            "_pidx": pa.array(idx),
            "_ph": pa.array(ph.view(np.int64)),
            "_part": pa.array((ph % np.uint64(num_partitions))
                              .astype(np.int64)),
        })

    def winners(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col])
        idx = np.asarray(group["_pidx"])
        ph = np.asarray(group["_ph"])
        order = np.lexsort((idx, ids, ph))
        ph_s = ph[order]
        first = np.ones(len(ph_s), dtype=bool)
        if len(ph_s) > 1:
            first[1:] = ph_s[1:] != ph_s[:-1]
        kept = group.take(pa.array(order[first])).select([id_col, "_pidx"])
        h = stable_hash64(kept[id_col])
        return kept.append_column(
            "_dpart", pa.array((h % np.uint64(doc_partitions))
                               .astype(np.int64)))

    from .similarity import _try_gather_small

    small = _try_gather_small(
        ds, (64 << 20) if small_bytes is None else small_bytes)

    kept_pairs = None if small is not None else (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(winners, batch_format="pyarrow")
    )

    def tag_docs(batch: pa.Table) -> pa.Table:
        h = stable_hash64(batch[id_col])
        return pa.table({
            id_col: batch[id_col],
            text_col: batch[text_col],
            "_pidx": pa.nulls(batch.num_rows, pa.int64()),
            "_dpart": pa.array((h % np.uint64(doc_partitions))
                               .astype(np.int64)),
        })

    def tag_kept(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            text_col: pa.nulls(batch.num_rows, pa.string()),
            "_pidx": batch["_pidx"],
            "_dpart": batch["_dpart"],
        })

    if small is None:
        docs_tagged = ds.map_batches(tag_docs, batch_format="pyarrow",
                                     zero_copy_batch=True)
        kept_tagged = kept_pairs.map_batches(tag_kept, batch_format="pyarrow",
                                             zero_copy_batch=True)

    def rebuild(group: pa.Table) -> pa.Table:
        is_doc = pc.is_valid(group[text_col])
        docs = group.filter(is_doc)
        kept = group.filter(pc.invert(is_doc))
        text = docs[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        parts = pc.split_pattern(text, sep)
        flat = pc.list_flatten(parts)
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts).astype(np.int64)
        offsets = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        # doc_id -> row position in this group's docs table
        doc_ids = np.asarray(docs[id_col])
        order = np.argsort(doc_ids, kind="stable")
        sorted_ids = doc_ids[order]
        k_ids = np.asarray(kept[id_col])
        k_idx = np.asarray(kept["_pidx"])
        pos = np.searchsorted(sorted_ids, k_ids)
        row = order[np.clip(pos, 0, max(0, len(order) - 1))] if len(order) \
            else np.zeros(0, np.int64)
        valid = (len(order) > 0) & (sorted_ids[np.clip(
            pos, 0, max(0, len(sorted_ids) - 1))] == k_ids) if len(k_ids) \
            else np.zeros(0, dtype=bool)
        row, k_idx = row[valid], k_idx[valid]
        flat_pos = offsets[row] + k_idx
        sel = np.lexsort((k_idx, row))
        flat_pos = flat_pos[sel]
        row_s = row[sel]
        kept_flat = flat.take(pa.array(flat_pos))
        per_doc = np.bincount(row_s, minlength=len(counts)).astype(np.int64)
        new_off = np.zeros(len(per_doc) + 1, np.int64)
        np.cumsum(per_doc, out=new_off[1:])
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(new_off, pa.int32()),
                                     kept_flat), sep)
        return pa.table({id_col: docs[id_col], text_col: joined})

    if small is not None:
        # driver fast path, SAME kernels end to end: the hash partitions
        # are functions of (paragraph hash / doc id), so whole-table
        # winners/rebuild equal the union of per-partition results
        # (equivalence pytest forces small_bytes=0 and compares)
        if small.num_rows == 0:
            return ds  # zero rows pass through (schema may be lost)
        import ray.data as rd

        kept = winners(explode(small))
        union = pa.concat_tables([tag_docs(small), tag_kept(kept)],
                                 promote_options="default")
        return rd.from_arrow(rebuild(union))
    return (docs_tagged.union(kept_tagged)
            .groupby("_dpart")
            .map_groups(rebuild, batch_format="pyarrow"))
