import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from nifi_processors_ray.stages.dedup import (
    MinHashStage,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard,
    simhash_dedup,
)
from nifi_processors_ray.stages.similarity import (
    embedding_neardup,
    knn_topk,
    lsh_bucket_topk,
)

BASE = "the quick brown fox jumps over the lazy dog and runs far away today"


def _docs():
    texts, ids = [], []
    for i in range(30):
        ids.append(i)
        if i % 10 == 3:
            texts.append(BASE)  # exact dups of each other
        elif i % 10 == 4:
            texts.append(BASE.replace("lazy", "sleepy"))  # near-dup of BASE
        else:
            texts.append(f"unique document {i} about topic{i} with words "
                         f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_ngram_jaccard():
    assert ngram_jaccard(BASE, BASE) == 1.0
    near = ngram_jaccard(BASE, BASE.replace("lazy", "sleepy"))
    assert 0.5 < near < 1.0
    assert ngram_jaccard(BASE, "totally different words entirely") < 0.05


def test_exact_dedup_keeps_min_id():
    ds = rd.from_arrow(_docs())
    out = pa.table(exact_dedup(ds).to_pandas())
    ids = sorted(out["doc_id"].to_pylist())
    # docs 3/13/23 identical -> keep 3; docs 4/14/24 identical -> keep 4
    assert 3 in ids and 13 not in ids and 23 not in ids
    assert 4 in ids and 14 not in ids and 24 not in ids
    assert len(ids) == 30 - 4


def test_minhash_dedup_clusters_exact_and_near():
    ds = rd.from_arrow(_docs())
    out = minhash_dedup(ds, threshold=0.5)
    clusters = dict(zip(out["doc_id"].to_pylist(), out["cluster_id"].to_pylist()))
    # each identical triple clusters together (exact dups always collide in
    # every LSH band); the one-word variant group (J~=0.6 vs BASE) is below
    # the 16x8 banding's reliable-candidate region and forms its own cluster
    assert clusters[3] == clusters[13] == clusters[23] == 3
    assert clusters[4] == clusters[14] == clusters[24] == 4
    # unique docs are not clustered
    assert 0 not in clusters and 7 not in clusters


def test_minhash_oversized_bucket_chain_keeps_full_recall():
    """A duplicate group LARGER than max_bucket_size must still resolve
    completely: the oversized-bucket fallback chains members adjacent in
    (set-hash, id) order instead of truncating (truncation silently
    dropped members beyond the cap — the round-3 scale-dependent recall
    hole)."""
    texts = (["alpha beta gamma delta"] * 40
             + ["omega psi chi"] * 25
             + [f"unique doc number {i} filler" for i in range(20)])
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)})
    out = minhash_dedup(rd.from_arrow(t), threshold=1.0, shingle_k=1,
                        num_perm=16, bands=1, max_bucket_size=8)
    got = dict(zip(out["doc_id"].to_pylist(), out["cluster_id"].to_pylist()))
    assert {k for k, v in got.items() if v == 0} == set(range(40))
    assert {k for k, v in got.items() if v == 40} == set(range(40, 65))
    assert len(got) == 65


def test_minhash_signature_similarity_tracks_jaccard():
    stage = MinHashStage(num_perm=128, bands=16)
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": [BASE, BASE.replace("lazy", "sleepy"),
                           "other thing entirely about nothing shared here"]})
    sig = stage.signatures(t)
    est_near = (sig[0] == sig[1]).mean()
    est_far = (sig[0] == sig[2]).mean()
    assert est_near > 0.5 > est_far


def test_simhash_pairs():
    ds = rd.from_arrow(_docs())
    out = simhash_dedup(ds, max_hamming=4)
    pairs = {(a, b) for a, b in zip(out["a"].to_pylist(), out["b"].to_pylist())}
    assert (3, 13) in pairs and (3, 23) in pairs and (13, 23) in pairs


def _embeddings(n=64, d=16):
    rng = np.random.Generator(np.random.PCG64(3))
    m = rng.standard_normal((n, d))
    m[7] = m[3] + 0.001 * rng.standard_normal(d)  # near-dup pair (3, 7)
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                     "embedding": pa.array(list(m), pa.list_(pa.float64()))})


def test_knn_topk_matches_numpy():
    tbl = _embeddings()
    m = np.stack(tbl["embedding"].to_pylist())
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ds = rd.from_arrow(tbl)
    out = knn_topk(ds, [0], m[:1], k=5)
    got = out["vec_id"].to_pylist()
    sims = mn @ mn[0]
    sims[0] = -np.inf  # exclude self
    expect = np.argsort(-sims)[:5].tolist()
    assert got == expect
    assert len(out) == 5
    s = out["score"].to_pylist()
    assert s == sorted(s, reverse=True)


def test_knn_topk_concurrency_kwarg_and_autoscale():
    """The scoring actor pool is caller-sizable (explicit int passes
    through) and autoscales to the cluster when unset — a hardcoded pool
    would idle a multi-node fleet (round-2 verdict #3)."""
    from nifi_processors_ray.stages.similarity import _resolve_concurrency

    assert _resolve_concurrency(2) == 2
    assert _resolve_concurrency((1, 8)) == (1, 8)
    auto = _resolve_concurrency(None)  # Ray is initialised by conftest
    assert isinstance(auto, tuple) and auto[0] == 1 and auto[1] >= 2

    tbl = _embeddings()
    m = np.stack(tbl["embedding"].to_pylist())
    out = knn_topk(rd.from_arrow(tbl), [0], m[:1], k=3, concurrency=2)
    base = knn_topk(rd.from_arrow(tbl), [0], m[:1], k=3)
    assert out["vec_id"].to_pylist() == base["vec_id"].to_pylist()


def test_lsh_topk_finds_near_duplicate():
    tbl = _embeddings()
    m = np.stack(tbl["embedding"].to_pylist())
    ds = rd.from_arrow(tbl)
    out = lsh_bucket_topk(ds, [3], m[3:4], k=3, n_bits=6)
    assert out["vec_id"].to_pylist()[0] == 7  # the planted near-dup survives LSH


def test_embedding_neardup():
    ds = rd.from_arrow(_embeddings())
    out = embedding_neardup(ds, threshold=0.999, n_bits=5)
    pairs = {(a, b) for a, b in zip(out["a"].to_pylist(), out["b"].to_pylist())}
    assert (3, 7) in pairs


def test_pairwise_shingle_jaccard_matches_scalar_kernel():
    import pyarrow as pa

    from nifi_processors_ray.stages.dedup import (ngram_jaccard,
                                                  pairwise_shingle_jaccard)

    a = ["the quick brown fox", "alpha beta gamma", "", "x x x y"]
    b = ["the quick brown cat", "alpha beta gamma", "", "x y"]
    t = pa.table({"ta": a, "tb": b})
    for k in (1, 3):
        out = pairwise_shingle_jaccard(t, "ta", "tb", k=k)
        got = out["jaccard"].to_pylist()
        want = [ngram_jaccard(x, y, k) for x, y in zip(a, b)]
        assert all(abs(g - w) < 1e-12 for g, w in zip(got, want)), (k, got, want)


def test_minhash_dedup_label_propagation_matches_union_find():
    """max_driver_pairs=0 forces the distributed min-label-propagation
    components; the clusters must equal the driver union-find result."""
    ds = rd.from_arrow(_docs())
    want = minhash_dedup(ds, threshold=0.5)
    got_ds = minhash_dedup(ds, threshold=0.5, max_driver_pairs=0)
    got = pa.table(got_ds.to_pandas()).sort_by("doc_id")
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["cluster_id"].to_pylist() == want["cluster_id"].to_pylist()


def test_label_propagation_components_chain():
    """A 4-node chain (edges only between neighbors) needs >1 iteration to
    converge; every node must end with the min member label."""
    from nifi_processors_ray.stages.dedup import label_propagation_components

    edges = rd.from_arrow(pa.table({"a": [10, 11, 12, 50], "b": [11, 12, 13, 51]}))
    out = pa.table(label_propagation_components(edges, id_col="doc_id")
                   .to_pandas()).sort_by("doc_id")
    got = dict(zip(out["doc_id"].to_pylist(), out["cluster_id"].to_pylist()))
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 50: 50, 51: 50}


def test_simhash_dedup_returns_dataset_beyond_guard():
    ds = rd.from_arrow(_docs())
    out = simhash_dedup(ds, max_hamming=4, max_driver_pairs=0)
    assert not isinstance(out, pa.Table)  # Dataset path
    tbl = pa.table(out.to_pandas())
    pairs = {(a, b) for a, b in zip(tbl["a"].to_pylist(), tbl["b"].to_pylist())}
    assert (3, 13) in pairs and (3, 23) in pairs and (13, 23) in pairs


def test_embedding_neardup_join_fallback_matches_broadcast():
    """max_broadcast_ids=0 forces the distributed join verification path;
    results must equal the broadcast-matrix route."""
    ds = rd.from_arrow(_embeddings())
    want = embedding_neardup(ds, threshold=0.999, n_bits=5)
    got = embedding_neardup(ds, threshold=0.999, n_bits=5, max_broadcast_ids=0)
    assert got["a"].to_pylist() == want["a"].to_pylist()
    assert got["b"].to_pylist() == want["b"].to_pylist()
    assert np.allclose(got["cosine"].to_pylist(), want["cosine"].to_pylist())


def test_minhash_dedup_join_fallback_matches_broadcast():
    ds = rd.from_arrow(_docs())
    want = minhash_dedup(ds, threshold=0.5)
    got = minhash_dedup(ds, threshold=0.5, max_broadcast_docs=0)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["cluster_id"].to_pylist() == want["cluster_id"].to_pylist()


def test_ivf_topk_finds_near_duplicate_and_bounds_scan():
    from nifi_processors_ray.stages.similarity import ivf_topk

    tbl = _embeddings(n=256)
    m = np.stack(tbl["embedding"].to_pylist())
    ds = rd.from_arrow(tbl)
    out = ivf_topk(ds, [3], m[3:4], k=3, n_centroids=16, nprobe=4)
    assert out["vec_id"].to_pylist()[0] == 7  # planted near-dup survives IVF
    assert len(out) == 3
    s = out["score"].to_pylist()
    assert s == sorted(s, reverse=True)


def test_ivf_topk_full_probe_matches_exact():
    from nifi_processors_ray.stages.similarity import ivf_topk, knn_topk

    tbl = _embeddings(n=128)
    m = np.stack(tbl["embedding"].to_pylist())
    ds = rd.from_arrow(tbl)
    exact = knn_topk(ds, [0, 5], m[[0, 5]], k=5)
    # probing every centroid scans the whole corpus -> identical to exact
    full = ivf_topk(ds, [0, 5], m[[0, 5]], k=5, n_centroids=8, nprobe=8)
    assert full.equals(exact)


def test_contamination_stage_flags_benchmark_overlap():
    import ray

    from nifi_processors_ray.stages.dedup import ContaminationStage

    bench = ["the quick brown fox", "completely unrelated benchmark line"]
    ref = ray.put(ContaminationStage.bench_shingles(bench, k=1))
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": ["the quick brown fox jumps",   # 4/5 overlap
                           "nothing shared here at all",
                           ""]})
    out = ContaminationStage(ref, k=1, threshold=0.5)(t)
    assert out["n_overlap"].to_pylist() == [4, 0, 0]
    assert out["contaminated"].to_pylist() == [True, False, False]
    fr = out["overlap_frac"].to_pylist()
    assert abs(fr[0] - 0.8) < 1e-12

    # distributed over a Dataset
    ds = rd.from_arrow(_docs())
    flagged = pa.table(ds.map_batches(
        ContaminationStage, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"k": 1, "threshold": 0.3},
        batch_format="pyarrow", concurrency=2).to_pandas())
    got = dict(zip(flagged["doc_id"].to_pylist(),
                   flagged["contaminated"].to_pylist()))
    assert got[3] is True     # BASE doc contains the fox sentence
    assert got[0] is False


def test_paragraph_dedup_matches_bruteforce():
    import ray.data as rd

    from nifi_processors_ray.stages.dedup import paragraph_dedup

    docs = [
        (0, "alpha beta\n\nshared one\n\ngamma"),
        (1, "shared one\n\ndelta\n\nshared two"),
        (2, "shared two\n\nshared one\n\nepsilon\n\nshared one"),
        (3, "shared one\n\nshared two"),          # fully duplicated -> ""
        (4, ""),                                   # empty doc: one "" para
        (5, "\n\nzeta"),                           # leading empty para (dup of 4's "")
    ]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs]})
    out = paragraph_dedup(rd.from_arrow(tbl), num_partitions=4,
                          doc_partitions=4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)

    # brute force: first global occurrence of each paragraph wins
    seen = {}
    for d, t in docs:
        for i, p in enumerate(t.split("\n\n")):
            seen.setdefault(p, (d, i))
    want = []
    for d, t in docs:
        kept = [p for i, p in enumerate(t.split("\n\n"))
                if seen[p] == (d, i)]
        want.append("\n\n".join(kept))
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]
    assert out["text"].tolist() == want


def test_paragraph_dedup_stable_rowcount_and_order_dedup():
    import ray.data as rd

    from nifi_processors_ray.stages.dedup import paragraph_dedup

    # 200 docs over a 10-paragraph pool: every paragraph survives exactly
    # once, rows are preserved, and total kept paragraphs == pool size
    pool = [f"para {i} body" for i in range(10)]
    rng = np.random.default_rng(3)
    ids = list(range(200))
    texts = ["\n\n".join(pool[j] for j in rng.integers(0, 10, size=5))
             for _ in ids]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    out = paragraph_dedup(rd.from_arrow(tbl), num_partitions=8,
                          doc_partitions=8).to_pandas()
    assert len(out) == 200
    kept_all = [p for t in out["text"] if t for p in t.split("\n\n")]
    assert sorted(kept_all) == sorted(set(kept_all)) == sorted(pool)


def test_small_corpus_fast_path_matches_distributed():
    """knn/lsh driver-side fast path (small_bytes budget) is the SAME math
    as the distributed actor-pool path — outputs must be identical;
    small_bytes=0 forces the distributed path. IVF's training sample is
    batching-dependent by design, so it pins the planted top-1 (layout-
    independent) rather than full equality."""
    import numpy as np
    import ray.data as rd

    from nifi_processors_ray.stages.similarity import (_to_matrix, ivf_topk,
                                                       knn_topk,
                                                       lsh_bucket_topk)

    rng = np.random.default_rng(5)
    n, d = 400, 16
    mat = rng.standard_normal((n, d))
    mat[7] = mat[3]  # planted duplicate: top-1 of query 3 is id 7
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array(list(mat))})
    ds = rd.from_arrow(t).repartition(4)
    q_ids = [3, 11]
    q_mat = _to_matrix(t.filter(
        pc.is_in(t["vec_id"], value_set=pa.array(q_ids)))["embedding"])

    for fn, kwargs in [(knn_topk, {}), (lsh_bucket_topk, {"n_bits": 5})]:
        fast = fn(ds, q_ids, q_mat, k=4, **kwargs)
        slow = fn(ds, q_ids, q_mat, k=4, small_bytes=0, **kwargs)
        fast = fast.sort_by([("query_id", "ascending"), ("score", "descending"),
                             ("vec_id", "ascending")])
        slow = slow.sort_by([("query_id", "ascending"), ("score", "descending"),
                             ("vec_id", "ascending")])
        assert fast.column("vec_id").to_pylist() == slow.column("vec_id").to_pylist(), fn
        assert np.allclose(np.asarray(fast["score"]), np.asarray(slow["score"])), fn

    for small in (None, 0):
        out = ivf_topk(ds, [3], q_mat[:1], k=1, n_centroids=8, nprobe=4,
                       **({} if small is None else {"small_bytes": 0}))
        assert out.column("vec_id").to_pylist() == [7], small


def test_embedding_neardup_fast_path_matches_distributed():
    """The small-corpus driver path of embedding_neardup runs the SAME
    bucket/pair kernels — output must equal the distributed path
    (small_bytes=0), including planted near-dups and oversized-bucket
    chain behavior."""
    import numpy as np
    import ray.data as rd

    from nifi_processors_ray.stages.similarity import embedding_neardup

    rng = np.random.default_rng(11)
    n, d = 300, 12
    mat = rng.standard_normal((n, d))
    mat[17] = mat[5]                      # exact duplicate
    mat[40] = mat[20] + 0.01 * rng.standard_normal(d)  # near duplicate
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array(list(mat))})
    ds = rd.from_arrow(t).repartition(4)
    kw = dict(threshold=0.95, n_bits=4, max_bucket_size=32)
    fast = embedding_neardup(ds, **kw)
    slow = embedding_neardup(ds, small_bytes=0, **kw)
    fa = list(zip(fast.column("a").to_pylist(), fast.column("b").to_pylist()))
    sl = list(zip(slow.column("a").to_pylist(), slow.column("b").to_pylist()))
    assert fa == sl
    assert (5, 17) in fa
    assert np.allclose(sorted(np.asarray(fast["cosine"])),
                       sorted(np.asarray(slow["cosine"])))


def test_dedup_fast_paths_match_distributed():
    """exact_dedup / paragraph_dedup driver fast paths run the same
    kernels as the partitioned shuffles — outputs must be identical
    (small_bytes=0 forces the distributed path)."""
    import numpy as np
    import ray.data as rd

    from nifi_processors_ray.stages.dedup import exact_dedup, paragraph_dedup

    texts = ["a b\n\nc d\n\na b", "c d\n\nx", "a b\n\nc d\n\na b", "", "x"]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(3)

    for fn in (exact_dedup, paragraph_dedup):
        fast = fn(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        slow = fn(ds, small_bytes=0).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert fast.equals(slow), (fn.__name__, fast, slow)


def test_minhash_fast_path_matches_distributed():
    """minhash_dedup's small-corpus driver path shares every kernel with
    the distributed pipeline — clusters must be identical, at exact
    (threshold 1.0, set-hash-keyed buckets) AND approximate thresholds,
    including the oversized-bucket chain fallback."""
    import numpy as np
    import ray.data as rd

    from nifi_processors_ray.stages.dedup import minhash_dedup

    base = ["the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "how vexingly quick daft zebras jump"]
    texts = []
    for i in range(120):
        t = base[i % 3]
        if i % 5 == 0:
            t = t + f" extra{i % 7}"
        texts.append(t)
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(3)
    for kw in (dict(threshold=1.0, shingle_k=1, num_perm=16, bands=1),
               dict(threshold=0.5, max_bucket_size=16)):
        fast = minhash_dedup(ds, **kw)
        slow = minhash_dedup(ds, small_bytes=0, **kw)
        f = fast.to_pandas() if not hasattr(fast, "iter_batches") else fast.to_pandas()
        s_ = slow.to_pandas() if not hasattr(slow, "iter_batches") else slow.to_pandas()
        f = f.sort_values("doc_id").reset_index(drop=True)
        s_ = s_.sort_values("doc_id").reset_index(drop=True)
        assert f.equals(s_), (kw, f.head(), s_.head())


def test_simhash_fast_path_matches_distributed():
    """simhash_dedup's driver fast path shares the band/pair kernels —
    verified pairs and hamming values must be identical."""
    ds = rd.from_arrow(_docs())
    fast = simhash_dedup(ds, max_hamming=4)
    slow = simhash_dedup(ds, max_hamming=4, small_bytes=0)
    assert fast.to_pydict() == slow.to_pydict()
