"""HyperLogLog approx-distinct: accuracy within the sketch's error bound
against exact distinct counts, invariance to partitioning."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from nifi_processors_ray.stages.sketches import approx_distinct


def test_hll_accuracy_large():
    n = 50_000
    vals = [f"user_{i}" for i in range(n)] * 2  # every value twice
    ds = rd.from_arrow(pa.table({"u": vals})).repartition(8)
    est = approx_distinct(ds, "u", p=12)
    assert abs(est - n) / n < 0.05  # ~3 sigma at 1.6% stderr


def test_hll_small_range_linear_counting():
    ds = rd.from_arrow(pa.table({"u": [f"x{i}" for i in range(100)] * 5}))
    est = approx_distinct(ds, "u", p=12)
    assert abs(est - 100) / 100 < 0.05


def test_hll_partition_invariant():
    vals = pa.table({"u": [f"k{i % 1000}" for i in range(20_000)]})
    a = approx_distinct(rd.from_arrow(vals), "u")
    b = approx_distinct(rd.from_arrow(vals).repartition(16), "u")
    assert a == b  # register-max merge is associative and deterministic


def test_approx_heavy_hitters_recovers_zipf_head():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nifi_processors_ray.stages.sketches import approx_heavy_hitters

    rng = np.random.default_rng(12)
    # zipf-ish: token i has frequency ~ 1/(i+1)
    pop = np.repeat(np.arange(400), (4000 / (np.arange(400) + 1)).astype(int))
    rng.shuffle(pop)
    vals = pa.array([f"tok{int(i)}" for i in pop])
    t = pa.table({"v": vals})
    n = len(pop)

    ds = rd.from_arrow(t).repartition(8)
    out = approx_heavy_hitters(ds, "v", k=10, capacity=64).to_pandas()
    got = out["v"].tolist()
    # exact top-10 by construction: tok0..tok9
    expect = [f"tok{i}" for i in range(10)]
    assert got == expect
    # deficient counts are lower bounds within the MG guarantee
    import collections

    true = collections.Counter(f"tok{int(i)}" for i in pop)
    for v, est in zip(out["v"], out["est_count"]):
        assert est <= true[v]
        assert true[v] - est <= n / (64 + 1) * 8  # <= per-batch bound x batches


def test_hll_fast_path_equals_distributed():
    """The byte-guarded driver merge and the forced-distributed groupby
    merge produce the identical estimate (register-max is associative)."""
    vals = pa.table({"u": [f"k{i % 777}" for i in range(10_000)]})
    ds = rd.from_arrow(vals).repartition(8)
    fast = approx_distinct(ds, "u", p=10)
    dist = approx_distinct(ds, "u", p=10, small_bytes=0)
    assert fast == dist


def test_heavy_hitters_fast_path_equals_distributed():
    from nifi_processors_ray.stages.sketches import approx_heavy_hitters

    rng = np.random.default_rng(5)
    pop = np.repeat(np.arange(300), (3000 / (np.arange(300) + 1)).astype(int))
    rng.shuffle(pop)
    ds = rd.from_arrow(
        pa.table({"v": [f"t{int(i)}" for i in pop]})).repartition(6)
    fast = approx_heavy_hitters(ds, "v", k=12, capacity=64).to_pandas()
    dist = approx_heavy_hitters(ds, "v", k=12, capacity=64,
                                small_bytes=0).to_pandas()
    assert fast["v"].tolist() == dist["v"].tolist()
    assert fast["est_count"].tolist() == dist["est_count"].tolist()
