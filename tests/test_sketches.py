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
