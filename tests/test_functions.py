"""functions/: gather_table (Arrow-native driver gather) and
default_partitions (cluster-sized shuffle defaults)."""
import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from nifi_processors_ray.functions import gather_table
from nifi_processors_ray.functions.scale import (cluster_cpus,
                                                 default_partitions)


def test_gather_table_preserves_dtypes_and_handles_empty():
    t = pa.table({
        "i": pa.array([1, 2, 3], pa.int64()),
        "u": pa.array([1, 2, 3], pa.uint64()),  # pandas would coerce this
        "s": pa.array(["a", None, "c"], pa.large_string()),
    })
    got = gather_table(rd.from_arrow(t).repartition(2))
    got = got.sort_by([("i", "ascending")])
    assert got.schema.field("u").type == pa.uint64()
    assert got.column("i").to_pylist() == [1, 2, 3]
    assert got.column("s").to_pylist() == ["a", None, "c"]
    # passthrough for tables, empty datasets keep a usable result
    assert gather_table(t) is t
    empty = rd.from_arrow(t.slice(0, 0))
    assert gather_table(empty).num_rows == 0


def test_default_partitions_explicit_wins_and_floor_holds():
    assert default_partitions(7, 64) == 7           # explicit always wins
    n = default_partitions(None, 64)
    assert n >= 64                                   # floor holds
    assert n >= min(64, cluster_cpus())              # scales with cluster
    assert default_partitions(None, 1) == max(1, cluster_cpus())
