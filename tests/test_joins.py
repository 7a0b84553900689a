import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from nifi_processors_ray.stages.joins import broadcast_lookup, bucket_join


def test_bucket_join_matches_pyarrow():
    n = 500
    left = pa.table({"k": pa.array(np.arange(n, dtype=np.int64) % 97),
                     "lv": pa.array(np.arange(n, dtype=np.int64))})
    right = pa.table({"rk": pa.array(np.arange(0, 120, dtype=np.int64)),
                      "rv": pa.array(np.arange(0, 120, dtype=np.int64) * 10)})
    out = bucket_join(rd.from_arrow(left), rd.from_arrow(right),
                      left_on="k", right_on="rk", num_buckets=8)
    got = out.to_pandas().sort_values(["lv"]).reset_index(drop=True)
    expect = (left.join(right, keys=["k"], right_keys=["rk"], join_type="inner")
              .to_pandas().sort_values(["lv"]).reset_index(drop=True))
    assert sorted(got.columns) == sorted(expect.columns)
    assert len(got) == len(expect) == n  # every k in 0..96 has a match
    assert (got["lv"].to_numpy() == expect["lv"].to_numpy()).all()
    got_rv = got.set_index("lv")["rv"]
    exp_rv = expect.set_index("lv")["rv"]
    assert (got_rv == exp_rv).all()


def test_broadcast_lookup_left_join_semantics():
    keys = np.array([1, 5, 9], dtype=np.int64)
    vals = {"name": np.array(["a", "b", "c"], dtype=object)}
    ref = ray.put((keys, vals))
    ds = rd.from_arrow(pa.table({"k": pa.array([5, 2, 9, 1], pa.int64())}))
    out = broadcast_lookup(ds, ref, "k", {"name": "name"}).to_pandas()
    assert out.sort_values("k")["name"].tolist() == ["a", None, "b", "c"]


def test_revenue_by_nation_bucket_fallback_matches_broadcast():
    """A zero broadcast budget forces the bucket_join fallback; the
    aggregate must equal the broadcast-lookup path."""
    from nifi_processors_ray.pipelines.registry import revenue_by_nation_pipeline

    sf = "/root/testdata/sf0.001"
    want = revenue_by_nation_pipeline(sf).sort_by("n_name")
    got = revenue_by_nation_pipeline(sf, max_broadcast_bytes=0).sort_by("n_name")
    assert got.equals(want)


def test_broadcast_membership_filter_semi_and_anti():
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray
    import ray.data as rd

    from nifi_processors_ray.stages.joins import broadcast_membership_filter

    t = pa.table({"k": pa.array(np.arange(100, dtype=np.int64)),
                  "v": pa.array(np.arange(100, dtype=np.float64))})
    keys = ray.put(np.sort(np.array([3, 7, 50, 99], dtype=np.int64)))
    semi = broadcast_membership_filter(rd.from_arrow(t), keys, "k",
                                       mode="semi").to_pandas()
    assert sorted(semi["k"].tolist()) == [3, 7, 50, 99]
    anti = broadcast_membership_filter(rd.from_arrow(t), keys, "k",
                                       mode="anti").to_pandas()
    assert len(anti) == 96 and 3 not in set(anti["k"])
    # empty key set: semi -> nothing, anti -> everything
    empty = ray.put(np.array([], dtype=np.int64))
    assert len(broadcast_membership_filter(rd.from_arrow(t), empty, "k",
                                           mode="semi").to_pandas()) == 0
    with _pytest.raises(ValueError, match="semi"):
        broadcast_membership_filter(rd.from_arrow(t), keys, "k", mode="x")
