import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from nifi_processors_ray.stages.olap import pivot_agg, rollup_agg


def _df():
    rng = np.random.default_rng(11)
    n = 2000
    return pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(0, 100, n).astype("float64"),
    })


def test_rollup_agg_matches_bruteforce():
    df = _df()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    out = rollup_agg(ds, group_cols=["a", "b"], value_col="v").to_pandas()

    fine = df.groupby(["a", "b"])["v"].agg(["sum", "size"]).reset_index()
    mid = df.groupby(["a"])["v"].agg(["sum", "size"]).reset_index()
    assert len(out) == len(fine) + len(mid) + 1

    def lookup(a, b):
        row = out[(out["a"].eq(a) if a is not None else out["a"].isna())
                  & (out["b"].eq(b) if b is not None else out["b"].isna())]
        assert len(row) == 1, (a, b)
        return row.iloc[0]

    for _, r in fine.iterrows():
        got = lookup(r["a"], r["b"])
        assert abs(got["sum_v"] - r["sum"]) < 1e-9
        assert got["n_rows"] == r["size"] and got["grouping_id"] == 0
    for _, r in mid.iterrows():
        got = lookup(r["a"], None)
        assert abs(got["sum_v"] - r["sum"]) < 1e-9
        assert got["n_rows"] == r["size"] and got["grouping_id"] == 1
    total = lookup(None, None)
    assert abs(total["sum_v"] - df["v"].sum()) < 1e-9
    assert total["n_rows"] == len(df) and total["grouping_id"] == 3


def test_pivot_agg_matches_bruteforce():
    df = _df()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    out = pivot_agg(ds, row_col="a", pivot_col="b", value_col="v",
                    pivot_values=["p", "q", "absent"]).to_pandas()
    assert sorted(out.columns) == sorted(["a", "sum_v_p", "sum_v_q",
                                          "sum_v_absent"])
    want = df.pivot_table(index="a", columns="b", values="v",
                          aggfunc="sum", fill_value=0.0)
    assert len(out) == df["a"].nunique()
    for _, r in out.iterrows():
        assert abs(r["sum_v_p"] - want.loc[r["a"], "p"]) < 1e-9
        assert abs(r["sum_v_q"] - want.loc[r["a"], "q"]) < 1e-9
        assert r["sum_v_absent"] == 0.0


def test_revenue_by_priority_broadcast_equals_join_fallback():
    """The byte-guarded broadcast-dimension path and the forced hash-join
    fallback (max_broadcast_bytes=0) return identical tables."""
    from nifi_processors_ray.pipelines.registry import q_revenue_by_priority

    sf = "/root/testdata/sf0.001"
    a = q_revenue_by_priority(sf).sort_by("o_orderpriority")
    b = q_revenue_by_priority(
        sf, max_broadcast_bytes=0).sort_by("o_orderpriority")
    assert a.equals(b)


def test_events_hourly_window_fast_path_equals_distributed(monkeypatch):
    """The driver-side partial fold and the distributed groupby over the
    same partials return identical tables (dtype included — the driver's
    value hash is type-sensitive)."""
    from nifi_processors_ray.pipelines import registry
    from nifi_processors_ray.stages import similarity

    sf = "/root/testdata/sf0.001"
    keys = [("user_id", "ascending"), ("hour", "ascending")]
    fast = registry.q_events_hourly_window(sf).sort_by(keys)
    monkeypatch.setattr(similarity, "_try_gather_small",
                        lambda ds, budget=0: None)
    dist = registry.q_events_hourly_window(sf).sort_by(keys)
    assert fast.schema.equals(dist.schema)
    assert fast.equals(dist)
