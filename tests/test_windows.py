import numpy as np
import pyarrow as pa
import ray.data as rd

from nifi_processors_ray.stages.windows import (
    asof_join,
    session_stats,
    sessionize,
    topk_per_group,
)


def _events():
    # user 1: ts 0, 10, 100, 110 (gap 50 -> sessions {0,10}, {100,110})
    # user 2: ts 5 (one session)
    return pa.table({
        "user": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 10_000_000, 100_000_000, 110_000_000, 5_000_000],
                       pa.timestamp("us")),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    })


def test_sessionize_gap_splits():
    out = pa.table(sessionize(rd.from_arrow(_events()), key_col="user",
                              ts_col="ts", gap_seconds=50).to_pandas())
    df = out.to_pandas().sort_values(["user", "ts"]).reset_index(drop=True)
    assert df[df.user == 1]["session_idx"].tolist() == [0, 0, 1, 1]
    assert df[df.user == 2]["session_idx"].tolist() == [0]


def test_session_stats():
    out = session_stats(rd.from_arrow(_events()), key_col="user",
                        ts_col="ts", gap_seconds=50).to_pandas()
    out = out.sort_values(["user", "session_idx"]).reset_index(drop=True)
    assert out["n_events"].tolist() == [2, 2, 1]
    assert out.loc[0, "session_start"] == np.datetime64(0, "us")
    assert out.loc[1, "session_end"] == np.datetime64(110_000_000, "us")


def test_asof_join_latest_prior():
    left = pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "t": pa.array([5, 15, 2, 7], pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "t": pa.array([3, 10, 9, 1], pa.int64()),
        "price": pa.array([100.0, 200.0, 300.0, 400.0]),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    on="t", by="k", value_cols=["price"]).to_pandas()
    out = out.sort_values(["k", "t"]).reset_index(drop=True)
    # k=1: t=2 -> none; t=5 -> 100 (t=3); t=15 -> 200 (t=10)
    # k=2: t=7 -> none (right t=9 is later)
    got = out["price"].tolist()
    assert np.isnan(got[0]) and got[1] == 100.0 and got[2] == 200.0
    assert np.isnan(got[3])


def test_topk_per_group_matches_pandas():
    rng = np.random.default_rng(5)
    t = pa.table({
        "g": pa.array(rng.integers(0, 7, 500), pa.int64()),
        "x": pa.array(rng.permutation(500).astype(np.int64)),
    })
    out = topk_per_group(rd.from_arrow(t), group_col="g", order_col="x",
                         k=3).to_pandas()
    want = (t.to_pandas().sort_values("x", ascending=False)
            .groupby("g").head(3))
    a = out.sort_values(["g", "x"]).reset_index(drop=True)
    b = want.sort_values(["g", "x"]).reset_index(drop=True)
    assert a.equals(b)


def test_sliding_window_agg_covers_each_event_m_times():
    from nifi_processors_ray.stages.windows import sliding_window_agg

    secs = [0, 1800, 3600, 7199, 7200]
    # values chosen so each window sum is distinctive
    t = pa.table({"ts": pa.array([v * 1_000_000 for v in secs],
                                 pa.timestamp("us")),
                  "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0])})
    ds = rd.from_arrow(t)
    out = pa.table(sliding_window_agg(ds, window_seconds=7200,
                                      slide_seconds=3600).to_pandas())
    got = {r["window_start"]: (r["n_events"], r["sum_value"])
           for r in out.to_pylist()}
    # window [-3600, 3600): events at 0, 1800
    assert got[-3600] == (2, 3.0)
    # window [0, 7200): events 0,1800,3600,7199
    assert got[0] == (4, 15.0)
    # window [3600, 10800): events 3600, 7199, 7200
    assert got[3600] == (3, 28.0)
    # window [7200, 14400): event 7200
    assert got[7200] == (1, 16.0)
    # every event counted exactly m=2 times in total
    assert sum(n for n, _ in got.values()) == 2 * 5

    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiple of"):
        sliding_window_agg(ds, window_seconds=5000, slide_seconds=3600)
