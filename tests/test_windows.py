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


def test_sessionize_cross_bucket_chain_merges():
    """A session spanning MANY time buckets must keep one session index
    (the per-key offset scan folds merge chains), and bucket-local indices
    must still split where real gaps are."""
    # key 1: events every 40s for 50 events (all one session), tiny buckets
    # (64s) force the session across ~31 buckets; then a 1000s gap, then 3
    # more events (second session)
    ts1 = list(range(0, 2000, 40)) + [3000, 3040, 3080]
    tbl = pa.table({
        "user": pa.array([1] * len(ts1), pa.int64()),
        "ts": pa.array([v * 1_000_000 for v in ts1], pa.timestamp("us")),
    })
    out = pa.table(sessionize(rd.from_arrow(tbl), key_col="user",
                              ts_col="ts", gap_seconds=50,
                              bucket_seconds=64).to_pandas())
    df = out.to_pandas().sort_values("ts").reset_index(drop=True)
    assert df["session_idx"].tolist() == [0] * 50 + [1, 1, 1]

    st = session_stats(rd.from_arrow(tbl), key_col="user", ts_col="ts",
                       gap_seconds=50, bucket_seconds=64).to_pandas()
    st = st.sort_values("session_idx").reset_index(drop=True)
    assert st["n_events"].tolist() == [50, 3]
    assert st.loc[0, "session_start"] == np.datetime64(0, "us")
    assert st.loc[0, "session_end"] == np.datetime64(1960 * 1_000_000, "us")
    assert st.loc[1, "session_start"] == np.datetime64(3000 * 1_000_000, "us")


def test_sessionize_matches_unbounded_reference():
    """Bucketed implementation == brute-force per-key reference on random
    data, for several bucket widths (any width must give identical output)."""
    rng = np.random.default_rng(11)
    n = 3000
    keys = rng.integers(0, 5, n)
    ts = np.sort(rng.integers(0, 500_000, n)).astype(np.int64)
    rng.shuffle(ts)
    tbl = pa.table({"user": pa.array(keys, pa.int64()),
                    "ts": pa.array(ts * 1_000_000, pa.timestamp("us"))})

    def brute(gap_us):
        df = tbl.to_pandas().sort_values(["user", "ts"])
        out = []
        for _, g in df.groupby("user"):
            t = g["ts"].astype("int64").to_numpy()
            new = np.ones(len(t), dtype=np.int64)
            if len(t) > 1:
                new[1:] = (np.diff(t) > gap_us).astype(np.int64)
            sid = np.cumsum(new) - 1
            out.append(g.assign(session_idx=sid))
        import pandas as pd

        return (pd.concat(out).sort_values(["user", "ts", "session_idx"])
                .reset_index(drop=True))

    want = brute(700 * 1_000_000)
    for bucket in (900, 5000, 1_000_000):
        got = (sessionize(rd.from_arrow(tbl), key_col="user", ts_col="ts",
                          gap_seconds=700, bucket_seconds=bucket)
               .to_pandas().sort_values(["user", "ts", "session_idx"])
               .reset_index(drop=True))
        assert got["session_idx"].tolist() == want["session_idx"].tolist(), \
            f"bucket={bucket}"

        stats = (session_stats(rd.from_arrow(tbl), key_col="user",
                               ts_col="ts", gap_seconds=700,
                               bucket_seconds=bucket)
                 .to_pandas().sort_values(["user", "session_idx"])
                 .reset_index(drop=True))
        wstats = (want.groupby(["user", "session_idx"])
                  .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                       n_events=("ts", "size")).reset_index())
        assert stats["n_events"].tolist() == wstats["n_events"].tolist()
        assert stats["session_start"].tolist() == \
            wstats["session_start"].tolist()


def test_hot_key_stays_bounded_sessionize():
    """1M events on ONE key: with time bucketing no group task may see the
    whole key (the round-2 scale-killer). max_group_rows turns the bound
    into a hard assertion inside every group task."""
    n = 1_000_000
    ts = np.arange(n, dtype=np.int64) * 60  # one event per minute
    tbl = pa.table({"user": pa.array(np.ones(n, dtype=np.int64)),
                    "ts": pa.array(ts * 1_000_000, pa.timestamp("us"))})
    # gap 1800s -> 60s spacing = ONE giant session; bucket 86400s -> 1440
    # events per (key, bucket) task, ~695 fragment rows in the merge task
    out = session_stats(rd.from_arrow(tbl), key_col="user", ts_col="ts",
                        gap_seconds=1800, bucket_seconds=86400,
                        max_group_rows=10_000).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "n_events"] == n
    assert out.loc[0, "session_start"] == np.datetime64(0, "us")
    assert out.loc[0, "session_end"] == np.datetime64((n - 1) * 60_000_000,
                                                      "us")

    lab = sessionize(rd.from_arrow(tbl.slice(0, 200_000)), key_col="user",
                     ts_col="ts", gap_seconds=1800, bucket_seconds=86400,
                     max_group_rows=10_000)
    sids = pa.table(lab.to_pandas())["session_idx"]
    import pyarrow.compute as pc2

    assert pc2.min(sids).as_py() == 0 and pc2.max(sids).as_py() == 0

    # and the guard actually fires when the bucket is too coarse
    import pytest as _pytest

    with _pytest.raises((ValueError, Exception), match="max_group_rows"):
        session_stats(rd.from_arrow(tbl), key_col="user", ts_col="ts",
                      gap_seconds=1800, bucket_seconds=10**9,
                      max_group_rows=10_000).to_pandas()


def test_hot_key_stays_bounded_asof():
    """asof_join on one hot key: (key, bucket) co-groups + carry rows keep
    every task bounded and results exact across bucket boundaries."""
    n = 200_000
    l_ts = np.arange(n, dtype=np.int64) * 10  # every 10s
    left = pa.table({"k": pa.array(np.ones(n, dtype=np.int64)),
                     "t": pa.array(l_ts)})
    # sparse right: one row every ~997s (buckets of 3600 raw units since
    # int axis); many left buckets have no right row -> carry path
    r_ts = np.arange(0, n * 10, 997, dtype=np.int64)
    right = pa.table({"k": pa.array(np.ones(len(r_ts), dtype=np.int64)),
                      "t": pa.array(r_ts),
                      "price": pa.array(r_ts.astype(np.float64))})
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right), on="t",
                    by="k", value_cols=["price"], bucket_seconds=3600,
                    max_group_rows=50_000).to_pandas()
    out = out.sort_values("t").reset_index(drop=True)
    # expected: floor(t / 997) * 997
    expect = (l_ts // 997) * 997
    assert np.array_equal(out["price"].to_numpy(), expect.astype(float))

    import pytest as _pytest

    with _pytest.raises((ValueError, Exception), match="max_group_rows"):
        asof_join(rd.from_arrow(left), rd.from_arrow(right), on="t",
                  by="k", value_cols=["price"], bucket_seconds=10**12,
                  max_group_rows=50_000).to_pandas()


def test_single_shuffle_mode_matches_bounded():
    """bucket_seconds=None (the documented hot-key-bound opt-out) must
    produce identical results to the bounded default."""
    rng = np.random.default_rng(17)
    n = 2000
    tbl = pa.table({
        "user": pa.array(rng.integers(0, 6, n), pa.int64()),
        "ts": pa.array(np.sort(rng.integers(0, 200_000, n)) * 1_000_000,
                       pa.timestamp("us")),
    })
    a = (sessionize(rd.from_arrow(tbl), key_col="user", ts_col="ts",
                    gap_seconds=300).to_pandas()
         .sort_values(["user", "ts", "session_idx"]).reset_index(drop=True))
    b = (sessionize(rd.from_arrow(tbl), key_col="user", ts_col="ts",
                    gap_seconds=300, bucket_seconds=None).to_pandas()
         .sort_values(["user", "ts", "session_idx"]).reset_index(drop=True))
    assert a["session_idx"].tolist() == b["session_idx"].tolist()

    sa = (session_stats(rd.from_arrow(tbl), key_col="user", ts_col="ts",
                        gap_seconds=300).to_pandas()
          .sort_values(["user", "session_idx"]).reset_index(drop=True))
    sb = (session_stats(rd.from_arrow(tbl), key_col="user", ts_col="ts",
                        gap_seconds=300, bucket_seconds=None).to_pandas()
          .sort_values(["user", "session_idx"]).reset_index(drop=True))
    assert sa.equals(sb)

    left = pa.table({"k": pa.array(rng.integers(0, 4, 500), pa.int64()),
                     "t": pa.array(rng.integers(0, 10_000, 500))})
    # unique right (k, t): equal-timestamp ties are documented
    # nondeterministic, so don't manufacture them here
    rt_ = rng.permutation(10_000)[:200].astype(np.int64)
    right = pa.table({"k": pa.array(rng.integers(0, 4, 200), pa.int64()),
                      "t": pa.array(rt_),
                      "v": pa.array(rng.standard_normal(200))})
    oa = (asof_join(rd.from_arrow(left), rd.from_arrow(right), on="t",
                    by="k", value_cols=["v"], bucket_seconds=500)
          .to_pandas().sort_values(["k", "t"]).reset_index(drop=True))
    ob = (asof_join(rd.from_arrow(left), rd.from_arrow(right), on="t",
                    by="k", value_cols=["v"], bucket_seconds=None)
          .to_pandas().sort_values(["k", "t"]).reset_index(drop=True))
    assert np.allclose(oa["v"].to_numpy(), ob["v"].to_numpy(),
                       equal_nan=True)


def test_asof_join_carry_across_empty_buckets():
    """The carry must come from the latest EARLIER bucket even when many
    empty buckets separate it from the left row, and same-bucket later
    right rows must not match."""
    left = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                     "t": pa.array([50, 10_050, 10_020], pa.int64())})
    right = pa.table({"k": pa.array([1, 1], pa.int64()),
                      "t": pa.array([40, 10_040], pa.int64()),
                      "v": pa.array([7.0, 9.0])})
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right), on="t",
                    by="k", value_cols=["v"], bucket_seconds=100).to_pandas()
    got = dict(zip(out["t"], out["v"]))
    assert got[50] == 7.0          # same bucket
    assert got[10_050] == 9.0      # same bucket, later right row
    assert got[10_020] == 7.0      # carry across ~99 empty buckets


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


def test_range_join_basic():
    from nifi_processors_ray.stages.windows import range_join

    left = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "t": pa.array([5, 15, 25, 2, 7], pa.int64()),
    })
    # non-overlapping validity intervals per key
    right = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "lo": pa.array([3, 20, 10], pa.int64()),
        "hi": pa.array([10, 30, 12], pa.int64()),
        "tag": ["a", "b", "c"],
    })
    out = range_join(rd.from_arrow(left), rd.from_arrow(right), on="t",
                     by="k", start_col="lo", end_col="hi",
                     value_cols=["tag"], bucket_seconds=8).to_pandas()
    out = out.sort_values(["k", "t"]).reset_index(drop=True)
    # k=1: t=2 -> none; t=5 in [3,10) -> a; t=15 -> gap; t=25 in [20,30) -> b
    # k=2: t=7 -> none ([10,12) starts later)
    assert len(out) == 5
    assert out["tag"].tolist() == [None, "a", None, "b", None]


def test_range_join_matches_bruteforce():
    from nifi_processors_ray.stages.windows import range_join

    rng = np.random.default_rng(42)
    n_keys, n_left = 12, 800
    lk = rng.integers(0, n_keys, n_left)
    lt = rng.integers(0, 10_000, n_left)
    # non-overlapping intervals per key: random cut points, every other
    # span is a validity interval (some spanning many 100-wide buckets)
    rk, lo, hi, pay = [], [], [], []
    for k in range(n_keys):
        cuts = np.unique(rng.integers(0, 10_000, 14))
        for i in range(0, len(cuts) - 1, 2):
            rk.append(k); lo.append(int(cuts[i])); hi.append(int(cuts[i + 1]))
            pay.append(k * 1000 + i)
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "t": pa.array(lt, pa.int64())})
    right = pa.table({"k": pa.array(rk, pa.int64()),
                      "lo": pa.array(lo, pa.int64()),
                      "hi": pa.array(hi, pa.int64()),
                      "pay": pa.array(pay, pa.int64())})
    out = range_join(rd.from_arrow(left), rd.from_arrow(right), on="t",
                     by="k", start_col="lo", end_col="hi",
                     value_cols=["pay"], bucket_seconds=100).to_pandas()
    out = out.sort_values(["k", "t"]).reset_index(drop=True)
    # brute force
    import pandas as pd
    exp = []
    rdf = right.to_pandas()
    for k, t in zip(lk, lt):
        m = rdf[(rdf.k == k) & (rdf.lo <= t) & (t < rdf.hi)]
        exp.append((k, t, m["pay"].iloc[0] if len(m) else None))
    edf = (pd.DataFrame(exp, columns=["k", "t", "pay"])
           .sort_values(["k", "t"]).reset_index(drop=True))
    assert len(out) == len(edf)
    got = out["pay"].astype("float64").to_numpy()
    want = edf["pay"].astype("float64").to_numpy()
    assert ((np.isnan(got) & np.isnan(want)) | (got == want)).all()


def _ll_brute(lk, lt, lv):
    import pandas as pd
    df = pd.DataFrame({"k": lk, "t": lt, "v": lv}).sort_values(["k", "t"])
    df["v_lag"] = df.groupby("k")["v"].shift(1)
    df["v_lead"] = df.groupby("k")["v"].shift(-1)
    return df.sort_values(["k", "t"]).reset_index(drop=True)


def test_lag_lead_matches_bruteforce_with_carries():
    from nifi_processors_ray.stages.windows import lag_lead

    rng = np.random.default_rng(17)
    n, n_keys = 3000, 8
    lk = rng.integers(0, n_keys, n)
    # unique order values per key so pandas shift is a valid oracle
    lt = np.arange(n, dtype=np.int64)
    rng.shuffle(lt)
    lv = rng.normal(size=n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()), "t": pa.array(lt, pa.int64()),
        "v": pa.array(lv, pa.float64())}))
    # bucket width 100 over t in [0, 3000): ~30 buckets -> many carries
    out = lag_lead(ds, key_col="k", order_col="t", value_cols=["v"],
                   bucket_seconds=100).to_pandas()
    out = out.sort_values(["k", "t"]).reset_index(drop=True)
    want = _ll_brute(lk, lt, lv)
    assert len(out) == n
    assert np.allclose(out["v_lag"].to_numpy(), want["v_lag"].to_numpy(),
                       equal_nan=True)
    assert np.allclose(out["v_lead"].to_numpy(), want["v_lead"].to_numpy(),
                       equal_nan=True)
    # single-shuffle opt-out agrees
    out1 = lag_lead(ds, key_col="k", order_col="t", value_cols=["v"],
                    bucket_seconds=None).to_pandas()
    out1 = out1.sort_values(["k", "t"]).reset_index(drop=True)
    assert np.allclose(out1["v_lag"].to_numpy(), want["v_lag"].to_numpy(),
                       equal_nan=True)
    assert np.allclose(out1["v_lead"].to_numpy(), want["v_lead"].to_numpy(),
                       equal_nan=True)


def test_lag_lead_sparse_buckets_and_singletons():
    from nifi_processors_ray.stages.windows import lag_lead

    # key 1: rows in far-apart buckets (empty buckets between); key 2:
    # singleton; key 3: all rows in one bucket
    tbl = pa.table({
        "k": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "t": pa.array([5, 1000, 5000, 50, 7, 8], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 1.0, 5.0, 6.0]),
    })
    out = lag_lead(rd.from_arrow(tbl), key_col="k", order_col="t",
                   value_cols=["v"], bucket_seconds=10).to_pandas()
    out = out.sort_values(["k", "t"]).reset_index(drop=True)
    assert out["v_lag"].tolist()[:3] == [None, 10.0, 20.0] or \
        (np.isnan(out["v_lag"][0]) and out["v_lag"].tolist()[1:3]
         == [10.0, 20.0])
    assert np.isnan(out["v_lag"][3]) and np.isnan(out["v_lead"][3])
    assert out["v_lead"].tolist()[4] == 6.0 and np.isnan(out["v_lead"][5])


def test_running_agg_matches_pandas_cumsum():
    import pandas as pd
    import pytest

    from nifi_processors_ray.stages.windows import running_agg

    rng = np.random.default_rng(7)
    n = 12000
    key = rng.integers(0, 30, n)
    key[:4000] = 1  # hot key spanning many buckets
    ts = rng.integers(0, 1_000_000, n)
    val = rng.integers(-5, 100, n).astype(np.int64)
    fval = rng.random(n) * 10
    tid = np.arange(n)
    df = pd.DataFrame({"k": key, "ts": ts, "v": val, "f": fval, "id": tid})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(9)
    exp = df.sort_values(["k", "ts", "id"]).reset_index(drop=True)
    exp["v_cumsum"] = exp.groupby("k")["v"].cumsum()
    exp["f_cumsum"] = exp.groupby("k")["f"].cumsum()
    exp["row_number"] = exp.groupby("k").cumcount() + 1
    for bs in (3600, None, 50_000):
        out = running_agg(ds, key_col="k", order_col="ts",
                          value_cols=["v", "f"], tiebreak_col="id",
                          bucket_seconds=bs).to_pandas()
        got = out.sort_values(["k", "ts", "id"]).reset_index(drop=True)
        assert len(got) == n
        assert (got["v_cumsum"].to_numpy()
                == exp["v_cumsum"].to_numpy()).all(), bs
        assert np.allclose(got["f_cumsum"].to_numpy(),
                           exp["f_cumsum"].to_numpy(), rtol=1e-12,
                           atol=1e-9), bs
        assert (got["row_number"].to_numpy()
                == exp["row_number"].to_numpy()).all(), bs
    # the hot-key guard is loud: one giant bucket > max_group_rows raises
    with pytest.raises(Exception, match="max_group_rows"):
        running_agg(ds, key_col="k", order_col="ts", value_cols=["v"],
                    tiebreak_col="id", bucket_seconds=1_000_000,
                    max_group_rows=100).to_pandas()


def test_running_agg_bounds_per_task_input():
    """One key owning every row still never concentrates: per-(key,bucket)
    segments stay under the cap when buckets are sized right."""
    from nifi_processors_ray.stages.windows import running_agg

    n = 50_000
    ts = np.arange(n, dtype=np.int64)  # 1 unit apart, one single key
    ds = rd.from_arrow(pa.table({
        "k": pa.array(np.zeros(n, np.int64)),
        "ts": pa.array(ts),
        "v": pa.array(np.ones(n, np.int64))})).repartition(8)
    out = running_agg(ds, key_col="k", order_col="ts", value_cols=["v"],
                      bucket_seconds=1000,  # 1000 rows per bucket
                      max_group_rows=1001).to_pandas()
    out = out.sort_values("ts").reset_index(drop=True)
    assert (out["v_cumsum"].to_numpy() == np.arange(1, n + 1)).all()
    assert (out["row_number"].to_numpy() == np.arange(1, n + 1)).all()


def test_distributed_carry_fallback_matches_broadcast_fast_path():
    """carry_broadcast_bytes=1 forces the at-scale distributed key-partition
    carry path; its results must be identical to the driver-side broadcast
    fast path on data with real cross-bucket dependencies."""
    rng = np.random.default_rng(7)
    n = 4000
    keys = rng.integers(0, 23, n)
    ts = rng.integers(0, 100_000, n)
    tbl = pa.table({
        "k": pa.array(keys, pa.int64()),
        "t": pa.array(np.arange(n) * 100_000 + ts, pa.int64()),
        "v": pa.array(rng.random(n)),
        "id": pa.array(np.arange(n), pa.int64()),
    })
    ds = rd.from_arrow(tbl).repartition(7)
    right = rd.from_arrow(tbl.select(["k", "t", "v"])).repartition(5)

    def canon(df, cols):
        return df.sort_values(cols).reset_index(drop=True)

    from nifi_processors_ray.stages.windows import lag_lead, running_agg

    for kwargs in ({}, {"carry_broadcast_bytes": 1}):
        a = asof_join(ds, right, on="t", by="k", value_cols=["v"],
                      bucket_seconds=10_000, **kwargs).to_pandas()
        la = lag_lead(ds, key_col="k", order_col="t", value_cols=["v"],
                      tiebreak_col="id", bucket_seconds=10_000,
                      **kwargs).to_pandas()
        ra = running_agg(ds, key_col="k", order_col="t",
                         value_cols=["id"], tiebreak_col="id",
                         bucket_seconds=10_000, **kwargs).to_pandas()
        if not kwargs:
            base = (canon(a, ["k", "t", "id"]), canon(la, ["k", "t", "id"]),
                    canon(ra, ["k", "t", "id"]))
        else:
            import pandas as pd

            pd.testing.assert_frame_equal(canon(a, ["k", "t", "id"]),
                                          base[0], check_like=True)
            pd.testing.assert_frame_equal(canon(la, ["k", "t", "id"]),
                                          base[1], check_like=True)
            pd.testing.assert_frame_equal(canon(ra, ["k", "t", "id"]),
                                          base[2], check_like=True)


def test_running_agg_and_lag_lead_empty_input():
    """Empty datasets flow through both the broadcast fast path and the
    single-shuffle mode without crashing (ADVICE r3: empty materialized
    totals/boundaries used to AttributeError / lose carry columns)."""
    from nifi_processors_ray.stages.windows import lag_lead, running_agg

    empty = pa.table({
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64()),
    })
    ds = rd.from_arrow(empty)
    for bs in (3600, None):
        ra = running_agg(ds, key_col="k", order_col="ts", value_cols=["v"],
                         bucket_seconds=bs).to_pandas()
        assert len(ra) == 0
        ll = lag_lead(ds, key_col="k", order_col="ts", value_cols=["v"],
                      bucket_seconds=bs).to_pandas()
        assert len(ll) == 0
    # the bucketed (materialized) path also preserves the output schema
    # (Dataset schema — Ray's to_pandas drops columns at zero rows)
    ra_names = running_agg(ds, key_col="k", order_col="ts",
                           value_cols=["v"], bucket_seconds=3600).schema().names
    assert "v_cumsum" in ra_names and "row_number" in ra_names
    ll_names = lag_lead(ds, key_col="k", order_col="ts", value_cols=["v"],
                        bucket_seconds=3600).schema().names
    assert "v_lag" in ll_names and "v_lead" in ll_names


def test_running_agg_null_values_sum_ignores_null():
    """NULL value rows contribute 0 to the running sum (SQL SUM-ignores-
    NULL); int columns must not round-trip through float64 NaN (ADVICE r3:
    cumsum used to emit INT64_MIN-ish garbage past a null)."""
    from nifi_processors_ray.stages.windows import running_agg

    tbl = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([10, 20, 30, 40, 10, 20], pa.int64()),
        "v": pa.array([10, None, 5, None, None, 7], pa.int64()),
        "f": pa.array([1.5, None, 2.5, None, None, 0.5], pa.float64()),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    for bs in (15, None):  # force cross-bucket offsets AND single-shuffle
        out = running_agg(ds, key_col="k", order_col="ts",
                          value_cols=["v", "f"],
                          bucket_seconds=bs).to_pandas()
        out = out.sort_values(["k", "ts"]).reset_index(drop=True)
        assert out["v_cumsum"].tolist() == [10, 10, 15, 15, 0, 7]
        assert out["f_cumsum"].tolist() == [1.5, 1.5, 4.0, 4.0, 0.0, 0.5]
        assert out["row_number"].tolist() == [1, 2, 3, 4, 1, 2]
