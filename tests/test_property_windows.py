"""Property tests: window operators vs DuckDB window functions on
randomized small frames (nulls, duplicate-free timestamps, singleton and
empty groups, cross-bucket boundaries). The fixed driver oracles verify
one data shape; these sweep the shape space. Examples are capped tightly
because every example drives a real Ray dataset."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_processors_ray.stages.windows import (lag_lead, running_agg,
                                                session_stats)

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@st.composite
def keyed_frames(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    keys = draw(st.lists(st.integers(1, 4), min_size=n, max_size=n))
    # unique (k, ts): tie order between equal timestamps is engine-defined
    # in BOTH engines, so ties would compare two valid answers
    ts_pool = draw(st.permutations(range(200)))
    ts = [ts_pool[i] for i in range(n)]
    vals = draw(st.lists(st.one_of(st.none(), st.integers(-100, 100)),
                         min_size=n, max_size=n))
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "ts": pa.array([x * 10 for x in ts], pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    bucket = draw(st.sampled_from([None, 50, 400]))
    return t, bucket


def _sql(tbl: pa.Table, query: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", tbl)
    return con.execute(query).df()


def _canon(df: pd.DataFrame, cols) -> pd.DataFrame:
    return (df[cols].sort_values(cols).reset_index(drop=True)
            .astype("float64"))


@given(keyed_frames())
@settings(**_SETTINGS)
def test_running_agg_matches_duckdb(case):
    tbl, bucket = case
    out = running_agg(rd.from_arrow(tbl).repartition(3), key_col="k",
                      order_col="ts", value_cols=["v"],
                      bucket_seconds=bucket).to_pandas()
    want = _sql(tbl, """
        SELECT k, ts, COALESCE(v, 0) AS v0,
               COALESCE(SUM(v) OVER w, 0) AS v_cumsum,
               ROW_NUMBER() OVER w AS row_number
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts
                            ROWS UNBOUNDED PRECEDING)""")
    if len(want) == 0:
        assert len(out) == 0
        return
    cols = ["k", "ts", "v_cumsum", "row_number"]
    pd.testing.assert_frame_equal(_canon(out, cols), _canon(want, cols))


@given(keyed_frames())
@settings(**_SETTINGS)
def test_lag_lead_matches_duckdb(case):
    tbl, bucket = case
    out = lag_lead(rd.from_arrow(tbl).repartition(3), key_col="k",
                   order_col="ts", value_cols=["v"],
                   bucket_seconds=bucket).to_pandas()
    want = _sql(tbl, """
        SELECT k, ts, LAG(v) OVER w AS v_lag, LEAD(v) OVER w AS v_lead
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts)""")
    if len(want) == 0:
        assert len(out) == 0
        return
    cols = ["k", "ts", "v_lag", "v_lead"]
    pd.testing.assert_frame_equal(_canon(out, cols), _canon(want, cols))


@given(keyed_frames())
@settings(**_SETTINGS)
def test_session_stats_matches_duckdb(case):
    tbl, bucket = case
    gap = 100
    out = session_stats(rd.from_arrow(tbl).repartition(3), key_col="k",
                        ts_col="ts", gap_seconds=gap,
                        bucket_seconds=bucket).to_pandas()
    want = _sql(tbl, f"""
        WITH d AS (
          SELECT k, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                           OR ts - LAG(ts) OVER w > {gap} THEN 1
                      ELSE 0 END AS new_s
          FROM t WINDOW w AS (PARTITION BY k ORDER BY ts)),
        s AS (
          SELECT k, ts, SUM(new_s) OVER (PARTITION BY k ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
          FROM d)
        SELECT k, session_idx, MIN(ts) AS session_start,
               MAX(ts) AS session_end, COUNT(*) AS n_events
        FROM s GROUP BY k, session_idx""")
    if len(want) == 0:
        assert len(out) == 0
        return
    cols = ["k", "session_idx", "session_start", "session_end", "n_events"]
    pd.testing.assert_frame_equal(_canon(out, cols), _canon(want, cols))


@st.composite
def asof_frames(draw):
    nl = draw(st.integers(min_value=0, max_value=30))
    nr = draw(st.integers(min_value=0, max_value=30))
    lk = draw(st.lists(st.integers(1, 3), min_size=nl, max_size=nl))
    rk = draw(st.lists(st.integers(1, 3), min_size=nr, max_size=nr))
    # unique ts WITHIN each side per key is not enough: a right tie at the
    # same (k, ts) makes "the latest right row" ambiguous — draw globally
    # unique right timestamps; left may collide with anything
    rts_pool = draw(st.permutations(range(150)))
    lts = draw(st.lists(st.integers(0, 149), min_size=nl, max_size=nl))
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "ts": pa.array([t * 10 for t in lts], pa.int64()),
                     "lid": pa.array(list(range(nl)), pa.int64())})
    right = pa.table({"k": pa.array(rk, pa.int64()),
                      "ts": pa.array([rts_pool[i] * 10 for i in range(nr)],
                                     pa.int64()),
                      "rv": pa.array(list(range(100, 100 + nr)), pa.int64())})
    bucket = draw(st.sampled_from([None, 50, 300]))
    return left, right, bucket


@given(asof_frames())
@settings(**_SETTINGS)
def test_asof_join_matches_duckdb(case):
    from nifi_processors_ray.stages.windows import asof_join

    left, right, bucket = case
    out = asof_join(rd.from_arrow(left).repartition(2),
                    rd.from_arrow(right).repartition(2),
                    on="ts", by="k", value_cols=["rv"],
                    bucket_seconds=bucket).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.lid, l.k, l.ts, r.rv
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts""").df()
    if len(want) == 0:
        assert len(out) == 0
        return
    cols = ["lid", "k", "ts", "rv"]
    pd.testing.assert_frame_equal(_canon(out, cols), _canon(want, cols))
