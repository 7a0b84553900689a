"""Property tests: dedup / top-k / quantiles vs DuckDB (or numpy) on
randomized small frames — sweeps group shapes (empty, singleton, all-
duplicate, hot) the fixed oracles don't explore."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_processors_ray.stages.dedup import exact_dedup
from nifi_processors_ray.stages.quantiles import grouped_quantiles
from nifi_processors_ray.stages.windows import topk_per_group

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _sql(tbl: pa.Table, query: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", tbl)
    return con.execute(query).df()


@st.composite
def doc_frames(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    # tiny vocabulary of texts -> heavy duplication, the dedup-relevant shape
    texts = draw(st.lists(st.sampled_from(["a", "b b", "c", "", "d d d"]),
                          min_size=n, max_size=n))
    ids = draw(st.permutations(range(60)))
    return pa.table({"doc_id": pa.array([ids[i] for i in range(n)], pa.int64()),
                     "text": pa.array(texts, pa.string())})


@given(doc_frames())
@settings(**_SETTINGS)
def test_exact_dedup_matches_duckdb(tbl):
    out = exact_dedup(rd.from_arrow(tbl).repartition(3)).to_pandas()
    want = _sql(tbl, """
        SELECT doc_id, text FROM t
        QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1""")
    cols = ["doc_id", "text"]
    a = out[cols].sort_values(cols).reset_index(drop=True) if len(out) else out
    b = want[cols].sort_values(cols).reset_index(drop=True) if len(want) else want
    assert len(a) == len(b)
    if len(a):
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


@st.composite
def grouped_values(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    groups = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    vals = draw(st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=n, max_size=n))
    return pa.table({"g": pa.array(groups, pa.int64()),
                     "v": pa.array(vals, pa.float64())})


@given(grouped_values())
@settings(**_SETTINGS)
def test_grouped_quantiles_match_numpy(tbl):
    qs = (0.0, 0.5, 1.0)
    out = grouped_quantiles(rd.from_arrow(tbl).repartition(3), group_col="g",
                            value_col="v", qs=qs).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    df = tbl.to_pandas()
    for _, row in out.iterrows():
        vals = df[df["g"] == row["g"]]["v"].to_numpy()
        for q, col in zip(qs, ["p0", "p50", "p100"]):
            want = np.quantile(vals, q)
            assert abs(row[col] - want) <= 1e-9 * max(1, abs(want)), (
                row["g"], q, row[col], want)
    assert set(out["g"]) == set(df["g"].unique())


@st.composite
def order_frames(draw):
    n = draw(st.integers(min_value=0, max_value=50))
    groups = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    # unique values: ties in the ranking metric would compare two valid
    # tie-breaks unless the op defines one (ours breaks ties like SQL only
    # with a deterministic tiebreak column, which `v` unique sidesteps)
    pool = draw(st.permutations(range(120)))
    vals = [pool[i] for i in range(n)]
    return pa.table({"g": pa.array(groups, pa.int64()),
                     "v": pa.array(vals, pa.int64())})


@given(order_frames(), st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_topk_per_group_matches_duckdb(tbl, k):
    out = topk_per_group(rd.from_arrow(tbl).repartition(3), group_col="g",
                         order_col="v", k=k).to_pandas()
    want = _sql(tbl, f"""
        SELECT g, v FROM t
        QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) <= {k}""")
    cols = ["g", "v"]
    a = out[cols].sort_values(cols).reset_index(drop=True) if len(out) else out
    b = want[cols].sort_values(cols).reset_index(drop=True) if len(want) else want
    assert len(a) == len(b)
    if len(a):
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
