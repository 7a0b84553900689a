"""Grouped quantiles: exact (vs numpy) and histogram sketch (bounded
error), stages/quantiles.py."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from nifi_processors_ray.stages.quantiles import (grouped_quantiles,
                                                  grouped_quantiles_sketch)


def _data(n=20_000, groups=4, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, groups, n)
    # per-group different distributions so quantiles are distinctive
    v = rng.standard_normal(n) * (g + 1) + g * 10
    return pa.table({"g": pa.array(g, pa.int64()), "v": pa.array(v)})


def test_exact_matches_numpy():
    t = _data()
    out = grouped_quantiles(rd.from_arrow(t), group_col="g", value_col="v",
                            qs=(0.5, 0.9, 0.99)).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    df = t.to_pandas()
    for i, grp in enumerate(sorted(df["g"].unique())):
        vals = df[df.g == grp]["v"].to_numpy()
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            assert out.loc[i, col] == pytest.approx(np.quantile(vals, q),
                                                    rel=1e-12)


def test_exact_handles_nulls_and_guard():
    t = pa.table({"g": pa.array([1, 1, 1, 2], pa.int64()),
                  "v": pa.array([1.0, None, 3.0, 5.0])})
    out = grouped_quantiles(rd.from_arrow(t), group_col="g", value_col="v",
                            qs=(0.5,)).to_pandas().sort_values("g")
    assert out["p50"].tolist() == [2.0, 5.0]  # null ignored

    big = pa.table({"g": pa.array(np.zeros(5000, np.int64)),
                    "v": pa.array(np.arange(5000, dtype=np.float64))})
    with pytest.raises(Exception, match="max_group_rows"):
        grouped_quantiles(rd.from_arrow(big), group_col="g", value_col="v",
                          max_group_rows=1000).to_pandas()


def test_sketch_within_bin_width():
    t = _data()
    exact = grouped_quantiles(rd.from_arrow(t), group_col="g",
                              value_col="v").to_pandas().sort_values("g")
    sk = grouped_quantiles_sketch(rd.from_arrow(t), group_col="g",
                                  value_col="v",
                                  n_bins=2048).to_pandas().sort_values("g")
    v = np.asarray(t["v"])
    bin_w = (v.max() - v.min()) / 2048
    for col in ("p50", "p90", "p99"):
        err = np.abs(exact[col].to_numpy() - sk[col].to_numpy())
        assert (err <= 2 * bin_w + 1e-9).all(), (col, err.max(), bin_w)
