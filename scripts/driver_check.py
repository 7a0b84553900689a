"""Emulates the driver's correctness gate: runs every queries() entry at a
given sf_dir and compares against oracle_sql() via DuckDB — row count,
sorted column names, and order-insensitive values.

Usage: PYTHONPATH=/root/repo python scripts/driver_check.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: ray={sorted(ray_df.columns)} "
                        f"sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count differs: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # the driver's value hash is TYPE-sensitive: an int64 column vs
            # a float64 oracle column hashes differently even when every
            # value is numerically equal ("123" vs "123.0"). Mirror that:
            # a dtype-kind mismatch is a problem on its own.
            kind = {"i": "int", "u": "int", "b": "bool", "f": "float",
                    "O": "obj", "U": "obj", "S": "obj",
                    "M": "ts", "m": "td"}
            ak = kind.get(av.dtype.kind, av.dtype.kind)
            bk = kind.get(bv.dtype.kind, bv.dtype.kind)
            if ak != bk:
                problems.append(
                    f"dtype differs in {c}: ray={av.dtype} sql={bv.dtype} "
                    f"(driver hash is type-sensitive)")
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                bad = ~np.isclose(av.astype(float), bv.astype(float),
                                  rtol=0, atol=1e-9, equal_nan=True)
            else:
                bad = av != bv
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"values differ in {c}: {int(bad.sum())} rows, first at "
                    f"canon-row {i}: ray={av[i]!r} sql={bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
            status: dict = {"rows": len(ray_df), "sec": round(time.time() - t0, 2)}
            if name in oracles:
                sql_df = con.sql(oracles[name]).df()
                problems = compare(name, ray_df, sql_df)
                status["oracle"] = "MATCH" if not problems else problems
            else:
                status["oracle"] = "rows-only"
        except Exception as e:  # noqa: BLE001
            status = {"error": f"{type(e).__name__}: {e}"}
        results[name] = status
        flag = ("OK " if status.get("oracle") in ("MATCH", "rows-only")
                and "error" not in status else "FAIL")
        print(f"[{flag}] {name}: {json.dumps(status, default=str)[:400]}")
    n_bad = sum(1 for s in results.values()
                if "error" in s or isinstance(s.get("oracle"), list))
    print(f"\n{len(results) - n_bad}/{len(results)} clean")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
