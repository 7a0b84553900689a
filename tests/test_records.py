import pyarrow as pa

from nifi_processors_ray.stages.records import (
    add_arity_route,
    deterministic_sample,
    extract_json_field,
    header_line,
    join_fields,
    normalize_values,
)


def test_join_fields_roundtrip_with_split():
    from nifi_processors_ray.stages.split_fields import split_fields

    t = pa.table({"a": ["x", "y"], "b": ["1", None], "c": [2, 3]})
    joined = join_fields(t, ["a", "b", "c"], separator=";", output_col="content")
    assert joined["content"].to_pylist() == ["x;1;2", "y;;3"]
    back = split_fields(joined, separator=";", num_fields=3)
    assert back["column_0000"].to_pylist() == ["x", "y"]
    assert back["column_0001"].to_pylist() == ["1", None]  # null roundtrips blank
    assert header_line(["a", "b"], ";") == "a;b"


def test_normalize_values():
    t = pa.table({"a": ["x\r\ny", " z \n"], "n": [1, 2]})
    out = normalize_values(t, trim=True)
    assert out["a"].to_pylist() == ["xy", "z"]
    assert out["n"].to_pylist() == [1, 2]  # non-string columns untouched


def test_extract_json_field_variants():
    t = pa.table({"p": ['{"k": 87, "j": "a"}', '{"j": "b"}', '{"k": "v"}', None]})
    out = extract_json_field(t, "p", "k", out_col="k")
    assert out["k"].to_pylist() == ["87", None, "v", None]


def test_add_arity_route():
    t = pa.table({"content": ["a;b", "a", "a;b;c", None]})
    out = add_arity_route(t, "content", ";", 2)
    assert out["route"].to_pylist() == [
        "success", "quarantine", "quarantine", "quarantine"]


def test_deterministic_sample():
    t = pa.table({"id": pa.array(range(100), pa.int64())})
    out = deterministic_sample(t, "id", modulus=10, keep=2)
    assert out["id"].to_pylist() == [i for i in range(100) if i % 10 < 2]


def test_stratified_sample_quota_and_determinism():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from nifi_processors_ray.stages.records import stratified_sample

    rng = np.random.default_rng(3)
    n = 5000
    grp = rng.choice(["a", "b", "c", "rare"], n, p=[0.5, 0.3, 0.199, 0.001])
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)
    df = pd.DataFrame({"g": grp, "id": ids})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    out = stratified_sample(ds, group_col="g", id_col="id", n=10).to_pandas()
    sizes = out.groupby("g").size()
    counts = df.groupby("g").size()
    for g in counts.index:
        assert sizes.get(g, 0) == min(10, counts[g]), g
    # exact selection matches the brute-force smallest-hash rule
    df["h"] = (df["id"] * 2654435761) % (1 << 32)
    want = (df.sort_values(["g", "h", "id"]).groupby("g").head(10))
    assert set(map(tuple, out[["g", "id"]].values)) == \
        set(map(tuple, want[["g", "id"]].values))
    # deterministic across runs
    out2 = stratified_sample(ds, group_col="g", id_col="id",
                             n=10).to_pandas()
    assert set(out2["id"]) == set(out["id"])
