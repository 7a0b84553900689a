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
