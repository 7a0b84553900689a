import pyarrow as pa

from nifi_processors_ray.sources.text import read_delimited_text


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def test_read_tsv_with_header(tmp_path):
    p = _write(tmp_path, "geo.tsv", [
        "geonameid\tname\tfcode",
        "1\tAlpha\tGRVC",
        "2\tBeta\tPPL",
        "3\t\tGRVO",  # blank field -> null
    ])
    ds = read_delimited_text(p, separator="\t", header=True)
    df = ds.to_pandas().sort_values("geonameid").reset_index(drop=True)
    assert list(df.columns) == ["geonameid", "name", "fcode"]
    assert df["name"].tolist()[:2] == ["Alpha", "Beta"]
    assert df["name"].isna().tolist() == [False, False, True]


def test_read_positional_multiple_files(tmp_path):
    p1 = _write(tmp_path, "a.csv", ["x;1", "y;2"])
    p2 = _write(tmp_path, "b.csv", ["z;3"])
    ds = read_delimited_text([p1, p2], separator=";", num_fields=2)
    df = ds.to_pandas().sort_values("column_0001").reset_index(drop=True)
    assert df["column_0000"].tolist() == ["x", "y", "z"]
    assert df["column_0001"].tolist() == ["1", "2", "3"]


def test_field_names_override(tmp_path):
    p = _write(tmp_path, "c.csv", ["a;b"])
    ds = read_delimited_text(p, separator=";", field_names=["k", "v"])
    tbl = pa.table(ds.to_pandas())
    assert tbl.column_names == ["k", "v"]
