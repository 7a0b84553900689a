import pyarrow as pa
import ray.data as rd

from nifi_processors_ray.stages.split_fields import SplitFieldsStage, split_fields


def test_readme_golden_case():
    # README.md:15-26 worked example (SplitToAttribute.java:177-194)
    t = pa.table({"content": ["Peterson, Jenny, New York, USA"]})
    out = split_fields(t, separator=", ", prefix="column_", width=3)
    assert out.to_pydict() == {
        "column_000": ["Peterson"],
        "column_001": ["Jenny"],
        "column_002": ["New York"],
        "column_003": ["USA"],
    }


def test_blank_fields_null_and_newline_strip():
    # pinned deviation: blank -> null, not skipped (SURVEY.md §2.3)
    t = pa.table({"content": ["a;;c\n", "x;y;z"]})
    out = split_fields(t, separator=";")
    assert out["column_0001"].to_pylist() == [None, "y"]
    assert out["column_0002"].to_pylist() == ["c", "z"]


def test_ragged_rows_fixed_arity():
    t = pa.table({"content": ["a;b;c;d", "a"]})
    out = split_fields(t, separator=";", num_fields=3)
    assert out.num_columns == 3
    assert out["column_0000"].to_pylist() == ["a", "a"]
    assert out["column_0002"].to_pylist() == ["c", None]


def test_stage_on_dataset():
    ds = rd.from_arrow(pa.table({"content": [f"r{i};v{i}" for i in range(100)]}))
    out = ds.map_batches(
        SplitFieldsStage(separator=";", num_fields=2),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tbl = out.to_arrow_refs()
    assert out.count() == 100
    assert set(out.schema().names) == {"column_0000", "column_0001"}


def test_regex_separator_opt_in():
    """separator_is_regex=True restores the reference's String.split regex
    semantics (SplitToAttribute.java:177) for inputs that relied on them."""
    import pyarrow as pa

    from nifi_processors_ray.stages.split_fields import split_fields

    t = pa.table({"content": ["a;b,c", "x;;y"]})
    out = split_fields(t, separator="[;,]", separator_is_regex=True,
                       num_fields=3)
    assert out["column_0000"].to_pylist() == ["a", "x"]
    assert out["column_0001"].to_pylist() == ["b", None]
    assert out["column_0002"].to_pylist() == ["c", "y"]
    # literal mode treats the same separator as plain text
    lit = split_fields(t, separator="[;,]", num_fields=2)
    assert lit["column_0000"].to_pylist() == ["a;b,c", "x;;y"]
