"""The reference README's worked examples, pinned verbatim
(reference README.md sections 1 and 2)."""

import pyarrow as pa

from nifi_processors_ray.stages.render import RenderTemplateStage
from nifi_processors_ray.stages.split_fields import split_fields


def test_readme_split_to_attribute_example():
    """README #1: 'Peterson, Jenny, New York, USA' with prefix 'column_'
    and number format '000' -> column_000..column_003."""
    t = pa.table({"content": ["Peterson, Jenny, New York, USA"]})
    out = split_fields(t, separator=", ", prefix="column_", width=3,
                       num_fields=4)
    assert out.column_names == ["column_000", "column_001", "column_002",
                                "column_003"]
    assert [out[c][0].as_py() for c in out.column_names] == [
        "Peterson", "Jenny", "New York", "USA"]


def test_readme_merge_template_example():
    """README #2: the names.vm template over column0..column3 attributes."""
    template = """{
\t\t"name": "$column0",
\t\t"first": "$column1",
\t\t"city": "$column2",
\t\t"country": "$column3"
}"""
    t = pa.table({"column0": ["Peterson"], "column1": ["Jenny"],
                  "column2": ["New York"], "column3": ["USA"]})
    stage = RenderTemplateStage(template, output_col="content",
                                keep_input_cols=False, strip_newlines=True)
    got = stage(t)["content"][0].as_py()
    assert got == """{
\t\t"name": "Peterson",
\t\t"first": "Jenny",
\t\t"city": "New York",
\t\t"country": "USA"
}"""


def test_readme_merge_template_bracket_placeholders():
    """README #2 also allows ${column0}-style placeholders."""
    t = pa.table({"column0": ["Peterson"]})
    stage = RenderTemplateStage('name=${column0}', output_col="content",
                                keep_input_cols=False)
    assert stage(t)["content"][0].as_py() == "name=Peterson"
