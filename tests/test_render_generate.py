"""O2 (render_template) + O4 (generate_rows) semantics, README golden cases."""

import pyarrow as pa

from nifi_processors_ray.sources.generate import RowLayout, generate_rows
from nifi_processors_ray.stages.render import RenderTemplateStage, parse_template
from nifi_processors_ray.stages.split_fields import split_fields


def test_readme_golden_split_then_render():
    # FIXTURES.md F3: O1 -> O2 chain reproducing README.md:15-66
    t = pa.table({"content": ["Peterson, Jenny, New York, USA"]})
    cols = split_fields(t, separator=", ", prefix="column_", width=3)
    template = (
        '{"name": "$column_000", "first": "$column_001", '
        '"city": "$column_002", "country": "$column_003"}'
    )
    out = RenderTemplateStage(template, output_col="content")(cols)
    assert out["content"].to_pylist() == [
        '{"name": "Peterson", "first": "Jenny", "city": "New York", "country": "USA"}'
    ]
    # the "original" edge: upstream columns still present (keep_input_cols)
    assert "column_000" in out.column_names


def test_template_parse_braced_and_missing():
    assert parse_template("a ${x.y} b $z") == [
        ("lit", "a "), ("field", "x.y"), ("lit", " b "), ("field", "z")]
    t = pa.table({"z": ["v"]})
    out = RenderTemplateStage("[$z|$missing]", output_col="r")(t)
    assert out["r"].to_pylist() == ["[v|]"]


def test_attribute_filter_regex():
    # MergeTemplate.java:243-257 — only attrs matching the filter are visible
    t = pa.table({"keep_a": ["1"], "drop_b": ["2"]})
    out = RenderTemplateStage("$keep_a/$drop_b", attribute_filter="keep_.*",
                              output_col="r")(t)
    assert out["r"].to_pylist() == ["1/"]


def test_newline_stripped_from_values():
    t = pa.table({"a": ["x\ny"]})
    out = RenderTemplateStage("<$a>", output_col="r")(t)
    assert out["r"].to_pylist() == ["<xy>"]


LAYOUT = [
    {"name": "id", "kind": "sequence"},
    {"name": "city", "kind": "wordlist", "words": ["Berlin", "Paris", "Rome"]},
    {"name": "code", "kind": "pattern", "pattern": "[A-Z]{3}-[0-9]{2}"},
    {"name": "tok", "kind": "random", "length": 6},
    {"name": "d", "kind": "date", "min_year": 2000, "max_year": 2099},
]


def test_rowlayout_deterministic_and_shaped():
    a = RowLayout(LAYOUT, seed=9).generate(0, 50)
    b = RowLayout(LAYOUT, seed=9).generate(0, 50)
    assert a.equals(b)
    c = RowLayout(LAYOUT, seed=10).generate(0, 50)
    assert not a.equals(c)
    import re

    assert all(re.fullmatch(r"[A-Z]{3}-[0-9]{2}", v) for v in a["code"].to_pylist())
    assert all(v in {"Berlin", "Paris", "Rome"} for v in a["city"].to_pylist())
    assert all(re.fullmatch(r"20\d\d-\d\d-\d\d", v) for v in a["d"].to_pylist())
    # partition independence: [0,50) == [0,20) + [20,50)
    lo = RowLayout(LAYOUT, seed=9).generate(0, 20)
    hi = RowLayout(LAYOUT, seed=9).generate(20, 30)
    assert pa.concat_tables([lo, hi]).equals(a)


def test_generate_rows_dataset_and_csv_content():
    ds = generate_rows(40, LAYOUT, seed=9, num_blocks=4, as_content=True,
                       separator=";")
    rows = ds.take_all()
    assert len(rows) == 40
    direct = RowLayout(LAYOUT, seed=9)
    expect = direct.as_csv_rows(direct.generate(0, 40), ";").to_pylist()
    assert sorted(r["content"] for r in rows) == sorted(expect)


def test_generate_rows_pinned_fixture_hash():
    """The registry's generate_rows query is seeded -> its full output is
    pinned by content hash (the no-SQL-oracle stand-in: any change to the
    generator's determinism breaks this)."""
    import hashlib

    import pyarrow as pa

    from nifi_processors_ray.pipelines.registry import q_generate_rows

    out = q_generate_rows("unused")
    tbl = out if isinstance(out, pa.Table) else pa.table(out.to_pandas())
    tbl = tbl.sort_by("id")
    digest = hashlib.sha256()
    for col in sorted(tbl.column_names):
        digest.update(col.encode())
        for v in tbl[col].to_pylist():
            digest.update(str(v).encode())
    assert tbl.num_rows == 1000
    assert digest.hexdigest() == (
        "7d650102ed8f801135b62efde36d43ae4f0fdd56c2d7ee399a1fa31667ec7e62")


def test_velocity_if_else_directives():
    from nifi_processors_ray.stages.render import RenderTemplateStage

    t = pa.table({"lang": ["en", "de", "fr", None],
                  "n": [5, 50, 500, 5000]})
    stage = RenderTemplateStage(
        "#if($lang == \"en\")english#elseif($lang == \"de\")german"
        "#else other#end:$n",
        output_col="content", keep_input_cols=False)
    out = stage(t)
    assert out["content"].to_pylist() == [
        "english:5", "german:50", " other:500", " other:5000"]


def test_velocity_numeric_condition_and_set():
    from nifi_processors_ray.stages.render import RenderTemplateStage

    t = pa.table({"n": ["5", "50", "500"]})
    stage = RenderTemplateStage(
        "#set($label = \"big\")#if($n < 100)small#else$label#end",
        output_col="content", keep_input_cols=False)
    out = stage(t)
    assert out["content"].to_pylist() == ["small", "small", "big"]


def test_velocity_truthiness_and_negation():
    from nifi_processors_ray.stages.render import RenderTemplateStage

    t = pa.table({"x": ["a", None]})
    stage = RenderTemplateStage("#if($x)has#end|#if(!$x)none#end",
                                output_col="content", keep_input_cols=False)
    assert stage(t)["content"].to_pylist() == ["has|", "|none"]


def test_velocity_unsupported_directive_raises():
    import pytest as _pytest

    from nifi_processors_ray.stages.render import RenderTemplateStage

    with _pytest.raises(ValueError, match="single .reference"):
        RenderTemplateStage("#evaluate($x $y)")  # malformed #evaluate arg
    # #include/#parse are supported but need a template root to resolve
    with _pytest.raises(ValueError, match="template_root"):
        RenderTemplateStage("#include('other.vm')")
    with _pytest.raises(ValueError, match="without matching"):
        RenderTemplateStage("#if($x)unclosed")


def test_velocity_macro_expansion():
    from nifi_processors_ray.stages.render import RenderTemplateStage

    t = pa.table({"lang": ["en", "de"], "src": ["web", "book"]})
    # $ref args substitute by name; literal args bind via generated #set;
    # macros may call macros; definitions render to nothing themselves.
    stage = RenderTemplateStage(
        "#macro(tag $v)<$v>#end"
        "#macro(pair $a $b)#tag($a)#tag($b)#end"
        "#pair($lang $src)|#tag(\"lit\")",
        output_col="content", keep_input_cols=False)
    assert stage(t)["content"].to_pylist() == [
        "<en><web>|<lit>", "<de><book>|<lit>"]


def test_velocity_macro_body_directives_and_arity():
    import pytest as _pytest

    from nifi_processors_ray.stages.render import RenderTemplateStage

    t = pa.table({"lang": ["en", "de"]})
    stage = RenderTemplateStage(
        "#macro(flag $v)#if($v == \"en\")EN#else--#end#end[#flag($lang)]",
        output_col="content", keep_input_cols=False)
    assert stage(t)["content"].to_pylist() == ["[EN]", "[--]"]
    with _pytest.raises(ValueError, match="expects 1 argument"):
        RenderTemplateStage("#macro(m $a)$a#end#m($x $y)")
    with _pytest.raises(ValueError, match="recursive #macro"):
        RenderTemplateStage("#macro(m $a)#m($a)#end#m($x)")


def test_velocity_include_and_parse(tmp_path):
    from nifi_processors_ray.stages.render import RenderTemplateStage

    (tmp_path / "raw.txt").write_text("verbatim $notparsed #if")
    (tmp_path / "sub.vm").write_text("#if($lang == \"en\")!EN#end")
    t = pa.table({"lang": ["en", "de"]})
    # include: spliced VERBATIM (refs/directives inside stay literal text)
    stage = RenderTemplateStage(
        "[#include(\"raw.txt\")]", output_col="content",
        keep_input_cols=False, template_root=str(tmp_path))
    assert stage(t)["content"].to_pylist() == [
        "[verbatim $notparsed #if]"] * 2
    # parse: compiled as a template against the row's columns
    stage = RenderTemplateStage(
        "$lang#parse(\"sub.vm\")", output_col="content",
        keep_input_cols=False, template_root=str(tmp_path))
    assert stage(t)["content"].to_pylist() == ["en!EN", "de"]


def test_velocity_parse_cycle_raises(tmp_path):
    import pytest as _pytest

    from nifi_processors_ray.stages.render import RenderTemplateStage

    (tmp_path / "a.vm").write_text("#parse(\"b.vm\")")
    (tmp_path / "b.vm").write_text("#parse(\"a.vm\")")
    with _pytest.raises(ValueError, match="include cycle"):
        RenderTemplateStage("#parse(\"a.vm\")",
                            template_root=str(tmp_path))


def test_velocity_foreach_list_column():
    from nifi_processors_ray.stages.render import RenderTemplateStage

    t = pa.table({
        "name": ["a", "b", "c"],
        "tags": pa.array([["x", "y"], [], None],
                         pa.list_(pa.string())),
    })
    out = RenderTemplateStage("$name:#foreach($t in $tags)<$t>#end",
                              output_col="r", keep_input_cols=False)(t)
    assert out["r"].to_pylist() == ["a:<x><y>", "b:", "c:"]
    # $foreach.index / count / velocityCount inside the body
    out2 = RenderTemplateStage(
        "#foreach($t in $tags)${foreach.index}=$t(${foreach.count});#end",
        output_col="r", keep_input_cols=False)(t)
    assert out2["r"].to_pylist() == ["0=x(1);1=y(2);", "", ""]


def test_velocity_foreach_range_and_nesting():
    from nifi_processors_ray.stages.render import RenderTemplateStage

    t = pa.table({"name": ["p", "q"],
                  "tags": pa.array([["u"], ["v", "w"]],
                                   pa.list_(pa.string()))})
    out = RenderTemplateStage("#foreach($i in [1..3])$i-$name;#end",
                              output_col="r", keep_input_cols=False)(t)
    assert out["r"].to_pylist() == ["1-p;2-p;3-p;", "1-q;2-q;3-q;"]
    # nested: outer over the list column, inner over a range, with #if
    tpl = ("#foreach($t in $tags)#if($t == \"v\")!#end"
           "#foreach($i in [1..2])$t$i#end|#end")
    out2 = RenderTemplateStage(tpl, output_col="r",
                               keep_input_cols=False)(t)
    assert out2["r"].to_pylist() == ["u1u2|", "!v1v2|w1w2|"]


def test_velocity_foreach_rejects_non_list():
    import pytest as _pytest

    from nifi_processors_ray.stages.render import RenderTemplateStage

    t = pa.table({"x": ["a"]})
    stage = RenderTemplateStage("#foreach($i in $x)$i#end", output_col="r")
    with _pytest.raises(ValueError, match="non-list"):
        stage(t)
    with _pytest.raises(ValueError, match="unsupported #foreach form"):
        RenderTemplateStage("#foreach(broken)x#end")
    with _pytest.raises(ValueError, match="without matching #end"):
        RenderTemplateStage("#foreach($i in [1..2])x")


def test_hash_word_literal_not_directive():
    """'#'+word text that is NOT a Velocity directive name renders literally
    (the reference — full Velocity — renders it as text, so compiling must
    not reject 'Issue #123' or 'page#section')."""
    t = pa.table({"a": ["x"]})
    out = RenderTemplateStage("Issue #123 page#section $a",
                              output_col="r", keep_input_cols=False)(t)
    assert out["r"].to_pylist() == ["Issue #123 page#section x"]
    # real directives still work right next to literal '#' text
    out2 = RenderTemplateStage("#42 #if($a)yes#end", output_col="r",
                               keep_input_cols=False)(t)
    assert out2["r"].to_pylist() == ["#42 yes"]


def test_attribute_filter_no_matching_columns():
    """A filter matching NO columns renders every placeholder empty (the
    reference's behavior when the regex excludes every attribute)."""
    t = pa.table({"a": ["1"], "b": ["2"]})
    out = RenderTemplateStage("[$a|$b]", attribute_filter="nomatch_.*",
                              output_col="r", keep_input_cols=False)(t)
    assert out["r"].to_pylist() == ["[|]"]


def test_rowlayout_xml_and_category_files(tmp_path):
    """Rowlayout XML + *.category word lists load into the generator spec
    (GenerateData.java:163-175 analog)."""
    import pytest as _pytest

    from nifi_processors_ray.sources.generate import (generate_rows,
                                                      load_rowlayout)

    (tmp_path / "seasons.category").write_text("spring\nsummer\nautumn\nwinter\n")
    xml = tmp_path / "rowlayout.xml"
    xml.write_text("""<rowlayout>
      <field name="id" type="sequence"/>
      <field name="season" type="category" category="seasons"/>
      <field name="code" type="regularexpression" pattern="[A-Z]{2}[0-9]{2}"/>
      <field name="token" type="random" length="6"/>
      <field name="d" type="datetime"/>
    </rowlayout>""")
    fields = load_rowlayout(str(xml), wordlists_dir=str(tmp_path),
                            min_year=2010, max_year=2012)
    out = pa.table(generate_rows(50, fields, seed=9, num_blocks=2).to_pandas())
    assert out.num_rows == 50
    assert set(out["season"].to_pylist()) <= {"spring", "summer", "autumn", "winter"}
    assert all(len(t) == 6 for t in out["token"].to_pylist())
    import re as _re
    assert all(_re.fullmatch(r"[A-Z]{2}[0-9]{2}", c) for c in out["code"].to_pylist())
    assert all(2010 <= int(d[:4]) <= 2012 for d in out["d"].to_pylist())
    # determinism: same seed -> identical table
    again = pa.table(generate_rows(50, fields, seed=9, num_blocks=5).to_pandas())
    assert out.sort_by("id").equals(again.sort_by("id"))

    bad = tmp_path / "bad.xml"
    bad.write_text('<rowlayout><field name="x" type="gaussian"/></rowlayout>')
    with _pytest.raises(ValueError, match="unsupported rowlayout field type"):
        load_rowlayout(str(bad))


def test_velocity_nested_if():
    from nifi_processors_ray.stages.render import RenderTemplateStage

    t = pa.table({"a": ["1", "2", "3"], "b": ["x", "y", "x"]})
    stage = RenderTemplateStage(
        '#if($a > 1)#if($b == "x")big-x#else big-other#end#else small#end',
        output_col="content", keep_input_cols=False)
    assert stage(t)["content"].to_pylist() == [" small", " big-other", "big-x"]


def test_velocity_define_stop_break():
    """O2d closure (round-3 verdict task #4): #define is late-bound VTL,
    #stop truncates the template per row, #break exits the innermost loop
    per row; #evaluate stays loudly rejected."""
    import pytest as _pytest

    t = pa.table({
        "name": ["alice", "bob", "carol"],
        "vip": [True, False, True],
        "tags": [["a", "b", "c", "d"], ["x", "y"], []],
    })

    # define: body renders at each reference site with the vars THERE
    stage = RenderTemplateStage(
        '#define($g)Hi $name ($w)#end#set($w = "1")$g#set($w = "2")/$g',
        output_col="content", keep_input_cols=False)
    assert stage(t)["content"].to_pylist() == [
        "Hi alice (1)/Hi alice (2)", "Hi bob (1)/Hi bob (2)",
        "Hi carol (1)/Hi carol (2)"]

    # stop under #if: per-row truncation, output before the stop is kept
    stage = RenderTemplateStage("A-#if($vip)#stop#end B-$name",
                                output_col="content", keep_input_cols=False)
    assert stage(t)["content"].to_pylist() == ["A-", "A- B-bob", "A-"]

    # break: current element's output up to the break is kept, later
    # elements of the same row are suppressed, other rows unaffected
    stage = RenderTemplateStage(
        "#foreach($x in $tags)$x#if($foreach.index == 1)#break#end,#end|",
        output_col="content", keep_input_cols=False)
    assert stage(t)["content"].to_pylist() == ["a,b|", "x,y|", "|"]

    # stop inside a loop halts the WHOLE template for that row
    stage = RenderTemplateStage(
        '[#foreach($x in $tags)$x#if($x == "b")#stop#end;#end]$name',
        output_col="content", keep_input_cols=False)
    assert stage(t)["content"].to_pylist() == [
        "[a;b", "[x;y;]bob", "[]carol"]

    # define referencing itself raises (render-time recursion cap)
    stage = RenderTemplateStage("#define($r)$r#end$r",
                                output_col="content", keep_input_cols=False)
    with _pytest.raises(ValueError, match="recursion"):
        stage(t)

    # compile-time rejections unchanged
    with _pytest.raises(ValueError, match="outside a #foreach"):
        RenderTemplateStage("x#break")


def test_velocity_evaluate():
    """O2e closure (round-4 verdict 'What's missing' #1): #evaluate renders
    a runtime string as a template, vectorized by distinct template value
    with an actor-level compile cache."""
    import pytest as _pytest

    t = pa.table({
        "name": ["ada", "bob", "cy", "dee"],
        "tpl": ["Hello $name!", "Hi $name...", "Hello $name!", None],
        "v": [1, 5, 2, 9],
    })
    stage = RenderTemplateStage("#evaluate($tpl)", output_col="content",
                                keep_input_cols=False)
    assert stage(t)["content"].to_pylist() == [
        "Hello ada!", "Hi bob...", "Hello cy!", ""]

    # dynamic template with directives inside
    t2 = t.set_column(1, "tpl",
                      pa.array(["#if($v > 3)big#else small#end"] * 4))
    out = RenderTemplateStage("#evaluate($tpl)", output_col="content",
                              keep_input_cols=False)(t2)
    assert out["content"].to_pylist() == [" small", "big", " small", "big"]

    # literal argument compiles statically at template-compile time
    out = RenderTemplateStage('pre #evaluate("[$name]") post',
                              output_col="content", keep_input_cols=False)(t)
    assert out["content"].to_pylist()[0] == "pre [ada] post"

    # a #set variable is evaluable, and evaluate works under #if
    out = RenderTemplateStage(
        '#set($d = $tpl)#if($v > 3)#evaluate($d)#else-#end',
        output_col="content", keep_input_cols=False)(t)
    assert out["content"].to_pylist() == ["-", "Hi bob...", "-", ""]

    # unknown reference renders nothing (Velocity: null -> no output)
    out = RenderTemplateStage("x#evaluate($nope)y", output_col="content",
                              keep_input_cols=False)(t)
    assert out["content"].to_pylist() == ["xy"] * 4

    # self-evaluation trips the depth guard, not a hang
    t3 = pa.table({"tpl": ["#evaluate($tpl)"]})
    with _pytest.raises(ValueError, match="nesting exceeds"):
        RenderTemplateStage("#evaluate($tpl)", output_col="c")(t3)
