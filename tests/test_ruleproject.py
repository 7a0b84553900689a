"""Golden end-to-end: the reference's OWN rule-project artifact
(``nifi_test2_dev.zip`` -> ``Group 1.xml``) executed over the reference's
own 100-row GeoNames sample (``allCountries_100.txt``) — the flow of
ExecuteRuleEngine_Example.xml (read TSV -> rule engine -> route)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from nifi_processors_ray.sources.ruleproject import (
    GEONAMES_FIELDS,
    load_rule_project,
)
from nifi_processors_ray.sources.text import read_delimited_text
from nifi_processors_ray.stages.rules import RuleEngineStage

ZIP = "/root/reference/nifi_test2_dev.zip"
TSV = "/root/reference/allCountries_100.txt"

needs_golden = pytest.mark.skipif(
    not (os.path.exists(ZIP) and os.path.exists(TSV)),
    reason="reference golden artifacts not present",
)


@needs_golden
def test_load_golden_zip():
    spec = load_rule_project(ZIP)
    assert len(spec["groups"]) == 1
    g = spec["groups"][0]
    assert g["id"] == "Group 1"
    assert g["valid_from"] == "2017-02-23"
    assert g["valid_until"] == "2099-12-31"
    assert g["depends_on"] is None
    (sg,) = g["subgroups"]
    assert sg["rule_op"] == "or" and sg["intergroup_op"] == "and"
    assert [r["value"] for r in sg["rules"]] == ["GRVC", "GRVO", "GRVP", "GRVPN"]
    assert all(r["check"] == "equals" and r["field"] == "feature_code"
               for r in sg["rules"])
    # $0 substituted at load time, $1 preserved
    assert sg["rules"][0]["message_failed"] == \
        "Field [feature_code] $1 incorrectly not is equal to GRVC"


@needs_golden
def test_golden_geonames_end_to_end():
    spec = load_rule_project(ZIP)
    ds = read_delimited_text(TSV, separator="\t", field_names=GEONAMES_FIELDS)
    out = pa.table(
        ds.map_batches(RuleEngineStage(spec, as_of="2017-03-01"),
                       batch_format="pyarrow").to_pandas())
    assert out.num_rows == 100
    passed = out.filter(pc.equal(out["route"], "success"))
    # exactly one row in the sample has feature_code in {GRVC,GRVO,GRVP,GRVPN}
    assert passed.num_rows == 1
    assert passed["geonameid"].to_pylist() == ["3038824"]
    assert passed["feature_code"].to_pylist() == ["GRVC"]
    assert set(out["ruleengine_groups_count"].to_pylist()) == {1}
    assert set(out["ruleengine_rules_count"].to_pylist()) == {4}
    # failed rows: group failed, 0 passed
    failed = out.filter(pc.equal(out["route"], "failed"))
    assert set(failed["ruleengine_groups_failed"].to_pylist()) == {1}


@needs_golden
def test_golden_validity_window_skips_group():
    spec = load_rule_project(ZIP)
    ds = read_delimited_text(TSV, separator="\t", field_names=GEONAMES_FIELDS)
    out = pa.table(
        ds.map_batches(RuleEngineStage(spec, as_of="2017-01-01"),
                       batch_format="pyarrow").to_pandas())
    # before validfrom: the whole group is skipped for every row
    assert set(out["ruleengine_groups_skipped"].to_pylist()) == {1}
    assert set(out["ruleengine_groups_failed"].to_pylist()) == {0}


def test_loader_depends_if_and_unknown_class(tmp_path):
    xml = """<xml><group id="G1" validfrom="" validuntil=""
        dependentgroupid="" dependentgroupexecuteif="">
      <subgroup id="S1" ruleoperator="and" intergroupoperator="and">
        <rule id="R1"><object parameter="f" type="string"/>
          <expected value="x" type="string"/>
          <execute value="com.datamelt.rules.implementation.CheckIsEqual"/>
        </rule></subgroup></group>
      <group id="G2" dependentgroupid="G1" dependentgroupexecuteif="failed">
      <subgroup id="S2" ruleoperator="and" intergroupoperator="and">
        <rule id="R2"><object parameter="f" type="string"/>
          <expected value="3" type="integer"/>
          <execute value="com.datamelt.rules.implementation.CheckIsGreater"/>
        </rule></subgroup></group></xml>"""
    p = tmp_path / "g.xml"
    p.write_text(xml)
    spec = load_rule_project(str(p))
    assert spec["groups"][1]["depends_on"] == "G1"
    assert spec["groups"][1]["depends_if"] == "failed"
    assert spec["groups"][1]["subgroups"][0]["rules"][0]["check"] == "gt"
    assert spec["groups"][1]["subgroups"][0]["rules"][0]["value"] == 3.0

    bad = xml.replace("CheckIsGreater", "CheckSomethingNew")
    p2 = tmp_path / "bad.xml"
    p2.write_text(bad)
    with pytest.raises(ValueError, match="unsupported JaRE check class"):
        load_rule_project(str(p2))

    # depends_if="failed" executes G2 only where G1 failed; garbage numeric
    # values fail the gt check per-row instead of aborting the batch
    t = pa.table({"f": ["x", "7", "oops"]})
    stage = RuleEngineStage(spec)
    out = stage(t)
    assert out["rulegroup_G1_passed"].to_pylist() == [True, False, False]
    # G2 runs on rows 1,2 (G1 failed): "7" > 3 passes, "oops" fails per-row
    assert out["rulegroup_G2_passed"].to_pylist() == [False, True, False]
