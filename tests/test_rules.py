"""Rule engine (O3) semantics pinned per FIXTURES.md F3: the Group 1.xml
golden rule set (feature_code ∈ {GRVC,GRVO,GRVP,GRVPN}, OR-connected) plus
counters, actions, routing and the 7 detailed output types."""

import pyarrow as pa
import pyarrow.compute as pc

from nifi_processors_ray.stages.rules import (
    DetailedResultsStage,
    OUTPUT_TYPES,
    RuleEngineStage,
)

# the reference's golden rule project (nifi_test2_dev.zip -> Group 1.xml):
# one group, one subgroup, 4 CheckIsEqual rules OR-connected on feature_code
GROUP1 = {
    "groups": [
        {
            "id": "G1",
            "valid_from": "2017-02-23",
            "subgroups": [
                {
                    "id": "SG1",
                    "intergroup_op": "and",
                    "rule_op": "or",
                    "rules": [
                        {"id": f"R{i}", "field": "feature_code", "check": "equals",
                         "value": v,
                         "message_passed": f"is {v}", "message_failed": f"not {v}"}
                        for i, v in enumerate(["GRVC", "GRVO", "GRVP", "GRVPN"])
                    ],
                }
            ],
        }
    ]
}


def _batch():
    return pa.table(
        {
            "geonameid": ["1", "2", "3", "4"],
            "feature_code": ["GRVC", "PPL", "GRVPN", None],
        }
    )


def test_group1_golden_counters_and_route():
    out = RuleEngineStage(GROUP1, as_of="2017-03-18")(_batch())
    assert out["ruleengine_groups_count"].to_pylist() == [1, 1, 1, 1]
    assert out["ruleengine_groups_passed"].to_pylist() == [1, 0, 1, 0]
    assert out["ruleengine_groups_failed"].to_pylist() == [0, 1, 0, 1]
    assert out["ruleengine_rules_count"].to_pylist() == [4, 4, 4, 4]
    assert out["ruleengine_rules_passed"].to_pylist() == [1, 0, 1, 0]
    assert out["ruleengine_rules_failed"].to_pylist() == [3, 4, 3, 4]
    assert out["route"].to_pylist() == ["success", "failed", "success", "failed"]
    assert out["rulegroup_G1_passed"].to_pylist() == [True, False, True, False]


def test_group_skipped_before_validity():
    out = RuleEngineStage(GROUP1, as_of="2016-01-01")(_batch())
    assert out["ruleengine_groups_skipped"].to_pylist() == [1, 1, 1, 1]
    assert out["ruleengine_groups_failed"].to_pylist() == [0, 0, 0, 0]


def test_dependent_group():
    spec = {
        "groups": GROUP1["groups"]
        + [
            {
                "id": "G2",
                "depends_on": "G1",
                "subgroups": [
                    {"id": "SG1", "rule_op": "and",
                     "rules": [{"id": "R1", "field": "geonameid", "check": "equals",
                                "value": "1"}]}
                ],
            }
        ]
    }
    out = RuleEngineStage(spec)(_batch())
    # G2 runs only where G1 passed (rows 0,2); passes only row 0
    assert out["rulegroup_G2_passed"].to_pylist() == [True, False, False, False]
    assert out["ruleengine_groups_skipped"].to_pylist() == [0, 1, 0, 1]


def test_actions_rewrite_fields():
    spec = dict(GROUP1)
    spec = {**GROUP1, "actions": [
        {"group": "G1", "when": "failed", "field": "feature_code",
         "set_value": "INVALID"},
        {"group": "G1", "when": "passed", "field": "status", "set_value": "ok"},
    ]}
    out = RuleEngineStage(spec)(_batch())
    assert out["feature_code"].to_pylist() == ["GRVC", "INVALID", "GRVPN", "INVALID"]
    assert out["status"].to_pylist() == ["ok", None, "ok", None]
    assert out["ruleengine_content_modified"].to_pylist() == [False, True, False, True]
    assert out["ruleengine_actions_executed"].to_pylist() == [1, 1, 1, 1]


def test_detailed_explosion_all():
    out = DetailedResultsStage(GROUP1, output_type="all_groups_all_rules")(_batch())
    # 4 rows x 4 rules
    assert out.num_rows == 16
    assert set(out["rule_id"].to_pylist()) == {"R0", "R1", "R2", "R3"}
    r0 = out.filter(pc.and_(pc.equal(out["geonameid"], "1"),
                            pc.equal(out["rule_id"], "R0")))
    assert r0["rule_failed"].to_pylist() == [False]
    assert r0["message"].to_pylist() == ["is GRVC"]
    assert r0["group_failed"].to_pylist() == [False]


def test_detailed_output_type_matrix():
    batch = _batch()
    counts = {}
    for ot in OUTPUT_TYPES:
        counts[ot] = DetailedResultsStage(GROUP1, output_type=ot)(batch).num_rows
    # rows 0,2 pass the group (1 rule passed, 3 failed each); rows 1,3 fail all
    assert counts["all_groups_all_rules"] == 16
    assert counts["failed_groups_all_rules"] == 8
    assert counts["passed_groups_all_rules"] == 8
    assert counts["failed_groups_failed_rules"] == 8
    assert counts["passed_groups_passed_rules"] == 2
    assert counts["all_groups_failed_rules"] == 14
    assert counts["all_groups_passed_rules"] == 2


def test_numeric_and_misc_checks():
    t = pa.table({"v": ["10", "25", None], "s": ["abc", "xbc", ""]})
    spec = {
        "groups": [
            {"id": "N", "subgroups": [
                {"id": "S", "rule_op": "and", "rules": [
                    {"id": "r1", "field": "v", "check": "between", "value": [5, 20]},
                    {"id": "r2", "field": "s", "check": "starts_with", "value": "a"},
                ]}
            ]}
        ]
    }
    out = RuleEngineStage(spec)(t)
    assert out["rulegroup_N_passed"].to_pylist() == [True, False, False]
