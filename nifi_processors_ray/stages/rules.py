"""Rule engine — the ExecuteRuleEngine (O3) analog, vectorized.

The reference evaluates a JaRE rule project per CSV row
(ExecuteRuleEngine.java:372-598): groups contain subgroups contain rules;
rules in a subgroup combine with a ``rule_op`` (and/or), subgroups chain
onto the group result with per-subgroup ``intergroup_op``; groups can be
date-gated (``validfrom``/``validuntil``) and depend on another group
(Group 1.xml: ``dependentgroupid``); per-row pass/fail counters are attached
as attributes (ExecuteRuleEngine.java:98-107,1002-1028); actions may rewrite
fields (``:489-510``); a detailed-results output explodes one row per rule
filtered by one of 7 output types (``:160-167,531-537,906-952``).

Ray-Data-first re-expression: the rule spec is a declarative JSON-able dict
compiled ONCE (per actor / per task closure) into vectorized
``pyarrow.compute`` predicates; evaluation is pure Arrow boolean algebra per
batch — no Python row loop. Counters and per-group outcomes become typed
columns; routing is a ``route`` column + ``ds.filter``; detailed results are
an Arrow-native row explosion.

Spec shape::

    {
      "groups": [
        {"id": "G1",
         "valid_from": "2017-02-23",        # optional ISO dates, gate vs `as_of`
         "valid_until": null,
         "depends_on": null,                 # run only where that group passed
         "subgroups": [
           {"id": "SG1", "intergroup_op": "and", "rule_op": "or",
            "rules": [
              {"id": "R1", "field": "feature_code", "check": "equals",
               "value": "GRVC",
               "message_passed": "...", "message_failed": "..."}]}]}
      ],
      "actions": [
        {"group": "G1", "when": "failed",    # passed | failed | always
         "field": "status", "set_value": "rejected"}]
    }

Checks: equals, not_equals, in_list, not_in_list, contains, starts_with,
ends_with, matches_regex, is_null, is_not_null, is_empty, longer_than,
shorter_than, gt, ge, lt, le, between (numeric checks cast to float64 —
the reference is stringly-typed and delegates typing to JaRE check classes).
A null field value fails every check except is_null/is_empty, mirroring the
reference's per-row failure tolerance (ExecuteRuleEngine.java:559-564)
without aborting the batch.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

COUNTER_COLS = [
    "ruleengine_groups_count",
    "ruleengine_groups_passed",
    "ruleengine_groups_failed",
    "ruleengine_groups_skipped",
    "ruleengine_rules_count",
    "ruleengine_rules_passed",
    "ruleengine_rules_failed",
    "ruleengine_actions_executed",
    "ruleengine_content_modified",
]


def _as_bool_filled(mask, n: int) -> np.ndarray:
    """Arrow boolean array -> numpy bool with nulls = False (null field
    values fail the check)."""
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    return np.asarray(mask.fill_null(False))


def _num(col):
    """Numeric view of a (stringly-typed) column for gt/ge/lt/le/between.

    Per-ROW tolerance, not per-batch: a malformed value becomes null (and
    thus fails the check via the null-fails-checks rule) instead of
    aborting the whole batch — the reference routes engine errors per row
    (ExecuteRuleEngine.java:559-564). The happy path is a single cast; the
    regex-screened fallback only runs when a batch actually contains
    garbage."""
    t = col.type if not isinstance(col, pa.ChunkedArray) else col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        col = pc.utf8_trim_whitespace(col)
        try:
            return pc.cast(col, pa.float64(), safe=False)
        except pa.ArrowInvalid:
            ok = pc.match_substring_regex(
                col, r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
            cleaned = pc.if_else(pc.fill_null(ok, False), col,
                                 pa.scalar(None, t))
            return pc.cast(cleaned, pa.float64(), safe=False)
    return pc.cast(col, pa.float64(), safe=False)


def _eval_check(col, check: str, value) -> "pa.BooleanArray":
    if check == "equals":
        return pc.equal(col, value)
    if check == "not_equals":
        return pc.not_equal(col, value)
    if check == "in_list":
        return pc.is_in(col, value_set=pa.array(value, type=col.type))
    if check == "not_in_list":
        return pc.invert(pc.is_in(col, value_set=pa.array(value, type=col.type)))
    if check == "contains":
        return pc.match_substring(col, value)
    if check == "not_contains":
        return pc.invert(pc.match_substring(col, value))
    if check == "starts_with":
        return pc.starts_with(col, value)
    if check == "ends_with":
        return pc.ends_with(col, value)
    if check == "matches_regex":
        return pc.match_substring_regex(col, value)
    if check == "is_null":
        return pc.is_null(col)
    if check == "is_not_null":
        return pc.is_valid(col)
    if check == "is_empty":
        return pc.or_kleene(pc.is_null(col), pc.equal(col, ""))
    if check == "is_not_empty":
        return pc.and_kleene(pc.is_valid(col), pc.not_equal(col, ""))
    if check == "longer_than":
        return pc.greater(pc.utf8_length(col), value)
    if check == "shorter_than":
        return pc.less(pc.utf8_length(col), value)
    if check == "gt":
        return pc.greater(_num(col), float(value))
    if check == "ge":
        return pc.greater_equal(_num(col), float(value))
    if check == "lt":
        return pc.less(_num(col), float(value))
    if check == "le":
        return pc.less_equal(_num(col), float(value))
    if check == "between":
        lo, hi = value
        return pc.and_(
            pc.greater_equal(_num(col), float(lo)), pc.less_equal(_num(col), float(hi))
        )
    raise ValueError(f"unknown check: {check}")


def _combine(op: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if op == "and":
        return a & b
    if op == "or":
        return a | b
    raise ValueError(f"unknown operator: {op}")


class CompiledRules:
    """Spec compiled once; ``evaluate`` runs vectorized per batch."""

    def __init__(self, spec: dict, as_of: str | None = None):
        self.spec = spec
        self.as_of = _dt.date.fromisoformat(as_of) if as_of else None
        self.total_rules = sum(
            len(sg["rules"]) for g in spec["groups"] for sg in g["subgroups"]
        )
        self.actions = spec.get("actions", [])
        ids = [g["id"] for g in spec["groups"]]
        if len(set(ids)) != len(ids):
            raise ValueError("duplicate group ids")
        for g in spec["groups"]:
            dep = g.get("depends_on")
            if dep is not None and dep not in ids:
                raise ValueError(f"group {g['id']} depends on unknown group {dep}")

    def _group_active(self, g: dict) -> bool:
        if self.as_of is None:
            return True
        vf, vu = g.get("valid_from"), g.get("valid_until")
        if vf and self.as_of < _dt.date.fromisoformat(vf):
            return False
        if vu and self.as_of > _dt.date.fromisoformat(vu):
            return False
        return True

    def evaluate(self, batch: pa.Table) -> dict:
        """-> dict with per-group outcome masks and per-rule masks.

        group_passed[gid]  : bool ndarray (False where failed OR skipped)
        group_skipped[gid] : bool ndarray
        rule_failed[(gid, sgid, rid)] : bool ndarray
        """
        n = batch.num_rows
        group_passed: dict[str, np.ndarray] = {}
        group_skipped: dict[str, np.ndarray] = {}
        rule_failed: dict[tuple, np.ndarray] = {}
        meta: dict[tuple, dict] = {}

        for g in self.spec["groups"]:
            gid = g["id"]
            if not self._group_active(g):
                group_skipped[gid] = np.ones(n, dtype=bool)
                group_passed[gid] = np.zeros(n, dtype=bool)
                for sg in g["subgroups"]:
                    for r in sg["rules"]:
                        rule_failed[(gid, sg["id"], r["id"])] = np.zeros(n, dtype=bool)
                        meta[(gid, sg["id"], r["id"])] = {"sg": sg, "rule": r,
                                                          "skipped": True}
                continue
            dep = g.get("depends_on")
            if dep is not None:
                # depends_if: run this group where the dependency passed
                # (default) or where it failed (JaRE dependentgroupexecuteif)
                if g.get("depends_if", "passed") == "failed":
                    active = ~group_passed[dep] & ~group_skipped[dep]
                else:
                    active = group_passed[dep].copy()
                skipped = ~active
            else:
                active = np.ones(n, dtype=bool)
                skipped = np.zeros(n, dtype=bool)

            acc: np.ndarray | None = None
            for sg in g["subgroups"]:
                sg_acc: np.ndarray | None = None
                for r in sg["rules"]:
                    col = batch[r["field"]]
                    ok = _as_bool_filled(_eval_check(col, r["check"], r.get("value")), n)
                    rule_failed[(gid, sg["id"], r["id"])] = ~ok & active
                    meta[(gid, sg["id"], r["id"])] = {"sg": sg, "rule": r,
                                                      "skipped": False}
                    sg_acc = ok if sg_acc is None else _combine(sg["rule_op"], sg_acc, ok)
                acc = (
                    sg_acc
                    if acc is None
                    else _combine(sg.get("intergroup_op", "and"), acc, sg_acc)
                )
            passed = (acc if acc is not None else np.ones(n, dtype=bool)) & active
            group_passed[gid] = passed
            group_skipped[gid] = skipped
        return {
            "group_passed": group_passed,
            "group_skipped": group_skipped,
            "rule_failed": rule_failed,
            "meta": meta,
        }


class RuleEngineStage:
    """``ds.map_batches(RuleEngineStage(spec), batch_format="pyarrow",
    concurrency=N)`` — actor-pool form: the spec compiles once per actor
    (the reference loads its engine once in @OnScheduled,
    ExecuteRuleEngine.java:330-336, but shares it across threads via a
    static field; one compiled spec per actor removes that hazard).

    Adds counter columns (COUNTER_COLS), one ``rulegroup_<id>_passed``
    boolean column per group, applies actions, and a ``route`` column
    (``success`` / ``failed`` by any-group-failed — the example flow's
    RouteOnAttribute on ruleengine.rulegroupsFailed,
    ExecuteRuleEngine_Example.xml:21).
    """

    def __init__(self, spec: dict, *, as_of: str | None = None,
                 apply_actions: bool = True, route_column: bool = True):
        self.rules = CompiledRules(spec, as_of=as_of)
        self.apply_actions = apply_actions
        self.route_column = route_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ev = self.rules.evaluate(batch)
        gp, gs = ev["group_passed"], ev["group_skipped"]
        n_groups = len(self.rules.spec["groups"])

        passed_cnt = np.zeros(n, dtype=np.int64)
        skipped_cnt = np.zeros(n, dtype=np.int64)
        for gid in gp:
            passed_cnt += gp[gid]
            skipped_cnt += gs[gid]
        failed_cnt = n_groups - passed_cnt - skipped_cnt

        rules_failed_cnt = np.zeros(n, dtype=np.int64)
        rules_skipped_cnt = np.zeros(n, dtype=np.int64)
        for key, rf in ev["rule_failed"].items():
            rules_failed_cnt += rf
            m = ev["meta"][key]
            if m["skipped"]:
                rules_skipped_cnt += 1
        rules_passed_cnt = self.rules.total_rules - rules_failed_cnt - rules_skipped_cnt

        out = batch
        actions_cnt = np.zeros(n, dtype=np.int64)
        modified = np.zeros(n, dtype=bool)
        if self.apply_actions:
            for a in self.rules.actions:
                when = a.get("when", "always")
                if when == "passed":
                    mask = gp[a["group"]]
                elif when == "failed":
                    mask = ~gp[a["group"]] & ~gs[a["group"]]
                else:
                    mask = np.ones(n, dtype=bool)
                field = a["field"]
                new_val = pa.scalar(a["set_value"])
                mask_arr = pa.array(mask)
                if field in out.column_names:
                    old = out[field]
                    col = pc.if_else(mask_arr, new_val, old)
                    changed = mask & ~_as_bool_filled(pc.equal(old, new_val), n)
                    out = out.set_column(
                        out.column_names.index(field), field, col
                    )
                else:
                    # a brand-new column is engine metadata, not a rewrite of
                    # the original row fields -> does not set content_modified
                    col = pc.if_else(mask_arr, new_val, pa.scalar(None, new_val.type))
                    changed = np.zeros(n, dtype=bool)
                    out = out.append_column(field, col)
                actions_cnt += mask
                modified |= changed

        counters = {
            "ruleengine_groups_count": np.full(n, n_groups, dtype=np.int64),
            "ruleengine_groups_passed": passed_cnt,
            "ruleengine_groups_failed": failed_cnt,
            "ruleengine_groups_skipped": skipped_cnt,
            "ruleengine_rules_count": np.full(n, self.rules.total_rules, np.int64),
            "ruleengine_rules_passed": rules_passed_cnt,
            "ruleengine_rules_failed": rules_failed_cnt,
            "ruleengine_actions_executed": actions_cnt,
            "ruleengine_content_modified": modified,
        }
        for name, arr in counters.items():
            out = out.append_column(name, pa.array(arr))
        for gid in gp:
            out = out.append_column(f"rulegroup_{gid}_passed", pa.array(gp[gid]))
        if self.route_column:
            route = np.where(failed_cnt > 0, "failed", "success")
            out = out.append_column("route", pa.array(route.tolist(), pa.string()))
        return out


# -- detailed results (row explosion) ---------------------------------------

# the 7 output types of ExecuteRuleEngine.java:160-167
OUTPUT_TYPES = {
    "all_groups_all_rules": (None, None),
    "failed_groups_failed_rules": (False, True),
    "failed_groups_all_rules": (False, None),
    "passed_groups_passed_rules": (True, False),
    "passed_groups_all_rules": (True, None),
    "all_groups_failed_rules": (None, True),
    "all_groups_passed_rules": (None, False),
}

DETAIL_COLS = [
    "group_id", "group_failed", "subgroup_id", "subgroup_failed",
    "intergroup_op", "rules_op", "rule_id", "rule_failed", "message",
]


class DetailedResultsStage:
    """Row explosion: one output row per (input row x rule) surviving the
    output-type filter, carrying the input columns plus rule metadata +
    pass/fail message (layout per ExecuteRuleEngine.java:906-952)."""

    def __init__(self, spec: dict, *, output_type: str = "all_groups_all_rules",
                 as_of: str | None = None, keep_cols: list[str] | None = None):
        if output_type not in OUTPUT_TYPES:
            raise ValueError(f"unknown output type {output_type}")
        self.rules = CompiledRules(spec, as_of=as_of)
        self.group_filter, self.rule_filter = OUTPUT_TYPES[output_type]
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        ev = self.rules.evaluate(batch)
        n = batch.num_rows
        src = batch.select(self.keep_cols) if self.keep_cols else batch
        pieces = []
        for g in self.rules.spec["groups"]:
            gid = g["id"]
            g_failed = ~ev["group_passed"][gid] & ~ev["group_skipped"][gid]
            active = ~ev["group_skipped"][gid]
            for sg in g["subgroups"]:
                # a subgroup "fails" when its own rule combination fails
                sg_ok = None
                for r in sg["rules"]:
                    ok = ~ev["rule_failed"][(gid, sg["id"], r["id"])]
                    sg_ok = ok if sg_ok is None else _combine(sg["rule_op"], sg_ok, ok)
                sg_fail = ~sg_ok
                for r in sg["rules"]:
                    rf = ev["rule_failed"][(gid, sg["id"], r["id"])]
                    mask = active.copy()
                    if self.group_filter is True:
                        mask &= ~g_failed
                    elif self.group_filter is False:
                        mask &= g_failed
                    if self.rule_filter is True:
                        mask &= rf
                    elif self.rule_filter is False:
                        mask &= ~rf
                    if not mask.any():
                        continue
                    sel = pa.array(mask)
                    piece = src.filter(sel)
                    m = piece.num_rows
                    rf_f = pa.array(rf[mask])
                    msg = pc.if_else(
                        rf_f,
                        pa.scalar(r.get("message_failed", f"{r['id']} failed")),
                        pa.scalar(r.get("message_passed", f"{r['id']} passed")),
                    )
                    extras = {
                        "group_id": pa.array([gid] * m, pa.string()),
                        "group_failed": pa.array(g_failed[mask]),
                        "subgroup_id": pa.array([sg["id"]] * m, pa.string()),
                        "subgroup_failed": pa.array(sg_fail[mask]),
                        "intergroup_op": pa.array(
                            [sg.get("intergroup_op", "and")] * m, pa.string()
                        ),
                        "rules_op": pa.array([sg["rule_op"]] * m, pa.string()),
                        "rule_id": pa.array([r["id"]] * m, pa.string()),
                        "rule_failed": rf_f,
                        "message": msg,
                    }
                    for name, arr in extras.items():
                        piece = piece.append_column(name, arr)
                    pieces.append(piece)
        if not pieces:
            schema = src.schema
            for name in DETAIL_COLS:
                t = pa.bool_() if name.endswith("failed") else pa.string()
                schema = schema.append(pa.field(name, t))
            return schema.empty_table()
        return pa.concat_tables(pieces)
