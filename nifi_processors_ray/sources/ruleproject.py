"""JaRE rule-project loader: zip / directory / ``Group *.xml`` -> rule spec.

The reference executes externally-authored JaRE rule projects: a zip of
per-group XML files exported from the datamelt business-rules web app
(``ExecuteRuleEngine.java:330-336`` loads the zip with
``BusinessRulesEngine(new ZipFile(...))``; the shipped golden project is
``nifi_test2_dev.zip`` -> ``Group 1.xml``). This module parses that XML
dialect into the engine's declarative JSON spec (``stages/rules.py``), so
the same artifact a reference user authored runs unchanged here.

XML shape (from the golden file)::

    <xml>
      <group id description outputafteractions dependentgroupid
             dependentgroupexecuteif validfrom validuntil>
        <subgroup id description ruleoperator intergroupoperator>
          <rule id description>
            <object classname method parametertype parameter type/>
            <expected value type/>
            <execute value="com.datamelt.rules.implementation.CheckIsEqual"/>
            <message type="failed" text="..."/>
            <message type="passed" text="..."/>
          </rule>
        </subgroup>
      </group>
    </xml>

Mapping notes:

* ``<object parameter>`` is the field NAME the check reads
  (``RowFieldCollection.getFieldValue`` by name) -> spec ``field``.
* JaRE check classes map to the vectorized checks in ``stages/rules.py``
  (table below); an unknown class raises at load time, never silently.
* ``dependentgroupid``/``dependentgroupexecuteif`` -> ``depends_on`` /
  ``depends_if`` (run a group only where the dependency passed/failed).
* ``$0`` in message templates (the expected value) is substituted at load
  time; ``$1`` (the per-row actual value) is left verbatim — messages are
  informational text in the detailed output, not data.
* ``outputafteractions`` is accepted and ignored: the engine's actions
  rewrite columns in place and the detailed output always reflects the
  pre-action values (pinned quirk, SURVEY §2.3).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
import zipfile

_CLS_PREFIX = "com.datamelt.rules.implementation."

# JaRE check class -> (spec check for string types, spec check for numeric
# types). None = same for both.
_CHECK_MAP: dict[str, tuple[str, str | None]] = {
    "CheckIsEqual": ("equals", None),
    "CheckIsNotEqual": ("not_equals", None),
    "CheckContains": ("contains", None),
    "CheckNotContains": ("not_contains", None),
    "CheckStartsWith": ("starts_with", None),
    "CheckEndsWith": ("ends_with", None),
    "CheckIsEmpty": ("is_empty", None),
    "CheckIsNotEmpty": ("is_not_empty", None),
    "CheckIsNull": ("is_null", None),
    "CheckIsNotNull": ("is_not_null", None),
    "CheckMatchesRegularExpression": ("matches_regex", None),
    "CheckMatchesRegex": ("matches_regex", None),
    "CheckIsGreater": ("gt", "gt"),
    "CheckIsGreaterOrEqual": ("ge", "ge"),
    "CheckIsSmaller": ("lt", "lt"),
    "CheckIsSmallerOrEqual": ("le", "le"),
    "CheckIsLongerThan": ("longer_than", None),
    "CheckIsShorterThan": ("shorter_than", None),
}

_NUMERIC_TYPES = {"integer", "long", "double", "float", "big decimal"}


def _parse_rule(el: ET.Element) -> dict:
    obj = el.find("object")
    expected = el.find("expected")
    execute = el.find("execute")
    if obj is None or execute is None:
        raise ValueError(f"rule {el.get('id')!r}: missing <object> or <execute>")
    cls = (execute.get("value") or "").strip()
    short = cls[len(_CLS_PREFIX):] if cls.startswith(_CLS_PREFIX) else cls
    if short not in _CHECK_MAP:
        raise ValueError(
            f"rule {el.get('id')!r}: unsupported JaRE check class {cls!r}; "
            f"supported: {sorted(_CHECK_MAP)}")
    str_check, num_check = _CHECK_MAP[short]
    vtype = (expected.get("type") if expected is not None else None) or "string"
    value = expected.get("value") if expected is not None else None
    check = str_check
    if vtype.lower() in _NUMERIC_TYPES and num_check is not None:
        check = num_check
    if check in ("longer_than", "shorter_than", "gt", "ge", "lt", "le"):
        value = float(value)

    rule = {
        "id": el.get("id"),
        "field": obj.get("parameter"),
        "check": check,
    }
    if value is not None:
        rule["value"] = value
    for msg in el.findall("message"):
        text = (msg.get("text") or "")
        if value is not None:
            text = text.replace("$0", str(value))
        rule[f"message_{msg.get('type')}"] = text
    return rule


def _parse_group(root: ET.Element) -> dict:
    if root.tag == "xml":
        groups = root.findall("group")
    elif root.tag == "group":
        groups = [root]
    else:
        raise ValueError(f"unexpected root element <{root.tag}>")
    out = []
    for g in groups:
        dep = (g.get("dependentgroupid") or "").strip() or None
        group = {
            "id": g.get("id"),
            "valid_from": (g.get("validfrom") or "").strip() or None,
            "valid_until": (g.get("validuntil") or "").strip() or None,
            "depends_on": dep,
            "subgroups": [
                {
                    "id": sg.get("id"),
                    "rule_op": (sg.get("ruleoperator") or "and").strip() or "and",
                    "intergroup_op": (sg.get("intergroupoperator")
                                      or "and").strip() or "and",
                    "rules": [_parse_rule(r) for r in sg.findall("rule")],
                }
                for sg in g.findall("subgroup")
            ],
        }
        if dep is not None:
            group["depends_if"] = (
                (g.get("dependentgroupexecuteif") or "passed").strip()
                or "passed")
        out.append(group)
    return out


def load_rule_project(path: str) -> dict:
    """Load a JaRE rule project into the engine's rule spec.

    ``path`` may be a ``.zip`` export (the reference's input form —
    ``ExecuteRuleEngine.java:330-336``), a directory of group XML files, or
    a single group ``.xml``. Groups are ordered by filename so dependent
    groups can reference earlier ones.
    """
    groups: list[dict] = []
    if os.path.isdir(path):
        names = sorted(fn for fn in os.listdir(path) if fn.endswith(".xml"))
        for fn in names:
            with open(os.path.join(path, fn), encoding="utf-8") as f:
                groups.extend(_parse_group(ET.fromstring(f.read())))
    elif zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            for name in sorted(z.namelist()):
                if name.endswith(".xml"):
                    groups.extend(_parse_group(ET.fromstring(
                        z.read(name).decode("utf-8"))))
    else:
        with open(path, encoding="utf-8") as f:
            groups.extend(_parse_group(ET.fromstring(f.read())))
    if not groups:
        raise ValueError(f"no rule groups found in {path!r}")
    return {"groups": groups, "actions": []}


#: GeoNames "allCountries" 19-column layout (the golden fixture
#: ``allCountries_100.txt``; the rule project reads ``feature_code``).
GEONAMES_FIELDS = [
    "geonameid", "name", "asciiname", "alternatenames", "latitude",
    "longitude", "feature_class", "feature_code", "country_code", "cc2",
    "admin1_code", "admin2_code", "admin3_code", "admin4_code",
    "population", "elevation", "dem", "timezone", "modification_date",
]
