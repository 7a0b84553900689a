"""Query registry: every implemented operator/pipeline exposed as a
``(sf_dir) -> Dataset | pyarrow.Table | pandas.DataFrame`` callable, with an
equivalent DuckDB oracle SQL where SQL can express the semantics.

This is the correctness gate (driver contract in ``__ray_entry__.py``):
column names are deliberately identical between the Ray result and the SQL
(the driver hashes values under sorted column names). Float aggregates are
rounded identically on both sides to make the value-hash robust to
summation order.

Never calls ``ray.init`` — the driver owns the session.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import sha256_column
from ..stages.dedup import exact_dedup, minhash_dedup, simhash_dedup
from ..stages.render import RenderTemplateStage
from ..stages.rules import DetailedResultsStage, RuleEngineStage
from ..stages.similarity import knn_topk, lsh_bucket_topk
from ..stages.split_fields import SplitFieldsStage
from ..stages.textstats import (
    FingerprintStage,
    LangIdStage,
    QualityScoreStage,
    count_tokens,
)
from ..state.lake import LakeTable, latest_by_key

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _pool(explicit=None):
    """Cluster-sized autoscaling actor-pool concurrency (scale.py)."""
    from ..functions.scale import default_pool

    return default_pool(explicit)


def _cached(cls, *args, **kwargs):
    """Per-worker cached stage instance as a stateless map_batches fn —
    for cheap-setup stages where an actor pool's startup is the dominant
    cost (functions/scale.cached_stage)."""
    from ..functions.scale import cached_stage

    return cached_stage(cls, *args, **kwargs)


def _partitions(floor: int) -> int:
    """Cluster-sized shuffle partition count (scale.py)."""
    from ..functions.scale import default_partitions

    return default_partitions(None, floor)


def _rd():
    import ray.data as rd

    return rd


def _read(sf_dir: str, table: str, columns=None):
    # Pass a projected, METADATA-FREE schema: the testdata parquet carries
    # pandas metadata, and any schema with metadata is unhashable to Ray's
    # block-schema dedup (pa.Schema.__hash__ chokes on the dict) — every
    # downstream merge then warns "Failed to hash the schemas" per block.
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    full = pq.read_schema(path).remove_metadata()
    schema = (pa.schema([full.field(c) for c in columns])
              if columns is not None else full)
    return _rd().read_parquet(path, columns=columns, schema=schema)


def _round_cols(tbl: pa.Table, spec: dict[str, int]) -> pa.Table:
    # half_towards_infinity == away-from-zero == DuckDB's ROUND, so exact
    # halves (e.g. 105/128 at 6dp) round identically on both sides
    for col, nd in spec.items():
        if col in tbl.column_names:
            tbl = tbl.set_column(
                tbl.column_names.index(col), col,
                pc.round(tbl[col], ndigits=nd,
                         round_mode="half_towards_infinity"),
            )
    return tbl


def _int_encode(tbl: pa.Table, spec: dict[str, int]) -> pa.Table:
    """Scale float aggregates by 10^k and round to int64 so the
    oracle comparison is EXACT (different summation orders between Ray
    and DuckDB can differ by 1 ULP, which breaks value-hash equality;
    integers cannot). SQL twin: CAST(ROUND(expr * 10^k) AS BIGINT)."""
    for col, k in spec.items():
        if col in tbl.column_names:
            scaled = pc.round(pc.multiply(tbl[col], float(10 ** k)))
            tbl = tbl.set_column(
                tbl.column_names.index(col), col, pc.cast(scaled, pa.int64())
            )
    return tbl


def _to_table(ds_or_tbl) -> pa.Table:
    """Oracle-scale materialization, Arrow-native end to end: a pandas
    round-trip silently coerces dtypes (the round-1 user_sessions HUGEINT
    incident), and this is the comparison surface. Now shared with every
    guarded driver-side gather in the stages (functions.tables)."""
    from ..functions.tables import gather_table

    return gather_table(ds_or_tbl)


# ---------------------------------------------------------------------------
# O1 split / O2 render / O3 rules / O4 generate
# ---------------------------------------------------------------------------


def q_split_fields(sf_dir: str):
    """O1: compose a delimited line then split positionally
    (SplitToAttribute.java:177-194 semantics over a Dataset)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def to_line(batch: pa.Table) -> pa.Table:
        line = pc.binary_join_element_wise(
            batch["lang"], batch["source"],
            pc.cast(batch["doc_id"], pa.string()), ";",
        )
        return pa.table({"doc_id": batch["doc_id"], "content": line})

    return docs.map_batches(to_line, batch_format="pyarrow",
                            zero_copy_batch=True).map_batches(
        SplitFieldsStage(separator=";", num_fields=3, keep_content=False),
        batch_format="pyarrow", zero_copy_batch=True,
    )


SQL_SPLIT_FIELDS = """
SELECT doc_id, lang AS column_0000, source AS column_0001,
       CAST(doc_id AS VARCHAR) AS column_0002
FROM documents
"""


def q_render_template(sf_dir: str):
    """O2: template render (MergeTemplate.java:240-265 semantics)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    stage = RenderTemplateStage(
        '{"id": $doc_id, "lang": "$lang", "src": "$source"}',
        output_col="content", keep_input_cols=True,
    )
    return docs.map_batches(stage, batch_format="pyarrow",
                            zero_copy_batch=True).select_columns(
        ["doc_id", "content"]
    )


SQL_RENDER_TEMPLATE = """
SELECT doc_id,
       '{"id": ' || CAST(doc_id AS VARCHAR) || ', "lang": "' || lang
       || '", "src": "' || source || '"}' AS content
FROM documents
"""

def q_render_foreach(sf_dir: str):
    """O2b: Velocity ``#foreach`` over a list-typed column — the loop
    renders as one vectorized explode/render/fold (render.py docstring).
    The list column is built per row as [lang, source, doc_id%4] so the
    DuckDB twin can state the same loop with list_transform."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    stage = RenderTemplateStage(
        "$doc_id[$lang]#foreach($t in $toks)<$t>#end",
        output_col="content", keep_input_cols=True)

    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lang = batch["lang"].combine_chunks()
        source = batch["source"].combine_chunks()
        idm = pc.cast(pc.bit_wise_and(batch["doc_id"], 3), pa.string())
        if isinstance(idm, pa.ChunkedArray):
            idm = idm.combine_chunks()
        stacked = pa.concat_arrays([lang, source, idm])
        order = (np.tile(np.arange(3, dtype=np.int64), n) * n
                 + np.repeat(np.arange(n, dtype=np.int64), 3))
        child = stacked.take(pa.array(order))
        toks = pa.ListArray.from_arrays(
            pa.array(np.arange(0, 3 * n + 1, 3, dtype=np.int32), pa.int32()),
            child)
        out = stage(batch.append_column("toks", toks))
        return out.select(["doc_id", "content"])

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQL_RENDER_FOREACH = """
SELECT doc_id,
       CAST(doc_id AS VARCHAR) || '[' || lang || ']'
       || array_to_string(list_transform(
              [lang, source, CAST(doc_id % 4 AS VARCHAR)],
              t -> '<' || t || '>'), '') AS content
FROM documents
"""


def q_render_macro(sf_dir: str):
    """O2c: Velocity ``#macro`` (compile-time call-by-name expansion) +
    ``#parse`` (sub-template splice) — the last directives the reference
    merges that round 2 still rejected (MergeTemplate.java:57-59,261).
    The macro/parse resolution happens ONCE at template compile on the
    driver; the batch path stays the same vectorized join kernel."""
    root = tempfile.mkdtemp(prefix="render_macro_", dir="/tmp")
    with open(os.path.join(root, "suffix.vm"), "w", encoding="utf-8") as fh:
        fh.write('#if($lang == "en")!EN#end')
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    stage = RenderTemplateStage(
        '#macro(tag $v)<$v>#end'
        '$doc_id:#tag($lang)#tag($source)#parse("suffix.vm")',
        output_col="content", keep_input_cols=True, template_root=root)
    return docs.map_batches(stage, batch_format="pyarrow",
                            zero_copy_batch=True).select_columns(
        ["doc_id", "content"])


SQL_RENDER_MACRO = """
SELECT doc_id,
       CAST(doc_id AS VARCHAR) || ':<' || lang || '><' || source || '>'
       || CASE WHEN lang = 'en' THEN '!EN' ELSE '' END AS content
FROM documents
"""


def q_render_define_stop(sf_dir: str):
    """O2d closure (round-3 verdict task #4): ``#define`` (late-bound VTL
    block), ``#break`` (exit innermost #foreach, here at the 3rd range
    element), and ``#stop`` (halt the template per row — German docs end
    at the header). All three render through the vectorized halt-mask
    machinery (stages/render.py); ``#evaluate`` stays loudly rejected."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    stage = RenderTemplateStage(
        "#define($hdr)$doc_id/$lang#end$hdr"
        "#foreach($i in [1..5])$i#if($i == 3)#break#end#end"
        '#if($lang == "de")#stop#end:$source',
        output_col="content", keep_input_cols=True)
    return docs.map_batches(stage, batch_format="pyarrow",
                            zero_copy_batch=True).select_columns(
        ["doc_id", "content"])


SQL_RENDER_DEFINE_STOP = """
SELECT doc_id,
       CAST(doc_id AS VARCHAR) || '/' || lang || '123'
       || CASE WHEN lang = 'de' THEN '' ELSE ':' || source END AS content
FROM documents
"""


def q_render_evaluate(sf_dir: str):
    """O2e closure (round-4 verdict 'What's missing' #1): ``#evaluate``
    renders a RUNTIME string as a template — here a per-language template
    column (few distinct values, the realistic shape), executed by
    distinct-template dictionary grouping with an actor-level compile
    cache (stages/render.py _render_evaluate; MergeTemplate.java:57-59
    delegates to full Velocity, which supports #evaluate)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def add_tpl(batch: pa.Table) -> pa.Table:
        tpl = pc.if_else(
            pc.equal(batch["lang"], "en"),
            pa.scalar("en:$source#$doc_id", pa.string()),
            pc.if_else(pc.equal(batch["lang"], "de"),
                       pa.scalar("de<$doc_id>", pa.string()),
                       pa.scalar("#if($doc_id > 100)x$lang#else y#end",
                                 pa.string())))
        return batch.append_column("tpl", tpl)

    stage = RenderTemplateStage("#evaluate($tpl)", output_col="content",
                                keep_input_cols=True)
    return (docs.map_batches(add_tpl, batch_format="pyarrow",
                             zero_copy_batch=True)
            .map_batches(stage, batch_format="pyarrow",
                         zero_copy_batch=True)
            .select_columns(["doc_id", "content"]))


SQL_RENDER_EVALUATE = """
SELECT doc_id,
       CASE WHEN lang = 'en' THEN 'en:' || source || '#' || CAST(doc_id AS VARCHAR)
            WHEN lang = 'de' THEN 'de<' || CAST(doc_id AS VARCHAR) || '>'
            WHEN doc_id > 100 THEN 'x' || lang
            ELSE ' y' END AS content
FROM documents
"""


_RULE_SPEC = {
    "groups": [
        {"id": "G1", "subgroups": [
            {"id": "SG1", "intergroup_op": "and", "rule_op": "or", "rules": [
                {"id": "R0", "field": "lang", "check": "equals", "value": "en",
                 "message_passed": "is en", "message_failed": "not en"},
                {"id": "R1", "field": "lang", "check": "equals", "value": "de",
                 "message_passed": "is de", "message_failed": "not de"},
            ]}]},
        {"id": "G2", "subgroups": [
            {"id": "SG1", "intergroup_op": "and", "rule_op": "and", "rules": [
                {"id": "R0", "field": "n_chars", "check": "gt", "value": 1000},
            ]}]},
    ]
}


def q_rule_route(sf_dir: str):
    """O3 core: group evaluation + counters + routing."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    out = docs.map_batches(RuleEngineStage(_RULE_SPEC), batch_format="pyarrow",
                           zero_copy_batch=True)
    return out.select_columns(
        ["doc_id", "ruleengine_groups_passed", "ruleengine_groups_failed",
         "rulegroup_G1_passed", "rulegroup_G2_passed", "route"]
    )


SQL_RULE_ROUTE = """
WITH b AS (
  SELECT doc_id, (lang = 'en' OR lang = 'de') AS g1, n_chars > 1000 AS g2
  FROM documents)
SELECT doc_id,
       (CASE WHEN g1 THEN 1 ELSE 0 END
        + CASE WHEN g2 THEN 1 ELSE 0 END)::BIGINT AS ruleengine_groups_passed,
       (CASE WHEN g1 THEN 0 ELSE 1 END
        + CASE WHEN g2 THEN 0 ELSE 1 END)::BIGINT AS ruleengine_groups_failed,
       g1 AS rulegroup_G1_passed, g2 AS rulegroup_G2_passed,
       CASE WHEN (NOT g1) OR (NOT g2) THEN 'failed' ELSE 'success' END AS route
FROM b
"""

_DETAIL_SPEC = {
    "groups": [
        {"id": "G1", "subgroups": [
            {"id": "SG1", "intergroup_op": "and", "rule_op": "or", "rules": [
                {"id": "R0", "field": "lang", "check": "equals", "value": "en",
                 "message_passed": "is en", "message_failed": "not en"},
                {"id": "R1", "field": "lang", "check": "equals", "value": "de",
                 "message_passed": "is de", "message_failed": "not de"},
            ]}]}]
}


def q_rule_detailed(sf_dir: str):
    """O3 detailed-results explosion (ExecuteRuleEngine.java:906-952)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    stage = DetailedResultsStage(_DETAIL_SPEC,
                                 output_type="all_groups_all_rules",
                                 keep_cols=["doc_id"])
    return docs.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)


SQL_RULE_DETAILED = """
WITH b AS (
  SELECT doc_id, lang = 'en' AS r0, lang = 'de' AS r1,
         (lang = 'en' OR lang = 'de') AS g
  FROM documents)
SELECT doc_id, 'G1' AS group_id, NOT g AS group_failed,
       'SG1' AS subgroup_id, NOT g AS subgroup_failed,
       'and' AS intergroup_op, 'or' AS rules_op, 'R0' AS rule_id,
       NOT r0 AS rule_failed,
       CASE WHEN r0 THEN 'is en' ELSE 'not en' END AS message
FROM b
UNION ALL
SELECT doc_id, 'G1', NOT g, 'SG1', NOT g, 'and', 'or', 'R1', NOT r1,
       CASE WHEN r1 THEN 'is de' ELSE 'not de' END
FROM b
"""


def q_stage_provenance(sf_dir: str):
    """Per-stage provenance counters (the NiFi ProvenanceReporter analog,
    SplitToAttribute.java:207 / GenerateData.java:225): the rule_route
    pipeline instrumented with stages/provenance.py — rows in/out plus
    per-relationship transfer counts, all accumulated in a zero-CPU
    counter actor while the pipeline streams."""
    import json as _json

    from ..stages.provenance import Provenance

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    prov = Provenance()
    try:
        # the instrumented stage runs as a stateless fn wrap (the compiled
        # instance ships in the task closure, the q_rule_route pattern) —
        # the counter ACTOR is the stateful piece, and wrap_class remains
        # the actor-pool form for expensive stages (tests cover both)
        out = docs.map_batches(
            prov.wrap("rule_route", RuleEngineStage(_RULE_SPEC),
                      route_col="route"),
            batch_format="pyarrow", zero_copy_batch=True)
        out.count()  # drive the stream through the instrumented stage
        rep = prov.report()
    finally:
        prov.close()
    routes = _json.loads(rep["routes"][0].as_py())
    return pa.table({
        "stage": rep["stage"],
        "rows_in": rep["rows_in"],
        "rows_out": rep["rows_out"],
        "n_success": pa.array([routes.get("success", 0)], pa.int64()),
        "n_failed": pa.array([routes.get("failed", 0)], pa.int64()),
    })


SQL_STAGE_PROVENANCE = """
SELECT 'rule_route' AS stage,
       COUNT(*) AS rows_in, COUNT(*) AS rows_out,
       CAST(SUM(CASE WHEN (lang = 'en' OR lang = 'de') AND n_chars > 1000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
       CAST(SUM(CASE WHEN (lang = 'en' OR lang = 'de') AND n_chars > 1000
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_failed
FROM documents
"""


def q_generate_rows(sf_dir: str):
    """O4: deterministic rowlayout generator (no SQL oracle — generator)."""
    from ..sources.generate import generate_rows

    layout = [
        {"name": "id", "kind": "sequence"},
        {"name": "city", "kind": "wordlist",
         "words": ["Berlin", "Paris", "Rome", "Oslo"]},
        {"name": "code", "kind": "pattern", "pattern": "[A-Z]{2}[0-9]{3}"},
        {"name": "d", "kind": "date", "min_year": 2000, "max_year": 2010},
    ]
    return generate_rows(1000, layout, seed=42, num_blocks=4)


# ---------------------------------------------------------------------------
# CDC pipelines
# ---------------------------------------------------------------------------


def q_cdc_events_latest(sf_dir: str):
    """Events framed as a CDC tail (key=user_id, seq=event_id, 'error' =
    delete) applied through the REAL lake sink (epoch-fenced, LWW), then
    merge-on-read final state."""
    rd = _rd()
    events = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "event_type", "value"])

    def frame(batch: pa.Table) -> pa.Table:
        op = pc.if_else(pc.equal(batch["event_type"], "error"),
                        pa.scalar("delete"), pa.scalar("upsert"))
        return batch.append_column("op", op)

    framed = events.map_batches(frame, batch_format="pyarrow",
                                zero_copy_batch=True)
    root = tempfile.mkdtemp(prefix="cdc_events_", dir="/tmp")
    lake = LakeTable(root, key_cols=("user_id",), seq_col="event_id",
                     op_col="op", num_partitions=_partitions(16))
    def _parity(p):
        def f(batch: pa.Table) -> pa.Table:
            keep = pc.equal(
                pc.bit_wise_and(batch["event_id"], pa.scalar(1, pa.int64())), p
            )
            return batch.filter(keep)

        return f

    try:
        lake.apply_epoch(framed.map_batches(_parity(0), batch_format="pyarrow",
                                            zero_copy_batch=True), 0)
        lake.apply_epoch(framed.map_batches(_parity(1), batch_format="pyarrow",
                                            zero_copy_batch=True), 1)
        final = lake.read_table()
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    return final.select(["user_id", "event_id", "event_type", "value"])


SQL_CDC_EVENTS_LATEST = """
WITH framed AS (
  SELECT user_id, event_id, event_type, value,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
  FROM events),
latest AS (
  SELECT * FROM framed
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
SELECT user_id, event_id, event_type, value FROM latest WHERE op = 'upsert'
"""


def q_cdc_incremental_agg(sf_dir: str):
    """Incrementally-maintained materialized aggregate (state/matview.py):
    events framed as the CDC tail of q_cdc_events_latest, applied in two
    epochs, with ``IncrementalAggView`` refreshed AFTER EACH epoch — the
    second refresh exercises real retractions (epoch-0 winners beaten by
    epoch-1 rows, group moves, deletes). Final view state must equal a
    from-scratch GROUP BY over the latest-row-per-key snapshot."""
    from ..state.matview import IncrementalAggView

    events = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "event_type", "value"])

    def frame(batch: pa.Table) -> pa.Table:
        op = pc.if_else(pc.equal(batch["event_type"], "error"),
                        pa.scalar("delete"), pa.scalar("upsert"))
        # aggregate integer-valued CENTS: integer-valued float64 sums are
        # exact in ANY summation order (up to 2^53), so the incremental
        # retract/insert accumulation cannot drift onto a rounding
        # knife-edge vs the oracle's direct SUM (observed at sf0.1: one
        # group off by 1 unit from float residue at a .5 boundary)
        cents = pc.round(pc.multiply(batch["value"], pa.scalar(100.0)),
                         round_mode="half_towards_infinity")
        return (batch.append_column("op", op)
                .append_column("value_cents", cents))

    framed = events.map_batches(frame, batch_format="pyarrow",
                                zero_copy_batch=True)

    def _parity(p):
        def f(batch: pa.Table) -> pa.Table:
            keep = pc.equal(
                pc.bit_wise_and(batch["event_id"], pa.scalar(1, pa.int64())),
                p)
            return batch.filter(keep)

        return f

    root = tempfile.mkdtemp(prefix="cdc_matview_", dir="/tmp")
    lake = LakeTable(os.path.join(root, "lake"), key_cols=("user_id",),
                     seq_col="event_id", op_col="op", num_partitions=_partitions(16))
    try:
        view = IncrementalAggView(lake, os.path.join(root, "view"),
                                  name="by_type", group_cols=["event_type"],
                                  value_col="value_cents")
        for p in (0, 1):
            lake.apply_epoch(
                framed.map_batches(_parity(p), batch_format="pyarrow",
                                   zero_copy_batch=True), p)
            out = view.refresh()
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    return _int_encode(out, {"sum_value": 0})


SQL_CDC_INCREMENTAL_AGG = """
WITH framed AS (
  SELECT user_id, event_id, event_type, value,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
  FROM events),
latest AS (
  SELECT * FROM framed
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
SELECT event_type, COUNT(*) AS cnt,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
FROM latest WHERE op = 'upsert' GROUP BY event_type
"""


def q_latest_event_per_user(sf_dir: str):
    """LWW as a pure operator (no sink): per-batch combiner, then ONE
    grouped arg-max per key-hash PARTITION — ``latest_by_key`` resolves
    every user in the partition with a single sort+mask, so there is no
    per-user Python dispatch (the shuffle-minimizing upsert reduction)."""
    from ..functions.hashing import hash64_columns

    events = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        red = latest_by_key(batch, ["user_id"], "event_id")
        h = hash64_columns(red, ["user_id"])
        return red.append_column(
            "_part", pa.array((h % np.uint64(64)).astype(np.int64)))

    def final(group: pa.Table) -> pa.Table:
        return latest_by_key(group, ["user_id"],
                             "event_id").drop_columns(["_part"])

    return (
        events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


SQL_LATEST_EVENT_PER_USER = """
SELECT event_id, user_id, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
"""


def q_cdc_documents_snapshot(sf_dir: str):
    """Flagship: documents framed as the input_hint repo-change table
    (repo, path, commit, lang, content, op, seq), applied exactly-once into
    the lake, final state fingerprinted per row (north-rule sha256)."""
    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])

    def frame(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"]
        path = pc.binary_join_element_wise(
            pa.scalar("doc"),
            pc.cast(pc.cast(pc.bit_wise_and(doc_id, 63), pa.int64()), pa.string()),
            "/",
        )
        op = pc.if_else(
            pc.equal(pc.cast(pc.bit_wise_and(doc_id, 7), pa.int64()), 7),
            pa.scalar("delete"), pa.scalar("upsert"),
        )
        return pa.table(
            {
                "repo": batch["source"],
                "path": path,
                "commit": pc.cast(doc_id, pa.string()),
                "lang": batch["lang"],
                "content": batch["text"],
                "op": op,
                "seq": doc_id,
            }
        )

    framed = docs.map_batches(frame, batch_format="pyarrow", zero_copy_batch=True)
    root = tempfile.mkdtemp(prefix="cdc_docs_", dir="/tmp")
    lake = LakeTable(root, key_cols=("repo", "path"), seq_col="seq",
                     op_col="op", num_partitions=_partitions(16))
    try:
        lake.apply_epoch(framed, 0)
        final = lake.read_table()
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    sha = pa.array(sha256_column(final["content"]), pa.string())
    return final.select(["repo", "path", "seq"]).append_column(
        "content_sha256", sha
    )


SQL_CDC_DOCUMENTS_SNAPSHOT = """
WITH framed AS (
  SELECT source AS repo, 'doc/' || CAST(doc_id % 64 AS VARCHAR) AS path,
         doc_id AS seq, text,
         CASE WHEN doc_id % 8 = 7 THEN 'delete' ELSE 'upsert' END AS op
  FROM documents),
latest AS (
  SELECT * FROM framed
  QUALIFY row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) = 1)
SELECT repo, path, seq, sha256(text) AS content_sha256
FROM latest WHERE op = 'upsert'
"""


# ---------------------------------------------------------------------------
# relational pipelines (aggregate / sort / join / window)
# ---------------------------------------------------------------------------


def q_q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: per-batch partial aggregation inside map_batches
    (the exchange carries (flag, status)-bounded partial rows, never the
    lineitem stream), byte-guarded driver fold with a distributed-groupby
    fallback; means derive from folded sums/counts."""
    from ray.data.aggregate import Sum

    from ..stages.similarity import _try_gather_small

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        import datetime

        batch = batch.filter(
            pc.less_equal(batch["l_shipdate"],
                          pa.scalar(datetime.datetime(1997, 1, 1)))
        )
        disc = pc.multiply(batch["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "l_quantity": batch["l_quantity"],
            "l_extendedprice": batch["l_extendedprice"],
            "disc_price": disc,
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("one", "sum")])

    def finish(g: pa.Table) -> pa.Table:
        n = pc.cast(g["count_order"], pa.float64())
        out = pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": g["sum_qty"],
            "sum_base_price": g["sum_base_price"],
            "sum_disc_price": g["sum_disc_price"],
            "avg_qty": pc.divide(g["sum_qty"], n),
            "avg_price": pc.divide(g["sum_base_price"], n),
            "count_order": g["count_order"],
        })
        return _int_encode(out, {"sum_qty": 2, "sum_base_price": 2,
                                 "sum_disc_price": 2, "avg_qty": 4,
                                 "avg_price": 4})

    parts = li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    small = _try_gather_small(parts)
    if small is not None:
        g = small.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity_sum", "sum"), ("l_extendedprice_sum", "sum"),
             ("disc_price_sum", "sum"), ("one_sum", "sum")])
        g = g.rename_columns([{"l_quantity_sum_sum": "sum_qty",
                               "l_extendedprice_sum_sum": "sum_base_price",
                               "disc_price_sum_sum": "sum_disc_price",
                               "one_sum_sum": "count_order"}.get(c, c)
                              for c in g.column_names])
        return finish(g)
    out = parts.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity_sum", alias_name="sum_qty"),
        Sum("l_extendedprice_sum", alias_name="sum_base_price"),
        Sum("disc_price_sum", alias_name="sum_disc_price"),
        Sum("one_sum", alias_name="count_order"))
    return finish(_to_table(out))


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS sum_qty,
       CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_price,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
         AS sum_disc_price,
       CAST(ROUND(AVG(l_quantity) * 10000) AS BIGINT) AS avg_qty,
       CAST(ROUND(AVG(l_extendedprice) * 10000) AS BIGINT) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-01-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_top10_orders(sf_dir: str):
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return orders.sort(["o_totalprice", "o_orderkey"],
                       descending=[True, False]).limit(10)


SQL_TOP10_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def revenue_by_nation_pipeline(sf_dir: str, *,
                               max_broadcast_bytes: int | None = None):
    """Dimension join with a byte-budget guard: when the (customer ->
    nation) dimension projection fits ``check_broadcast_budget`` it ships
    ONCE via ``ray.put`` and each batch looks it up with searchsorted (no
    fact-table shuffle); when it doesn't, the pipeline falls back to the
    partitioned ``bucket_join`` — the dimension is no longer 'small' and
    broadcasting it would be the 100-TB failure mode."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import (DEFAULT_BROADCAST_BUDGET, bucket_join,
                                check_broadcast_budget,
                                parquet_projected_bytes)

    if max_broadcast_bytes is None:
        max_broadcast_bytes = DEFAULT_BROADCAST_BUDGET
    cust_path = os.path.join(sf_dir, "customer.parquet")
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    nk = np.asarray(nation["n_nationkey"]).astype(np.int64)
    nname = np.asarray(nation["n_name"]).astype(object)
    order_n = np.argsort(nk)
    nk, nname = nk[order_n], nname[order_n]

    dim_bytes = parquet_projected_bytes(cust_path,
                                        ["c_custkey", "c_nationkey"])
    if check_broadcast_budget(dim_bytes, what="customer dimension",
                              max_broadcast_bytes=max_broadcast_bytes):
        cust = pq.read_table(cust_path, columns=["c_custkey", "c_nationkey"])
        ckey = np.asarray(cust["c_custkey"]).astype(np.int64)
        cnat = np.asarray(cust["c_nationkey"]).astype(np.int64)
        order_c = np.argsort(ckey)
        nnat = len(nk)
        lookup_ref = ray.put((ckey[order_c], cnat[order_c], nk))

        def nation_partials(batch: pa.Table) -> pa.Table:
            # broadcast lookup (ray.put once; per-worker object cache makes
            # the ray.get zero-copy after the first batch) + per-batch
            # bincount partials: each batch reduces to <= |nations| rows,
            # so no per-row n_name column is ever materialized and the
            # only data movement is nations x batches summary rows
            ck, cn, nkey = ray.get(lookup_ref)
            cust_idx = np.searchsorted(ck, np.asarray(batch["o_custkey"]))
            nat_idx = np.searchsorted(nkey, cn[cust_idx])
            price = np.asarray(batch["o_totalprice"], dtype=np.float64)
            return pa.table({
                "code": pa.array(np.arange(nnat, dtype=np.int64)),
                "revenue": pa.array(np.bincount(nat_idx, weights=price,
                                                minlength=nnat)),
                "n_orders": pa.array(np.bincount(nat_idx, minlength=nnat)
                                     .astype(np.int64)),
            })

        parts = orders.map_batches(nation_partials, batch_format="pyarrow",
                                   zero_copy_batch=True)
        # partials are bounded by |nations| per batch at ANY corpus scale —
        # fold them on the driver instead of a sliver-granular sort shuffle
        rev = np.zeros(nnat, np.float64)
        cnt = np.zeros(nnat, np.int64)
        for b in parts.iter_batches(batch_format="pyarrow"):
            # iter_batches may concatenate several partial tables into one
            # batch, repeating codes — bincount accumulates duplicates
            # (fancy-index += would keep only one contribution per code)
            c = np.asarray(b["code"])
            rev += np.bincount(c, weights=np.asarray(b["revenue"]),
                               minlength=nnat)
            cnt += np.bincount(c, weights=np.asarray(b["n_orders"]),
                               minlength=nnat).astype(np.int64)
        keep = cnt > 0
        out = pa.table({
            "n_name": pa.array(nname[keep], pa.string()),
            "revenue": pa.array(rev[keep]),
            "n_orders": pa.array(cnt[keep]),
        })
        return _int_encode(out, {"revenue": 2})
    else:
        # dimension over budget: partitioned hash join, then the (tiny,
        # asserted) nation map attaches per batch
        cust_ds = _read(sf_dir, "customer",
                        columns=["c_custkey", "c_nationkey"])
        joined_ck = bucket_join(orders, cust_ds, left_on="o_custkey",
                                right_on="c_custkey", num_buckets=32)
        assert check_broadcast_budget(nation.nbytes, what="nation"), \
            "nation dimension exceeds broadcast budget"
        nat_ref = ray.put((nk, nname))

        def attach_name(batch: pa.Table) -> pa.Table:
            k, nn = ray.get(nat_ref)
            idx = np.searchsorted(k, np.asarray(batch["c_nationkey"]))
            return batch.append_column(
                "n_name", pa.array(nn[idx], pa.string()))

        joined = joined_ck.map_batches(attach_name, batch_format="pyarrow",
                                       zero_copy_batch=True)

    out = (
        joined
        .groupby("n_name")
        .aggregate(Sum("o_totalprice", alias_name="revenue"),
                   Count(alias_name="n_orders"))
    )
    return _int_encode(_to_table(out), {"revenue": 2})


def q_revenue_by_nation(sf_dir: str):
    return revenue_by_nation_pipeline(sf_dir)


SQL_REVENUE_BY_NATION = """
SELECT n_name, CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_revenue_by_priority(sf_dir: str, *,
                          max_broadcast_bytes: int | None = None):
    """Fact-side aggregate with a byte-guarded broadcast dimension: the
    (o_orderkey -> priority code) map ships ONCE via ray.put and every
    lineitem batch reduces to <= |priorities| partial-sum rows (bincount),
    so the only exchange is ~5 rows per batch. When the dimension
    projection exceeds the broadcast budget (the 100-TB failure mode for
    a broadcast), the pipeline falls back to the partitioned hash join."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from ..stages.joins import (DEFAULT_BROADCAST_BUDGET,
                                check_broadcast_budget,
                                parquet_projected_bytes)

    if max_broadcast_bytes is None:
        max_broadcast_bytes = DEFAULT_BROADCAST_BUDGET
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])
    ord_path = os.path.join(sf_dir, "orders.parquet")
    dim_bytes = parquet_projected_bytes(
        ord_path, ["o_orderkey", "o_orderpriority"])
    if check_broadcast_budget(dim_bytes, what="orders priority dimension",
                              max_broadcast_bytes=max_broadcast_bytes):
        od = pq.read_table(ord_path,
                           columns=["o_orderkey", "o_orderpriority"])
        okey = np.asarray(od["o_orderkey"]).astype(np.int64)
        pr = od["o_orderpriority"].combine_chunks().dictionary_encode()
        codes = np.asarray(pr.indices).astype(np.int64)
        cats = pr.dictionary.to_pylist()
        order_o = np.argsort(okey)
        ncat = len(cats)
        lookup_ref = ray.put((okey[order_o], codes[order_o]))

        def revenue_partials(batch: pa.Table) -> pa.Table:
            # broadcast lookup (per-worker object cache, zero-copy numpy)
            ok, code = ray.get(lookup_ref)
            disc = np.asarray(pc.multiply(
                batch["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), batch["l_discount"])))
            k = np.asarray(batch["l_orderkey"])
            idx = np.clip(np.searchsorted(ok, k), 0, len(ok) - 1)
            hit = ok[idx] == k  # inner-join semantics
            matched = code[idx][hit]
            sums = np.bincount(matched, weights=disc[hit], minlength=ncat)
            cnts = np.bincount(matched, minlength=ncat)
            return pa.table({
                "code": pa.array(np.arange(ncat, dtype=np.int64)),
                "revenue": pa.array(sums, pa.float64()),
                "n": pa.array(cnts.astype(np.int64))})

        parts = li.map_batches(revenue_partials, batch_format="pyarrow",
                               zero_copy_batch=True)
        # partials are bounded by |priorities| per batch at ANY scale —
        # driver fold, not a sliver-granular sort shuffle
        rev = np.zeros(ncat, np.float64)
        cnt = np.zeros(ncat, np.int64)
        for b in parts.iter_batches(batch_format="pyarrow"):
            # iter_batches may concatenate several partial tables into one
            # batch, repeating codes — bincount accumulates duplicates
            # (fancy-index += would keep only one contribution per code)
            c = np.asarray(b["code"])
            rev += np.bincount(c, weights=np.asarray(b["revenue"]),
                               minlength=ncat)
            cnt += np.bincount(c, weights=np.asarray(b["n"]),
                               minlength=ncat).astype(np.int64)
        keep = cnt > 0  # GROUP BY emits only priorities with join matches
        out = pa.table({
            "o_orderpriority": pa.array(
                [cats[i] for i in range(ncat) if keep[i]], pa.string()),
            "revenue": pa.array(rev[keep]),
        })
        return _int_encode(out, {"revenue": 2})

    # dimension over budget: partitioned hash join, then the group-by
    def prep(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(batch["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "disc_price": disc})

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = li.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True).join(
        orders, join_type="inner", num_partitions=_partitions(8),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    out = joined.groupby("o_orderpriority").aggregate(
        Sum("disc_price", alias_name="revenue")
    )
    return _int_encode(_to_table(out), {"revenue": 2})


SQL_REVENUE_BY_PRIORITY = """
SELECT o_orderpriority,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
         AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_events_by_type(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    events = _read(sf_dir, "events", columns=["event_type", "value"])
    out = events.groupby("event_type").aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value")
    )
    return _int_encode(_to_table(out), {"sum_value": 2})


SQL_EVENTS_BY_TYPE = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value
FROM events GROUP BY event_type
"""


def q_events_hourly_window(sf_dir: str):
    """Tumbling event-time window: truncate ts to the hour inside
    map_batches (no shuffle) and PRE-AGGREGATE per batch — the exchange
    carries (groups x batches) partial rows, not the full event stream.
    Partials under the standard byte budget fold in one driver-side Arrow
    group_by; past it (billions of (user, hour) groups at corpus scale)
    the distributed groupby over the same partials runs instead."""
    from ray.data.aggregate import Sum

    from ..stages.similarity import _try_gather_small

    events = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # cast to us: the parquet ts unit is seconds, and the oracle's
        # date_trunc comes back timestamp[us] — a value-equal result must
        # be dtype-equal too (the driver's value hash is type-sensitive)
        hour = pc.floor_temporal(batch["ts"], unit="hour").cast(
            pa.timestamp("us"))
        t = pa.table({"user_id": batch["user_id"], "hour": hour,
                      "value": batch["value"],
                      "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["user_id", "hour"]).aggregate(
            [("value", "sum"), ("one", "sum")])
        return g  # user_id, hour, value_sum (SUM), one_sum (COUNT(*))

    parts = events.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    small = _try_gather_small(parts)
    if small is not None:
        g = small.group_by(["user_id", "hour"]).aggregate(
            [("value_sum", "sum"), ("one_sum", "sum")])
        out = pa.table({"user_id": g["user_id"], "hour": g["hour"],
                        "n_events": g["one_sum_sum"],
                        "sum_value": g["value_sum_sum"]})
        return _int_encode(out, {"sum_value": 2})
    out = parts.groupby(["user_id", "hour"]).aggregate(
        Sum("one_sum", alias_name="n_events"),
        Sum("value_sum", alias_name="sum_value"))
    tab = _to_table(out)
    # Ray's sort shuffle can revert the timestamp unit to the source's;
    # re-pin us so both branches emit the oracle's dtype
    tab = tab.set_column(tab.column_names.index("hour"), "hour",
                         tab["hour"].cast(pa.timestamp("us")))
    return _int_encode(tab, {"sum_value": 2})


SQL_EVENTS_HOURLY_WINDOW = """
SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


# ---------------------------------------------------------------------------
# training-data operators (dedup / text analysis / similarity)
# ---------------------------------------------------------------------------


def q_exact_dedup(sf_dir: str):
    from ray.data.aggregate import Count, Min

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from ..functions.hashing import stable_hash64

    def add_hash(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h = stable_hash64(text).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "_content_hash": pa.array(h)})

    out = (
        docs.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"),
                   Count(alias_name="n_copies"))
    )
    return _to_table(out).select(["doc_id", "n_copies"])


SQL_EXACT_DEDUP = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


def q_paragraph_dedup(sf_dir: str):
    """C4-style paragraph-level exact dedup (stages/dedup.paragraph_dedup):
    keep the globally-first occurrence of every distinct paragraph and
    rebuild each doc from its survivors. The synthetic docs are single-line
    word soup, so the query splits on the literal ``' the '`` to get
    genuinely repeated cross-document segments; real corpora use the
    default blank-line separator."""
    from ..stages.dedup import paragraph_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return paragraph_dedup(docs, sep=" the ",
                           num_partitions=_partitions(32),
                           doc_partitions=_partitions(32))


SQL_PARAGRAPH_DEDUP = """
WITH paras AS (
  SELECT doc_id, generate_subscripts(l, 1) AS idx, unnest(l) AS p
  FROM (SELECT doc_id, string_split(text, ' the ') AS l FROM documents)
),
winners AS (
  SELECT doc_id, idx FROM (
    SELECT doc_id, idx,
           row_number() OVER (PARTITION BY p ORDER BY doc_id, idx) AS rn
    FROM paras) WHERE rn = 1
),
kept AS (
  SELECT pa.doc_id, pa.idx, pa.p
  FROM paras pa JOIN winners w ON pa.doc_id = w.doc_id AND pa.idx = w.idx
)
SELECT d.doc_id, COALESCE(k.text, '') AS text
FROM documents d LEFT JOIN (
  SELECT doc_id, string_agg(p, ' the ' ORDER BY idx) AS text
  FROM kept GROUP BY doc_id) k USING (doc_id)
"""


def q_token_counts(sf_dir: str):
    """Whitespace token count + BPE-ish pretokenizer count (contractions /
    letter-runs / digit-runs / symbol-runs) in ONE pass over the text —
    both RE2 patterns mirrored exactly in the DuckDB twin. (Round-4 merge
    of the former token_counts / token_counts_bpe pair: one driver row now
    verifies both kernels.)"""
    from ..stages.textstats import BPEISH_PATTERN

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ws = count_tokens(batch, text_col="text")
        bpe = count_tokens(batch, text_col="text", pattern=BPEISH_PATTERN,
                           out_col="n_bpe_tokens")
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": ws["n_tokens"],
                         "n_bpe_tokens": bpe["n_bpe_tokens"]})

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _sql_token_counts() -> str:
    from ..stages.textstats import BPEISH_PATTERN

    pat = BPEISH_PATTERN.replace("'", "''")
    return ("SELECT doc_id, "
            "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens, "
            "CAST(length(regexp_extract_all(text, '" + pat + "')) AS BIGINT)"
            " AS n_bpe_tokens FROM documents")


SQL_TOKEN_COUNTS = _sql_token_counts()


class _QualityRepetitionStage:
    """Actor-pool stage for q_quality_scores: quality regexes compiled
    once per actor; repetition kernel appended per batch."""

    def __init__(self):
        self.quality = QualityScoreStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.textstats import repetition_scores

        q = self.quality(batch).select(
            ["doc_id", "n_chars_text", "n_tokens", "alpha_ratio",
             "digit_ratio", "punct_ratio", "stopword_ratio",
             "quality_score"])
        r = repetition_scores(batch).select(
            ["n_lines", "dup_line_frac", "dup_2gram_frac", "dup_3gram_frac"])
        for name in r.column_names:
            q = q.append_column(name, r[name])
        return q


def q_quality_scores(sf_dir: str):
    """Quality heuristics (length/punct/stopword ratios, Gopher-style
    score) + repetition filters (duplicate line / 2-gram / 3-gram
    fractions) in one pass per document. (Round-4 merge of the former
    quality_scores / repetition_scores pair — both kernels share the
    tokenize and one driver row verifies both.)"""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tbl = _to_table(docs.map_batches(_cached(_QualityRepetitionStage),
                                     batch_format="pyarrow",
                                     zero_copy_batch=True))
    return _round_cols(tbl, {"alpha_ratio": 6, "digit_ratio": 6,
                             "punct_ratio": 6, "stopword_ratio": 6,
                             "quality_score": 6, "dup_line_frac": 6,
                             "dup_2gram_frac": 6, "dup_3gram_frac": 6})


def _stopword_alt() -> str:
    """The exact stopword alternation QualityScoreStage compiles — shared
    with the SQL twins so both sides count the same matches."""
    from ..stages.textstats import _STOPWORDS

    words = sorted({w for ws in _STOPWORDS.values() for w in ws})
    return "|".join(words)


# pure arithmetic over regex match counts + list functions — fully
# SQL-expressible; the quality formula mirrors QualityScoreStage term by
# term and the repetition columns mirror textstats.repetition_scores
# (same nesting, both sides rounded to 6dp)
SQL_QUALITY_SCORES = """
WITH c AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS safe_chars,
         CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tok,
         GREATEST(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE), 1.0)
             AS safe_tok,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS digit,
         CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS punct,
         CAST(len(regexp_extract_all(text,
              '(?i)\\b(?:{ALT})\\b')) AS DOUBLE) AS stop,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
         regexp_extract_all(text, '\\S+') AS toks
  FROM documents),
g AS (
  SELECT *,
         [toks[i] || chr(1) || toks[i+1]
          for i in range(1, len(toks))] AS g2,
         [toks[i] || chr(1) || toks[i+1] || chr(1) || toks[i+2]
          for i in range(1, len(toks) - 1)] AS g3
  FROM c)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars_text,
       CAST(n_tok AS BIGINT) AS n_tokens,
       ROUND(alpha / safe_chars, 6) AS alpha_ratio,
       ROUND(digit / safe_chars, 6) AS digit_ratio,
       ROUND(punct / safe_chars, 6) AS punct_ratio,
       ROUND(stop / safe_tok, 6) AS stopword_ratio,
       ROUND(GREATEST(LEAST(
           (alpha / safe_chars) * 0.5
           + (LEAST(stop / safe_tok, 0.5) * 0.8
              + (0.2 - ((digit / safe_chars) * 0.3
                        + (punct / safe_chars) * 0.3))),
           1.0), 0.0), 6) AS quality_score,
       CAST(len(lines) AS BIGINT) AS n_lines,
       ROUND(CASE WHEN len(lines) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
                        / len(lines) END, 6) AS dup_line_frac,
       ROUND(CASE WHEN len(g2) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                        / len(g2) END, 6) AS dup_2gram_frac,
       ROUND(CASE WHEN len(g3) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
                        / len(g3) END, 6) AS dup_3gram_frac
FROM g
""".replace("{ALT}", _stopword_alt())


def q_top_tokens(sf_dir: str):
    """Corpus vocabulary: exact global top-50 tokens by frequency —
    per-batch value_counts partials (the combiner), token-sum groupby,
    deterministic (count desc, token asc) top-k."""
    from ..stages.textstats import token_frequencies

    docs = _read(sf_dir, "documents", columns=["text"])
    return _to_table(token_frequencies(docs, top_k=50))


SQL_TOP_TOKENS = """
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents)
GROUP BY tok ORDER BY n DESC, token ASC LIMIT 50
"""


def q_approx_top_tokens(sf_dir: str):
    """Misra-Gries heavy-hitters over the token stream — the fixed-size-
    per-batch sibling of the exact top_tokens (approximate deficient
    counts by construction -> rows-only; MG guarantee pinned in
    tests/test_sketches.py)."""
    from ..stages.sketches import approx_heavy_hitters

    docs = _read(sf_dir, "documents", columns=["text"])

    def toks(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        t = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(text.fill_null("")), r"\s+"))
        return pa.table({"token": t.filter(pc.not_equal(t, ""))})

    flat = docs.map_batches(toks, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _to_table(approx_heavy_hitters(flat, "token", k=20,
                                          capacity=512))


def q_lang_id(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return docs.map_batches(_cached(LangIdStage), batch_format="pyarrow",
                            zero_copy_batch=True).select_columns(
        ["doc_id", "lang", "lang_pred"]
    )


def _lang_id_sql() -> str:
    """SQL twin of LangIdStage: per-language stopword-hit counts, argmax
    with the same tie-break (first language in sorted order wins)."""
    from ..stages.textstats import _STOPWORDS

    langs = sorted(_STOPWORDS)
    counts = ",\n         ".join(
        f"len(regexp_extract_all(text, "
        f"'(?i)\\b(?:{'|'.join(_STOPWORDS[lang])})\\b')) AS s_{lang}"
        for lang in langs)
    branches = []
    for i, lang in enumerate(langs):
        later = langs[i + 1:]
        cond = " AND ".join(f"s_{lang} >= s_{o}" for o in later) or "TRUE"
        branches.append(f"WHEN {cond} THEN '{lang}'")
    all_cols = ", ".join(f"s_{lang}" for lang in langs)
    return f"""
WITH s AS (
  SELECT doc_id, lang,
         {counts}
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN GREATEST({all_cols}) = 0 THEN 'other'
            {' '.join(branches)}
            END AS lang_pred
FROM s
"""


SQL_LANG_ID = _lang_id_sql()


def q_fingerprints(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        out = FingerprintStage(text_col="text")(batch)
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "fingerprint64": pc.cast(
                    pc.bit_wise_and(out["fingerprint64"],
                                    pa.scalar((1 << 63) - 1, pa.uint64())),
                    pa.int64()),
                "simhash64": pc.cast(
                    pc.bit_wise_and(out["simhash64"],
                                    pa.scalar((1 << 63) - 1, pa.uint64())),
                    pa.int64()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def q_approx_distinct(sf_dir: str):
    """HyperLogLog distinct-user estimate over events (m=4096 registers;
    shuffle = m tiny rows per batch regardless of data size). Approximate
    by construction -> rows-only; accuracy pinned in tests/test_sketches.py."""
    from ..stages.sketches import approx_distinct

    events = _read(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(events, "user_id", p=12)
    return pa.table({"metric": pa.array(["approx_distinct_users"]),
                     "estimate": pa.array([est], pa.float64())})


def q_text_clean(sf_dir: str):
    """The text-cleaning chain in one pass per document: NFC normalize +
    control-strip + whitespace-collapse (``text_norm``), email/IP/phone
    redaction (``text_scrubbed``), and markup-strip of a deterministic
    HTML wrapping (``text_plain``). (Round-4 merge of the former
    normalize_text / pii_scrub / strip_markup triple — each kernel is an
    independent column, one driver row verifies all three; both engines
    are RE2 + ICU so the DuckDB twin is exact.)"""
    from ..stages.textclean import normalize_text, scrub_pii, strip_markup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        norm = normalize_text(batch)["text_norm"]
        scrub = scrub_pii(batch)["text_scrubbed"]
        raw = pc.binary_join_element_wise(
            pa.scalar('<div class="d"><p>'), batch["text"],
            pa.scalar('</p><script>var x = 1;</script>&amp;done</div>'), "")
        plain = strip_markup(
            pa.table({"doc_id": batch["doc_id"], "text": raw}))["text_plain"]
        return pa.table({"doc_id": batch["doc_id"], "text_norm": norm,
                         "text_scrubbed": scrub, "text_plain": plain})

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQL_TEXT_CLEAN = """
SELECT doc_id,
       trim(regexp_replace(
            regexp_replace(nfc_normalize(text),
                           '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
            '\s+', ' ', 'g')) AS text_norm,
       regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
           '\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g') AS text_scrubbed,
  trim(regexp_replace(
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(
      '<div class="d"><p>' || text
        || '</p><script>var x = 1;</script>&amp;done</div>',
      '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
      '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
      '(?s)<!--.*?-->', ' ', 'g'),
      '(?s)<[^>]*>', ' ', 'g'),
      '&lt;', '<', 'g'),
      '&gt;', '>', 'g'),
      '&quot;', '"', 'g'),
      '&#39;', CHR(39), 'g'),
      '&nbsp;', ' ', 'g'),
      '&amp;', '&', 'g'),
    '\\s+', ' ', 'g')) AS text_plain
FROM documents
"""


def q_chunk_text(sf_dir: str):
    """Context-window chunking (stages/textclean.chunk_text): 500-char
    windows overlapping by 50 — the pre-tokenization/RAG chunking explode,
    vectorized per chunk ordinal."""
    from ..stages.textclean import chunk_text

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(
        lambda b: chunk_text(b, size=500, overlap=50),
        batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(out)


SQL_CHUNK_TEXT = """
WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS text,
         unnest(range(GREATEST(
             CAST(CEIL(length(COALESCE(text, '')) / 450.0) AS BIGINT),
             1))) AS chunk_id
  FROM documents)
SELECT doc_id, chunk_id,
       substring(text, CAST(chunk_id * 450 + 1 AS INT), 500) AS chunk
FROM d
"""


def q_blocklist_filter(sf_dir: str):
    """Broadcast ANTI join: drop documents whose id is in a blocklist
    shipped once via ray.put (the no-shuffle WHERE key NOT IN form —
    blocklists/allowlists/decontamination id sets at corpus scale)."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.joins import broadcast_membership_filter

    base = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id"])
    ids = np.asarray(base["doc_id"])
    block = ray.put(np.sort(ids[ids % 13 == 5]))
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return broadcast_membership_filter(docs, block, "doc_id", mode="anti")


SQL_BLOCKLIST_FILTER = """
SELECT doc_id, lang FROM documents WHERE doc_id % 13 <> 5
"""


def q_corpus_pipeline(sf_dir: str):
    """FLAGSHIP training-data pipeline, end to end in ONE streaming
    composition: normalize -> quality gate (alpha ratio, token floor,
    no duplicated lines) -> exact dedup on the normalized text (min id
    wins) -> token accounting. Every stage reuses an already-oracled
    kernel, so the whole pipeline has an exact SQL twin — the composition
    is what a reference user's real cleanup flow looks like."""
    from ..stages.dedup import exact_dedup
    from ..stages.textclean import normalize_text
    from ..stages.textstats import count_tokens, repetition_scores

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        t = normalize_text(batch)            # adds text_norm
        t = repetition_scores(t)             # adds n_lines, dup_*_frac
        text = t["text"]
        alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"),
                        pa.float64())
        chars = pc.cast(pc.max_element_wise(
            pc.utf8_length(text), pa.scalar(1, pa.int32())), pa.float64())
        n_tok = pc.count_substring_regex(text, r"\S+")
        keep = pc.and_(
            pc.and_(pc.greater_equal(pc.divide(alpha, chars),
                                     pa.scalar(0.5)),
                    pc.greater_equal(n_tok, pa.scalar(5, pa.int32()))),
            pc.equal(t["dup_line_frac"], pa.scalar(0.0)),
        )
        return t.filter(keep).select(["doc_id", "text_norm"])

    filtered = docs.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True)
    deduped = exact_dedup(filtered, id_col="doc_id", text_col="text_norm")
    return deduped.map_batches(
        lambda b: count_tokens(b, text_col="text_norm")
        .select(["doc_id", "n_tokens"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_CORPUS_PIPELINE = """
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(
              regexp_replace(nfc_normalize(text),
                             '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '',
                             'g'),
              '\\s+', ' ', 'g')) AS text_norm,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
           / GREATEST(length(text), 1) AS alpha_ratio,
         len(regexp_extract_all(text, '\\S+')) AS n_tok,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
  FROM documents),
f AS (
  SELECT doc_id, text_norm FROM c
  WHERE alpha_ratio >= 0.5 AND n_tok >= 5
    AND len(list_distinct(lines)) = len(lines)),
d AS (
  SELECT MIN(doc_id) AS doc_id, text_norm FROM f GROUP BY text_norm)
SELECT doc_id,
       CAST(len(regexp_extract_all(text_norm, '\\S+')) AS BIGINT) AS n_tokens
FROM d
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag corpus docs whose distinct-token set
    overlaps the 'benchmark' slice (doc_id % 97 == 3) by >= 30%. The
    benchmark shingle set broadcasts once; per-batch overlap is fully
    vectorized. Integer counts divide identically in DuckDB -> exact
    oracle."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.dedup import ContaminationStage

    bench_tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    mask = np.asarray(bench_tbl["doc_id"]) % 97 == 3
    ref = ray.put(ContaminationStage.bench_shingles(
        bench_tbl.filter(pa.array(mask))["text"], k=1))

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(
        _cached(ContaminationStage, ref, k=1, threshold=0.3),
        batch_format="pyarrow", zero_copy_batch=True,
    ).select_columns(["doc_id", "n_shingles", "n_overlap", "overlap_frac",
                      "contaminated"])
    return _round_cols(_to_table(out), {"overlap_frac": 6})


SQL_DECONTAMINATE = """
WITH bench AS (
  SELECT list_distinct(flatten(list(regexp_extract_all(text, '\\S+'))))
         AS btoks
  FROM documents WHERE doc_id % 97 = 3),
d AS (
  SELECT doc_id, list_distinct(regexp_extract_all(text, '\\S+')) AS toks
  FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_shingles,
       CAST(len(list_intersect(toks, btoks)) AS BIGINT) AS n_overlap,
       ROUND(CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(toks, btoks)) AS DOUBLE)
                  / len(toks) END, 6) AS overlap_frac,
       (CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(toks, btoks)) AS DOUBLE)
                  / len(toks) END) >= 0.3 AS contaminated
FROM d CROSS JOIN bench
"""


def _planted_docs(sf_dir: str):
    """documents ∪ exact copies of the doc_id % 101 == 7 slice with
    NEGATIVE ids (-1 - doc_id). Negative planted ids are the LOWEST ids, so
    the deterministic lowest-ids-win bucket cap can never evict them
    (round-2 advice: high planted ids break scale-dependently)."""
    import pyarrow.parquet as pq

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    base = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    sub = base.filter(pa.array(np.asarray(base["doc_id"]) % 101 == 7))
    dup = pa.table({
        "doc_id": pc.subtract(pa.scalar(-1, pa.int64()), sub["doc_id"]),
        "text": sub["text"],
    })
    return docs.union(_rd().from_arrow(dup))


def q_minhash_dedup(sf_dir: str):
    """MinHash+LSH dedup with a DETERMINISTIC exact oracle. Exact copies of
    the doc_id % 101 == 7 slice are unioned in (negative ids, cap-proof);
    threshold 1.0 over k=1 shingles keeps exactly the pairs with IDENTICAL
    distinct-token SETS (identical sets -> identical MinHash signatures ->
    co-bucketed in every band -> candidate; verification Jaccard is 1.0
    iff the sets are equal). Connected components of that relation are the
    equal-token-set equivalence classes — SQL-stateable by grouping on the
    sorted distinct-token list. The organic corpus has such groups too
    (same-token-set docs), so this exercises discovery, not just the
    plant; approximate thresholds stay pinned in pytest
    (minhash_dedup_near).

    Banding is tuned to the threshold (standard S-curve reasoning): at
    J=1.0 ONE band of the full signature has recall 1 for identical sets,
    while many short bands would flood the candidate stream with
    partial-match pairs the verifier then rejects (measured: 16x8 banding
    produced >500k false candidates at sf0.1 vs ~36k true pairs)."""
    return minhash_dedup(_planted_docs(sf_dir), threshold=1.0, shingle_k=1,
                         num_perm=16, bands=1)


SQL_MINHASH_DEDUP = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT -1 - doc_id AS doc_id, text FROM documents WHERE doc_id % 101 = 7),
d AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(
             regexp_extract_all(text, '\\S+'))), ' ') AS tokset
  FROM all_docs),
g AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY tokset) AS cluster_id,
         COUNT(*) OVER (PARTITION BY tokset) AS cnt
  FROM d)
SELECT doc_id, cluster_id FROM g WHERE cnt >= 2
"""


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs with a DETERMINISTIC oracle: exact copies
    (negative ids) share every 16-bit band, so each planted pair is always
    co-bucketed and verifies at Hamming 0. Output is restricted to pairs
    with a + b == -1 — exactly the planted (copy, original) pairs and
    nothing else (organic pairs have a, b >= 0; a mixed pair (-1-x, y)
    sums to -1 only when y == x). Full-output behavior is pinned in
    pytest."""
    out = simhash_dedup(_planted_docs(sf_dir), max_hamming=3)
    keep = pc.equal(pc.add(out["a"], out["b"]), pa.scalar(-1, pa.int64()))
    return out.filter(keep)


SQL_SIMHASH_PAIRS = """
SELECT -1 - doc_id AS a, doc_id AS b, CAST(0 AS BIGINT) AS hamming
FROM documents WHERE doc_id % 101 = 7
"""


def q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qtbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    qtbl = qtbl.filter(pc.is_in(qtbl["vec_id"], value_set=pa.array([0, 1, 2])))
    from ..stages.similarity import _to_matrix

    out = knn_topk(emb, np.asarray(qtbl["vec_id"]), _to_matrix(qtbl["embedding"]),
                   k=5, exclude_self=True)
    return _round_cols(out, {"score": 6})


SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                CAST(q.qe AS DOUBLE[])) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id)
SELECT query_id, vec_id, ROUND(score, 6) AS score FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, vec_id ASC) <= 5
"""


def _planted_query_vec(sf_dir: str):
    """embeddings ∪ one exact copy of query vector 0 under vec_id = -1:
    an identical vector shares every LSH bucket / nearest centroid, so the
    approximate paths recover it with probability 1 — a deterministic
    top-1 regardless of probe recall."""
    import pyarrow.parquet as pq

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    base = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    q = base.filter(pc.equal(base["vec_id"], 0))
    dup = pa.table({"vec_id": pa.array([-1], pa.int64()),
                    "embedding": q["embedding"]})
    return emb.union(_rd().from_arrow(dup)), q


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed ANN with an EXACT oracle via a planted duplicate
    (see _planted_query_vec): top-1 for query 0 is the copy at cosine 1.0
    (the query itself is excluded by exclude_self). Full-k recall over
    organic queries is pinned in pytest (round-4 merge of the former
    rows-only ann_lsh + oracled ann_lsh_top1 pair)."""
    from ..stages.similarity import _to_matrix

    both, q = _planted_query_vec(sf_dir)
    out = lsh_bucket_topk(both, [0], _to_matrix(q["embedding"]), k=1,
                          n_bits=6)
    return _round_cols(out, {"score": 6})


def q_ann_ivf(sf_dir: str):
    """IVF coarse-quantizer ANN (k-means sibling of ann_lsh: sample-trained
    centroids, distributed assignment filter, exact top-k over probed
    lists) with the same planted-duplicate EXACT oracle; full-k recall in
    pytest (round-4 merge of ann_ivf + ann_ivf_top1)."""
    from ..stages.similarity import _to_matrix, ivf_topk

    both, q = _planted_query_vec(sf_dir)
    out = ivf_topk(both, [0], _to_matrix(q["embedding"]), k=1,
                   n_centroids=32, nprobe=8)
    return _round_cols(out, {"score": 6})


SQL_ANN_PLANTED_TOP1 = """
SELECT CAST(0 AS BIGINT) AS query_id, CAST(-1 AS BIGINT) AS vec_id,
       1.0 AS score
"""


def q_image_features(sf_dir: str):
    """REAL image decode paths, BOTH codecs in one query (round-4 merge of
    image_features_ppm + multimodal_features): deterministic P6 PPM images
    and PNG payloads (stdlib-zlib inflate + scanline unfilter) through the
    same actor-pool feature stage, unioned with a ``codec`` discriminator.
    Decoded ids/dimensions are deterministic, so the DuckDB twin states
    them exactly from range(); pixel/feature VALUES stay pinned in
    pytest (SQL cannot decode)."""
    from ..stages.multimodal import (ImageFeatureStage, synthesize_jpeg_media,
                                     synthesize_png_media,
                                     synthesize_ppm_media)

    rd = _rd()

    def run(tbl: pa.Table, codec: str):
        media = rd.from_arrow(tbl)
        out = media.map_batches(_cached(ImageFeatureStage),
                                batch_format="pyarrow", batch_size=64)
        return out.map_batches(
            lambda b, c=codec: b.append_column(
                "codec", pa.array([c] * b.num_rows, pa.string())),
            batch_format="pyarrow", zero_copy_batch=True)

    ppm = run(synthesize_ppm_media(512, width=32, height=24), "ppm")
    png = run(synthesize_png_media(256, width=32, height=24), "png")
    jpg = run(synthesize_jpeg_media(128, width=32, height=24), "jpeg")
    return ppm.union(png).union(jpg).select_columns(
        ["media_id", "codec", "decoded_width", "decoded_height"])


def q_audio_features_wav(sf_dir: str):
    """REAL audio decode path: deterministic PCM16 WAV payloads -> RMS /
    zero-crossing / spectral centroid + rolloff via np.fft. Feature physics
    pinned in pytest -> rows-only here."""
    from ..stages.multimodal import AudioFeatureStage, synthesize_wav_media

    rd = _rd()
    media = rd.from_arrow(synthesize_wav_media(256, seconds=0.25,
                                               sample_rate=8000))
    out = media.map_batches(_cached(AudioFeatureStage),
                            batch_format="pyarrow", batch_size=32)
    out = out.select_columns(["media_id", "sample_rate", "duration_sec"])
    return _round_cols(_to_table(out), {"duration_sec": 6})


def q_video_frames_y4m(sf_dir: str):
    """REAL video frame sampling: deterministic Y4M clips -> every-2nd luma
    frame re-encoded as PPM rows (actual pixels; pinned in pytest)."""
    from ..stages.multimodal import Y4MFrameSampleStage, synthesize_y4m_media

    rd = _rd()
    media = rd.from_arrow(synthesize_y4m_media(128, width=32, height=24,
                                               n_frames=8))
    out = media.map_batches(_cached(Y4MFrameSampleStage, every=2),
                            batch_format="pyarrow", batch_size=16)
    return out.select_columns(["media_id", "frame_idx"])


def q_reserialize_rows(sf_dir: str):
    """join_fields: columns -> separator-joined content line (the inverse
    of split_fields; ExecuteRuleEngine.java:975-992)."""
    from ..stages.records import join_fields

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def f(batch: pa.Table) -> pa.Table:
        return join_fields(batch, ["lang", "source"], separator="|",
                           output_col="content", keep_inputs=False)

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQL_RESERIALIZE_ROWS = """
SELECT doc_id, lang || '|' || source AS content FROM documents
"""


def q_extract_json_field(sf_dir: str):
    """Vectorized JSON scalar extraction from the events props column."""
    from ..stages.records import extract_json_field

    events = _read(sf_dir, "events", columns=["event_id", "props"])

    def f(batch: pa.Table) -> pa.Table:
        out = extract_json_field(batch, "props", "k", out_col="k",
                                 out_type=pa.int64())
        return out.select(["event_id", "k"])

    return events.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQL_EXTRACT_JSON_FIELD = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
"""


def q_deterministic_sample(sf_dir: str):
    from ..stages.records import deterministic_sample

    events = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    return events.map_batches(
        lambda b: deterministic_sample(b, "event_id", modulus=20, keep=1),
        batch_format="pyarrow", zero_copy_batch=True,
    )


SQL_DETERMINISTIC_SAMPLE = """
SELECT event_id, event_type, value FROM events WHERE event_id % 20 < 1
"""


def q_stratified_sample(sf_dir: str):
    """Fixed-quota per-group sampling (stages/records.stratified_sample):
    20 documents per language, selected by smallest Knuth hash of doc_id —
    the deterministic stratified data-mix sampler, exact SQL twin via
    QUALIFY ROW_NUMBER()."""
    from ..stages.records import stratified_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return _to_table(stratified_sample(docs, group_col="lang",
                                       id_col="doc_id", n=20))


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, n_chars FROM documents
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY lang
    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) <= 20
"""


def q_distinct_langs(sf_dir: str):
    from ray.data.aggregate import Count

    docs = _read(sf_dir, "documents", columns=["lang"])
    return _to_table(docs.groupby("lang").aggregate(Count(alias_name="n_docs")))


SQL_DISTINCT_LANGS = """
SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
"""


def q_quarantine_route(sf_dir: str):
    """Malformed-row quarantine routing (F5): synthesize a content line,
    corrupt a deterministic subset, route by arity."""
    from ..stages.records import add_arity_route, join_fields

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def f(batch: pa.Table) -> pa.Table:
        t = join_fields(batch, ["lang", "source"], separator=";",
                        output_col="content", keep_inputs=True)
        # corrupt rows where doc_id % 7 == 0: drop the separator
        bad = pa.array(np.asarray(batch["doc_id"]) % 7 == 0)
        content = pc.if_else(
            bad, pc.replace_substring(t["content"], ";", " "), t["content"]
        )
        t = t.set_column(t.column_names.index("content"), "content", content)
        t = add_arity_route(t, "content", ";", 2)
        return t.select(["doc_id", "route"])

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQL_QUARANTINE_ROUTE = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN 'quarantine' ELSE 'success' END AS route
FROM documents
"""


def q_ngram_jaccard(sf_dir: str):
    """Candidate-pair exact Jaccard verification: sampled doc pairs
    (doc_id, doc_id+12), partner text attached via broadcast lookup (small
    side shipped once with ray.put — no shuffle), then the vectorized
    word-shingle Jaccard kernel. k=1 so a SQL oracle mirrors it exactly;
    the MinHash/SimHash paths use the same kernel at k=3."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.dedup import pairwise_shingle_jaccard
    from ..stages.joins import broadcast_lookup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    a = docs.map_batches(
        lambda b: b.filter(pa.array(np.asarray(b["doc_id"]) % 25 == 0)),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    btbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    btbl = btbl.filter(pa.array(np.asarray(btbl["doc_id"]) % 25 == 12))
    keys = np.asarray(btbl["doc_id"]) - 12  # partner key = id_a
    order = np.argsort(keys)
    ref = ray.put((keys[order],
                   {"text_b": np.asarray(btbl["text"], dtype=object)[order],
                    "id_b": np.asarray(btbl["doc_id"])[order]}))
    paired = broadcast_lookup(a, ref, "doc_id",
                              {"text_b": "text_b", "id_b": "id_b"})

    def f(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["id_b"]))
        out = pairwise_shingle_jaccard(batch, "text", "text_b", k=1)
        out = _round_cols(out, {"jaccard": 6})
        out = out.rename_columns(
            ["id_a" if c == "doc_id" else c for c in out.column_names])
        return out.select(["id_a", "id_b", "jaccard"])

    return paired.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQL_NGRAM_JACCARD = """
WITH a AS (SELECT doc_id, list_distinct(regexp_extract_all(text, '\\S+')) AS toks
           FROM documents WHERE doc_id % 25 = 0),
     b AS (SELECT doc_id, list_distinct(regexp_extract_all(text, '\\S+')) AS toks
           FROM documents WHERE doc_id % 25 = 12)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CASE WHEN len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks)) = 0 THEN 1.0
             ELSE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / (len(a.toks) + len(b.toks)
                     - len(list_intersect(a.toks, b.toks))) END, 6) AS jaccard
FROM a JOIN b ON b.doc_id = a.doc_id + 12
"""


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (LSH bucket + exact cosine
    verify). The base table has no near-dups (max pairwise cosine ~0.51 at
    sf0.01), so the query unions in EXACT copies of the first 10 vectors
    (id -> -1 - id) — the operator must recover exactly those planted
    pairs with cosine 1.0, which a SQL oracle can state directly (exact
    copies always share an LSH home bucket, so recall is deterministic;
    perturbed near-dup recall is pinned in pytest instead)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import embedding_neardup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    base = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    sub = base.filter(pc.less(base["vec_id"], 10))
    # negative planted ids: the deterministic lowest-ids-win bucket cap can
    # never evict them, so the oracle holds at every scale factor
    dup = pa.table({
        "vec_id": pc.subtract(pa.scalar(-1, pa.int64()), sub["vec_id"]),
        "embedding": sub["embedding"],
    })
    both = emb.union(_rd().from_arrow(dup))
    out = embedding_neardup(both, threshold=0.95, n_bits=6)
    return _round_cols(out, {"cosine": 6})


SQL_EMBEDDING_NEARDUP = """
SELECT -1 - vec_id AS a, vec_id AS b, 1.0 AS cosine
FROM embeddings WHERE vec_id < 10
"""


def q_sliding_window(sf_dir: str):
    """2h windows sliding by 1h over events: each event feeds 2 windows
    (vectorized explode + one groupby)."""
    from ..stages.windows import sliding_window_agg

    events = _read(sf_dir, "events", columns=["ts", "value"])
    out = sliding_window_agg(events, ts_col="ts", value_col="value",
                             window_seconds=7200, slide_seconds=3600)
    return _int_encode(_to_table(out), {"sum_value": 2})


SQL_SLIDING_WINDOW = """
SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) - g.i) * 3600 AS window_start,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value
FROM events CROSS JOIN (SELECT unnest(range(2)) AS i) g
GROUP BY 1
"""


def q_value_quantiles(sf_dir: str):
    """Exact grouped quantiles (p50/p90/p99 of value per event_type) —
    stages/quantiles.py, numpy/quantile_cont linear interpolation."""
    from ..stages.quantiles import grouped_quantiles

    events = _read(sf_dir, "events", columns=["event_type", "value"])
    out = grouped_quantiles(events, group_col="event_type",
                            value_col="value")
    return _round_cols(_to_table(out), {"p50": 6, "p90": 6, "p99": 6})


SQL_VALUE_QUANTILES = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


def q_user_sessions(sf_dir: str):
    """Gap-based sessionization (30-min gap) -> one row per session."""
    from ..stages.windows import session_stats

    events = _read(sf_dir, "events", columns=["user_id", "ts"])
    return session_stats(events, key_col="user_id", ts_col="ts",
                         gap_seconds=1800)


SQL_USER_SESSIONS = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 1800 SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM d)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end, COUNT(*) AS n_events
FROM s GROUP BY user_id, session_idx
"""


def q_asof_prior_view(sf_dir: str):
    """Point-in-time (as-of) join: attach the value of each user's latest
    view event at-or-before every event's timestamp."""
    from ..stages.windows import asof_join

    events = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "ts", "event_type", "value"])
    left = events.map_batches(
        lambda b: b.select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow", zero_copy_batch=True)
    right = events.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "view"))
                   .select(["user_id", "ts", "value"]),
        batch_format="pyarrow", zero_copy_batch=True)
    # a week per bucket: ~1500 users x 30 days of events means hour-sized
    # buckets would make nearly every row its own (key, bucket) — the bound
    # should be chosen so a key's rows per bucket stay chunky but task-sized
    out = asof_join(left, right, on="ts", by="user_id", value_cols=["value"],
                    bucket_seconds=7 * 86400)
    return out.map_batches(
        lambda b: b.rename_columns(
            ["prior_view_value" if c == "value" else c for c in b.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_ASOF_PRIOR_VIEW = """
SELECT l.event_id, l.user_id, l.ts, r.value AS prior_view_value
FROM events l ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_join_window(sf_dir: str):
    """Validity-interval (range) join: each event joined to the covering
    per-(user, day) activity window [day+2h, day+14h) — non-overlapping by
    construction, the documented SCD-2 assumption of
    ``stages.windows.range_join``. The intervals span 12 one-hour time
    buckets, so the cross-bucket carry machinery is on the hot path."""
    from ray.data.aggregate import Count

    from ..stages.windows import range_join

    US_DAY = 86_400_000_000
    US_H = 3_600_000_000
    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    left = events

    def day_partial(batch: pa.Table) -> pa.Table:
        day = pc.multiply(pc.divide(pc.cast(batch["ts"], pa.int64()),
                                    US_DAY), US_DAY)
        t = pa.table({"user_id": batch["user_id"], "_day": day})
        return t.group_by(["user_id", "_day"]).aggregate([])

    days = events.map_batches(day_partial, batch_format="pyarrow",
                              zero_copy_batch=True).groupby(
        ["user_id", "_day"]).aggregate(Count(alias_name="_n"))

    def mk_iv(batch: pa.Table) -> pa.Table:
        day = batch["_day"]
        return pa.table({
            "user_id": batch["user_id"],
            "lo": pc.cast(pc.add(day, 2 * US_H), pa.timestamp("us")),
            "hi": pc.cast(pc.add(day, 14 * US_H), pa.timestamp("us")),
            "window_day": pc.cast(day, pa.timestamp("us")),
        })

    right = days.map_batches(mk_iv, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = range_join(left, right, on="ts", by="user_id", start_col="lo",
                     end_col="hi", value_cols=["window_day"])

    # comparison surface: epoch-us int64 with -1 for "no covering window"
    # (a nullable datetime column compares as NaT != NaT under numpy)
    def enc(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["window_day"], pa.int64()).fill_null(-1)
        return batch.drop_columns(["window_day"]).append_column(
            "window_day_us", us)

    return out.map_batches(enc, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_RANGE_JOIN_WINDOW = """
WITH iv AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
SELECT e.event_id, e.user_id, e.ts,
       COALESCE(CAST(epoch_us(iv.d) AS BIGINT), -1) AS window_day_us
FROM events e LEFT JOIN iv
  ON e.user_id = iv.user_id
 AND e.ts >= iv.d + INTERVAL 2 HOUR
 AND e.ts <  iv.d + INTERVAL 14 HOUR
"""


def q_tfidf(sf_dir: str):
    """Corpus TF-IDF (stages/textstats.tfidf): single-tokenize explode,
    token-partition df reduction, broadcast sorted-hash idf lookup."""
    from ..stages.textstats import tfidf

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = tfidf(docs)
    return _round_cols(_to_table(out), {"tfidf": 6})


SQL_TFIDF = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, df.df,
       ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
FROM tf JOIN df USING (token) CROSS JOIN n
"""


def q_inverted_index(sf_dir: str):
    """Search-index build (stages/textstats.inverted_index): per token the
    ascending comma-joined doc-id postings, capped at the 64 lowest ids
    (the deterministic skew bound a hot token needs at scale)."""
    from ..stages.textstats import inverted_index

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return _to_table(inverted_index(docs, max_postings=64))


SQL_INVERTED_INDEX = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents),
pairs AS (SELECT DISTINCT token, doc_id FROM tok),
capped AS (
  SELECT token, doc_id FROM pairs
  QUALIFY ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) <= 64)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_postings,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM capped GROUP BY token
"""


def q_unigram_logprob(sf_dir: str):
    """Corpus-LM quality score (stages/textstats.unigram_logprob): per-doc
    mean token log-probability under the corpus' own unigram distribution
    — the perplexity-filter shape for training-data quality gating.
    Int-encoded at 1e4 so Ray/DuckDB summation-order tails cannot break
    hash equality."""
    from ..stages.textstats import unigram_logprob

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = unigram_logprob(docs)
    return _int_encode(_to_table(out), {"unigram_logprob": 4})


SQL_UNIGRAM_LOGPROB = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents),
freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM freq)
SELECT k.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(ROUND((SUM(LN(CAST(f.n AS DOUBLE))) / COUNT(*) - LN(tot.t))
                  * 10000) AS BIGINT) AS unigram_logprob
FROM tok k JOIN freq f USING (token) CROSS JOIN tot
GROUP BY k.doc_id, tot.t
"""


def q_lag_lead_events(sf_dir: str):
    """Per-key ordered LAG/LEAD (stages/windows.lag_lead): each event's
    previous and next value within its user's timeline — the bounded
    (key, time-bucket) + boundary-carry composition, 1h buckets."""
    from ..stages.windows import lag_lead

    events = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "ts", "value"])
    out = lag_lead(events, key_col="user_id", order_col="ts",
                   value_cols=["value"], tiebreak_col="event_id",
                   bucket_seconds=7 * 86400)
    return _round_cols(_to_table(out), {"value_lag": 6, "value_lead": 6,
                                        "value": 6})


SQL_LAG_LEAD_EVENTS = """
SELECT event_id, user_id, ts, ROUND(value, 6) AS value,
       ROUND(LAG(value) OVER w, 6) AS value_lag,
       ROUND(LEAD(value) OVER w, 6) AS value_lead
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_running_totals(sf_dir: str):
    """Per-key running aggregates (stages/windows.running_agg): each
    event's cumulative spend and 1-based rank within its user's timeline —
    SUM() OVER + ROW_NUMBER() with the bounded (key, time-bucket) + offset
    composition, 1h buckets. Values accumulate as exact integer cents
    (FLOOR(value*100) on identical doubles matches DuckDB bit-for-bit)."""
    from ..stages.windows import running_agg

    events = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "ts", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["value"], dtype=np.float64)
        return batch.append_column(
            "value_cents", pa.array(np.floor(v * 100).astype(np.int64)))

    ds = events.map_batches(cents, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = running_agg(ds, key_col="user_id", order_col="ts",
                      value_cols=["value_cents"], tiebreak_col="event_id",
                      bucket_seconds=7 * 86400)
    return _round_cols(_to_table(out), {"value": 6})


SQL_RUNNING_TOTALS = """
SELECT event_id, user_id, ts, ROUND(value, 6) AS value, value_cents,
       CAST(SUM(value_cents) OVER w AS BIGINT) AS value_cents_cumsum,
       ROW_NUMBER() OVER w AS row_number
FROM (SELECT event_id, user_id, ts, value,
             CAST(FLOOR(value * 100) AS BIGINT) AS value_cents FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_top3_orders_per_priority(sf_dir: str):
    """topk_per_group: per-batch top-k combiner -> tiny groupby merge
    (the shuffle ships <= k rows per (group, batch))."""
    from ..stages.windows import topk_per_group

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    return topk_per_group(orders, group_col="o_orderpriority",
                          order_col="o_totalprice", k=3,
                          tiebreak_col="o_orderkey")


SQL_TOP3_ORDERS_PER_PRIORITY = """
SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
"""


_GOLDEN_ZIP = "/root/reference/nifi_test2_dev.zip"
_GOLDEN_TSV = "/root/reference/allCountries_100.txt"


def q_rule_geonames(sf_dir: str):
    """Golden rule-project end-to-end: the reference's own JaRE zip
    (``nifi_test2_dev.zip`` -> ``Group 1.xml``) over its own GeoNames
    sample, through read_delimited_text -> RuleEngineStage
    (ExecuteRuleEngine.java:330-336; ExecuteRuleEngine_Example.xml flow).
    ``sf_dir`` is unused — the inputs ARE the golden artifacts."""
    from ..sources.ruleproject import GEONAMES_FIELDS, load_rule_project
    from ..sources.text import read_delimited_text
    from ..stages.rules import RuleEngineStage

    spec = load_rule_project(_GOLDEN_ZIP)
    ds = read_delimited_text(_GOLDEN_TSV, separator="\t",
                             field_names=GEONAMES_FIELDS)
    out = ds.map_batches(RuleEngineStage(spec, as_of="2017-03-01"),
                         batch_format="pyarrow")
    return _to_table(out).select(["geonameid", "feature_code", "route"])


SQL_RULE_GEONAMES = """
SELECT column00 AS geonameid, column07 AS feature_code,
       CASE WHEN column07 IN ('GRVC', 'GRVO', 'GRVP', 'GRVPN')
            THEN 'success' ELSE 'failed' END AS route
FROM read_csv('/root/reference/allCountries_100.txt', delim='\t',
              header=false, all_varchar=true, quote='')
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP (stages/olap.rollup_agg): lineitem quantity at
    (returnflag, linestatus), (returnflag), and grand-total levels with the
    standard GROUPING() bitmask — one corpus shuffle at the finest level,
    coarser levels folded from the materialized fine aggregate."""
    from ..stages.olap import rollup_agg

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])
    out = rollup_agg(li, group_cols=["l_returnflag", "l_linestatus"],
                     value_col="l_quantity")
    return _int_encode(_to_table(out), {"sum_l_quantity": 2})


SQL_ROLLUP_LINEITEM = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS sum_l_quantity,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grouping_id
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_pivot_orders(sf_dir: str):
    """Crosstab (stages/olap.pivot_agg): total order value per priority,
    one column per order status — the per-batch combiner ships the
    crosstab shape through the single shuffle, never the raw orders."""
    from ..stages.olap import pivot_agg

    orders = _read(sf_dir, "orders",
                   columns=["o_orderpriority", "o_orderstatus",
                            "o_totalprice"])
    out = pivot_agg(orders, row_col="o_orderpriority",
                    pivot_col="o_orderstatus", value_col="o_totalprice",
                    pivot_values=["O", "F", "P"])
    return _int_encode(_to_table(out), {"sum_o_totalprice_O": 2,
                                        "sum_o_totalprice_F": 2,
                                        "sum_o_totalprice_P": 2})


SQL_PIVOT_ORDERS = """
SELECT o_orderpriority,
       CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice
                           ELSE 0 END) * 100) AS BIGINT)
           AS sum_o_totalprice_O,
       CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
                           ELSE 0 END) * 100) AS BIGINT)
           AS sum_o_totalprice_F,
       CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice
                           ELSE 0 END) * 100) AS BIGINT)
           AS sum_o_totalprice_P
FROM orders GROUP BY o_orderpriority
"""


SQL_IMAGE_FEATURES = """
SELECT media_id, codec,
       CAST(32 AS BIGINT) AS decoded_width, CAST(24 AS BIGINT) AS decoded_height
FROM (SELECT UNNEST(range(512)) AS media_id, 'ppm' AS codec
      UNION ALL SELECT UNNEST(range(256)), 'png'
      UNION ALL SELECT UNNEST(range(128)), 'jpeg')
"""

SQL_AUDIO_FEATURES = """
SELECT UNNEST(range(256)) AS media_id, CAST(8000 AS BIGINT) AS sample_rate,
       0.25 AS duration_sec
"""

SQL_VIDEO_FRAMES = """
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx
FROM (SELECT UNNEST(range(128)) AS media_id)
CROSS JOIN (SELECT UNNEST([0, 2, 4, 6]) AS frame_idx)
"""


# ORDER MATTERS (round-3 verdict task #3): the driver's CORRECTNESS file
# records only the first ~50 entries, so queries that have never had a
# driver-verified row — plus entries whose output changed this round —
# come FIRST; the long-stable reference-parity core follows; the tail
# (all previously driver-verified, or no_oracle with pytest pins) may
# fall outside the window. scripts/driver_check.py covers the full
# surface regardless and its output is committed per round.
QUERIES = {
    # -- NEW in round 5 ----------------------------------------------------
    "render_evaluate": q_render_evaluate,
    # -- changed in round 5 (oracle cast / kernel / fast path / pool) -----
    "running_totals": q_running_totals,
    "simhash_pairs": q_simhash_pairs,
    "fingerprints": q_fingerprints,
    "approx_distinct_users": q_approx_distinct,
    "approx_top_tokens": q_approx_top_tokens,
    "revenue_by_priority": q_revenue_by_priority,
    "video_frames_y4m": q_video_frames_y4m,
    "value_quantiles": q_value_quantiles,
    # -- outside the driver's 50-entry window in round 4 ------------------
    "chunk_text": q_chunk_text,
    "blocklist_filter": q_blocklist_filter,
    "corpus_pipeline": q_corpus_pipeline,
    "decontaminate": q_decontaminate,
    "minhash_dedup": q_minhash_dedup,
    "ann_topk": q_ann_topk,
    "audio_features_wav": q_audio_features_wav,
    "reserialize_rows": q_reserialize_rows,
    # -- pool/partition call sites touched in round 5 (same outputs) ------
    "quality_scores": q_quality_scores,
    "lang_id": q_lang_id,
    "rule_route": q_rule_route,
    "revenue_by_nation": q_revenue_by_nation,
    "image_features": q_image_features,
    "paragraph_dedup": q_paragraph_dedup,
    "embedding_neardup": q_embedding_neardup,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "exact_dedup": q_exact_dedup,
    # -- reference-parity core (driver-verified every round) -------------
    "split_fields": q_split_fields,
    "render_template": q_render_template,
    "render_foreach": q_render_foreach,
    "render_macro": q_render_macro,
    "render_define_stop": q_render_define_stop,
    "rule_detailed": q_rule_detailed,
    "rule_geonames": q_rule_geonames,
    "stage_provenance": q_stage_provenance,
    "generate_rows": q_generate_rows,
    "cdc_events_latest": q_cdc_events_latest,
    "cdc_incremental_agg": q_cdc_incremental_agg,
    "latest_event_per_user": q_latest_event_per_user,
    "cdc_documents_snapshot": q_cdc_documents_snapshot,
    "q1_pricing_summary": q_q1_pricing_summary,
    "top10_orders": q_top10_orders,
    "events_by_type": q_events_by_type,
    "events_hourly_window": q_events_hourly_window,
    "top_tokens": q_top_tokens,
    "token_counts": q_token_counts,
    "text_clean": q_text_clean,
    "rollup_lineitem": q_rollup_lineitem,
    "pivot_orders": q_pivot_orders,
    "top3_orders_per_priority": q_top3_orders_per_priority,
    # -- tail: r4 driver-green and untouched this round -------------------
    "extract_json_field": q_extract_json_field,
    "deterministic_sample": q_deterministic_sample,
    "stratified_sample": q_stratified_sample,
    "distinct_langs": q_distinct_langs,
    "quarantine_route": q_quarantine_route,
    "ngram_jaccard": q_ngram_jaccard,
    "sliding_window": q_sliding_window,
    "user_sessions": q_user_sessions,
    "asof_prior_view": q_asof_prior_view,
    "range_join_window": q_range_join_window,
    "lag_lead_events": q_lag_lead_events,
    "tfidf": q_tfidf,
    "unigram_logprob": q_unigram_logprob,
    "inverted_index": q_inverted_index,
}

ORACLE_SQL = {
    "extract_json_field": SQL_EXTRACT_JSON_FIELD,
    "deterministic_sample": SQL_DETERMINISTIC_SAMPLE,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "distinct_langs": SQL_DISTINCT_LANGS,
    "quarantine_route": SQL_QUARANTINE_ROUTE,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "sliding_window": SQL_SLIDING_WINDOW,
    "value_quantiles": SQL_VALUE_QUANTILES,
    "user_sessions": SQL_USER_SESSIONS,
    "asof_prior_view": SQL_ASOF_PRIOR_VIEW,
    "range_join_window": SQL_RANGE_JOIN_WINDOW,
    "lag_lead_events": SQL_LAG_LEAD_EVENTS,
    "running_totals": SQL_RUNNING_TOTALS,
    "tfidf": SQL_TFIDF,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "inverted_index": SQL_INVERTED_INDEX,
    "rollup_lineitem": SQL_ROLLUP_LINEITEM,
    "pivot_orders": SQL_PIVOT_ORDERS,
    "top3_orders_per_priority": SQL_TOP3_ORDERS_PER_PRIORITY,
    "render_define_stop": SQL_RENDER_DEFINE_STOP,
    "render_evaluate": SQL_RENDER_EVALUATE,
    "token_counts": SQL_TOKEN_COUNTS,
    "quality_scores": SQL_QUALITY_SCORES,
    "text_clean": SQL_TEXT_CLEAN,
    # the planted-duplicate construction makes the approximate ANN paths
    # exactly oracle-able at rank 1 (full-k recall is pytest-pinned)
    "ann_lsh": SQL_ANN_PLANTED_TOP1,
    "ann_ivf": SQL_ANN_PLANTED_TOP1,
    "split_fields": SQL_SPLIT_FIELDS,
    "render_template": SQL_RENDER_TEMPLATE,
    "render_foreach": SQL_RENDER_FOREACH,
    "render_macro": SQL_RENDER_MACRO,
    "rule_route": SQL_RULE_ROUTE,
    "rule_detailed": SQL_RULE_DETAILED,
    "rule_geonames": SQL_RULE_GEONAMES,
    "stage_provenance": SQL_STAGE_PROVENANCE,
    "cdc_events_latest": SQL_CDC_EVENTS_LATEST,
    "cdc_incremental_agg": SQL_CDC_INCREMENTAL_AGG,
    "latest_event_per_user": SQL_LATEST_EVENT_PER_USER,
    "cdc_documents_snapshot": SQL_CDC_DOCUMENTS_SNAPSHOT,
    "q1_pricing_summary": SQL_Q1,
    "top10_orders": SQL_TOP10_ORDERS,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "revenue_by_priority": SQL_REVENUE_BY_PRIORITY,
    "events_by_type": SQL_EVENTS_BY_TYPE,
    "events_hourly_window": SQL_EVENTS_HOURLY_WINDOW,
    "exact_dedup": SQL_EXACT_DEDUP,
    "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
    "top_tokens": SQL_TOP_TOKENS,
    "lang_id": SQL_LANG_ID,
    "chunk_text": SQL_CHUNK_TEXT,
    "blocklist_filter": SQL_BLOCKLIST_FILTER,
    "corpus_pipeline": SQL_CORPUS_PIPELINE,
    "decontaminate": SQL_DECONTAMINATE,
    "minhash_dedup": SQL_MINHASH_DEDUP,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "ann_topk": SQL_ANN_TOPK,
    "reserialize_rows": SQL_RESERIALIZE_ROWS,
    # the media decode paths have deterministic SHAPE outputs (ids,
    # decoded dimensions, sample rate, frame indices) — stated exactly in
    # SQL from range(); pixel/audio VALUES are what SQL cannot compute and
    # stay pinned in pytest
    "image_features": SQL_IMAGE_FEATURES,
    "audio_features_wav": SQL_AUDIO_FEATURES,
    "video_frames_y4m": SQL_VIDEO_FRAMES,
    # rows-only (non-SQL-expressible): generate_rows (seeded numpy,
    # pinned-hash pytest instead), fingerprints (SipHash),
    # approx_top_tokens / approx_distinct_users (sketch estimates,
    # error-bound pytest)
}
