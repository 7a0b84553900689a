"""render_template — the MergeTemplate (O2) analog.

Reference behavior (MergeTemplate.java:216-292): FlowFile attributes whose
keys match a regex filter (default ``.*``, MergeTemplate.java:129,149-155)
are substituted into a Velocity template's ``$name`` / ``${name}``
placeholders (template loaded once in @OnScheduled, ``:167-191``); the
rendered text replaces the content; both ``merged`` and a cloned
``original`` are emitted. Line separators inside attribute values are
removed before substitution (``:253``).

Ray-Data-first re-expression: the template is parsed ONCE (per actor, in
``__init__``) into literal/field segments, and each batch renders with a
single ``pyarrow.compute.binary_join_element_wise`` call — fully vectorized,
no per-row Python. The ``original`` edge needs no clone: the upstream
Dataset is immutable and can simply be consumed again.

Unresolvable placeholders render as the empty string (the reference routes a
template failure to empty content, MergeTemplate.java:267-272; per-row we
degrade to "" instead of failing the batch). Columns whose name does not
match ``attribute_filter`` are invisible to the template.

Velocity directives (MergeTemplate merges full Velocity,
MergeTemplate.java:57-59,261): the vectorizable subset is supported —
``#if(cond) ... #elseif(cond) ... #else ... #end`` (conditions: ``$ref``,
``!$ref``, ``$ref OP literal-or-$ref`` with OP in ``== != > >= < <=``),
``#set($var = "literal" | number | $ref)``, and
``#foreach($item in $listref | [a..b]) body #end`` — loops render as one
vectorized EXPLODE (flatten the list column, gather scalar fields per
element) / RENDER (the same machinery over the exploded batch — nesting
works) / FOLD (``pc.binary_join`` per row), with ``$foreach.index`` /
``$foreach.count`` / ``$velocityCount`` available. Still no per-row
Python anywhere.

``#macro(name $p1 $p2) body #end`` is supported by COMPILE-TIME expansion
(Velocity macros are call-by-name): each ``#name(args)`` call splices the
body with ``$ref`` arguments substituted textually and literal/number
arguments bound through generated ``#set`` variables, so the rendered
pipeline stays fully vectorized. Macros may call other macros; runaway
recursion is capped and raises. ``#include("f")`` splices the file's text
VERBATIM as a literal (Velocity does not parse included files) and
``#parse("f")`` splices the file compiled as a template (static-file
semantics — the reference resolves the name per merge, but with a constant
argument the results are identical); both require ``template_root`` and
cap nesting depth against include cycles.

``#define($ref) body #end`` binds UNRENDERED template to a reference
(late evaluation, per Velocity): the body is kept as compiled nodes and
evaluates at each ``$ref`` render site with the variables in scope THERE.
``#stop`` halts rendering of the remainder of the template and ``#break``
exits the innermost ``#foreach`` — both are per-ROW when reached under an
``#if`` (the engine renders every branch vectorized and keeps a per-row
halt mask: output before the directive is kept, output after it renders
as ""), which matches Velocity's semantics row-by-row. ``#break`` outside
a loop is a compile-time error (as in Velocity).

``#evaluate($ref)`` (render a RUNTIME string as a template) executes by
DISTINCT template value: the dynamic strings dictionary-encode per batch,
each distinct template compiles once (actor-level LRU cache) and renders
vectorized over exactly its rows — the compile-once model survives
because real dynamic templates are few (per-tenant/per-type); a batch of
per-row-UNIQUE templates trips a loud cap instead of degrading silently.
A literal argument ``#evaluate("...")`` compiles statically at
template-compile time. A ``#``+word that is NOT a Velocity
directive name ('Issue #123') is literal text, as in Velocity proper.
Deviations: ``#set`` inside an ``#if``/``#foreach`` body is branch-local
(bodies evaluate vectorized for every row, so a conditional global
assignment has no single per-row value); ``#foreach`` iterates list-typed
columns or integer ranges (NiFi attributes are strings; the Arrow
engine's list columns are the collection analog); ``#stop``/``#break``
inside a ``#define`` body halt only that body's render.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# $name or ${name} — Velocity-style references (identifier chars only)
_PLACEHOLDER = re.compile(r"\$(?:\{([A-Za-z_][\w.-]*)\}|([A-Za-z_][\w]*))")
_DIRECTIVE = re.compile(r"#(\w+)")
_SUPPORTED_DIRECTIVES = {"if", "elseif", "else", "end", "set", "foreach",
                         "macro", "include", "parse", "define", "stop",
                         "break", "evaluate"}
# The actual Velocity directive vocabulary: only these names are directives.
# Any other '#'+word text ('Issue #123', 'page#section') is literal — the
# reference (full Velocity) renders unknown directive-like text literally,
# so raising on it would reject valid templates. #evaluate (compile a
# RUNTIME string as a template) executes by DISTINCT template value: each
# batch dictionary-encodes the dynamic strings, compiles each distinct
# template once (LRU-cached on the actor), and renders it vectorized over
# just its rows — per-row compilation only ever happens for per-row-unique
# templates, exactly the cost full Velocity pays for every row.
_VELOCITY_DIRECTIVES = _SUPPORTED_DIRECTIVES
_COND = re.compile(
    r"^\s*(!)?\s*\$\{?([A-Za-z_][\w.-]*)\}?\s*"
    r"(?:(==|!=|>=|<=|>|<)\s*(.+?))?\s*$")
_SET = re.compile(r"^\s*\$\{?([A-Za-z_][\w.-]*)\}?\s*=\s*(.+?)\s*$")
_FOREACH = re.compile(r"^\s*\$\{?([A-Za-z_][\w.-]*)\}?\s+in\s+(.+?)\s*$")
_RANGE = re.compile(r"^\s*\[\s*(-?\d+)\s*\.\.\s*(-?\d+)\s*\]\s*$")
# macro-call / #macro-header argument tokens: quoted string, $ref, or bare
_MACRO_ARG = re.compile(r'"[^"]*"|\'[^\']*\'|\$\{?[A-Za-z_][\w.-]*\}?'
                        r"|[^\s,()]+")
_QUOTED_FILE = re.compile(r'"([^"]*)"|\'([^\']*)\'')
_MACRO_EXPANSION_CAP = 500  # total call expansions before declaring runaway
_PARSE_DEPTH_CAP = 16  # #parse/#include nesting bound (cycle guard)


def parse_template(template: str) -> list[tuple[str, str]]:
    """-> [('lit', text) | ('field', name), ...] (no directives)."""
    out: list[tuple[str, str]] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            out.append(("lit", template[pos : m.start()]))
        out.append(("field", m.group(1) or m.group(2)))
        pos = m.end()
    if pos < len(template):
        out.append(("lit", template[pos:]))
    return out


def _paren_arg(template: str, start: int) -> tuple[str, int]:
    """Extract '(...)' starting at ``start`` -> (inner text, end index)."""
    if start >= len(template) or template[start] != "(":
        raise ValueError("Velocity directive missing '(' argument")
    depth, i = 0, start
    while i < len(template):
        if template[i] == "(":
            depth += 1
        elif template[i] == ")":
            depth -= 1
            if depth == 0:
                return template[start + 1 : i], i + 1
        i += 1
    raise ValueError("unbalanced parentheses in Velocity directive")


def _find_block_end(template: str, body_start: int) -> int:
    """Index of the ``#end`` match closing the block whose body starts at
    ``body_start`` (nested #if/#foreach/#macro/#define blocks counted)."""
    depth = 1
    for m in _DIRECTIVE.finditer(template, body_start):
        name = m.group(1)
        if name in ("if", "foreach", "macro", "define"):
            depth += 1
        elif name == "end":
            depth -= 1
            if depth == 0:
                return m.start()
    raise ValueError("block directive without matching #end")


def _extract_macros(template: str) -> tuple[str, dict]:
    """Strip every ``#macro(name $p...) body #end`` definition out of the
    template text -> (stripped template, {name: (params, body)})."""
    macros: dict[str, tuple[list[str], str]] = {}
    while True:
        m = re.search(r"#macro\b", template)
        if not m:
            return template, macros
        header, body_start = _paren_arg(template, m.end())
        parts = _MACRO_ARG.findall(header)
        if not parts:
            raise ValueError("#macro needs a name: #macro(name $p1 ...)")
        name, params = parts[0], []
        for p in parts[1:]:
            pm = _PLACEHOLDER.fullmatch(p)
            if not pm:
                raise ValueError(
                    f"#macro({name}) parameter {p!r} is not a $reference")
            params.append(pm.group(1) or pm.group(2))
        end = _find_block_end(template, body_start)
        macros[name] = (params, template[body_start:end])
        # drop the definition and its trailing '#end' (4 chars)
        template = template[: m.start()] + template[end + 4 :]


def _expand_macros(template: str, macros: dict) -> str:
    """Inline every ``#name(args)`` call (Velocity macros are call-by-name:
    $ref arguments substitute textually; literal/number arguments bind via
    generated #set variables so they behave identically in text, condition,
    and #set positions). Macros may call macros; runaway recursion raises."""
    if not macros:
        return template
    call_re = re.compile(
        r"#(" + "|".join(re.escape(n) for n in macros) + r")(?=\()")
    counter = 0
    for _ in range(_MACRO_EXPANSION_CAP):
        m = call_re.search(template)
        if m is None:
            return template
        arg_text, end = _paren_arg(template, m.end())
        args = _MACRO_ARG.findall(arg_text)
        params, body = macros[m.group(1)]
        if len(args) != len(params):
            raise ValueError(
                f"#{m.group(1)} expects {len(params)} argument(s), "
                f"got {len(args)}: {arg_text!r}")
        prefix: list[str] = []
        for p, a in zip(params, args):
            if _PLACEHOLDER.fullmatch(a):
                repl = a  # $ref argument: substitute by name
            else:
                counter += 1
                var = f"__macro{counter}_{p}"
                prefix.append(f"#set(${{{var}}} = {a})")
                repl = "${" + var + "}"
            body = re.sub(
                r"\$\{" + re.escape(p) + r"\}|\$" + re.escape(p) + r"(?!\w)",
                lambda _m, _r=repl: _r, body)
        template = (template[: m.start()] + "".join(prefix) + body
                    + template[end:])
    raise ValueError(
        f"macro expansion exceeded {_MACRO_EXPANSION_CAP} calls — "
        "recursive #macro?")


def _tokenize(template: str, template_root: str | None,
              depth: int) -> list[tuple]:
    """Template text -> flat token stream of text pieces + directive marks.
    Handles the compile-time directives here: #macro (extracted + expanded),
    #include (file spliced verbatim as a literal), #parse (file tokenized
    recursively)."""
    if depth > _PARSE_DEPTH_CAP:
        raise ValueError(
            f"#parse/#include nesting exceeds {_PARSE_DEPTH_CAP} — "
            "include cycle?")
    template, macros = _extract_macros(template)
    template = _expand_macros(template, macros)
    tokens: list[tuple] = []
    pos = 0
    for m in _DIRECTIVE.finditer(template):
        if m.start() < pos:
            continue  # inside an already-consumed '(...)' argument
        name = m.group(1)
        if name not in _VELOCITY_DIRECTIVES:
            continue  # '#123' / '#section': literal text, not a directive
        if name not in _SUPPORTED_DIRECTIVES:
            raise ValueError(
                f"unsupported Velocity directive #{name} — supported subset: "
                f"{sorted('#' + d for d in _SUPPORTED_DIRECTIVES)}")
        if m.start() > pos:
            tokens.extend(parse_template(template[pos : m.start()]))
        if name in ("include", "parse"):
            arg, end = _paren_arg(template, m.end())
            files = [a or b for a, b in _QUOTED_FILE.findall(arg)]
            if not files:
                raise ValueError(
                    f"#{name} needs quoted file name(s): #{name}(\"f\")")
            if template_root is None:
                raise ValueError(
                    f"#{name} requires template_root= (the directory "
                    "templates resolve against)")
            for fname in files:
                with open(os.path.join(template_root, fname),
                          encoding="utf-8") as fh:
                    text = fh.read()
                if name == "include":
                    tokens.append(("lit", text))  # verbatim, never parsed
                else:
                    tokens.extend(_tokenize(text, template_root, depth + 1))
            pos = end
        elif name in ("if", "elseif", "set", "foreach", "define",
                      "evaluate"):
            arg, end = _paren_arg(template, m.end())
            if name == "evaluate":
                qm = _QUOTED_FILE.fullmatch(arg.strip())
                if qm:
                    # literal-string argument: the template is known at
                    # compile time — splice it in compiled (static) form
                    tokens.extend(_tokenize(qm.group(1) or qm.group(2) or "",
                                            template_root, depth + 1))
                    pos = end
                    continue
            tokens.append(("#" + name, arg))
            pos = end
        else:
            tokens.append(("#" + name, None))
            pos = m.end()
    if pos < len(template):
        tokens.extend(parse_template(template[pos:]))
    return tokens


def compile_template(template: str, *,
                     template_root: str | None = None) -> list[tuple]:
    """Template -> AST of ('lit', s) / ('field', name) /
    ('set', var, rhs) / ('if', [(cond, body), ...], else_body) /
    ('foreach', var, src, body) nodes. #macro/#include/#parse resolve at
    compile time (see module docstring); raises on any unsupported
    directive."""
    tokens = _tokenize(template, template_root, 0)

    def build(i: int, until: set[str],
              loop_depth: int) -> tuple[list[tuple], int, str | None]:
        nodes: list[tuple] = []
        while i < len(tokens):
            kind = tokens[i][0]
            if kind in until:
                return nodes, i + 1, kind
            if kind == "#if":
                branches = [(tokens[i][1], None)]
                body, i, stop = build(i + 1, {"#elseif", "#else", "#end"},
                                      loop_depth)
                branches[0] = (branches[0][0], body)
                else_body: list[tuple] = []
                while stop == "#elseif":
                    cond = tokens[i - 1][1]
                    body, i, stop = build(i, {"#elseif", "#else", "#end"},
                                          loop_depth)
                    branches.append((cond, body))
                if stop == "#else":
                    else_body, i, stop = build(i, {"#end"}, loop_depth)
                if stop != "#end":
                    raise ValueError("#if without matching #end")
                nodes.append(("if", branches, else_body))
            elif kind == "#set":
                m2 = _SET.match(tokens[i][1])
                if not m2:
                    raise ValueError(f"unsupported #set form: {tokens[i][1]!r}")
                nodes.append(("set", m2.group(1), m2.group(2)))
                i += 1
            elif kind == "#foreach":
                m2 = _FOREACH.match(tokens[i][1])
                if not m2:
                    raise ValueError(
                        f"unsupported #foreach form: {tokens[i][1]!r} "
                        "(expected '$item in $listref' or '$i in [a..b]')")
                body, i, stop = build(i + 1, {"#end"}, loop_depth + 1)
                if stop != "#end":
                    raise ValueError("#foreach without matching #end")
                nodes.append(("foreach", m2.group(1), m2.group(2).strip(),
                              body))
            elif kind == "#define":
                m2 = _PLACEHOLDER.fullmatch(tokens[i][1].strip())
                if not m2:
                    raise ValueError(
                        f"#define needs a single $reference argument, got "
                        f"{tokens[i][1]!r}")
                # a #define body is a fresh template context: late-bound
                # render sites are never inside this lexical loop
                body, i, stop = build(i + 1, {"#end"}, 0)
                if stop != "#end":
                    raise ValueError("#define without matching #end")
                nodes.append(("define", m2.group(1) or m2.group(2), body))
            elif kind == "#evaluate":
                m2 = _PLACEHOLDER.fullmatch(tokens[i][1].strip())
                if not m2:
                    raise ValueError(
                        "#evaluate needs a single $reference (or a quoted "
                        f"literal) argument, got {tokens[i][1]!r}")
                nodes.append(("evaluate", m2.group(1) or m2.group(2)))
                i += 1
            elif kind == "#stop":
                nodes.append(("stop",))
                i += 1
            elif kind == "#break":
                if loop_depth == 0:
                    raise ValueError(
                        "#break outside a #foreach loop (Velocity only "
                        "allows #break inside iteration)")
                nodes.append(("break",))
                i += 1
            elif kind in ("#elseif", "#else", "#end"):
                raise ValueError(f"{kind} without matching #if")
            else:
                nodes.append(tokens[i])
                i += 1
        return nodes, i, None

    nodes, i, stop = build(0, set(), 0)
    return nodes


class RenderTemplateStage:
    """``ds.map_batches(RenderTemplateStage(template), batch_format="pyarrow",
    concurrency=N)`` — template compiled once per actor."""

    def __init__(
        self,
        template: str,
        *,
        attribute_filter: str = ".*",
        output_col: str = "content",
        strip_newlines: bool = True,
        keep_input_cols: bool = True,
        template_root: str | None = None,
    ):
        self.segments = compile_template(template,
                                         template_root=template_root)
        self.template_root = template_root  # #evaluate'd text may #parse
        self.filter = re.compile(attribute_filter)
        self.output_col = output_col
        self.strip_newlines = strip_newlines
        self.keep_input_cols = keep_input_cols

    # -- per-batch evaluation helpers (all vectorized) ----------------------

    def _resolve(self, name: str, batch: pa.Table, visible: set,
                 vars: dict, *, raw: bool = False):
        """Field/variable -> Arrow array (string-cast unless raw)."""
        if name in vars:
            col = vars[name]
            if isinstance(col, tuple) and col and col[0] == "__vtl_define__":
                # #define'd reference: late evaluation — render the stored
                # body HERE, with the variables in scope at this site
                return self._render_define(name, col[1], batch, visible,
                                           vars)
        elif name in visible:
            col = batch[name]
        else:
            return None
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if raw:
            return col
        if not (pa.types.is_string(col.type)
                or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())
        if self.strip_newlines:
            col = pc.replace_substring(col, "\r", "")
            col = pc.replace_substring(col, "\n", "")
        return col.fill_null("")

    def _rhs_value(self, rhs: str, batch: pa.Table, visible: set, vars: dict,
                   n: int):
        """#set / condition right-hand side -> Arrow array or scalar."""
        rhs = rhs.strip()
        if (len(rhs) >= 2 and rhs[0] == rhs[-1] and rhs[0] in "\"'"):
            return pa.scalar(rhs[1:-1], pa.string())
        m = _PLACEHOLDER.fullmatch(rhs)
        if m:
            col = self._resolve(m.group(1) or m.group(2), batch, visible,
                                vars, raw=True)
            return col if col is not None else pa.nulls(n, pa.string())
        try:
            return pa.scalar(float(rhs), pa.float64())
        except ValueError:
            raise ValueError(f"unsupported Velocity expression: {rhs!r}")

    def _eval_cond(self, cond: str, batch: pa.Table, visible: set,
                   vars: dict, n: int) -> np.ndarray:
        m = _COND.match(cond)
        if not m:
            raise ValueError(f"unsupported Velocity condition: {cond!r}")
        negate, name, op, rhs = m.groups()
        col = self._resolve(name, batch, visible, vars, raw=True)
        if col is None:
            mask = np.zeros(n, dtype=bool)  # unknown ref -> false
        elif op is None:
            # Velocity truth: non-null is true; a boolean is its value
            if pa.types.is_boolean(col.type):
                mask = np.asarray(col.fill_null(False))
            else:
                mask = np.asarray(pc.is_valid(col))
        else:
            rv = self._rhs_value(rhs, batch, visible, vars, n)
            is_num = (isinstance(rv, pa.Scalar)
                      and pa.types.is_floating(rv.type)) or (
                not isinstance(rv, pa.Scalar)
                and (pa.types.is_integer(rv.type)
                     or pa.types.is_floating(rv.type)))
            lhs = col
            if is_num and not (pa.types.is_integer(lhs.type)
                               or pa.types.is_floating(lhs.type)):
                lhs = pc.cast(lhs, pa.float64(), safe=False)
            kern = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
                    ">=": pc.greater_equal, "<": pc.less,
                    "<=": pc.less_equal}[op]
            res = kern(lhs, rv)
            if isinstance(res, pa.ChunkedArray):
                res = res.combine_chunks()
            mask = np.asarray(res.fill_null(False))
        return ~mask if negate else mask

    def _render_define(self, name: str, body: list, batch: pa.Table,
                       visible: set, vars: dict) -> pa.Array:
        """Render a ``#define`` body at a reference site: fresh halt state
        (a #stop inside the body halts only the body), current variables.
        A define rendering itself (directly or mutually) is capped."""
        self._define_depth = getattr(self, "_define_depth", 0) + 1
        try:
            if self._define_depth > 32:
                raise ValueError(
                    f"#define render recursion exceeds 32 — does ${name} "
                    "reference itself?")
            n = batch.num_rows
            state = {"stop": np.zeros(n, dtype=bool),
                     "break": np.zeros(n, dtype=bool)}
            return self._render_nodes(body, batch, visible, dict(vars), n,
                                      np.ones(n, dtype=bool), state)
        finally:
            self._define_depth -= 1

    #: distinct dynamic templates allowed per batch before #evaluate raises
    #: (a safety valve against per-row-unique templates, which would pay a
    #: compile per row — full Velocity's cost, but loud here)
    MAX_EVAL_TEMPLATES = 4096
    #: compiled-template LRU capacity per actor
    _EVAL_CACHE_MAX = 1024

    def _render_evaluate(self, name: str, batch: pa.Table, visible: set,
                         vars: dict, n: int) -> pa.Array:
        """``#evaluate($ref)``: render each row's RUNTIME string as a
        template. Vectorized by DISTINCT template value — dictionary-encode
        the strings, compile each distinct template once (actor-level LRU),
        render it over just its rows, scatter back. Like a ``#define``
        body, the evaluated template runs with a fresh halt state (a
        ``#stop`` inside halts only the evaluated text — documented
        deviation, same family as the branch-local ``#set``)."""
        self._eval_depth = getattr(self, "_eval_depth", 0) + 1
        try:
            if self._eval_depth > 8:
                raise ValueError(
                    "#evaluate nesting exceeds 8 — does the evaluated "
                    "template evaluate itself?")
            col = self._resolve(name, batch, visible, vars, raw=True)
            if col is None:
                return pa.nulls(n, pa.string()).fill_null("")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if not (pa.types.is_string(col.type)
                    or pa.types.is_large_string(col.type)):
                col = pc.cast(col, pa.string())
            col = col.fill_null("")
            dictty = col.dictionary_encode()
            templates = dictty.dictionary.to_pylist()
            codes = np.asarray(dictty.indices)
            if len(templates) > self.MAX_EVAL_TEMPLATES:
                raise ValueError(
                    f"#evaluate saw {len(templates)} distinct dynamic "
                    f"templates in one batch (cap {self.MAX_EVAL_TEMPLATES})"
                    " — per-row-unique templates defeat compile-once; "
                    "precompute the rendered column upstream instead")
            cache = getattr(self, "_eval_cache", None)
            if cache is None:
                cache = self._eval_cache = {}
            out = np.empty(n, dtype=object)
            for j, tpl in enumerate(templates):
                rows = np.flatnonzero(codes == j)
                if not len(rows):
                    continue
                if tpl == "":
                    out[rows] = ""
                    continue
                compiled = cache.get(tpl)
                if compiled is None:
                    compiled = compile_template(
                        tpl, template_root=self.template_root)
                    cache[tpl] = compiled
                    while len(cache) > self._EVAL_CACHE_MAX:
                        cache.pop(next(iter(cache)))
                else:
                    cache[tpl] = cache.pop(tpl)  # LRU refresh
                idx = pa.array(rows)
                sub_batch = batch.take(idx)
                sub_vars = {}
                for k, v in vars.items():
                    if isinstance(v, tuple) and v and v[0] == "__vtl_define__":
                        sub_vars[k] = v
                    else:
                        vv = (v.combine_chunks()
                              if isinstance(v, pa.ChunkedArray) else v)
                        sub_vars[k] = vv.take(idx)
                sub = self._render_nodes(compiled, sub_batch, visible,
                                         sub_vars, len(rows))
                out[rows] = sub.to_numpy(zero_copy_only=False)
            # rows of halted/unmatched templates stay "" by construction
            mask_unset = np.array([v is None for v in out])
            if mask_unset.any():
                out[mask_unset] = ""
            return pa.array(out, pa.string())
        finally:
            self._eval_depth -= 1

    def _render_nodes(self, nodes: list, batch: pa.Table, visible: set,
                      vars: dict, n: int, active: np.ndarray | None = None,
                      state: dict | None = None) -> pa.Array:
        """``active``: bool mask of rows this node list logically executes
        for (#if branch bodies narrow it) — governs which rows a
        #stop/#break applies to. ``state``: per-row halt masks, mutated in
        document order; every emitted part is blanked for rows already
        halted BEFORE that part (so output up to the directive is kept)."""
        if active is None:
            active = np.ones(n, dtype=bool)
        if state is None:
            state = {"stop": np.zeros(n, dtype=bool),
                     "break": np.zeros(n, dtype=bool)}
        parts = []

        def emit(part):
            halted = state["stop"] | state["break"]
            if halted.any():
                part = pc.if_else(pa.array(halted),
                                  pa.scalar("", pa.string()), part)
            parts.append(part)

        for node in nodes:
            kind = node[0]
            # snapshot BEFORE the node runs: a row halting INSIDE this
            # node keeps the node's own output up to the halt point
            pre_halt = state["stop"] | state["break"]
            pre_any = bool(pre_halt.any())

            def emit_post(part):
                if pre_any:
                    part = pc.if_else(pa.array(pre_halt),
                                      pa.scalar("", pa.string()), part)
                parts.append(part)

            if kind == "lit":
                emit(pa.scalar(node[1], pa.string()))
            elif kind == "field":
                col = self._resolve(node[1], batch, visible, vars)
                emit(col if col is not None else pa.scalar("", pa.string()))
            elif kind == "set":
                val = self._rhs_value(node[2], batch, visible, vars, n)
                if isinstance(val, pa.Scalar):
                    val = pa.nulls(n, val.type).fill_null(val)
                vars[node[1]] = val
            elif kind == "define":
                vars[node[1]] = ("__vtl_define__", node[2])
            elif kind == "stop":
                state["stop"] |= active
            elif kind == "break":
                state["break"] |= active
            elif kind == "if":
                # condition masks evaluate in document order, BEFORE any
                # branch-local #set mutations; branch bodies run with
                # first-true-wins exclusive active masks so a #stop in a
                # branch halts exactly the rows that took it
                conds = [self._eval_cond(c, batch, visible, vars, n)
                         for c, _ in node[1]]
                taken = np.zeros(n, dtype=bool)
                branch_out = []
                for cm, (_, body) in zip(conds, node[1]):
                    excl = cm & ~taken
                    taken |= cm
                    branch_out.append(self._render_nodes(
                        body, batch, visible, dict(vars), n,
                        active & excl, state))
                rendered = self._render_nodes(node[2], batch, visible,
                                              dict(vars), n,
                                              active & ~taken, state)
                for cm, br in zip(reversed(conds), reversed(branch_out)):
                    rendered = pc.if_else(pa.array(cm), br, rendered)
                emit_post(rendered)
            elif kind == "foreach":
                emit_post(self._render_foreach(
                    node[1], node[2], node[3], batch, visible, vars, n,
                    active, state))
            elif kind == "evaluate":
                emit_post(self._render_evaluate(node[1], batch, visible,
                                                vars, n))
            else:
                raise ValueError(f"unexpected template node {kind!r}")
        if not parts:
            return pa.nulls(n, pa.string()).fill_null("")
        rendered = pc.binary_join_element_wise(*parts, "")
        if isinstance(rendered, pa.Scalar):  # all-literal template
            rendered = pa.nulls(n, pa.string()).fill_null(rendered)
        if isinstance(rendered, pa.ChunkedArray):
            rendered = rendered.combine_chunks()
        return rendered

    def _render_foreach(self, var: str, src: str, body: list,
                        batch: pa.Table, visible: set, vars: dict,
                        n: int, active: np.ndarray | None = None,
                        state: dict | None = None) -> pa.Array:
        """``#foreach($item in $listref) body #end`` — vectorized EXPLODE /
        RENDER / FOLD: the body renders ONCE over the flattened element
        array (scalar fields gathered per element), then per-row results
        re-join with ``pc.binary_join``. No Python loop over rows or
        elements; nesting works because the body renders through the same
        machinery over the exploded batch. ``$foreach.index`` (0-based) and
        ``$foreach.count`` (1-based) are available inside the body.
        ``$velocityCount`` (legacy 1-based) aliases count."""
        m_range = _RANGE.match(src)
        if m_range:
            a, b = int(m_range.group(1)), int(m_range.group(2))
            step = 1 if b >= a else -1
            items = np.arange(a, b + step, step, dtype=np.int64)
            m = len(items)
            counts = np.full(n, m, dtype=np.int64)
            child = pa.array(np.tile(items, n))
        else:
            mref = _PLACEHOLDER.fullmatch(src.strip())
            if not mref:
                raise ValueError(
                    f"unsupported #foreach source: {src!r} (expected a "
                    "$list reference or [a..b] range)")
            col = self._resolve(mref.group(1) or mref.group(2), batch,
                                visible, vars, raw=True)
            if col is None:
                return pa.nulls(n, pa.string()).fill_null("")
            if not (pa.types.is_list(col.type)
                    or pa.types.is_large_list(col.type)):
                raise ValueError(
                    f"#foreach over non-list reference {src!r} "
                    f"(type {col.type}); Velocity iterates collections — "
                    "pass a list-typed column")
            counts = np.asarray(
                pc.list_value_length(col).fill_null(0), dtype=np.int64)
            child = pc.list_flatten(col)
            if isinstance(child, pa.ChunkedArray):
                child = child.combine_chunks()
        total = int(counts.sum())
        row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        idx_arr = pa.array(row_idx)
        vbatch = batch.take(idx_arr)
        vvars = {}
        for k, v in vars.items():
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            vvars[k] = v.take(idx_arr) if isinstance(v, pa.Array) else v
        vvars[var] = child
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        elem_idx = (np.arange(total, dtype=np.int64)
                    - np.repeat(offsets[:-1], counts))
        vvars["foreach.index"] = pa.array(elem_idx)
        vvars["foreach.count"] = pa.array(elem_idx + 1)
        vvars["velocityCount"] = vvars["foreach.count"]
        # loop body runs with its OWN halt state over the exploded rows:
        # #break halts this loop only; #stop propagates to the caller
        active_exp = (np.repeat(active, counts) if active is not None
                      else np.ones(total, dtype=bool))
        state2 = {"stop": np.zeros(total, dtype=bool),
                  "break": np.zeros(total, dtype=bool)}
        rendered = self._render_nodes(body, vbatch, visible, vvars, total,
                                      active_exp, state2)
        if isinstance(rendered, pa.ChunkedArray):
            rendered = rendered.combine_chunks()
        halt_e = state2["stop"] | state2["break"]
        if halt_e.any():
            # suppress every element AFTER the first halting element of
            # its row (the halting element's own tail was already blanked
            # by in-body part masking): exclusive cumsum of halts, per-row
            ex = np.concatenate(([0], np.cumsum(halt_e)[:-1]))
            valid = counts > 0
            row_base = np.repeat(ex[offsets[:-1][valid]], counts[valid])
            prev_halt = (ex - row_base) > 0
            if prev_halt.any():
                rendered = pc.if_else(pa.array(prev_halt),
                                      pa.scalar("", pa.string()), rendered)
            if state is not None and state2["stop"].any():
                # #stop inside the loop halts the whole template for that
                # original row
                np.logical_or.at(state["stop"], row_idx, state2["stop"])
        lst = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), pa.int32()),
            pc.cast(rendered, pa.string()))
        return pc.binary_join(lst, pa.scalar("", pa.string()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        visible = {c for c in batch.column_names if self.filter.fullmatch(c)}
        rendered = self._render_nodes(self.segments, batch, visible, {}, n)
        if not self.keep_input_cols:
            return pa.table({self.output_col: rendered})
        out = batch
        if self.output_col in out.column_names:
            out = out.set_column(
                out.column_names.index(self.output_col), self.output_col, rendered
            )
        else:
            out = out.append_column(self.output_col, rendered)
        return out
