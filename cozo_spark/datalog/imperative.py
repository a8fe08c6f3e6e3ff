"""Imperative (%-prefixed) CozoScript programs.

Reference: grammar cozoscript.pest:238-258, executor
cozo-core/src/runtime/imperative.rs:66-341. A Python control-flow interpreter
over the query engine: query blocks (optionally bound to `_temp` relations
via `as`), %if/%if_not/%then/%else/%end, %loop/%mark/%break/%continue,
%return, %ignore_error, %swap, %debug.

Truthiness of a condition = non-emptiness of the last query's result
(imperative.rs:35-64). All statements share the session's registry —
atomic-per-script semantics are relaxed to best-effort (SURVEY §7 hard parts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class QueryStmt:
    toks: tuple  # token slice indices into the parser's token list
    src: str
    bind_as: Optional[str] = None


@dataclass
class IfStmt:
    negated: bool
    cond: Any  # QueryStmt or temp-relation name
    then: list = field(default_factory=list)
    orelse: list = field(default_factory=list)


@dataclass
class LoopStmt:
    label: Optional[str]
    body: list = field(default_factory=list)


@dataclass
class BreakStmt:
    label: Optional[str] = None


@dataclass
class ContinueStmt:
    label: Optional[str] = None


@dataclass
class ReturnStmt:
    items: list = field(default_factory=list)


@dataclass
class SwapStmt:
    a: str = ""
    b: str = ""


@dataclass
class DebugStmt:
    name: str = ""


@dataclass
class IgnoreErrorStmt:
    stmt: Any = None


class _Break(Exception):
    def __init__(self, label):
        self.label = label


class _Continue(Exception):
    def __init__(self, label):
        self.label = label


class _Return(Exception):
    def __init__(self, values):
        self.values = values


def parse_imperative(parser) -> list:
    """Parse a %-program from the current parser position."""
    stmts = []
    while not parser.done():
        stmts.append(_parse_stmt(parser))
    return stmts


def _parse_block(parser, stop: set) -> list:
    stmts = []
    while not parser.done():
        t = parser.peek()
        if t.kind == "pct" and t.text in stop:
            break
        stmts.append(_parse_stmt(parser))
    return stmts


def _parse_stmt(parser):
    t = parser.peek()
    if t.kind == "pct":
        word = t.text
        parser.i += 1
        if word == "%if" or word == "%if_not":
            cond = _parse_condition(parser)
            parser.try_eat("pct", "%then")
            then = _parse_block(parser, {"%else", "%end"})
            orelse = []
            if parser.try_eat("pct", "%else"):
                orelse = _parse_block(parser, {"%end"})
            parser.eat("pct", "%end")
            return IfStmt(word == "%if_not", cond, then, orelse)
        if word == "%mark":
            label = parser.eat("ident").text
            parser.eat("pct", "%loop")
            body = _parse_block(parser, {"%end"})
            parser.eat("pct", "%end")
            return LoopStmt(label, body)
        if word == "%loop":
            body = _parse_block(parser, {"%end"})
            parser.eat("pct", "%end")
            return LoopStmt(None, body)
        if word == "%break":
            label = parser.eat("ident").text if parser.at("ident") else None
            return BreakStmt(label)
        if word == "%continue":
            label = parser.eat("ident").text if parser.at("ident") else None
            return ContinueStmt(label)
        if word == "%return":
            items = []
            while parser.at("ident") or parser.at("uident") or parser.at("punct", "{"):
                if parser.at("punct", "{"):
                    items.append(_parse_query_block(parser))
                else:
                    items.append(parser.peek().text)
                    parser.i += 1
                if not parser.try_eat("punct", ","):
                    break
            return ReturnStmt(items)
        if word == "%swap":
            a = parser._eat_var()
            b = parser._eat_var()
            return SwapStmt(a, b)
        if word == "%debug":
            return DebugStmt(parser._eat_var())
        if word == "%ignore_error":
            return IgnoreErrorStmt(_parse_stmt(parser))
        raise _perr(parser, f"unknown imperative keyword {word}")
    if t.kind == "punct" and t.text == "{":
        return _parse_query_block(parser)
    raise _perr(parser, f"unexpected token {t} in imperative script")


def _perr(parser, msg):
    from cozo_spark.datalog.parser import ParseError
    return ParseError(msg)


def _parse_condition(parser):
    t = parser.peek()
    if t.kind in ("ident", "uident") and not (t.kind == "punct"):
        if t.text.startswith("_"):
            parser.i += 1
            return t.text
    return _parse_query_block(parser)


def _parse_query_block(parser) -> QueryStmt:
    """Capture a brace-delimited query block as source text (re-parsed at
    execution time so each iteration sees current temp-relation state)."""
    parser.eat("punct", "{")
    depth = 1
    start_tok = parser.i
    while depth > 0:
        t = parser.peek()
        if t is None:
            raise _perr(parser, "unterminated query block")
        if t.kind == "punct" and t.text == "{":
            depth += 1
        elif t.kind == "punct" and t.text == "}":
            depth -= 1
        parser.i += 1
    end_tok = parser.i - 1  # exclude closing brace
    bind_as = None
    if parser.at("ident", "as"):
        parser.eat("ident", "as")
        bind_as = parser._eat_var()
    return QueryStmt((start_tok, end_tok), _toks_to_src(parser, start_tok, end_tok), bind_as)


def _toks_to_src(parser, a, b) -> str:
    parts = []
    for t in parser.toks[a:b]:
        if t.kind == "string":
            parts.append('"' + t.text.replace("\\", "\\\\").replace('"', '\\"') + '"')
        else:
            parts.append(t.text)
    return " ".join(parts)


MAX_LOOP_ITERS = 100_000


def run_imperative(db, stmts: list):
    """Execute a parsed imperative program against a CozoDb."""
    last = None
    try:
        last = _run_block(db, stmts)
    except _Return as r:
        from cozo_spark.datalog.engine import NamedRows

        outs = []
        for item in r.values:
            if isinstance(item, str):
                df = db.temp_relations.get(item)
                if df is None:
                    raise
                outs.append(NamedRows(df.columns, [list(x) for x in df.collect()]))
            else:
                outs.append(db.run_script(item.src))
        if len(outs) == 1:
            return outs[0]
        return outs if outs else NamedRows(["status"], [["OK"]])
    return last


def _run_block(db, stmts: list):
    from cozo_spark.datalog.engine import NamedRows

    last = NamedRows(["status"], [["OK"]])
    for s in stmts:
        if isinstance(s, QueryStmt):
            res = db.run_script(s.src)
            if s.bind_as is not None:
                # `{...} as _name` stores the RESULT ROWS (including
                # :returning output) as a temp relation; headers sanitize
                # '(' → '_', ')' → '' and duplicates are an error
                # (imperative.rs script_store_as_relation:342-365)
                from pyspark.sql import types as T

                from cozo_spark.datalog.fixpoint import _checkpoint
                from cozo_spark.datalog.translate import QueryError

                names, seen = [], set()
                for h in res.headers:
                    k = str(h).replace("(", "_").replace(")", "")
                    if k in seen:
                        raise QueryError(
                            f"Duplicate variable name {k}, please use distinct "
                            "variables in `as` construct.")
                    seen.add(k)
                    names.append(k)
                # consume the WHOLE page chain — with row_page_size set,
                # res.rows is only page 1 (NamedRows::next pagination).
                # flatten() SEVERS the chain (reference semantics), so
                # rebuild `res` as one whole page: the statement result may
                # still be returned as the program's value below.
                if hasattr(res, "flatten"):
                    rows = [tuple(r) for page in res.flatten()
                            for r in page.rows]
                    res = type(res)(headers=res.headers, rows=list(rows))
                else:
                    rows = [tuple(r) for r in res.rows]
                if rows:
                    # infer per-column types from non-null values (all-NULL
                    # columns default to String) — bare createDataFrame
                    # raises 'Some of types cannot be determined' on them
                    schema = db._infer_schema(rows, names)
                    rows = [db._coerce_row(r, schema) for r in rows]
                    from cozo_spark.plans.local import local_frame
                    df = local_frame(db.spark, rows, schema)
                else:
                    df = db.spark.createDataFrame([], T.StructType(
                        [T.StructField(n, T.StringType(), True) for n in names]))
                db.temp_relations[s.bind_as] = _checkpoint(df)
            last = res
        elif isinstance(s, IfStmt):
            truthy = _cond_truthy(db, s.cond)
            if s.negated:
                truthy = not truthy
            last = _run_block(db, s.then if truthy else s.orelse)
        elif isinstance(s, LoopStmt):
            for _ in range(MAX_LOOP_ITERS):
                try:
                    _run_block(db, s.body)
                except _Break as b:
                    if b.label is None or b.label == s.label:
                        break
                    raise
                except _Continue as c:
                    if c.label is None or c.label == s.label:
                        continue
                    raise
            else:
                raise RuntimeError("%loop exceeded max iterations")
        elif isinstance(s, BreakStmt):
            raise _Break(s.label)
        elif isinstance(s, ContinueStmt):
            raise _Continue(s.label)
        elif isinstance(s, ReturnStmt):
            raise _Return(s.items)
        elif isinstance(s, SwapStmt):
            a = db.temp_relations.get(s.a)
            b = db.temp_relations.get(s.b)
            db.temp_relations[s.a], db.temp_relations[s.b] = b, a
        elif isinstance(s, DebugStmt):
            df = db.temp_relations.get(s.name)
            print(f"%debug {s.name}: {df.collect() if df is not None else None}")
        elif isinstance(s, IgnoreErrorStmt):
            try:
                last = _run_block(db, [s.stmt])
            except Exception:
                pass
        else:
            raise RuntimeError(f"unknown imperative stmt {s!r}")
    return last


def _cond_truthy(db, cond) -> bool:
    if isinstance(cond, str):
        df = db.temp_relations.get(cond)
        return df is not None and not df.isEmpty()
    res = db.run_script(cond.src)
    # reference truthiness is purely row-set non-emptiness
    # (imperative.rs:64: Ok(!res.rows.is_empty())) — a single [false] row
    # is still truthy; conditions filter in the body to produce emptiness
    return bool(res.rows)
