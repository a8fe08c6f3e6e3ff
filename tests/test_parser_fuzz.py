"""Hypothesis fuzz of the CozoScript parser and expression evaluator.

Mirrors the reference's grammar-robustness posture (tests.rs bad_parse,
parser corner cases): arbitrary input must either parse or raise
ParseError/QueryError — never crash with an internal exception — and
well-formed generated programs must round-trip through parse → evaluate
without internal errors. Pure driver-side (no Spark session needed for the
parser paths), so these run in milliseconds.
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from cozo_spark.datalog.parser import ParseError, parse_script, const_eval
from cozo_spark.datalog.translate import QueryError


ACCEPTABLE = (ParseError, QueryError, ValueError, KeyError, NotImplementedError)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_arbitrary_text_never_crashes_parser(src):
    try:
        parse_script(src, None)
    except ACCEPTABLE:
        pass
    except RecursionError:
        pass  # pathological nesting rejected by Python's own limit


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.printable, max_size=120))
def test_printable_text_never_crashes_parser(src):
    try:
        parse_script(src, None)
    except ACCEPTABLE:
        pass
    except RecursionError:
        pass


_ident = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)
_num = st.integers(min_value=-10**6, max_value=10**6)


@st.composite
def _const_exprs(draw, depth=0):
    if depth >= 3:
        leaf = draw(st.sampled_from(["num", "str", "bool", "null"]))
    else:
        leaf = draw(st.sampled_from(
            ["num", "str", "bool", "null", "list", "arith", "cmp", "concat"]))
    if leaf == "num":
        n = draw(_num)
        return str(n) if n >= 0 else f"({n})"
    if leaf == "str":
        s = draw(st.text(alphabet=string.ascii_letters + " ", max_size=8))
        return repr(s)
    if leaf == "bool":
        return draw(st.sampled_from(["true", "false"]))
    if leaf == "null":
        return "null"
    if leaf == "list":
        items = draw(st.lists(_const_exprs(depth=depth + 1), max_size=3))
        return "[" + ", ".join(items) + "]"
    if leaf == "arith":
        a = draw(_const_exprs(depth=depth + 1))
        b = draw(_const_exprs(depth=depth + 1))
        op = draw(st.sampled_from(["+", "-", "*"]))
        return f"({a} {op} {b})"
    if leaf == "cmp":
        a = draw(_const_exprs(depth=depth + 1))
        b = draw(_const_exprs(depth=depth + 1))
        op = draw(st.sampled_from(["==", "!=", "<", ">="]))
        return f"({a} {op} {b})"
    a = draw(_const_exprs(depth=depth + 1))
    b = draw(_const_exprs(depth=depth + 1))
    return f"({a} ++ {b})"


@settings(max_examples=200, deadline=None)
@given(_const_exprs())
def test_generated_const_rules_parse(expr):
    """Grammar-valid constant rules always parse; const_eval either folds
    them or raises a typed error (cross-type arithmetic etc.)."""
    prog = parse_script(f"?[x] := x = {expr}", None)
    assert prog is not None
    from cozo_spark.datalog.parser import Parser

    try:
        const_eval(Parser(expr).parse_expr())
    except ACCEPTABLE:
        pass
    except (TypeError, ZeroDivisionError, OverflowError):
        pass  # dynamic type errors surface as engine errors at runtime


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_ident, _num), min_size=1, max_size=5))
def test_generated_programs_parse(rows):
    body = ", ".join(f"[{v}, '{k}']" for k, v in rows)
    prog = parse_script(f"?[a, b] <- [{body}] :limit 3", None)
    assert prog is not None
