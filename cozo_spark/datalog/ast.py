"""AST for CozoScript (grammar transcribed from the reference's
cozo-core/src/cozoscript.pest — a clean PEG; IR mirrors
cozo-core/src/data/program.rs:467-965 in simplified form)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union


# --- expressions -------------------------------------------------------------

@dataclass(frozen=True)
class Const:
    value: Any


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Param:
    name: str


@dataclass(frozen=True)
class Call:
    fn: str
    args: tuple


@dataclass(frozen=True)
class ListEx:
    items: tuple


@dataclass(frozen=True)
class ObjectEx:
    pairs: tuple  # ((key_expr, val_expr), ...)


Expr = Union[Const, Var, Param, Call, ListEx, ObjectEx]


# --- atoms -------------------------------------------------------------------

@dataclass
class RuleApply:
    name: str
    args: list


@dataclass
class RelApply:
    name: str
    args: list
    validity: Optional[Expr] = None


@dataclass
class NamedRelApply:
    name: str
    pairs: dict  # col -> Expr (None value means bind var with same name)
    validity: Optional[Expr] = None


@dataclass
class SearchApply:
    """`~rel:idx{bindings | opts}` index-search atom (HNSW/FTS/LSH —
    data/program.rs:976-1563)."""
    rel: str
    idx: str
    pairs: dict   # col -> Expr|None bindings (like NamedRelApply)
    opts: dict    # option name -> Expr


@dataclass
class Unify:
    var: str
    expr: Expr
    multi: bool = False  # `x in expr` explodes


@dataclass
class Cond:
    expr: Expr


@dataclass
class Negation:
    atom: Any


@dataclass
class Conj:
    atoms: list


@dataclass
class Disj:
    branches: list


Atom = Union[RuleApply, RelApply, NamedRelApply, Unify, Cond, Negation, Conj, Disj]


# --- rule heads --------------------------------------------------------------

@dataclass
class HeadVar:
    name: str


@dataclass
class HeadAggr:
    aggr: str
    var: str
    extra: list  # extra const args, e.g. collect(v, 10)


# --- rules -------------------------------------------------------------------

@dataclass
class RuleClause:
    head: list  # HeadVar | HeadAggr
    body: list  # atoms (conjunction)


@dataclass
class ConstRule:
    head: list
    expr: Expr


@dataclass
class FixedInput:
    kind: str  # 'rule' | 'relation' | 'named_relation'
    name: str
    bindings: list  # var names (positional) or (col, var) pairs for named
    validity: Optional[Expr] = None


@dataclass
class FixedApply:
    head: list
    rule_name: str
    inputs: list = field(default_factory=list)
    options: dict = field(default_factory=dict)


@dataclass
class SortSpec:
    var: str
    descending: bool = False


@dataclass
class OutOpts:
    limit: Optional[int] = None
    offset: Optional[int] = None
    sorters: list = field(default_factory=list)  # SortSpec
    store_op: Optional[str] = None  # create/replace/put/insert/update/rm/delete/ensure/ensure_not
    store_target: Optional[str] = None
    store_schema: Optional[Any] = None  # TableSchema
    assert_kind: Optional[str] = None  # 'none' | 'some'
    returning: bool = False
    timeout: Optional[float] = None
    disable_magic_rewrite: bool = False


@dataclass
class ColDef:
    name: str
    typing: Optional[str] = None  # rendered type string, e.g. 'Int', 'String?', '[Float]'
    default: Optional[Expr] = None
    gen_expr: Optional[str] = None  # `= out_arg` form


@dataclass
class TableSchema:
    keys: list = field(default_factory=list)      # ColDef
    non_keys: list = field(default_factory=list)  # ColDef


@dataclass
class Program:
    rules: dict = field(default_factory=dict)  # name -> list[RuleClause] | ConstRule | FixedApply
    opts: OutOpts = field(default_factory=OutOpts)


def expr_vars(e: Expr) -> set:
    if isinstance(e, Var):
        return {e.name}
    if isinstance(e, Call):
        out = set()
        for a in e.args:
            out |= expr_vars(a)
        return out
    if isinstance(e, ListEx):
        out = set()
        for a in e.items:
            out |= expr_vars(a)
        return out
    if isinstance(e, ObjectEx):
        out = set()
        for k, v in e.pairs:
            out |= expr_vars(k) | expr_vars(v)
        return out
    return set()


# --- parameter analysis (prepared statements) ----------------------------------

def expr_has_param(e) -> bool:
    if isinstance(e, Param):
        return True
    if isinstance(e, Call):
        return any(expr_has_param(a) for a in e.args)
    if isinstance(e, ListEx):
        return any(expr_has_param(x) for x in e.items)
    if isinstance(e, ObjectEx):
        return any(expr_has_param(k) or expr_has_param(v) for k, v in e.pairs)
    return False


def subst_params_expr(e, params: dict):
    """Replace Param nodes with Const(value) — the bind step of a prepared
    plan (engine._run_prepared compiles the substituted residuals into
    `where` Columns on the cached skeleton)."""
    if isinstance(e, Param):
        return Const(params[e.name])
    if isinstance(e, Call):
        return Call(e.fn, tuple(subst_params_expr(a, params) for a in e.args))
    if isinstance(e, ListEx):
        return ListEx(tuple(subst_params_expr(x, params) for x in e.items))
    if isinstance(e, ObjectEx):
        return ObjectEx(tuple((subst_params_expr(k, params),
                               subst_params_expr(v, params))
                              for k, v in e.pairs))
    return e


def rename_vars_expr(e, mapping: dict):
    """Rename Var nodes per ``mapping`` (missing names unchanged) — used by
    the prepared-statement support-rule hoist to re-home a migrated filter
    condition onto the application site's fresh argument variables."""
    if isinstance(e, Var):
        new = mapping.get(e.name)
        return Var(new) if new is not None else e
    if isinstance(e, Call):
        return Call(e.fn, tuple(rename_vars_expr(a, mapping) for a in e.args))
    if isinstance(e, ListEx):
        return ListEx(tuple(rename_vars_expr(x, mapping) for x in e.items))
    if isinstance(e, ObjectEx):
        return ObjectEx(tuple((rename_vars_expr(k, mapping),
                               rename_vars_expr(v, mapping))
                              for k, v in e.pairs))
    return e


def _maybe_expr_has_param(x) -> bool:
    """args lists mix var-name strings, None, and Expr nodes."""
    return x is not None and not isinstance(x, str) and expr_has_param(x)


def atom_has_param(a) -> bool:
    if isinstance(a, (Unify, Cond)):
        return expr_has_param(a.expr)
    if isinstance(a, Negation):
        return atom_has_param(a.atom)
    if isinstance(a, Conj):
        return any(atom_has_param(x) for x in a.atoms)
    if isinstance(a, Disj):
        return any(atom_has_param(x) for x in a.branches)
    if isinstance(a, RuleApply):
        return any(_maybe_expr_has_param(x) for x in a.args)
    if isinstance(a, RelApply):
        return (_maybe_expr_has_param(a.validity)
                or any(_maybe_expr_has_param(x) for x in a.args))
    if isinstance(a, NamedRelApply):
        return (_maybe_expr_has_param(a.validity)
                or any(v is not None and expr_has_param(v)
                       for v in a.pairs.values()))
    if isinstance(a, SearchApply):
        return (any(v is not None and expr_has_param(v)
                    for v in a.pairs.values())
                or any(expr_has_param(v) for v in a.opts.values()))
    return False


def rule_has_param(rule) -> bool:
    if isinstance(rule, ConstRule):
        return expr_has_param(rule.expr)
    if isinstance(rule, FixedApply):
        # expr_has_param falls through to False for plain python values
        return any(expr_has_param(v) for v in rule.options.values())
    return any(atom_has_param(a) for cl in rule for a in cl.body)


def _atom_ref_vars(a) -> set:
    """Every variable NAME an atom references (bound or used — callers
    that only need 'could this var flow through here' don't care which).
    args lists mix var-name strings, None, and Expr nodes; NamedRelApply
    pairs with a None value bind the var named after the column."""
    out: set = set()
    if isinstance(a, RuleApply):
        for x in a.args:
            if isinstance(x, str):
                out.add(x)
            elif x is not None:
                out |= expr_vars(x)
    elif isinstance(a, RelApply):
        for x in a.args:
            if isinstance(x, str):
                out.add(x)
            elif x is not None:
                out |= expr_vars(x)
        if a.validity is not None and not isinstance(a.validity, str):
            out |= expr_vars(a.validity)
    elif isinstance(a, NamedRelApply):
        for col, v in a.pairs.items():
            if v is None:
                out.add(col)
            else:
                out |= expr_vars(v)
        if a.validity is not None and not isinstance(a.validity, str):
            out |= expr_vars(a.validity)
    elif isinstance(a, SearchApply):
        for col, v in a.pairs.items():
            if v is None:
                out.add(col)
            else:
                out |= expr_vars(v)
        for v in a.opts.values():
            out |= expr_vars(v)
    elif isinstance(a, Unify):
        out.add(a.var)
        out |= expr_vars(a.expr)
    elif isinstance(a, Cond):
        out |= expr_vars(a.expr)
    elif isinstance(a, Negation):
        out |= _atom_ref_vars(a.atom)
    elif isinstance(a, Conj):
        for x in a.atoms:
            out |= _atom_ref_vars(x)
    elif isinstance(a, Disj):
        for x in a.branches:
            out |= _atom_ref_vars(x)
    return out


# --- nondeterminism analysis --------------------------------------------------

# functions whose re-evaluation yields different values; a mutation whose
# entry involves any of these must be materialized exactly once
NONDET_FNS = frozenset({
    "rand_float", "rand_bernoulli", "rand_int", "rand_choose", "rand_vec",
    "rand_uuid_v1", "rand_uuid_v4", "uuid", "now", "choice_rand",
})


def expr_nondet(e) -> bool:
    if isinstance(e, Call):
        return e.fn in NONDET_FNS or any(expr_nondet(a) for a in e.args)
    if isinstance(e, ListEx):
        return any(expr_nondet(x) for x in e.items)
    if isinstance(e, ObjectEx):
        return any(expr_nondet(k) or expr_nondet(v) for k, v in e.pairs)
    return False


def _validity_nondet(v) -> bool:
    """`@ ts` reads: a constant numeric/date probe re-evaluates
    identically, but `@ "NOW"` bakes the wall clock into the plan — a
    cached plan would serve rows as of its FIRST compile forever."""
    if v is None:
        return False
    from cozo_spark.datalog.translate import try_const

    ok, val = try_const(v)
    if not ok:
        return True  # conservatively uncacheable
    return isinstance(val, str) and val == "NOW"


def _atom_nondet(a) -> bool:
    if isinstance(a, (Unify, Cond)):
        return expr_nondet(a.expr)
    if isinstance(a, Negation):
        return _atom_nondet(a.atom)
    if isinstance(a, Conj):
        return any(_atom_nondet(x) for x in a.atoms)
    if isinstance(a, Disj):
        return any(_atom_nondet(x) for x in a.branches)
    if isinstance(a, RuleApply):
        return any(expr_nondet(x) for x in a.args
                   if not isinstance(x, str) and x is not None)
    if isinstance(a, RelApply):
        return _validity_nondet(a.validity) or \
            any(expr_nondet(x) for x in a.args
                if not isinstance(x, str) and x is not None)
    if isinstance(a, NamedRelApply):
        return _validity_nondet(a.validity) or \
            any(expr_nondet(v) for v in a.pairs.values() if v is not None)
    if isinstance(a, SearchApply):
        return any(expr_nondet(v) for v in a.opts.values())
    return False


def program_nondet(prog: "Program") -> bool:
    """True when re-evaluating the program could yield different rows —
    rand/now calls anywhere, choice_rand heads, or fixed-rule outputs
    (conservative: user rules and RandomWalk are opaque)."""
    for rules in prog.rules.values():
        if isinstance(rules, ConstRule):
            if expr_nondet(rules.expr):
                return True
        elif isinstance(rules, FixedApply):
            return True
        else:
            for cl in rules:
                if any(isinstance(h, HeadAggr) and h.aggr == "choice_rand"
                       for h in cl.head):
                    return True
                if any(_atom_nondet(a) for a in cl.body):
                    return True
    return False
