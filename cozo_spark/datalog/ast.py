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
