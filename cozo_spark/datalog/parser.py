"""Recursive-descent parser for CozoScript.

Grammar transcribed from the reference's PEG
(cozo-core/src/cozoscript.pest); entry points mirror parse/mod.rs:306-353.
Round-1 scope: query scripts (rules, const rules, fixed rules, out options)
and the sys-script subset the engine supports; imperative scripts parse as a
statement list for the imperative interpreter.

Parameters ``$name`` are substituted at parse time (parse/expr.rs param rule).
"""

from __future__ import annotations

import re
from typing import Any, Optional

from cozo_spark.datalog.ast import (
    Call, ColDef, Cond, Conj, Const, ConstRule, Disj, FixedApply, FixedInput,
    HeadAggr, HeadVar, ListEx, NamedRelApply, Negation, ObjectEx, OutOpts,
    Param, Program, RelApply, RuleApply, RuleClause, SearchApply, SortSpec,
    TableSchema, Unify, Var, expr_has_param,
)


class ParseError(Exception):
    pass


_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<block_comment>/\*(?:[^*]|\*(?!/))*\*/)
  | (?P<line_comment>\#[^\n]*)
  | (?P<raw_string>(?P<rs_us>_*)"(?P<rs_body>(?:(?!"(?P=rs_us)).)*)"(?P=rs_us))
  | (?P<dq_string>"(?:[^"\\]|\\.)*")
  | (?P<sq_string>'(?:[^'\\]|\\.)*')
  | (?P<float>(?:0|[1-9][0-9_]*)(?:\.[0-9_]*)?[eE][-+]?[0-9_]+|(?:0|[1-9][0-9_]*)\.[0-9_]*)
  | (?P<hex>0x[0-9a-fA-F][0-9a-fA-F_]*)
  | (?P<oct>0o[0-7][0-7_]*)
  | (?P<bin>0b[01][01_]*)
  | (?P<int>[0-9][0-9_]*)
  | (?P<param>\$[\w.]+)
  | (?P<relident>\*[\w.:]*\w|\*_\w+)
  | (?P<searchident>~[\w.:]+)
  | (?P<ident>[^\W\d]\w*(?:\.\w+)*(?::[^\W\d]\w*)*)
  | (?P<uident>_[\w.]*)
  | (?P<sysopt>:[a-z_]+)
  | (?P<pct>%[a-z_]+)
  | (?P<punct><~|:=|<-|=>|==|!=|>=|<=|&&|\|\||\+\+|->|::|[\[\](){},;=<>+\-*/%^~!@|:.?])
""", re.VERBOSE | re.DOTALL)

_ESCAPES = {'"': '"', "'": "'", "\\": "\\", "/": "/", "b": "\b",
            "f": "\f", "n": "\n", "r": "\r", "t": "\t"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "u":
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(_ESCAPES.get(n, n))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


class Tok:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind
        self.text = text
        self.pos = pos

    def __repr__(self):
        return f"Tok({self.kind},{self.text!r})"


def tokenize(src: str) -> list[Tok]:
    toks = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ParseError(f"unexpected character {src[pos]!r} at {pos}: ...{src[max(0,pos-20):pos+20]!r}...")
        kind = m.lastgroup
        if kind == "raw_string":
            toks.append(Tok("string", m.group("rs_body"), pos))
        elif kind in ("dq_string", "sq_string"):
            toks.append(Tok("string", _unescape(m.group(0)[1:-1]), pos))
        elif kind not in ("ws", "block_comment", "line_comment"):
            toks.append(Tok(kind, m.group(0), pos))
        pos = m.end()
        if kind == "raw_string":
            pos = m.end("raw_string") if m.end("raw_string") > 0 else pos
    return toks


_KEYWORDS_BOOL = {"true": True, "false": False}

# operators that may FOLLOW a parenthesized group only when that group is a
# sub-expression, not a grouped rule body
_EXPR_CONT_OPS = {"||", "&&", "==", "!=", "<", "<=", ">", ">=", "+", "-",
                  "*", "/", "%", "^", "++", "~", "->"}


class Parser:
    def __init__(self, src: str, params: Optional[dict] = None,
                 defer_params: bool = False):
        self.toks = tokenize(src)
        self.i = 0
        self.params = params or {}
        # prepared-statement mode: leave `$name` as a Param AST node instead
        # of folding the supplied value into a Const, so the engine can
        # compile a reusable plan skeleton (engine._build_skeleton) and bind
        # values at cache-hit time
        self.defer_params = defer_params

    # -- token helpers --------------------------------------------------------

    def peek(self, k: int = 0) -> Optional[Tok]:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def at(self, kind: str, text: Optional[str] = None, k: int = 0) -> bool:
        t = self.peek(k)
        return t is not None and t.kind == kind and (text is None or t.text == text)

    def eat(self, kind: str, text: Optional[str] = None) -> Tok:
        t = self.peek()
        if t is None or t.kind != kind or (text is not None and t.text != text):
            raise ParseError(f"expected {text or kind}, got {t} (pos {t.pos if t else 'EOF'})")
        self.i += 1
        return t

    def try_eat(self, kind: str, text: Optional[str] = None) -> Optional[Tok]:
        if self.at(kind, text):
            return self.eat(kind, text)
        return None

    def done(self) -> bool:
        return self.i >= len(self.toks)

    def _peek_param_row_names(self) -> Optional[list]:
        """If the upcoming tokens are `[[ $a, $b, ... ]` — a literal row made
        ONLY of parameters — return the parameter names (param shorthand)."""
        if not (self.at("punct", "[") and self.at("punct", "[", 1)):
            return None
        j, names = self.i + 2, []
        while j < len(self.toks):
            t = self.toks[j]
            if t.kind != "param":
                return None
            names.append(t.text[1:])
            j += 1
            t = self.toks[j] if j < len(self.toks) else None
            if t is None:
                return None
            if t.kind == "punct" and t.text == "]":
                return names or None
            if not (t.kind == "punct" and t.text == ","):
                return None
            j += 1
        return None

    # -- entry points ----------------------------------------------------------

    def parse_script(self) -> Any:
        if self.at("punct", "::"):
            return self.parse_sys()
        if self.at("pct") or self.at("punct", "{"):
            # leading '%' keyword OR a brace-grouped block sequence — both are
            # the reference's imperative/grouped script form (`{q1} {q2}` runs
            # sequentially in one call, tests.rs test_conditions,
            # crashy_imperative's `{:create _test {a}}` opener)
            from cozo_spark.datalog.imperative import parse_imperative
            return parse_imperative(self)
        return self.parse_query_script()

    def parse_query_script(self) -> Program:
        prog = Program()
        while not self.done():
            if self.at("sysopt"):
                self.parse_option(prog.opts)
                self.try_eat("punct", ";")
                continue
            self.parse_rule_into(prog)
            self.try_eat("punct", ";")
        if not prog.rules and prog.opts.store_op is None:
            raise ParseError("no rules in query script")
        return prog

    # -- rules -----------------------------------------------------------------

    def parse_rule_into(self, prog: Program) -> None:
        name, head = self.parse_rule_head()
        if self.try_eat("punct", ":="):
            body = self.parse_rule_body()
            prog.rules.setdefault(name, [])
            if not isinstance(prog.rules.get(name), list):
                raise ParseError(f"rule {name} redefined with different kind")
            prog.rules[name].append(RuleClause(head, body))
        elif self.try_eat("punct", "<-"):
            # param shorthand (runtime/tests.rs param_shorthand): an EMPTY
            # head over literal rows of bare $params names the columns after
            # the parameters — `?[] <- [[$x, $y]]` behaves as `?[x, y] <- ...`
            if not head:
                pnames = self._peek_param_row_names()
                if pnames:
                    head = [HeadVar(p) for p in pnames]
            expr = self.parse_expr()
            prog.rules[name] = ConstRule(head, expr)
        elif self.try_eat("punct", "<~"):
            rule_name = self.eat("ident").text
            inputs, options = self.parse_fixed_args()
            prog.rules[name] = FixedApply(head, rule_name, inputs, options)
        else:
            raise ParseError(f"expected := or <- or <~ after rule head {name}")

    def parse_rule_head(self):
        if self.try_eat("punct", "?"):
            name = "?"
        else:
            name = self.eat("ident").text
        self.eat("punct", "[")
        head = []
        while not self.at("punct", "]"):
            head.append(self.parse_head_arg())
            if not self.try_eat("punct", ","):
                break
        self.eat("punct", "]")
        return name, head

    def parse_head_arg(self):
        # aggr_arg = ident "(" var ("," expr)* ")"
        if self.at("ident") and self.at("punct", "(", 1):
            aggr = self.eat("ident").text
            self.eat("punct", "(")
            var = self._eat_var()
            extra = []
            while self.try_eat("punct", ","):
                extra.append(self.parse_expr())
            self.eat("punct", ")")
            return HeadAggr(aggr, var, extra)
        return HeadVar(self._eat_var())

    def _eat_var(self) -> str:
        t = self.peek()
        if t is not None and t.kind in ("ident", "uident"):
            self.i += 1
            return t.text
        raise ParseError(f"expected variable, got {t}")

    def parse_rule_body(self) -> list:
        atoms = []
        while True:
            atoms.append(self.parse_disjunction())
            if not self.try_eat("punct", ","):
                break
            if self._body_ends():
                break
        return atoms

    def _body_ends(self) -> bool:
        t = self.peek()
        if t is None:
            return True
        if t.kind == "sysopt" or t.kind == "pct":
            return True
        if t.kind == "punct" and t.text in (";", ")", "]", "}"):
            return True
        # next rule starts: ident "[" ... ":=" — lookahead for a rule head
        return self._looks_like_rule_start()

    def _looks_like_rule_start(self) -> bool:
        t = self.peek()
        if t is None or not (t.kind == "ident" or (t.kind == "punct" and t.text == "?")):
            return False
        j = self.i + 1
        if not (j < len(self.toks) and self.toks[j].kind == "punct" and self.toks[j].text == "["):
            return False
        depth = 0
        while j < len(self.toks):
            tk = self.toks[j]
            if tk.kind == "punct" and tk.text == "[":
                depth += 1
            elif tk.kind == "punct" and tk.text == "]":
                depth -= 1
                if depth == 0:
                    nxt = self.toks[j + 1] if j + 1 < len(self.toks) else None
                    return nxt is not None and nxt.kind == "punct" and nxt.text in (":=", "<-", "<~")
            j += 1
        return False

    def parse_disjunction(self):
        branches = [self.parse_atom()]
        while self.at("ident", "or"):
            self.eat("ident", "or")
            branches.append(self.parse_atom())
        if len(branches) == 1:
            return branches[0]
        return Disj(branches)

    def parse_atom(self):
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input in rule body")
        if t.kind == "ident" and t.text == "not":
            self.eat("ident", "not")
            return Negation(self.parse_atom())
        if t.kind == "relident":
            return self.parse_relation_apply()
        if t.kind == "searchident":
            return self.parse_search_apply()
        if t.kind == "punct" and t.text == "(":
            # grouped rule body (conjunction of disjunctions)
            save = self.i
            self.eat("punct", "(")
            try:
                atoms = []
                while True:
                    atoms.append(self.parse_disjunction())
                    if not self.try_eat("punct", ","):
                        break
                self.eat("punct", ")")
                # `(a && b) || (c && d)` — the parenthesized group parses as
                # an atom but is actually the left operand of an expression
                # (the reference's PEG backtracks to the expr alternative
                # here, cozoscript.pest atom ordering); detect a trailing
                # operator and reparse the whole thing as one expression
                nxt = self.peek()
                if nxt is not None and nxt.kind == "punct" and nxt.text in _EXPR_CONT_OPS:
                    self.i = save
                    return Cond(self.parse_expr())
                if len(atoms) == 1:
                    return atoms[0]
                return Conj(atoms)
            except ParseError:
                self.i = save
                return Cond(self.parse_expr())
        # rule_apply: underscore_ident "[" args "]" — but NOT followed by
        # an operator that would make it an expression index access
        if t.kind in ("ident", "uident") and self.at("punct", "[", 1):
            name = t.text
            self.i += 1
            self.eat("punct", "[")
            args = []
            while not self.at("punct", "]"):
                args.append(self.parse_expr())
                if not self.try_eat("punct", ","):
                    break
            self.eat("punct", "]")
            return RuleApply(name, args)
        # unify / unify_multi: var "=" expr | var "in" expr
        if t.kind in ("ident", "uident"):
            if self.at("punct", "=", 1) and not self.at("punct", "==", 1):
                var = self._eat_var()
                self.eat("punct", "=")
                return Unify(var, self.parse_expr())
            if self.at("ident", "in", 1):
                var = self._eat_var()
                self.eat("ident", "in")
                return Unify(var, self.parse_expr(), multi=True)
        return Cond(self.parse_expr())

    def parse_search_apply(self) -> SearchApply:
        t = self.eat("searchident")
        full = t.text[1:]
        if ":" not in full:
            raise ParseError(f"search atom needs rel:index, got ~{full}")
        rel, idx = full.rsplit(":", 1)
        self.eat("punct", "{")
        pairs = {}
        while not (self.at("punct", "|") or self.at("punct", "}")):
            col = self._eat_var()
            if self.try_eat("punct", ":"):
                pairs[col] = self.parse_expr()
            else:
                pairs[col] = None
            if not self.try_eat("punct", ","):
                break
        opts = {}
        if self.try_eat("punct", "|"):
            while not self.at("punct", "}"):
                key = self.eat("ident").text
                self.eat("punct", ":")
                opts[key] = self.parse_expr()
                if not self.try_eat("punct", ","):
                    break
        self.eat("punct", "}")
        return SearchApply(rel, idx, pairs, opts)

    def parse_relation_apply(self):
        t = self.eat("relident")
        name = t.text[1:]
        validity = None
        if self.try_eat("punct", "{"):
            pairs = {}
            while not self.at("punct", "}"):
                if self.at("punct", "@"):
                    break
                col = self._eat_var()
                if self.try_eat("punct", ":"):
                    pairs[col] = self.parse_expr()
                else:
                    pairs[col] = None  # bind var of same name
                if not self.try_eat("punct", ","):
                    break
            if self.try_eat("punct", "@"):
                validity = self.parse_expr()
            self.eat("punct", "}")
            return NamedRelApply(name, pairs, validity)
        self.eat("punct", "[")
        args = []
        while not self.at("punct", "]"):
            if self.at("punct", "@"):
                break
            args.append(self.parse_expr())
            if not self.try_eat("punct", ","):
                break
        if self.try_eat("punct", "@"):
            validity = self.parse_expr()
        self.eat("punct", "]")
        return RelApply(name, args, validity)

    # -- fixed rules -------------------------------------------------------------

    def parse_fixed_args(self):
        self.eat("punct", "(")
        inputs: list[FixedInput] = []
        options: dict[str, Any] = {}
        while not self.at("punct", ")"):
            t = self.peek()
            if t.kind == "relident":
                self.i += 1
                name = t.text[1:]
                if self.try_eat("punct", "["):
                    bindings = []
                    validity = None
                    while not self.at("punct", "]"):
                        if self.at("punct", "@"):
                            break
                        bindings.append(self._eat_var())
                        if not self.try_eat("punct", ","):
                            break
                    if self.try_eat("punct", "@"):
                        validity = self.parse_expr()
                    self.eat("punct", "]")
                    inputs.append(FixedInput("relation", name, bindings, validity))
                else:
                    self.eat("punct", "{")
                    bindings = []
                    validity = None
                    while not self.at("punct", "}"):
                        if self.at("punct", "@"):
                            break
                        col = self._eat_var()
                        if self.try_eat("punct", ":"):
                            bindings.append((col, self._eat_var()))
                        else:
                            bindings.append((col, col))
                        if not self.try_eat("punct", ","):
                            break
                    if self.try_eat("punct", "@"):
                        validity = self.parse_expr()
                    self.eat("punct", "}")
                    inputs.append(FixedInput("named_relation", name, bindings, validity))
            elif t.kind in ("ident", "uident") and self.at("punct", "[", 1):
                name = t.text
                self.i += 1
                self.eat("punct", "[")
                bindings = []
                while not self.at("punct", "]"):
                    bindings.append(self._eat_var())
                    if not self.try_eat("punct", ","):
                        break
                self.eat("punct", "]")
                inputs.append(FixedInput("rule", name, bindings))
            else:
                key = self.eat("ident").text
                self.eat("punct", ":")
                options[key] = self.parse_expr()
            if not self.try_eat("punct", ","):
                break
        self.eat("punct", ")")
        return inputs, options

    # -- out options --------------------------------------------------------------

    def parse_option(self, opts: OutOpts) -> None:
        t = self.eat("sysopt")
        o = t.text
        if o == ":limit":
            opts.limit = self._const_int()
        elif o == ":offset":
            opts.offset = self._const_int()
        elif o in (":order", ":sort"):
            while True:
                desc = False
                if self.try_eat("punct", "-"):
                    desc = True
                else:
                    self.try_eat("punct", "+")
                var = self._eat_var()
                if self.at("punct", "("):
                    # `:order -count(fr)` sorts on the aggregate head column,
                    # whose rendered name is "count(fr)" (air_routes.rs:1664)
                    self.eat("punct", "(")
                    inner = self._eat_var()
                    self.eat("punct", ")")
                    var = f"{var}({inner})"
                opts.sorters.append(SortSpec(var, desc))
                if not self.try_eat("punct", ","):
                    break
        elif o in (":create", ":replace", ":put", ":insert", ":update", ":rm",
                   ":delete", ":ensure", ":ensure_not"):
            opts.store_op = o[1:]
            opts.store_target = self.eat("ident").text if self.at("ident") else self.eat("uident").text
            if self.at("punct", "{"):
                opts.store_schema = self.parse_table_schema()
        elif o == ":assert":
            kind = self.eat("ident").text
            if kind not in ("none", "some"):
                raise ParseError(f":assert expects none|some, got {kind}")
            opts.assert_kind = kind
        elif o == ":returning":
            opts.returning = True
        elif o == ":timeout":
            opts.timeout = self._const_num()
        elif o == ":sleep":
            self._const_num()
        elif o == ":disable_magic_rewrite":
            e = self.parse_expr()
            opts.disable_magic_rewrite = bool(getattr(e, "value", False))
        else:
            raise ParseError(f"unknown option {o}")

    def _const_int(self) -> int:
        e = self.parse_expr()
        if self.defer_params and expr_has_param(e):
            # r9: a $param :limit/:offset no longer refuses the prepared
            # skeleton — the skeleton is built WITHOUT output options
            # (engine._build_skeleton passes OutOpts()) and binding applies
            # the options from the per-call substituted parse, so the
            # deferred value is never read. None = "resolved at bind".
            return None  # type: ignore[return-value]
        v = const_eval(e)
        if not isinstance(v, int):
            raise ParseError(f"expected integer constant, got {v!r}")
        return v

    def _const_num(self) -> float:
        e = self.parse_expr()
        v = const_eval(e)
        if not isinstance(v, (int, float)):
            raise ParseError(f"expected numeric constant, got {v!r}")
        return float(v)

    def parse_table_schema(self) -> TableSchema:
        self.eat("punct", "{")
        keys = self._parse_cols(stop={"=>", "}"})
        non_keys = []
        if self.try_eat("punct", "=>"):
            non_keys = self._parse_cols(stop={"}"})
        self.eat("punct", "}")
        return TableSchema(keys, non_keys)

    def _parse_cols(self, stop: set) -> list:
        cols = []
        while not (self.peek() and self.peek().kind == "punct" and self.peek().text in stop):
            name = self._eat_var()
            typing = None
            default = None
            gen = None
            if self.try_eat("punct", ":"):
                typing = self.parse_col_type()
            if self.at("ident", "default"):
                self.eat("ident", "default")
                default = self.parse_expr()
            elif self.try_eat("punct", "="):
                gen = self._eat_var()
            cols.append(ColDef(name, typing, default, gen))
            if not self.try_eat("punct", ","):
                break
        return cols

    def parse_col_type(self) -> str:
        t = self.peek()
        if t.kind == "ident":
            self.i += 1
            base = t.text
        elif t.kind == "punct" and t.text == "[":
            self.eat("punct", "[")
            el = self.parse_col_type()
            ln = ""
            if self.try_eat("punct", ";"):
                ln = ";" + str(const_eval(self.parse_expr()))
            self.eat("punct", "]")
            base = f"[{el}{ln}]"
        elif t.kind == "punct" and t.text == "<":
            self.eat("punct", "<")
            el = self.eat("ident").text
            self.eat("punct", ";")
            n = self.eat("int").text
            self.eat("punct", ">")
            base = f"<{el};{n}>"
        elif t.kind == "punct" and t.text == "(":
            self.eat("punct", "(")
            els = []
            while not self.at("punct", ")"):
                els.append(self.parse_col_type())
                if not self.try_eat("punct", ","):
                    break
            self.eat("punct", ")")
            base = "(" + ",".join(els) + ")"
        else:
            raise ParseError(f"expected column type, got {t}")
        if self.try_eat("punct", "?"):
            base += "?"
        return base

    # -- sys scripts -----------------------------------------------------------------

    def parse_sys(self) -> dict:
        self.eat("punct", "::")
        op = self.eat("ident").text
        out: dict[str, Any] = {"sysop": op}
        if op in ("relations", "running", "compact", "fixed_rules"):
            pass
        elif op == "kill":
            out["expr"] = const_eval(self.parse_expr())
        elif op in ("columns", "indices", "describe", "show_triggers"):
            out["target"] = self.eat("ident").text
        elif op in ("remove", "rename"):
            names = []
            while self.at("ident"):
                a = self.eat("ident").text
                if op == "rename":
                    self.eat("punct", "->")
                    names.append((a, self.eat("ident").text))
                else:
                    names.append(a)
                if not self.try_eat("punct", ","):
                    break
            out["targets"] = names
        elif op == "access_level":
            out["level"] = self.eat("ident").text
            out["targets"] = [self.eat("ident").text]
            while self.try_eat("punct", ","):
                out["targets"].append(self.eat("ident").text)
        elif op == "explain":
            self.eat("punct", "{")
            inner = Parser.__new__(Parser)
            inner.toks, inner.i, inner.params = self.toks, self.i, self.params
            inner.defer_params = self.defer_params
            prog = Program()
            while not inner.at("punct", "}"):
                if inner.at("sysopt"):
                    inner.parse_option(prog.opts)
                    inner.try_eat("punct", ";")
                    continue
                inner.parse_rule_into(prog)
                inner.try_eat("punct", ";")
            self.i = inner.i
            self.eat("punct", "}")
            out["program"] = prog
        elif op == "set_triggers":
            out["target"] = self.eat("ident").text
            triggers = []
            while self.at("ident", "on"):
                self.eat("ident", "on")
                kind = self.eat("ident").text
                self.eat("punct", "{")
                depth = 1
                start = self.i
                while depth > 0:
                    tk = self.peek()
                    if tk is None:
                        raise ParseError("unterminated trigger body")
                    if tk.kind == "punct" and tk.text == "{":
                        depth += 1
                    elif tk.kind == "punct" and tk.text == "}":
                        depth -= 1
                    self.i += 1
                triggers.append((kind, self._reconstruct(start, self.i - 1)))
            out["triggers"] = triggers
        elif op in ("index", "hnsw", "fts", "lsh"):
            verb = self.eat("ident").text
            out["verb"] = verb
            # compound_or_index_ident tokenizes as one ident ('rel:idx')
            full = self.eat("ident").text
            if ":" in full:
                rel, idx = full.rsplit(":", 1)
            else:
                rel = full
                self.eat("punct", ":")
                idx = self.eat("ident").text
            out["target"] = (rel, idx)
            if verb == "create":
                self.eat("punct", "{")
                fields: dict[str, Any] = {}
                plain: list[str] = []
                while not self.at("punct", "}"):
                    nm = self._eat_var()
                    if self.try_eat("punct", ":"):
                        e = self.parse_expr()
                        if isinstance(e, Var):
                            # bare identifiers are names in index options:
                            # `extractor: v`, `tokenizer: NGram`,
                            # `fields: vec` (parse/sys.rs index option rules)
                            fields[nm] = e.name
                        elif (isinstance(e, ListEx)
                              and all(isinstance(i, Var) for i in e.items)):
                            # `fields: [a, b]` — a list of column names
                            fields[nm] = [i.name for i in e.items]
                        else:
                            try:
                                fields[nm] = const_eval(e)
                            except ParseError:
                                # expression option (e.g. lsh
                                # `extract_filter: is_null(dup_for)`) — pass
                                # the AST through for the index to compile
                                fields[nm] = e
                    else:
                        plain.append(nm)
                    if not self.try_eat("punct", ","):
                        break
                self.eat("punct", "}")
                out["fields"] = fields
                out["columns"] = plain
        else:
            raise ParseError(f"unsupported sys op ::{op}")
        return out

    def _reconstruct(self, a: int, b: int) -> str:
        """Rebuild source text from a token span (used for trigger bodies and
        imperative query blocks, which are re-parsed at execution time)."""
        parts = []
        for t in self.toks[a:b]:
            if t.kind == "string":
                parts.append('"' + t.text.replace("\\", "\\\\").replace('"', '\\"') + '"')
            else:
                parts.append(t.text)
        return " ".join(parts)

    # -- expressions --------------------------------------------------------------

    _PREC = {
        "||": 1, "&&": 2,
        "==": 3, "!=": 3, ">": 3, "<": 3, ">=": 3, "<=": 3,
        "~": 4,
        "++": 5, "+": 5, "-": 5,
        "*": 6, "/": 6, "%": 6,
        "^": 7,
        "->": 8,
    }
    _OP_FN = {
        "||": "or", "&&": "and", "==": "eq", "!=": "neq", ">": "gt", "<": "lt",
        ">=": "ge", "<=": "le", "~": "coalesce", "++": "concat_op", "+": "add",
        "-": "sub", "*": "mul", "/": "div", "%": "mod", "^": "pow",
        "->": "json_get",
    }

    def parse_expr(self, min_prec: int = 1):
        lhs = self.parse_unary()
        while True:
            t = self.peek()
            if t is None or t.kind != "punct" or t.text not in self._PREC:
                break
            prec = self._PREC[t.text]
            if prec < min_prec:
                break
            op = t.text
            self.i += 1
            # ^ is right-associative; all others left
            nxt = prec if op == "^" else prec + 1
            rhs = self.parse_expr(nxt)
            lhs = Call(self._OP_FN[op], (lhs, rhs))
        return lhs

    def parse_unary(self):
        t = self.peek()
        if t is not None and t.kind == "punct" and t.text == "-":
            self.i += 1
            inner = self.parse_unary()
            if isinstance(inner, Const) and isinstance(inner.value, (int, float)):
                return Const(-inner.value)
            return Call("minus", (inner,))
        if t is not None and t.kind == "punct" and t.text == "!":
            self.i += 1
            return Call("negate", (self.parse_unary(),))
        return self.parse_term()

    def parse_term(self):
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input in expression")
        if t.kind == "string":
            self.i += 1
            return Const(t.text)
        if t.kind == "float":
            self.i += 1
            return Const(float(t.text.replace("_", "")))
        if t.kind == "int":
            self.i += 1
            return Const(int(t.text.replace("_", "")))
        if t.kind == "hex":
            self.i += 1
            return Const(int(t.text.replace("_", ""), 16))
        if t.kind == "oct":
            self.i += 1
            return Const(int(t.text.replace("_", ""), 8))
        if t.kind == "bin":
            self.i += 1
            return Const(int(t.text.replace("_", ""), 2))
        if t.kind == "param":
            self.i += 1
            name = t.text[1:]
            if name not in self.params:
                raise ParseError(f"parameter ${name} not supplied")
            if self.defer_params:
                return Param(name)
            return Const(self.params[name])
        if t.kind == "punct" and t.text == "(":
            self.i += 1
            e = self.parse_expr()
            self.eat("punct", ")")
            return e
        if t.kind == "punct" and t.text == "[":
            self.i += 1
            items = []
            while not self.at("punct", "]"):
                items.append(self.parse_expr())
                if not self.try_eat("punct", ","):
                    break
            self.eat("punct", "]")
            return ListEx(tuple(items))
        if t.kind == "punct" and t.text == "{":
            self.i += 1
            pairs = []
            while not self.at("punct", "}"):
                k = self.parse_expr()
                self.eat("punct", ":")
                v = self.parse_expr()
                pairs.append((k, v))
                if not self.try_eat("punct", ","):
                    break
            self.eat("punct", "}")
            return ObjectEx(tuple(pairs))
        if t.kind in ("ident", "uident"):
            if t.text in _KEYWORDS_BOOL:
                self.i += 1
                return Const(_KEYWORDS_BOOL[t.text])
            if t.text == "null":
                self.i += 1
                return Const(None)
            if self.at("punct", "(", 1):
                name = t.text
                self.i += 1
                self.eat("punct", "(")
                args = []
                while not self.at("punct", ")"):
                    args.append(self.parse_expr())
                    if not self.try_eat("punct", ","):
                        break
                self.eat("punct", ")")
                return Call(name, tuple(args))
            self.i += 1
            return Var(t.text)
        raise ParseError(f"unexpected token {t} in expression")


def const_eval(e) -> Any:
    """Constant-fold an expression with no variables (fixed_rule options,
    const rules — mirrors eval_to_const, fixed_rule/mod.rs:651)."""
    if isinstance(e, Const):
        return e.value
    if isinstance(e, ListEx):
        return [const_eval(x) for x in e.items]
    if isinstance(e, ObjectEx):
        return {const_eval(k): const_eval(v) for k, v in e.pairs}
    if isinstance(e, Call):
        args = [const_eval(a) for a in e.args]
        return _const_call(e.fn, args)
    raise ParseError(f"expression is not constant: {e}")


def _const_call(fn: str, args: list) -> Any:
    import math

    table = {
        "add": lambda *a: sum(a), "sub": lambda a, b: a - b,
        "mul": lambda a, b: a * b, "div": lambda a, b: a / b,
        "minus": lambda a: -a, "pow": lambda a, b: float(a) ** b,
        "mod": lambda a, b: math.fmod(a, b) if isinstance(a, float) or isinstance(b, float) else a % b,
        "neg": lambda a: not a, "negate": lambda a: not a,
        "concat_op": lambda a, b: a + b, "concat": lambda *a: _concat_const(a),
        "list": lambda *a: list(a),
        "eq": lambda a, b: a == b, "neq": lambda a, b: a != b,
        "gt": lambda a, b: a > b, "lt": lambda a, b: a < b,
        "ge": lambda a, b: a >= b, "le": lambda a, b: a <= b,
        "and": lambda *a: all(a), "or": lambda *a: any(a),
        "coalesce": lambda *a: next((x for x in a if x is not None), None),
        "validity": lambda *a: list(a) if len(a) > 1 else [a[0], True],
        "to_int": lambda a: int(a), "to_float": lambda a: float(a),
        "to_string": lambda a: str(a),
        # vector constructors are constant-foldable (runtime/tests.rs
        # test_vec_types: `?[v] <- [[vec([1,2,3])]]`)
        "vec": lambda a, *rest: [float(x) for x in a],
        "rand_vec": lambda n: [__import__("random").random() * 2 - 1
                               for _ in range(int(n))],
        "int_range": lambda *a: list(range(*[int(x) for x in a])),
        "now": lambda: __import__("time").time(),
        "floor": lambda a: float(math.floor(a)),
        "ceil": lambda a: float(math.ceil(a)),
        "round": lambda a: float(round(a)),
        "rand_float": lambda: __import__("random").random(),
        "rand_int": lambda a, b: __import__("random").randint(int(a), int(b)),
        "rand_uuid_v1": lambda: str(__import__("uuid").uuid1()),
        "rand_uuid_v4": lambda: str(__import__("uuid").uuid4()),
    }
    if fn in table:
        return table[fn](*args)
    raise ParseError(f"function {fn} not allowed in constant expression")


def _concat_const(args):
    if all(isinstance(a, str) for a in args):
        return "".join(args)
    out = []
    for a in args:
        out.extend(a)
    return out


def parse_script(src: str, params: Optional[dict] = None,
                 defer_params: bool = False):
    return Parser(src, params, defer_params=defer_params).parse_script()
