"""Magic-set rewrite, restricted to the linear-transmission pattern.

The reference rewrites recursive programs so the entry rule's bound constants
flow *into* the recursion (sideways information passing): magic_sets_rewrite
at cozo-core/src/query/magic.rs:55-70, adornment magic.rs:304-642, skipped
for aggregation-carrying rules (magic.rs:31-54) and via
`:disable_magic_rewrite` (cozoscript.pest:138).

We implement the sound core that covers the dominant goal-directed shape —
seeded reachability/closure:

    reach[a, b] := *edge[a, b]
    reach[a, c] := reach[a, b], *edge[b, c]
    ?[b] := reach[1, b]

Rewrite condition, per recursive rule `r` and head position `i`:

1. `r` is directly self-recursive and shares no cycle with another rule
   (its SCC is {r});
2. every clause's head[i] is a plain variable `v` (no aggregation at i), and
   every self-application in that clause passes exactly `v` at position `i`
   ("linear transmission": the value at position i is carried through the
   recursion unchanged);
3. every application of `r` from *other* rules (including under negation)
   binds position `i` to a constant, and `r` is not a fixed-rule input.

Then the set of `r`-tuples with value∈seeds at position i is closed under
the recursion — derivations of a seeded tuple only use seeded premises — so
filtering the *base* clauses to `v ∈ seeds` yields exactly the tuples the
callers can observe. Negated callers still see the complete seeded subset,
so anti-joins stay correct. At scale this is the difference between a full
transitive closure of the graph and the closure of one node's component.

Applied after DNF expansion (bodies are flat conjunctions), before
stratification; the added atom is an ordinary Cond filter, which Catalyst
pushes into the scan of the base clauses.
"""

from __future__ import annotations

from cozo_spark.datalog.ast import (
    Call, Cond, Conj, Const, Disj, FixedApply, HeadVar, ListEx, NamedRelApply,
    Negation, RelApply, RuleApply, RuleClause, Unify, expr_vars,
    Var,
)


def _walk_rule_refs(atom, out: list) -> None:
    if isinstance(atom, RuleApply):
        out.append(atom)
    elif isinstance(atom, Negation):
        _walk_rule_refs(atom.atom, out)
    elif isinstance(atom, Conj):
        for a in atom.atoms:
            _walk_rule_refs(a, out)
    elif isinstance(atom, Disj):
        for b in atom.branches:
            _walk_rule_refs(b, out)


def _reaches(start: str, goal: str, deps: dict) -> bool:
    seen, stack = set(), [start]
    while stack:
        n = stack.pop()
        if n == goal:
            return True
        if n in seen:
            continue
        seen.add(n)
        stack.extend(deps.get(n, ()))
    return False


def magic_restrict(prog, clause_map: dict) -> None:
    """Mutate clause_map in place: filter base clauses of qualifying
    recursive rules down to the constants their callers ask for.

    Records the set of restricted rule names on ``prog.magic_restricted``
    so the recursive evaluator can tell that an SCC's fixpoint is
    seed-bounded: its per-epoch deltas are O(reachable-from-seed), so
    the full static relations it scans must NOT be materialized up front
    (r12 — a magic-seeded recursion over a 100 TB edge relation touches
    only the seed's slice; an eager full-relation checkpoint would undo
    the entire point of the rewrite)."""
    # every rule application, grouped by target, with the calling rule
    apps: dict[str, list[tuple[str, RuleApply, RuleClause]]] = {}
    deps: dict[str, set] = {}
    for name, clauses in clause_map.items():
        all_refs: list[RuleApply] = []
        for cl in clauses:
            refs: list[RuleApply] = []
            for atom in cl.body:
                _walk_rule_refs(atom, refs)
            all_refs.extend(refs)
            for a in refs:
                apps.setdefault(a.name, []).append((name, a, cl))
        deps[name] = {a.name for a in all_refs}

    fixed_inputs = {
        inp.name
        for rule in prog.rules.values() if isinstance(rule, FixedApply)
        for inp in rule.inputs if getattr(inp, "kind", None) == "rule"
    }

    restricted_rules: set = set()
    prog.magic_restricted = restricted_rules

    for r, clauses in list(clause_map.items()):
        if not clauses or r in fixed_inputs or r.startswith("__magic_"):
            continue
        self_apps = [a for caller, a, _cl in apps.get(r, []) if caller == r]
        ext_apps = [(a, cl) for caller, a, cl in apps.get(r, []) if caller != r]
        if not self_apps or not ext_apps:
            continue  # not recursive, or never consumed
        # SCC must be exactly {r}: no other rule r reaches also reaches back
        if any(_reaches(s, r, deps) for s in deps.get(r, ()) if s != r):
            continue
        arity = len(clauses[0].head)
        for i in range(arity):
            head_vars = []
            ok = True
            for cl in clauses:
                h = cl.head[i] if i < len(cl.head) else None
                if not isinstance(h, HeadVar):
                    ok = False
                    break
                head_vars.append(h.name)
            if not ok:
                continue
            # linear transmission through every self-application
            for cl, hv in zip(clauses, head_vars):
                refs: list[RuleApply] = []
                for atom in cl.body:
                    _walk_rule_refs(atom, refs)
                for a in refs:
                    if a.name == r and (len(a.args) != arity
                                        or a.args[i] != Var(hv)):
                        ok = False
                        break
                if not ok:
                    break
            if not ok:
                continue
            # every external caller binds position i to a constant OR a
            # variable provably bound by r-independent atoms of its clause
            # (the classic magic set with variable seeds — sideways
            # information passing): seeds = union of the constants and the
            # r-independent projections
            seeds: list = []
            magic_bodies: list = []
            for a, caller_cl in ext_apps:
                if len(a.args) != arity:
                    ok = False
                    break
                arg = a.args[i]
                if isinstance(arg, Const):
                    seeds.append(arg.value)
                elif isinstance(arg, Var) and arg.name != "_":
                    body = _magic_seed_body(caller_cl, r, deps, arg.name)
                    if body is None:
                        ok = False
                        break
                    magic_bodies.append((arg.name, body))
                else:
                    ok = False
                    break
            if not ok or not (seeds or magic_bodies):
                continue
            uniq = list(dict.fromkeys(seeds))
            if magic_bodies:
                # materialize the seed set as a helper rule evaluated before
                # r (it depends only on r-independent atoms); base clauses of
                # r semi-join it — the variable-seed analogue of the constant
                # filter below. Over-approximate seed sets are sound (supersets
                # only admit extra tuples the callers never observe).
                mname = f"__magic_{r}_{i}"
                mclauses = [
                    RuleClause([HeadVar(v)], list(body))
                    for v, body in magic_bodies
                ]
                for s in uniq:
                    mv = f"__mv_{i}"
                    mclauses.append(RuleClause(
                        [HeadVar(mv)], [Unify(mv, Const(s))]))
                clause_map[mname] = mclauses
                prog.rules[mname] = mclauses
                for cl, hv in zip(clauses, head_vars):
                    refs = []
                    for atom in cl.body:
                        _walk_rule_refs(atom, refs)
                    if any(a.name == r for a in refs):
                        continue  # recursive clause: restriction flows through
                    cl.body.append(RuleApply(mname, (Var(hv),)))
                restricted_rules.add(r)
                continue
            for cl, hv in zip(clauses, head_vars):
                refs = []
                for atom in cl.body:
                    _walk_rule_refs(atom, refs)
                if any(a.name == r for a in refs):
                    continue  # recursive clause: restriction flows through
                if len(uniq) == 1:
                    cond = Cond(Call("eq", (Var(hv), Const(uniq[0]))))
                else:
                    cond = Cond(Call("is_in", (
                        Var(hv), ListEx(tuple(Const(s) for s in uniq)))))
                cl.body.append(cond)
                restricted_rules.add(r)


def _atom_outputs(atom) -> set:
    if isinstance(atom, (RuleApply, RelApply)):
        return {x.name for x in atom.args if isinstance(x, Var) and x.name != "_"}
    if isinstance(atom, NamedRelApply):
        out = set()
        for col, e in atom.pairs.items():
            if e is None:
                out.add(col)
            elif isinstance(e, Var) and e.name != "_":
                out.add(e.name)
        return out
    if isinstance(atom, Unify):
        return {atom.var} if atom.var != "_" else set()
    return set()


def _atom_needs(atom) -> set:
    if isinstance(atom, Unify):
        return expr_vars(atom.expr)
    return set()  # positional/named args are vars or consts post-parse


def _magic_seed_body(caller_cl: RuleClause, r: str, deps: dict,
                     var: str) -> list | None:
    """Build the body of a magic-seed rule: the subset of the caller
    clause's atoms that (a) do not depend on `r` (directly or through other
    rules) and (b) form a bindable conjunction that binds `var`. Dropping
    filters/negations only widens the seed set — sound. Returns None when
    `var` cannot be bound r-independently."""
    candidates = []
    for atom in caller_cl.body:
        if isinstance(atom, (Cond, Negation, Conj, Disj)):
            continue  # restrictive-only (or compound) — droppable
        if not isinstance(atom, (RuleApply, RelApply, NamedRelApply, Unify)):
            continue  # search atoms etc.: engine-context-bound, droppable
        refs: list = []
        _walk_rule_refs(atom, refs)
        if any(a.name == r or _reaches(a.name, r, deps) for a in refs):
            continue
        if getattr(atom, "validity", None) is not None:
            continue  # as-of reads: keep the rewrite conservative
        candidates.append(atom)
    # greedy consume loop mirroring the translator's safety ordering
    retained: list = []
    bound: set = set()
    progress = True
    while progress and candidates:
        progress = False
        for idx, atom in enumerate(candidates):
            if _atom_needs(atom) <= bound:
                retained.append(atom)
                bound |= _atom_outputs(atom)
                candidates.pop(idx)
                progress = True
                break
    if var not in bound:
        return None
    return retained
