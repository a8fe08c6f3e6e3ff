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
    Call, Cond, Conj, Const, Disj, FixedApply, HeadVar, ListEx, Negation,
    RuleApply, Var,
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
    recursive rules down to the constants their callers ask for."""
    # every rule application, grouped by target, with the calling rule
    apps: dict[str, list[tuple[str, RuleApply]]] = {}
    deps: dict[str, set] = {}
    for name, clauses in clause_map.items():
        refs: list[RuleApply] = []
        for cl in clauses:
            for atom in cl.body:
                _walk_rule_refs(atom, refs)
        deps[name] = {a.name for a in refs}
        for a in refs:
            apps.setdefault(a.name, []).append((name, a))

    fixed_inputs = {
        inp.name
        for rule in prog.rules.values() if isinstance(rule, FixedApply)
        for inp in rule.inputs if getattr(inp, "kind", None) == "rule"
    }

    for r, clauses in clause_map.items():
        if not clauses or r in fixed_inputs:
            continue
        self_apps = [a for caller, a in apps.get(r, []) if caller == r]
        ext_apps = [a for caller, a in apps.get(r, []) if caller != r]
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
            # every external caller binds position i to a constant
            seeds = []
            for a in ext_apps:
                if len(a.args) != arity or not isinstance(a.args[i], Const):
                    ok = False
                    break
                seeds.append(a.args[i].value)
            if not ok or not seeds:
                continue
            uniq = list(dict.fromkeys(seeds))
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
