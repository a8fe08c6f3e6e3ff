"""Imperative-script (%-program) differential fuzz: random programs built
from put/rm blocks, %if/%if_not conditionals (truthiness = last query
non-empty, imperative.rs:35-64), and bounded %loop/%break, executed against
a Python interpreter model of the same semantics.

The imperative surface is otherwise example-tested; control-flow
composition (nesting, else-branches, loop counters) is where generated
programs earn their keep.
"""

from __future__ import annotations

import random

import pytest


class _Model:
    def __init__(self):
        self.st: dict = {}

    def put(self, k, v):
        self.st[k] = v

    def rm(self, k):
        self.st.pop(k, None)

    def cond(self, thresh):
        return any(v > thresh for v in self.st.values())


def _gen_block(rnd, depth, counter_name):
    """Returns (script_text, apply_fn(model))."""
    roll = rnd.random()
    if depth >= 2 or roll < 0.45:
        if rnd.random() < 0.7:
            k, v = rnd.randint(0, 5), rnd.randint(0, 50)
            return (f"{{ ?[k, v] <- [[{k}, {v}]] :put st {{k => v}} }}",
                    lambda m, k=k, v=v: m.put(k, v))
        k = rnd.randint(0, 5)
        return (f"{{ ?[k] <- [[{k}]] :rm st {{k}} }}",
                lambda m, k=k: m.rm(k))
    if roll < 0.8:
        neg = rnd.random() < 0.5
        thresh = rnd.randint(0, 50)
        then_s, then_f = _gen_block(rnd, depth + 1, counter_name)
        else_s, else_f = _gen_block(rnd, depth + 1, counter_name)
        kw = "%if_not" if neg else "%if"
        script = (f"{kw} {{ ?[k] := *st[k, v], v > {thresh} }}\n"
                  f"%then {{ {then_s} }}\n%else {{ {else_s} }}\n%end")

        def apply(m, neg=neg, thresh=thresh, then_f=then_f, else_f=else_f):
            hit = m.cond(thresh)
            if neg:
                hit = not hit
            (then_f if hit else else_f)(m)
        return script, apply
    # bounded loop: run body n times via a dedicated counter key (1000 - i);
    # half the loops keep the counter in a TEMP relation (exercises the
    # placeholder-schema adoption + lazy temp writes inside %loop)
    n = rnd.randint(1, 3)
    ck = counter_name[0]
    counter_name[0] += 1
    key = 1000 + ck
    body_s, body_f = _gen_block(rnd, depth + 1, counter_name)
    if rnd.random() < 0.5:
        rel, spec = "loopc", "{k => v}"
    else:
        rel, spec = f"_lc{ck}", "{k => v}"
    script = (
        (f"{{ :create {rel} {{k => v}} }}\n" if rel.startswith("_") else "")
        + f"{{ ?[k, v] <- [[{key}, 0]] :put {rel} {spec} }}\n"
        f"%loop\n"
        f"  %if {{ ?[v] := *{rel}[{key}, v], v >= {n} }}\n"
        f"  %then {{ %break }}\n"
        f"  %end\n"
        f"  {body_s}\n"
        f"  {{ cur[ov] := *{rel}[{key}, ov]\n"
        f"     ?[k, v] := cur[ov], k = {key}, v = ov + 1 "
        f":put {rel} {spec} }}\n"
        f"%end"
    )

    def apply(m, n=n, body_f=body_f):
        for _ in range(n):
            body_f(m)
    return script, apply


def test_imperative_labeled_break_and_swap(spark):
    """%mark-labeled loops with a labeled %break escaping the inner loop
    pair, plus %swap of two temp relations observed by a later block."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    r = db.run_script("""
    { ?[x] <- [[1]] } as _a
    { ?[x] <- [[2]] } as _b
    %swap _a _b
    { ?[x] := *_a[x] }
    """)
    assert r.rows == [[2]]

    db.run_script(":create hits {k: Int => v: Int}")
    # outer labeled loop; inner loop breaks OUT of the outer via the label
    # after one body execution — exactly one :put lands
    db.run_script("""
    %mark outer %loop
        %loop
            { ?[k, v] <- [[1, 10]] :put hits {k => v} }
            %break outer
        %end
        { ?[k, v] <- [[2, 20]] :put hits {k => v} }
    %end
    """)
    got = {r[0]: r[1] for r in db.run_script("?[k, v] := *hits{k, v}").rows}
    assert got == {1: 10}


def test_imperative_return_multiple(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    res = db.run_script("""
    { ?[x] <- [[1]] } as _r1
    %return _r1, { ?[y] <- [[7], [8]] }
    """)
    assert isinstance(res, list) and len(res) == 2
    assert res[0].rows == [[1]]
    assert sorted(res[1].rows) == [[7], [8]]


@pytest.mark.parametrize("seed", [21, 212])
def test_fuzz_imperative_vs_model(spark, seed):
    from cozo_spark.datalog.engine import CozoDb

    rnd = random.Random(seed)
    db = CozoDb(spark)
    db.run_script(":create st {k: Int => v: Int}")
    db.run_script(":create loopc {k: Int => v: Int}")
    model = _Model()
    counter_name = [0]

    for case in range(6):
        blocks = [_gen_block(rnd, 0, counter_name)
                  for _ in range(rnd.randint(1, 3))]
        script = "\n".join(b[0] for b in blocks)
        db.run_script(script)
        for _, f in blocks:
            f(model)
        got = {r[0]: r[1] for r in
               db.run_script("?[k, v] := *st{k, v}").rows}
        assert got == model.st, (case, script, got, model.st)
