"""Prepared-statement plan skeletons (engine._run_prepared).

A $param-ized script compiles its param-free skeleton once; subsequent
calls with NEW values bind via residual `where` conditions instead of
re-translating (reference parity: runtime/db.rs run_script re-compiles per
call — we do the work once). These tests pin:
- skeleton reuse across different param values (the r5 VERDICT directive's
  "Done" criterion) with results identical to literal-inlined scripts,
- soundness gates (aggregation heads, params in negation/unify/:limit fall
  back to the per-value path),
- invalidation on relation mutation,
- pushdown: the bound literal still reaches the parquet scan.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _db(spark, tables=("customer", "orders")):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    for t in tables:
        db.register_dataframe(t, spark.read.parquet(f"{SF_SMALL}/{t}.parquet"))
    return db


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


SCRIPT = """
?[name, total] := *customer{c_custkey: $id, c_name: name},
                  *orders{o_custkey: $id, o_totalprice: total},
                  total > $lo
:sort -total
:limit 5
"""


def _literal(db, script, subs):
    s = script
    for k, v in subs.items():
        s = s.replace(f"${k}", repr(v) if isinstance(v, str) else str(v))
    return _rows(db.run_script_df(s))


def test_skeleton_reused_across_values(spark, monkeypatch):
    from cozo_spark.datalog.engine import CozoDb

    db = _db(spark)
    builds = []
    orig = CozoDb._build_skeleton

    def spy(self, script, params):
        builds.append(script)
        return orig(self, script, params)

    monkeypatch.setattr(CozoDb, "_build_skeleton", spy)
    for v, lo in ((1, 100.0), (4, 50.0), (10, 0.0)):
        got = _rows(db.run_script_df(SCRIPT, {"id": v, "lo": lo}))
        want = _literal(db, SCRIPT, {"id": v, "lo": lo})
        assert got == want, f"id={v}"
    # one skeleton build serves every subsequent value: the 2nd/3rd calls
    # must be binds, not recompiles
    assert len(builds) == 1


def test_positional_and_rule_atom_params(spark):
    db = _db(spark, ("customer",))
    script = """
    named[k, n] := *customer{c_custkey: k, c_name: n}
    ?[n] := named[$id, n]
    """
    for v in (2, 7):
        got = _rows(db.run_script_df(script, {"id": v}))
        want = _literal(db, script, {"id": v})
        assert got == want
    # positional stored-relation args go through the same rewrite
    db2 = _db(spark, ("nation",))
    pos = "?[b] := *nation[$a, b, c]"
    for v in (0, 3):
        assert _rows(db2.run_script_df(pos, {"a": v})) == \
            _literal(db2, pos, {"a": v})


@pytest.mark.parametrize("script,params", [
    # (aggregation heads became ELIGIBLE in r7 — the skeleton is the raw
    # pre-aggregation stream and the filter binds before aggregate_head;
    # see tests/test_prepared_agg.py)
    # (param inside a negated atom became a PREFIX-template bind in r11 —
    # the param-free *customer scan + filter prefix caches and the
    # per-call negation joins on top; see
    # test_prefix_template_negated_entry below)
    # (`:limit $n` became ELIGIBLE in r9 — the skeleton is built without
    # output options and binding applies the per-call parse's limit; see
    # test_limit_param_prepared below)
    # param nested inside an expression used as a column binding: the
    # param sits in the FIRST (and only) atom — no clean prefix exists
    ("?[n] := *customer{c_custkey: $id + 1, c_name: n}", {"id": 2}),
])
def test_ineligible_shapes_still_correct(spark, script, params):
    from cozo_spark.datalog.engine import CozoDb

    db = _db(spark)
    got = _rows(db.run_script_df(script, params))
    want = _literal(db, script, params)
    assert got == want
    assert db._skel_key(script, params) not in CozoDb._skel_cache


def test_prefix_template_negated_entry(spark):
    """r11 prefix template: a param inside a negated atom no longer
    refuses — the clean prefix (*customer scan + k < 8) caches as a
    store and the per-call negation anti-joins on top. Correctness
    pinned across values; the cached entry must be a prefix repl."""
    from cozo_spark.datalog.engine import CozoDb

    db = _db(spark)
    script = ("?[k] := *customer{c_custkey: k}, k < 8, "
              "not *orders{o_custkey: k, o_totalprice: $t}")
    for t in (1.0, 100000.0, 57586.58):
        got = _rows(db.run_script_df(script, {"t": t}))
        want = _literal(db, script, {"t": t})
        assert got == want, t
    ent = CozoDb._skel_cache.get(db._skel_key(script, {"t": 1.0}))
    assert ent is not None and ent.get("template")
    pr = [p for p in ent["repls"] if p.get("prefix_len")]
    assert pr and pr[0]["prefix_len"] == 2 and pr[0]["slot_args"] == ("k",)


def test_limit_param_prepared(spark, monkeypatch):
    """`:limit $n` / `:offset $n` bind from the cached skeleton (r9): the
    skeleton carries no output options, so the per-call parse's limit
    applies at bind time — different n values share one skeleton."""
    from cozo_spark.datalog.engine import CozoDb

    db = _db(spark, ("customer",))
    builds = []
    orig = CozoDb._build_skeleton

    def spy(self, script, params):
        builds.append(script)
        return orig(self, script, params)

    monkeypatch.setattr(CozoDb, "_build_skeleton", spy)
    s = "?[k] := *customer{c_custkey: k}, k > $lo\n:sort k\n:limit $n"
    for lo, n in ((0, 3), (5, 7), (0, 1)):
        got = _rows(db.run_script_df(s, {"lo": lo, "n": n}))
        assert got == _literal(db, s, {"lo": lo, "n": n}), (lo, n)
        assert len(got) == n
    assert len(builds) == 1
    s2 = "?[k] := *customer{c_custkey: k}\n:sort k\n:limit $n\n:offset $o"
    for n, o in ((4, 2), (2, 10)):
        assert _rows(db.run_script_df(s2, {"n": n, "o": o})) == \
            _literal(db, s2, {"n": n, "o": o})
    assert len(builds) == 2


def test_mutation_invalidates_skeleton(spark):
    db = _db(spark, ())
    db.run_script("""?[k, v] <- [[1, 'a'], [2, 'b']] :create kv {k => v}""")
    q = "?[v] := *kv{k: $k, v}"
    assert _rows(db.run_script_df(q, {"k": 1})) == [("a",)]
    db.run_script("""?[k, v] <- [[1, 'z']] :put kv {k => v}""")
    assert _rows(db.run_script_df(q, {"k": 1})) == [("z",)]


def test_bound_literal_pushed_to_scan(spark):
    db = _db(spark, ("customer",))
    q = "?[n] := *customer{c_custkey: $id, c_name: n}"
    db.run_script_df(q, {"id": 3}).collect()
    df = db.run_script_df(q, {"id": 41})          # bind path
    assert _rows(df) == _literal(db, q, {"id": 41})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    import re
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "41" in pushed, pushed


def test_repeated_value_hits_exact_cache(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = _db(spark, ("customer",))
    q = "?[n] := *customer{c_custkey: $id, c_name: n}"
    a = db.run_script_df(q, {"id": 5})
    b = db.run_script_df(q, {"id": 5})
    assert a is b  # exact per-value cache serves the same lazy plan
    assert _rows(b) == _literal(db, q, {"id": 5})
