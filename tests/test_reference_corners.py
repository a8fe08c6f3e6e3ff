"""Semantic-corner parity with the reference's runtime test suite
(cozo-core/src/runtime/tests.rs) — the behaviors most likely to silently
diverge in a re-implementation: empty aggregations, wildcard non-unification,
strict fixed-rule binding checks, column defaults, mutation arity errors."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def db(spark):
    from cozo_spark.datalog.engine import CozoDb

    return CozoDb(spark)


def rows(res):
    return sorted(tuple(r) for r in res.rows)


def test_normal_aggr_empty(db):
    # tests.rs:54-59: count over the empty stream is one row [0]
    r = db.run_script("?[count(a)] := a in []")
    assert [list(x) for x in r.rows] == [[0]]


def test_meet_aggr_empty(db):
    # tests.rs:61-72: meet aggregation over empty input is NULL; mixed with
    # a normal aggregation both appear in one row
    r = db.run_script("?[min(a)] := a in []")
    assert [list(x) for x in r.rows] == [[None]]
    r2 = db.run_script("?[min(a), count(a)] := a in []")
    assert [list(x) for x in r2.rows] == [[None, 0]]


def test_layers_multi_clause_aggregation(db):
    # tests.rs:74-91: an aggregation rule with two clauses aggregates the
    # union multiset of BOTH clauses' match streams
    r = db.run_script("""
    y[a] := a in [1,2,3]
    x[sum(a)] := y[a]
    x[sum(a)] := a in [4,5,6]
    ?[sum(a)] := x[a]
    """)
    assert float(r.rows[0][0]) == 21.0


def test_classical_grandparent(db):
    # tests.rs:123-141
    r = db.run_script("""
    parent[] <- [['joseph', 'jakob'], ['jakob', 'isaac'], ['isaac', 'abraham']]
    grandparent[gcld, gp] := parent[gcld, p], parent[p, gp]
    ?[who] := grandparent[who, 'abraham']
    """)
    assert rows(r) == [("jakob",)]


def test_do_not_unify_underscore(db):
    # tests.rs:210-244: every `_` occurrence is an independent wildcard
    r = db.run_script("""
    r1[] <- [[1, 'a'], [2, 'b']]
    r2[] <- [[2, 'B'], [3, 'C']]
    ?[l1, l2] := r1[_ , l1], r2[_ , l2]
    """)
    assert len(r.rows) == 4

    from cozo_spark.datalog.translate import QueryError
    with pytest.raises(QueryError, match="_"):
        db.run_script("?[_] := _ = 1")

    r2 = db.run_script("?[x] := x = 1, _ = 1, _ = 2")
    assert [list(x) for x in r2.rows] == [[1]]


def test_wildcard_multi_unification_keeps_multiplicity(db):
    # `_ in [..]` iterates (multiset semantics feed aggregations) but binds
    # nothing
    r = db.run_script("?[count(x)] := x = 1, _ in [1,2,3]")
    assert [list(x) for x in r.rows] == [[3]]


def test_strict_checks_for_fixed_rule_args(db):
    # tests.rs:179-208: repeated wildcards fine, repeated NAMED vars error
    r = db.run_script("r[] <- [[1, 2]]\n?[] <~ PageRank(r[_, _])")
    assert len(r.rows) == 2
    r2 = db.run_script("r[] <- [[1, 2]]\n?[] <~ PageRank(r[a, b])")
    assert len(r2.rows) == 2

    from cozo_spark.datalog.translate import QueryError
    with pytest.raises(QueryError, match="duplicate binding"):
        db.run_script("r[] <- [[1, 2]]\n?[] <~ PageRank(r[a, a])")


def test_default_columns(db):
    # tests.rs:143-161: a `default now()` key column is filled at :put time
    db.run_script(
        ":create statusd {uid: String, ts default now() => quitted: Bool, mood: String}")
    db.run_script(
        "?[uid, quitted, mood] <- [['z', true, 'x']] :put statusd {uid => quitted, mood}")
    r = db.run_script("?[uid, quitted, mood] := *statusd{uid, quitted, mood}")
    assert rows(r) == [("z", True, "x")]
    r2 = db.run_script("?[uid] := *statusd{uid, ts}, !is_null(ts)")
    assert rows(r2) == [("z",)]


def test_rm_does_not_need_all_keys_put_does(db):
    # tests.rs:163-177
    from cozo_spark.datalog.translate import QueryError

    db.run_script(":create statusr {uid => mood}")
    db.run_script("?[uid, mood] <- [[1, 2]] :put statusr {uid => mood}")
    with pytest.raises((QueryError, Exception)):
        db.run_script("?[uid, mood] <- [[2]] :put statusr {uid}")
    db.run_script("?[uid, mood] <- [[3, 2]] :rm statusr {uid => mood}")
    db.run_script("?[uid] <- [[1]] :rm statusr {uid}")
    r = db.run_script("?[uid, mood] := *statusr[uid, mood]")
    assert r.rows == []


def test_const_rule_arity_is_checked(db):
    from cozo_spark.datalog.translate import QueryError

    with pytest.raises(QueryError, match="arity"):
        db.run_script("?[a, b] <- [[1]]")
    with pytest.raises(QueryError, match="arity"):
        db.run_script("?[a] <- [[1], [2, 3]]")


def test_empty_head_keeps_rule_columns(db):
    # `?[] <~ Rule(...)` / `?[] <- ...`: all output columns pass through
    r = db.run_script("?[] <- [[1, 'x']]")
    assert [list(x) for x in r.rows] == [[1, "x"]]


def test_limit_offset_row_counts(db):
    # tests.rs:29-52 asserts exact rows from its BTree storage order; an
    # unordered :limit in our engine guarantees COUNT, not which rows
    assert len(db.run_script("?[a] := a in [5,3,1,2,4] :limit 2").rows) == 2
    assert len(db.run_script("?[a] := a in [5,3,1,2,4] :limit 2 :offset 4").rows) == 1
    assert len(db.run_script("?[a] := a in [5,3,1,2,4] :limit 2 :offset 5").rows) == 0


def test_conditions_named_access(db):
    # tests.rs:93-121
    db.run_script("?[code] <- [['a'],['b'],['c']] :create airportc {code}")
    db.run_script(
        "?[fr, to, dist] <- [['a', 'b', 1.1], ['a', 'c', 0.5], ['b', 'c', 9.1]] "
        ":create routec {fr, to => dist}")
    r = db.run_script("""
    r[code, dist] := *airportc{code}, *routec{fr: code, dist}
    ?[dist] := r['a', dist], dist > 0.5, dist <= 1.1
    """)
    assert [list(x) for x in r.rows] == [[1.1]]
