"""Datalog engine tests, modeled on the reference's suites
(cozo-core/src/runtime/tests.rs and tests/air_routes.rs shapes)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def db(spark):
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create edge {fr: Int, to: Int}")
    d.run_script("?[fr, to] <- [[1, 2], [2, 3], [3, 4], [2, 5]] :put edge {fr, to}")
    return d


def rows(res):
    return sorted(tuple(r) for r in res.rows)


def test_const_rule(db):
    r = db.run_script("?[a, b] <- [[1, 'x'], [2, 'y']]")
    assert rows(r) == [(1, "x"), (2, "y")]


def test_filter_expr(db):
    r = db.run_script("?[a, b] := *edge[a, b], a > 1, b < 5")
    assert rows(r) == [(2, 3), (3, 4)]


def test_unify_and_arith(db):
    r = db.run_script("?[a, c] := *edge[a, b], c = b * 10 + a")
    assert rows(r) == [(1, 21), (2, 32), (2, 52), (3, 43)]


def test_unify_multi_explode(db):
    r = db.run_script("?[x] := y in [1, 2, 3], x = y * y")
    assert rows(r) == [(1,), (4,), (9,)]


def test_join_two_atoms(db):
    r = db.run_script("?[a, c] := *edge[a, b], *edge[b, c]")
    assert rows(r) == [(1, 3), (1, 5), (2, 4)]


def test_negation(db):
    # nodes with outgoing but no incoming edge
    r = db.run_script("?[a] := *edge[a, _], not *edge[_, a]")
    assert rows(r) == [(1,)]


def test_disjunction(db):
    r = db.run_script("?[a, b] := *edge[a, b], (a == 1 or b == 4)")
    assert rows(r) == [(1, 2), (3, 4)]


def test_parenthesized_expr_disjunction(db):
    # `(e1 && e2) || (e3 && e4)` as ONE expression atom — the parenthesized
    # group is the left operand of ||, not a grouped rule body (the
    # reference's PEG backtracks to the expr alternative)
    r = db.run_script(
        "?[a, b] := *edge[a, b], (a == 1 && b == 2) || (a == 2 && b == 5)")
    assert rows(r) == [(1, 2), (2, 5)]


def test_negated_conjunction_de_morgan(db):
    # ¬(A ∧ B) → ¬A ∨ ¬B (NNF pushdown, reference logical.rs:93-107)
    r = db.run_script("?[a, b] := *edge[a, b], not (a > 1, b < 5)")
    assert rows(r) == [(1, 2), (2, 5)]


def test_negated_conjunction_of_atoms(db):
    # both conjuncts are relation atoms over bound vars; the NNF rewrite
    # splits the clause into two anti-join clauses whose union is the answer
    r = db.run_script("?[a, b] := *edge[a, b], not (*edge[_, a], *edge[b, _])")
    assert rows(r) == [(1, 2), (2, 5), (3, 4)]


def test_negated_disjunction(db):
    # ¬(A ∨ B) → ¬A ∧ ¬B
    r = db.run_script("?[a, b] := *edge[a, b], not (a == 1 or b == 4)")
    assert rows(r) == [(2, 3), (2, 5)]


def test_double_negation(db):
    r = db.run_script("?[a, b] := *edge[a, b], not not a == 1")
    assert rows(r) == [(1, 2)]


def test_multi_clause_union(db):
    r = db.run_script("""
    r[a, b] := *edge[a, b], a == 1
    r[a, b] := *edge[a, b], b == 4
    ?[a, b] := r[a, b]
    """)
    assert rows(r) == [(1, 2), (3, 4)]


def test_aggregation_count_sum(db):
    r = db.run_script("?[a, count(b), sum(b)] := *edge[a, b]")
    assert rows(r) == [(1, 1, 2.0), (2, 2, 8.0), (3, 1, 4.0)]


def test_aggregation_no_keys(db):
    r = db.run_script("?[count(a), max(b), min(b)] := *edge[a, b]")
    assert rows(r) == [(4, 5, 2)]


def test_order_limit_offset(db):
    r = db.run_script("?[a, b] := *edge[a, b] :order -a, b :limit 2")
    assert [tuple(x) for x in r.rows] == [(3, 4), (2, 3)]
    r2 = db.run_script("?[a, b] := *edge[a, b] :order a, b :offset 1 :limit 2")
    assert [tuple(x) for x in r2.rows] == [(2, 3), (2, 5)]


def test_recursion_transitive_closure(db):
    r = db.run_script("""
    reach[a, b] := *edge[a, b]
    reach[a, c] := reach[a, b], *edge[b, c]
    ?[a, b] := reach[a, b]
    """)
    assert rows(r) == [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5), (3, 4)]


def test_recursion_meet_min(db):
    # shortest hop counts via meet-min aggregation inside recursion
    r = db.run_script("""
    sp[b, min(d)] := *edge[1, b], d = 1
    sp[c, min(d)] := sp[b, d1], *edge[b, c], d = d1 + 1
    ?[b, d] := sp[b, d]
    """)
    assert rows(r) == [(2, 1), (3, 2), (4, 3), (5, 2)]


def test_mutual_recursion(db):
    r = db.run_script("""
    even[x] := x = 0
    even[x] := odd[y], x = y + 1, x <= 6
    odd[x] := even[y], x = y + 1, x <= 6
    ?[x] := even[x]
    """)
    assert rows(r) == [(0,), (2,), (4,), (6,)]


def test_stratified_negation_rules(db):
    r = db.run_script("""
    reach[a, b] := *edge[a, b]
    reach[a, c] := reach[a, b], *edge[b, c]
    unreachable[a, b] := *edge[a, _], *edge[_, b], not reach[a, b]
    ?[a, b] := unreachable[a, b]
    """)
    assert (2, 2) in rows(r)


def test_negation_cycle_rejected(db):
    from cozo_spark.datalog.translate import QueryError

    with pytest.raises(QueryError, match="unstratifiable"):
        db.run_script("""
        p[x] := *edge[x, _], not q[x]
        q[x] := *edge[x, _], not p[x]
        ?[x] := p[x]
        """)


def test_string_functions(db):
    r = db.run_script("""
    ?[u, l, n] := x = 'Hello', u = uppercase(x), l = lowercase(x), n = length(x)
    """)
    assert rows(r) == [("HELLO", "hello", 5)]


def test_list_functions(db):
    r = db.run_script("""
    ?[s, f, l, srt] := lst = [3, 1, 2], s = length(lst), f = first(lst),
                       l = last(lst), srt = sorted(lst)
    """)
    # length() on an array: Spark size via list path
    assert r.rows[0][1] == 3 and r.rows[0][2] == 2 and r.rows[0][3] == [1, 2, 3]


def test_params():
    pass  # covered in test_params_sub below


def test_params_sub(db):
    r = db.run_script("?[a, b] := *edge[a, b], a == $target", params={"target": 2})
    assert rows(r) == [(2, 3), (2, 5)]


def test_create_put_rm_update(spark):
    from cozo_spark.datalog.engine import CozoDb

    db2 = CozoDb(spark)
    db2.run_script(":create kv {k: String => v: Int}")
    db2.run_script("?[k, v] <- [['a', 1], ['b', 2]] :put kv {k => v}")
    r = db2.run_script("?[k, v] := *kv[k, v]")
    assert rows(r) == [("a", 1), ("b", 2)]
    # upsert by key
    db2.run_script("?[k, v] <- [['a', 10]] :put kv {k => v}")
    r = db2.run_script("?[k, v] := *kv[k, v]")
    assert rows(r) == [("a", 10), ("b", 2)]
    # rm by key
    db2.run_script("?[k] <- [['b']] :rm kv {k}")
    r = db2.run_script("?[k, v] := *kv[k, v]")
    assert rows(r) == [("a", 10)]


def test_named_relation_access(db):
    r = db.run_script("?[x] := *edge{fr: 1, to: x}")
    assert rows(r) == [(2,)]
    r2 = db.run_script("?[fr, to] := *edge{fr, to}, fr == 3")
    assert rows(r2) == [(3, 4)]


def test_fixed_rule_pagerank(db):
    r = db.run_script("""
    ?[node, rank] <~ PageRank(*edge[])
    """)
    assert len(r.rows) == 5  # nodes 1..5
    ranks = {int(n): v for n, v in r.rows}
    assert ranks[4] > ranks[1]  # sink gets more rank than source


def test_fixed_rule_degree(db):
    r = db.run_script("?[node, total, outd, ind] <~ DegreeCentrality(*edge[])")
    d = {n: (t, o, i) for n, t, o, i in r.rows}
    assert d[2] == (3, 2, 1)


def test_sysops(db):
    r = db.run_script("::relations")
    assert any(row[0] == "edge" for row in r.rows)
    r2 = db.run_script("::columns edge")
    assert [row[0] for row in r2.rows] == ["fr", "to"]


def test_assert_options(db):
    db.run_script("?[a] := *edge[a, _], a > 100 :assert none")
    db.run_script("?[a] := *edge[a, _] :assert some")


def test_imperative_loop(spark):
    from cozo_spark.datalog.engine import CozoDb

    db3 = CozoDb(spark)
    db3.run_script(":create counter {k: String => n: Int}")
    db3.run_script("?[k, n] <- [['x', 0]] :put counter {k => n}")
    res = db3.run_script("""
    %loop
        %if { ?[n] := *counter['x', n], n >= 3 }
            %then %break
        %end
        { ?[k, n] := *counter[k, m], k == 'x', n = m + 1 :put counter {k => n} }
    %end
    %return { ?[n] := *counter['x', n] }
    """)
    assert res.rows == [[3]]


def test_validity_asof(spark):
    from cozo_spark.datalog.engine import CozoDb

    db4 = CozoDb(spark)
    db4.run_script(":create hist {k: String, vld: Validity => v: Int}")
    # validity struct literals: [ts_us, is_assert]
    db4.run_script("""
    ?[k, vld, v] <- [['a', [100, true], 1], ['a', [200, true], 2],
                     ['a', [300, false], 0], ['b', [150, true], 7]]
    :put hist {k, vld => v}
    """)
    r = db4.run_script("?[k, v] := *hist{k, v @ 250}")
    assert rows(r) == [("a", 2), ("b", 7)]
    r2 = db4.run_script("?[k, v] := *hist{k, v @ 350}")
    assert rows(r2) == [("b", 7)]
    r3 = db4.run_script("?[k, v] := *hist{k, v @ 120}")
    assert rows(r3) == [("a", 1)]


def test_limit_early_exit_stops_fixpoint(spark):
    """QueryLimiter parity (eval.rs:33-61, db.rs:1529-1539): an unordered
    :limit query over a recursive rule stops the fixpoint as soon as the
    entry rule can serve limit+offset rows — a 60-deep chain must not run
    60 epochs for :limit 2."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create chain {fr: Int, to: Int}")
    edges = [[i, i + 1] for i in range(60)]
    d.run_script(f"?[fr, to] <- {edges} :put chain {{fr, to}}")

    r = d.run_script(
        "reach[a, b] := *chain[a, b]\n"
        "reach[a, c] := reach[a, b], *chain[b, c]\n"
        "?[a, b] := reach[a, b]\n"
        ":limit 2")
    assert len(r.rows) == 2
    assert d._last_fixpoint_epochs < 10

    # ordered query must NOT early-exit (needs the full closure to sort)
    r = d.run_script(
        "reach[a, b] := *chain[a, b]\n"
        "reach[a, c] := reach[a, b], *chain[b, c]\n"
        "?[a, b] := reach[a, b]\n"
        ":order -b :limit 1")
    assert r.rows[0][1] == 60  # max b only reachable after the full closure
    assert d._last_fixpoint_epochs >= 59


def test_magic_rewrite_goal_directed_recursion(spark):
    """Magic-set restriction (magic.rs:55-642, linear-transmission core):
    `?[b] := reach[1, b]` must explore only node 1's component — a big
    disconnected chain elsewhere must not extend the fixpoint."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create medge {fr: Int, to: Int}")
    comp_a = [[1, 2], [2, 3], [3, 4]]
    comp_b = [[i, i + 1] for i in range(100, 140)]  # long chain, unrelated
    d.run_script(f"?[fr, to] <- {comp_a + comp_b} :put medge {{fr, to}}")

    script = (
        "reach[a, b] := *medge[a, b]\n"
        "reach[a, c] := reach[a, b], *medge[b, c]\n"
        "?[b] := reach[1, b]")
    r = d.run_script(script)
    assert rows(r) == [(2,), (3,), (4,)]
    assert d._last_fixpoint_epochs <= 5  # comp_b's 40-deep chain not explored

    r2 = d.run_script(script + "\n:disable_magic_rewrite true")
    assert rows(r2) == [(2,), (3,), (4,)]
    assert d._last_fixpoint_epochs >= 39  # full closure without the rewrite


def test_magic_rewrite_skips_unbound_and_negated_callers(spark):
    """No rewrite when any caller binds the position to a variable; negated
    constant callers still see the complete seeded subset."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create nedge {fr: Int, to: Int}")
    d.run_script("?[fr, to] <- [[1, 2], [2, 3], [5, 6]] :put nedge {fr, to}")

    # var-bound caller alongside const caller → rewrite must not fire
    r = d.run_script(
        "reach[a, b] := *nedge[a, b]\n"
        "reach[a, c] := reach[a, b], *nedge[b, c]\n"
        "all_src[a] := reach[a, _b]\n"
        "?[a] := all_src[a], not reach[5, a]")
    assert rows(r) == [(1,), (2,), (5,)]  # reach[5,·]={6}: nothing excluded

    # pure negated-const caller: anti-join over the seeded subset
    r2 = d.run_script(
        "reach[a, b] := *nedge[a, b]\n"
        "reach[a, c] := reach[a, b], *nedge[b, c]\n"
        "?[x] := x in [2, 3, 6], not reach[1, x]")
    assert rows(r2) == [(6,)]


def test_magic_rewrite_composes_with_limit_early_exit(spark):
    """Seeded recursion + :limit — the magic restriction narrows the frontier
    to the seed's component AND the limiter stops the fixpoint early."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create cedge {fr: Int, to: Int}")
    comp_a = [[1, i + 1] for i in range(1, 30)]      # star: 1 -> 2..30 (depth 1)
    comp_b = [[i, i + 1] for i in range(100, 160)]   # 60-deep chain elsewhere
    d.run_script(f"?[fr, to] <- {comp_a + comp_b} :put cedge {{fr, to}}")

    r = d.run_script(
        "reach[a, b] := *cedge[a, b]\n"
        "reach[a, c] := reach[a, b], *cedge[b, c]\n"
        "?[b] := reach[1, b]\n"
        ":limit 3")
    assert len(r.rows) == 3
    assert all(2 <= b <= 30 for (b,) in r.rows)  # only component-A nodes
    assert d._last_fixpoint_epochs <= 3


def test_mixed_int_float_const_coerces(spark):
    """Mixed Int/Float constant columns unify to Float (documented
    divergence from the reference's distinct-value ordering,
    value.rs:575-598 — a single-typed column can't hold both)."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    r = d.run_script("?[x] <- [[1], [1.5], [2]]")
    assert rows(r) == [(1.0,), (1.5,), (2.0,)]
    r2 = d.run_script("?[x, v] <- [[1, [1, 2.5]], [2, [3, 4]]]")
    assert rows(r2) == [(1, [1.0, 2.5]), (2, [3.0, 4.0])]


def test_entry_in_body_is_parse_error(spark):
    """'?' in a body atom is grammar-illegal CozoScript: the reference
    grammar (cozoscript.pest:86 rule_apply = underscore_ident ~ ...;
    prog_entry '?' legal only in rule_head, line 72) rejects it, so our
    parser must too. This also means '?' can never join a recursive SCC,
    which is why the engine has no '?-in-SCC' early-exit branch."""
    import pytest

    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.datalog.parser import ParseError

    d = CozoDb(spark)
    d.run_script(":create wedge2 {fr: Int, to: Int => w: Int}")
    d.run_script("?[fr, to, w] <- [[1, 2, 10], [1, 3, 1], [3, 2, 1]] "
                 ":put wedge2 {fr, to => w}")
    with pytest.raises(ParseError):
        d.run_script("""
        sp[n, min(d)] := *wedge2[1, n, w], d = w
        sp[n, min(d)] := ?[m, d0], *wedge2[m, n, w], d = d0 + w
        ?[n, d] := sp[n, d]
        :limit 3
        """)


def test_limit_no_early_exit_with_meet_dep(spark):
    """Regression (ADVICE r1): :limit early-exit is unsound when the entry
    rule reads a meet-aggregation rule in the SCC — partial min() totals can
    still improve in later epochs, so probing '?' against them can emit a
    non-minimal distance. Weighted graph where a 2-hop path (cost 2) beats
    the 1-hop path (cost 10) found in epoch 1."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create wedge {fr: Int, to: Int => w: Int}")
    d.run_script("?[fr, to, w] <- [[1, 2, 10], [1, 3, 1], [3, 2, 1]] "
                 ":put wedge {fr, to => w}")
    r = d.run_script("""
    sp[n, min(d)] := *wedge[1, n, w], d = w
    sp[n, min(d)] := sp[m, d0], *wedge[m, n, w], d = d0 + w
    ?[n, d] := sp[n, d]
    :limit 3
    """)
    got = sorted(tuple(x) for x in r.rows)
    assert (2, 10) not in got
    assert set(got) <= {(2, 2), (3, 1)}
    assert len(got) == 2


def test_reliable_checkpoint_config(spark, tmp_path):
    """`spark.cozo.checkpointDir` switches fixpoint checkpoints from
    localCheckpoint to reliable checkpoint() in the given directory —
    required for executor-loss-safe recursion on a real cluster."""
    import os

    from cozo_spark.datalog.fixpoint import _checkpoint

    ck = str(tmp_path / "ck")
    spark.conf.set("spark.cozo.checkpointDir", ck)
    try:
        df = _checkpoint(spark.range(10))
        assert df.count() == 10
        assert spark.sparkContext.getCheckpointDir().endswith(ck.lstrip("/")) \
            or ck in spark.sparkContext.getCheckpointDir()
        assert any(os.scandir(ck))  # reliable checkpoint files written
    finally:
        spark.conf.unset("spark.cozo.checkpointDir")
    # default path still works
    assert _checkpoint(spark.range(5)).count() == 5


def test_magic_rewrite_variable_seeds(spark):
    """Variable-seed magic sets (sideways information passing): the seed
    values come from an r-independent relation in the caller's clause —
    `?[b] := *starts[s], reach[s, b]` explores only the seeds' components,
    not the unrelated 40-deep chain."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create vedge {fr: Int, to: Int}")
    comp_a = [[1, 2], [2, 3], [3, 4]]
    comp_b = [[i, i + 1] for i in range(100, 140)]
    d.run_script(f"?[fr, to] <- {comp_a + comp_b} :put vedge {{fr, to}}")
    d.run_script(":create vstarts {s: Int}")
    d.run_script("?[s] <- [[1]] :put vstarts {s}")

    script = (
        "reach[a, b] := *vedge[a, b]\n"
        "reach[a, c] := reach[a, b], *vedge[b, c]\n"
        "?[b] := *vstarts[s], reach[s, b]")
    r = d.run_script(script)
    assert rows(r) == [(2,), (3,), (4,)]
    assert d._last_fixpoint_epochs <= 5  # comp_b chain not explored

    r2 = d.run_script(script + "\n:disable_magic_rewrite true")
    assert rows(r2) == [(2,), (3,), (4,)]
    assert d._last_fixpoint_epochs >= 39  # full closure without the rewrite

    # mixed const + variable callers union their seed sets
    r3 = d.run_script(
        "reach[a, b] := *vedge[a, b]\n"
        "reach[a, c] := reach[a, b], *vedge[b, c]\n"
        "two[b] := reach[100, b]\n"
        "?[b] := *vstarts[s], reach[s, b]\n"
        "?[b] := two[b], b <= 102")
    assert rows(r3) == [(2,), (3,), (4,), (101,), (102,)]

    # negated variable-seed caller sees the complete seeded subset
    r4 = d.run_script(
        "reach[a, b] := *vedge[a, b]\n"
        "reach[a, c] := reach[a, b], *vedge[b, c]\n"
        "?[s, x] := *vstarts[s], x in [2, 4, 6], not reach[s, x]")
    assert rows(r4) == [(1, 6)]


def test_magic_rewrite_variable_seed_unbindable_skipped(spark):
    """When the caller's seed variable is bound only BY the recursive atom
    itself, no restriction can be derived and the rewrite must not fire."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create uedge {fr: Int, to: Int}")
    d.run_script("?[fr, to] <- [[1, 2], [2, 3], [7, 8]] :put uedge {fr, to}")
    r = d.run_script(
        "reach[a, b] := *uedge[a, b]\n"
        "reach[a, c] := reach[a, b], *uedge[b, c]\n"
        "?[a, b] := reach[a, b]")
    assert rows(r) == [(1, 2), (1, 3), (2, 3), (7, 8)]


def test_validity_reference_scenario(spark):
    """Direct port of the reference's own validity test
    (cozo-core/src/data/tests/validity.rs:15-200): sentinel-timestamp
    rejection, ASSERT/RETRACT string coercion against the transaction
    clock, @ "NOW" / @ "END" reads, and full-history scans."""
    import pytest as _pytest

    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create vld {a, v: Validity => d}")

    # i64::MAX / i64::MIN timestamps are reserved and must be rejected
    with _pytest.raises(Exception):
        db.run_script(
            '?[a, v, d] <- [[1, [9223372036854775807, true], null]] '
            ':put vld {a, v => d}')
    with _pytest.raises(Exception):
        db.run_script(
            '?[a, v, d] <- [[1, [-9223372036854775808, true], null]] '
            ':put vld {a, v => d}')

    db.run_script('?[a, v, d] <- [[1, [0, true], 0]] :put vld {a, v => d}')
    assert len(db.run_script('?[a, v, d] := *vld{a, v, d @ "NOW"}').rows) == 1
    assert len(db.run_script('?[a, v, d] := *vld{a, v, d}').rows) == 1

    db.run_script('?[a, v, d] <- [[1, [1, false], 1]] :put vld {a, v => d}')
    assert len(db.run_script('?[a, v, d] := *vld{a, v, d @ "NOW"}').rows) == 0
    assert len(db.run_script('?[a, v, d] := *vld{a, v, d}').rows) == 2

    # "ASSERT" stamps the transaction clock (now) with is_assert=true
    db.run_script('?[a, v, d] <- [[1, "ASSERT", 2]] :put vld {a, v => d}')
    res = db.run_script('?[a, v, d] := *vld{a, v, d @ "NOW"}').rows
    assert len(res) == 1 and res[0][2] == 2
    assert len(db.run_script('?[a, v, d] := *vld{a, v, d}').rows) == 3

    # "RETRACT" stamps now with is_assert=false — current view empties
    db.run_script('?[a, v, d] <- [[1, "RETRACT", 3]] :put vld {a, v => d}')
    assert len(db.run_script('?[a, v, d] := *vld{a, v, d @ "NOW"}').rows) == 0
    assert len(db.run_script('?[a, v, d] := *vld{a, v, d}').rows) == 4

    # a far-future assert: invisible @ NOW, visible @ END
    db.run_script(
        '?[a, v, d] <- [[1, [9223372036854775806, true], null]] '
        ':put vld {a, v => d}')
    assert len(db.run_script('?[a, v, d] := *vld{a, v, d @ "NOW"}').rows) == 0
    res = db.run_script('?[a, v, d] := *vld{a, v, d @ "END"}').rows
    assert len(res) == 1 and res[0][2] is None
    assert len(db.run_script('?[a, v, d] := *vld{a, v, d}').rows) == 5
