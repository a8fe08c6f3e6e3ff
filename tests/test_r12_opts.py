"""Round-12 optimization pins.

1. Magic-restricted SCCs skip the static-side materialization: a seeded
   recursion (literal or prepared) must never checkpoint the FULL static
   relation — its fixpoint is seed-bounded by construction, and an eager
   full-relation checkpoint would undo the magic rewrite at scale
   (VERDICT r11 #2).
2. fixpoint._checkpoint_count keeps its one-positional-arg monkeypatch
   seam (VERDICT r11 #1): the engine's static-side materialization is
   inlined against engine._checkpoint instead of routing a ``ck=`` kwarg
   through the fixpoint seam.
3. Distributed Louvain runs ZERO bare DataFrame.count() actions: the
   per-level community count rides the next level's comm checkpoint
   (VERDICT r11 #3).
"""

from __future__ import annotations

import inspect

from pyspark.sql import functions as F


def test_checkpoint_count_seam_is_one_positional_arg():
    from cozo_spark.datalog.fixpoint import _checkpoint_count

    sig = inspect.signature(_checkpoint_count)
    assert list(sig.parameters) == ["df"], (
        "_checkpoint_count is the test-spy seam for per-epoch delta "
        "materializations; extra parameters break every one-arg spy")


def test_magic_literal_seed_skips_static_materialization(spark):
    """Literal-seeded recursion on a 1000-chain: unrestricted closure is
    ~n²/2; the seeded tail < n. With the r12 gate no action — delta
    checkpoint OR static-side materialization — may touch more than the
    seed-reachable slice (the full edge relation is 999 rows and must
    NOT be materialized)."""
    import cozo_spark.datalog.engine as E
    import cozo_spark.datalog.fixpoint as FP
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    n = 1000
    chain = spark.range(n - 1).select(
        F.col("id").alias("fr"), (F.col("id") + 1).alias("to"))
    db.register_dataframe("edge", chain, keys=["fr", "to"])

    ck_rows = []
    orig_ck = E._checkpoint

    def ck_spy(df, *a, **k):
        out = orig_ck(df, *a, **k)
        ck_rows.append(out.count())
        return out

    cnt_counts = []
    orig_cc = FP._checkpoint_count

    def cc_spy(df):
        out, m = orig_cc(df)
        cnt_counts.append(m)
        return out, m

    E._checkpoint = ck_spy
    FP._checkpoint_count = cc_spy
    try:
        got = sorted(tuple(r) for r in db.run_script_df("""
        reach[a, b] := *edge{fr: a, to: b}
        reach[a, c] := reach[a, b], *edge{fr: b, to: c}
        ?[b] := reach[%d, b]
        :limit 5
        """ % (n - 10)).collect())
    finally:
        E._checkpoint = orig_ck
        FP._checkpoint_count = orig_cc
    assert got == [(n - 9,), (n - 8,), (n - 7,), (n - 6,), (n - 5,)]
    assert cnt_counts and max(cnt_counts) < 50, cnt_counts
    assert all(r < 50 for r in ck_rows), (
        f"a static-side materialization leaked the full relation: {ck_rows}")


def test_magic_restricted_set_recorded_on_prog():
    from cozo_spark.datalog.ast import (
        Call, Cond, Const, HeadVar, Program, RelApply, RuleApply,
        RuleClause, Var)
    from cozo_spark.datalog.magic import magic_restrict

    clause_map = {
        "reach": [
            RuleClause([HeadVar("a"), HeadVar("b")],
                       [RelApply("edge", (Var("a"), Var("b")))]),
            RuleClause([HeadVar("a"), HeadVar("c")],
                       [RuleApply("reach", (Var("a"), Var("b"))),
                        RelApply("edge", (Var("b"), Var("c")))]),
        ],
        "?": [RuleClause([HeadVar("b")],
                         [RuleApply("reach", (Const(1), Var("b")))])],
    }
    prog = Program(rules=dict(clause_map))
    magic_restrict(prog, clause_map)
    assert prog.magic_restricted == {"reach"}
    # the base clause gained the seed filter, the recursive one did not
    base_conds = [a for a in clause_map["reach"][0].body
                  if isinstance(a, Cond)]
    assert len(base_conds) == 1
    assert isinstance(base_conds[0].expr, Call)
    rec_conds = [a for a in clause_map["reach"][1].body
                 if isinstance(a, Cond)]
    assert not rec_conds


def test_unrestricted_recursion_still_materializes_static_side(spark):
    """The r11 static-side checkpoint must keep firing for recursions the
    magic rewrite does NOT bound (full closure reads every edge every
    epoch otherwise — the r11 win this gate must not regress)."""
    import cozo_spark.datalog.engine as E
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    chain = spark.range(60).select(
        F.col("id").alias("fr"), (F.col("id") + 1).alias("to"))
    db.register_dataframe("edge", chain, keys=["fr", "to"])

    ck_rows = []
    orig_ck = E._checkpoint

    def ck_spy(df, *a, **k):
        out = orig_ck(df, *a, **k)
        ck_rows.append(out.count())
        return out

    E._checkpoint = ck_spy
    try:
        got = db.run_script_df("""
        reach[a, b] := *edge{fr: a, to: b}
        reach[a, c] := reach[a, b], *edge{fr: b, to: c}
        ?[a, b] := reach[a, b]
        """).count()
    finally:
        E._checkpoint = orig_ck
    assert got == 61 * 60 // 2
    # the 60-row edge relation is materialized once by the static-side gate
    assert 60 in ck_rows, ck_rows


def _partition(df, comm_col="community", node_col="node"):
    out = {}
    for r in df.collect():
        out.setdefault(r[comm_col], set()).add(r[node_col])
    return sorted((sorted(v) for v in out.values()), key=str)


def test_louvain_dist_no_bare_count_actions(spark, monkeypatch):
    """Every driver-side scalar in the distributed Louvain loop rides a
    checkpoint Observation or the upfront m2 collect — the per-level
    ``g.select("a").distinct().count()`` job is gone (r12)."""
    from pyspark.sql import DataFrame

    from cozo_spark.fixed_rules.graphs import louvain_communities
    from cozo_spark.fixed_rules.local_graphs import (
        community_detection_louvain)

    calls = []
    orig_count = DataFrame.count

    def spy(self):
        calls.append(self)
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "count", spy)

    def _clique(members):
        return [(a, b, 1.0) for a in members for b in members if a < b]

    # two levels of structure so the level loop iterates more than once
    rows = []
    for base in (0, 10, 20, 30):
        rows += _clique([base, base + 1, base + 2])
    rows += [(2, 10, 0.1), (12, 20, 0.1), (22, 30, 0.1), (32, 0, 0.1)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    part = _partition(louvain_communities(edges, local_threshold=0))
    assert not calls, (
        f"{len(calls)} bare DataFrame.count() actions inside Louvain")
    # unchanged semantics: every node appears exactly once, triangles whole
    flat = sorted(n for grp in part for n in grp)
    assert flat == sorted({a for r in rows for a in r[:2]})
    monkeypatch.undo()
    local = _partition(community_detection_louvain(
        spark.createDataFrame(rows, "src long, dst long, weight double")))
    for base in (0, 10, 20, 30):
        tri = {base, base + 1, base + 2}
        assert any(tri <= set(grp) for grp in part), (base, part)
        assert any(tri <= set(grp) for grp in local), (base, local)
