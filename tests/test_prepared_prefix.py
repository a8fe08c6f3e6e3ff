"""Prefix template for param-carrying clauses (r11).

BASELINE r11 measured the last-resort template binding at ~1x full
re-translation for shapes where EVERY clause carries the param (agg
arguments, multi-clause entries) — nothing was cacheable at whole-clause
granularity. The prefix template recovers the param-free work those
clauses START with: the longest clean atom prefix caches as a store
projected to exactly the vars the suffix or head consume; the bind keeps
the per-call suffix. Sound for set-semantic rules (collapsing bindings
that differ only in projected-away vars cannot change the rule's
distinct result); agg-head clauses are refused (raw multiset needed).
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest


def _edges(spark, n=200, fan=7):
    return spark.range(2 * n).select(
        (F.col("id") % n).alias("fr"),
        ((F.col("id") * fan + 1) % n).alias("to"))


def _db(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.register_dataframe("edge", _edges(spark), keys=["fr", "to"])
    return db


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _literal(db, script, params):
    s = script
    for k, v in params.items():
        s = s.replace(f"${k}", repr(v) if isinstance(v, str) else str(v))
    return _rows(db.run_script_df(s))


def _entry(db, script, params):
    from cozo_spark.datalog.engine import CozoDb

    return CozoDb._skel_cache.get(db._skel_key(script, params))


AGG_ARG = """
contrib[a, s] := *edge{fr: a, to: b}, s = b * $w
?[a, sum(s)] := contrib[a, s]
"""

# a param-carrying support rule consumed under NEGATION: the flat
# skeleton's cond-migration hoist refuses negated consumers (r9), so
# this genuinely lands on the template (single-clause entries with
# hoistable params take the FLAT skeleton instead — tested in
# test_prepared.py)
NEG_SUPPORT = """
bad[b] := *edge{fr: b, to: t}, t == $z
?[a] := *edge{fr: a, to: b}, not bad[b]
"""

PROJECTED = """
pv[v2] := *edge{fr: k, to: v}, v2 = v + $d
?[v2] := pv[v2]
"""


@pytest.mark.parametrize("script,mkp", [
    (AGG_ARG, lambda i: {"w": i + 2}),
    (NEG_SUPPORT, lambda i: {"z": 17 * i}),
    (PROJECTED, lambda i: {"d": 100 * i}),
])
def test_prefix_bind_matches_literal(spark, script, mkp):
    db = _db(spark)
    for i in range(4):
        p = mkp(i)
        assert _rows(db.run_script_df(script, p)) == _literal(db, script, p), p
    ent = _entry(db, script, mkp(0))
    assert ent is not None and ent.get("template")
    assert any(p.get("prefix_len") for p in ent["repls"]), \
        "expected at least one prefix repl"


def test_prefix_split_shape_agg_arg(spark):
    """The support rule splits after its scan; the store projects to
    exactly (a, b) — the vars the suffix unification and head consume."""
    db = _db(spark)
    db.run_script_df(AGG_ARG, {"w": 3})
    ent = _entry(db, AGG_ARG, {"w": 3})
    pr = [p for p in ent["repls"] if p.get("prefix_len")]
    assert len(pr) == 1
    assert pr[0]["name"] == "contrib" and pr[0]["prefix_len"] == 1
    assert pr[0]["slot_args"] == ("a", "b")


def test_prefix_projection_preserves_set_semantics(spark):
    """The store projects away the driving key (k) — duplicate v values
    collapse in the store, and the rule's distinct result must still
    equal the literal path's (which distincts at the end)."""
    db = _db(spark)
    for d in (0, 5, 1000):
        assert _rows(db.run_script_df(PROJECTED, {"d": d})) == \
            _literal(db, PROJECTED, {"d": d})


def test_prefix_template_invalidated_by_mutation(spark):
    db = _db(spark)
    db.run_script(
        "?[fr, to] <- [[1, 2], [2, 4], [3, 6]] :create sed {fr => to}")
    s = ("ss[a, s] := *sed{fr: a, to: b}, s = b + $d\n"
         "?[a, s] := ss[a, s]")
    assert _rows(db.run_script_df(s, {"d": 10})) == \
        [(1, 12), (2, 14), (3, 16)]
    db.run_script("?[fr, to] <- [[5, 8]] :put sed {fr => to}")
    assert _rows(db.run_script_df(s, {"d": 10})) == \
        [(1, 12), (2, 14), (3, 16), (5, 18)]
    assert _rows(db.run_script_df(s, {"d": 100})) == \
        [(1, 102), (2, 104), (3, 106), (5, 108)]


def test_prefix_differential_fuzz(spark):
    """Random shapes x random values vs literal inlining."""
    db = _db(spark)
    rng = random.Random(11)
    shapes = [
        ("?[a] := *edge{fr: a, to: b}, b == $x", lambda: {"x": rng.randrange(200)}),
        ("down[a, b] := *edge{fr: a, to: b}, a > b\n"
         "?[a, mx] := down[a, b0], mx = b0 + $o",
         lambda: {"o": rng.randrange(50)}),
        ("?[a, c] := *edge{fr: a, to: b}, not *edge{fr: b, to: $z}, "
         "*edge{fr: b, to: c}", lambda: {"z": rng.randrange(200)}),
    ]
    for script, mk in shapes:
        for _ in range(3):
            p = mk()
            assert _rows(db.run_script_df(script, p)) == \
                _literal(db, script, p), (script, p)


def test_txn_shadow_sweep_spares_base_caches(spark):
    """r11 review fix: the write-path cache sweep is scoped to the
    RECORDING db's identity. A MultiTransaction's shadow db mirrors the
    base's relation names exactly — its mutations must not wipe the base
    db's skeleton/template entries (they are still valid for the base
    until commit), and base mutations must still sweep the base's own."""
    from cozo_spark.datalog.engine import CozoDb

    db = _db(spark)
    s = """
    contrib[a, s] := *edge{fr: a, to: b}, s = b * $w
    ?[a, sum(s)] := contrib[a, s]
    """
    db.run_script_df(s, {"w": 2})
    key = db._skel_key(s, {"w": 2})
    assert key in CozoDb._skel_cache
    db.run_script("?[k, v] <- [[1, 1]] :create txn_t {k => v}")
    # :create changed the registry -> the base entry was swept; rebuild it
    db.run_script_df(s, {"w": 3})
    assert key in CozoDb._skel_cache
    with db.multi_transaction() as tx:
        tx.run_script("?[k, v] <- [[2, 2]] :put txn_t {k => v}")
        # the SHADOW's mutation swept only shadow-scoped entries
        assert key in CozoDb._skel_cache, \
            "txn shadow mutation wiped the base db's skeleton cache"
        # and the base entry still binds correctly mid-txn
        assert _rows(db.run_script_df(s, {"w": 5})) == _literal(db, s, {"w": 5})
    # post-commit the registry frames changed -> base sweep on next write
    db.run_script("?[k, v] <- [[3, 3]] :put txn_t {k => v}")
    assert _rows(db.run_script_df(s, {"w": 7})) == _literal(db, s, {"w": 7})
