"""Regression tests for the round-4 ADVICE findings (fixed in round 5).

1. Turkish stemmer case folding: dotted/dotless-I mapping BEFORE .lower()
2. url_normalize: [?&]-anchored tracking params; default-port stripping
   scoped to the authority and matched to the scheme
3. NamedRows.flatten severs pages (db.rs:163-177 takes `next`)
4. MultiTransaction conflict detection is logical-write based:
   ::compact (either side) never fabricates a write-write conflict

Plus round-5 engine work:
5. ReorderSort two-pass global position — no single-partition WindowExec,
   identical ranks on the forced distributed branch
6. compiled-plan cache: hits on identical pure queries, invalidation on
   mutation / access-level change, never caches recursive programs
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cozo_spark.datalog.engine import CozoDb
from cozo_spark.datalog.translate import QueryError


def test_turkish_stemmer_case_folding():
    from cozo_spark.functions.snowball_ext import stem_turkish

    # proper Turkish uppercase of 'kitabı' is 'KİTABI' (dotted İ)
    assert stem_turkish("KİTABI") == stem_turkish("kitabı") == "kitap"
    # İ (U+0130) must fold to plain 'i', not 'i'+U+0307 combining dot
    assert stem_turkish("İSTANBUL") == stem_turkish("istanbul") == "istanbul"
    # ASCII I folds to dotless ı (Turkish alphabet), consistently
    assert stem_turkish("KAPI") == stem_turkish("kapı")


def test_url_normalize_anchoring_and_ports(spark):
    from cozo_spark.operators.text import url_normalize

    cases = {
        # tracking params anchored on [?&]: longer names survive intact
        "http://x/?myutm_source=1&id=2": "http://x?myutm_source=1&id=2",
        "http://x/?a=1&oldfbclid=2&b=3": "http://x?a=1&oldfbclid=2&b=3",
        # real tracking params drop, delimiters repaired
        "http://x/?utm_a=1&utm_b=2&id=3": "http://x?id=3",
        "http://x/?utm_a=1&utm_b=2": "http://x",
        "http://x/p?id=1&gclid=zzz": "http://x/p?id=1",
        # port stripping: authority only, scheme-appropriate default
        "http://h:443/": "http://h:443",   # NOT default for http
        "https://h:80/a": "https://h:80/a",  # NOT default for https
        "http://h:80/a/": "http://h/a",
        "HTTPS://Example.COM:443/path/?utm_source=n&id=4#sec":
            "https://example.com/path?id=4",
        "https://X.com:443": "https://x.com",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r["url"]: r["norm_url"] for r in url_normalize(df).collect()}
    assert got == cases


def test_namedrows_flatten_severs_pages(spark):
    db = CozoDb(spark)
    db.row_page_size = 3
    r = db.run_script("?[x] <- [[1],[2],[3],[4],[5],[6],[7]] :sort x")
    pages = r.flatten()
    assert [len(p.rows) for p in pages] == [3, 3, 1]
    # db.rs:163-177: flatten takes/severs `next` — each page stands alone,
    # so as_dict on an element serializes ONE page, not the residual chain
    for p in pages:
        assert not p.has_more()
        assert p.as_dict()["next"] is None


def test_txn_compact_is_not_a_write(spark):
    db = CozoDb(spark)
    db.run_script(":create cw {k: Int => v: Int}")
    db.run_script("?[k, v] <- [[1, 10]] :put cw {k => v}")

    # shadow-side ::compact only: must not classify cw as written, so a
    # concurrent base mutation of cw commits cleanly
    tx = db.multi_transaction()
    tx.run_script("::compact")
    db.run_script("?[k, v] <- [[2, 20]] :put cw {k => v}")
    tx.commit()  # no spurious write-write conflict
    assert sorted(r[0] for r in db.run_script("?[k] := *cw[k, _]").rows) \
        == [1, 2]

    # base-side ::compact while a txn WROTE cw: compaction alone is not a
    # conflicting base write either
    tx2 = db.multi_transaction()
    tx2.run_script("?[k, v] <- [[3, 30]] :put cw {k => v}")
    db.run_script("::compact")
    tx2.commit()
    assert sorted(r[0] for r in db.run_script("?[k] := *cw[k, _]").rows) \
        == [1, 2, 3]

    # a genuine concurrent write still conflicts
    tx3 = db.multi_transaction()
    tx3.run_script("?[k, v] <- [[4, 40]] :put cw {k => v}")
    db.run_script("?[k, v] <- [[5, 50]] :put cw {k => v}")
    with pytest.raises(QueryError, match="conflict"):
        tx3.commit()


def test_txn_drop_recreate_still_conflicts(spark):
    # created_seq disambiguation: drop+recreate in base resets version to 0
    # but MUST still read as a conflicting change for a txn that wrote it
    db = CozoDb(spark)
    db.run_script(":create ab {k: Int}")
    tx = db.multi_transaction()
    tx.run_script("?[k] <- [[1]] :put ab {k}")
    db.run_script("::remove ab")
    db.run_script(":create ab {k: Int}")
    with pytest.raises(QueryError, match="conflict"):
        tx.commit()


def _mk_docs(spark, n=400):
    return (spark.range(n)
            .select(F.col("id").alias("k"),
                    (F.col("id") % 7).alias("g"),
                    (F.col("id") * 37 % 101).alias("v")))


def test_reorder_sort_two_pass_matches_single_node(spark, monkeypatch):
    import cozo_spark.fixed_rules as fr

    rs = fr.get_fixed_rule("ReorderSort")
    inp = _mk_docs(spark).repartition(8)
    opts = dict(sort_by=[F.col("v"), F.col("k")],
                out=[F.col("k"), F.col("g"), F.col("v")],
                break_ties=True)
    small = rs([inp], dict(opts))
    small_rows = sorted(tuple(r) for r in small.collect())

    monkeypatch.setattr(fr, "REORDER_SORT_SMALL_BYTES", 0)
    big = rs([inp], dict(opts))
    plan = big._jdf.queryExecution().executedPlan().toString()
    # the distributed branch must not contain ANY window operator — local
    # positions come from monotonically_increasing_id over the range sort
    assert "Window" not in plan
    big_rows = sorted(tuple(r) for r in big.collect())
    assert big_rows == small_rows
    # _rank is a dense 1..N permutation
    ranks = sorted(r[0] for r in big_rows)
    assert ranks == list(range(1, len(big_rows) + 1))


def test_reorder_sort_two_pass_rank_ties(spark, monkeypatch):
    import cozo_spark.fixed_rules as fr

    rs = fr.get_fixed_rule("ReorderSort")
    monkeypatch.setattr(fr, "REORDER_SORT_SMALL_BYTES", 0)
    inp = _mk_docs(spark, 100).repartition(5)
    out = rs([inp], dict(sort_by=[F.col("g")],
                         out=[F.col("k"), F.col("g")],
                         break_ties=False))
    rows = [(r["_rank"], r["g"]) for r in out.collect()]
    # competition rank: all members of a tie group share the group's min
    # position; ranks jump by group size
    by_g = {}
    for rank, g in rows:
        by_g.setdefault(g, set()).add(rank)
    assert all(len(s) == 1 for s in by_g.values())
    expected_rank, got = 1, dict()
    for g in sorted(by_g):
        got[g] = next(iter(by_g[g]))
        assert got[g] == expected_rank
        expected_rank += sum(1 for _, gg in rows if gg == g)


def test_plan_cache_hits_and_invalidation(spark):
    from cozo_spark.datalog.engine import CozoDb as _Db

    db = CozoDb(spark)
    db.run_script(":create pc {k: Int => v: Int}")
    db.run_script("?[k, v] <- [[1, 10], [2, 20]] :put pc {k => v}")
    q = "?[k, v] := *pc[k, v], v > 5"
    a = db.run_script_df(q)
    b = db.run_script_df(q)
    assert b is a  # cache hit returns the SAME lazy plan object
    assert sorted(tuple(r) for r in b.collect()) == [(1, 10), (2, 20)]

    # a mutation swaps the frame -> miss, and results reflect the write
    db.run_script("?[k, v] <- [[3, 30]] :put pc {k => v}")
    c = db.run_script_df(q)
    assert c is not a
    assert sorted(tuple(r) for r in c.collect()) \
        == [(1, 10), (2, 20), (3, 30)]

    # metadata change without a frame swap also invalidates
    d = db.run_script_df(q)
    assert d is c
    db.run_script("::access_level hidden pc")
    with pytest.raises(QueryError):
        db.run_script_df(q)
    db.run_script("::access_level normal pc")

    # a second CozoDb over the SAME frames shares the compiled plan
    db2 = CozoDb(spark)
    db2.relations = dict(db.relations)
    e1 = db.run_script_df(q)
    e2 = db2.run_script_df(q)
    assert e2 is e1
    assert _Db._plan_cache  # populated


def test_plan_cache_skips_recursion_and_nondet(spark):
    db = CozoDb(spark)
    db.run_script(":create ed {f: Int, t: Int}")
    db.run_script("?[f, t] <- [[1, 2], [2, 3]] :put ed {f, t}")
    rec = """
    r[a, b] := *ed[a, b]
    r[a, c] := r[a, b], *ed[b, c]
    ?[a, b] := r[a, b]
    """
    x = db.run_script_df(rec)
    y = db.run_script_df(rec)
    assert y is not x  # fixpoints ran jobs -> never served from cache
    nd = "?[x] := *ed[x, _], y = rand_float(), y >= 0.0"
    u = db.run_script_df(nd)
    v = db.run_script_df(nd)
    assert v is not u


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_plan_cache_vs_mutations(spark, seed):
    """Random interleavings of (cached) reads and mutations: a plan-cache
    hit must never serve stale data — every read reflects exactly the
    model state, across two scripts and ::compact/access-level churn."""
    import random

    rng = random.Random(seed)
    db = CozoDb(spark)
    db.run_script(":create fz {k: Int => v: Int}")
    model: dict[int, int] = {}
    q_all = "?[k, v] := *fz[k, v]"
    q_big = "?[k, v] := *fz[k, v], v >= 50"

    for step in range(30):
        op = rng.choice(["put", "rm", "read", "read_big", "compact"])
        if op == "put":
            rows = [[rng.randrange(10), rng.randrange(100)]
                    for _ in range(rng.randrange(1, 4))]
            for k, v in sorted(rows):
                model[k] = v
            db.run_script(
                f"?[k, v] <- {rows} :put fz {{k => v}}")
        elif op == "rm":
            ks = [[rng.randrange(10)] for _ in range(2)]
            for (k,) in ks:
                model.pop(k, None)
            db.run_script(f"?[k] <- {ks} :rm fz {{k}}")
        elif op == "compact":
            db.run_script("::compact")
        else:
            q = q_all if op == "read" else q_big
            got = sorted(tuple(r) for r in db.run_script(q).rows)
            want = sorted((k, v) for k, v in model.items()
                          if op == "read" or v >= 50)
            assert got == want, f"step {step} ({op}): {got} != {want}"
