"""Distributed hash-derandomized random walks (fixed_rules/graphs.py).

The scale path for RandomWalk: per step one frontier join + one min_by
argmin, no windows, no driver adjacency. These tests pin determinism,
dead-end retirement, weighted bias, and the engine dispatch surface.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cozo_spark.fixed_rules.graphs import random_walks


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 1), (5, 1), (9, 6)],
        "src long, dst long")


def test_walks_deterministic_and_complete(spark, edges):
    a = sorted((r["start"], r["it"], tuple(r["path"]))
               for r in random_walks(edges, steps=5, iterations=2,
                                     seed=7).collect())
    b = sorted((r["start"], r["it"], tuple(r["path"]))
               for r in random_walks(edges, steps=5, iterations=2,
                                     seed=7).collect())
    assert a == b
    # one walk per (node, iteration); every step follows a real edge
    assert len(a) == 7 * 2
    adj = {(r["src"], r["dst"]) for r in edges.collect()}
    for start, it, path in a:
        assert int(path[0]) == start
        for u, v in zip(path, path[1:]):
            assert (int(u), int(v)) in adj


def test_dead_end_retires_walk(spark, edges):
    rows = {(r["start"], r["it"]): list(r["path"])
            for r in random_walks(edges, steps=5, seed=1).collect()}
    # 6 has no out-edges: the walk from 9 stops after one hop, from 6
    # immediately
    assert rows[(9, 0)] == ["9", "6"]
    assert rows[(6, 0)] == ["6"]


def test_seed_changes_trajectories(spark, edges):
    a = {(r["start"], r["it"]): tuple(r["path"])
         for r in random_walks(edges, steps=6, seed=1).collect()}
    b = {(r["start"], r["it"]): tuple(r["path"])
         for r in random_walks(edges, steps=6, seed=2).collect()}
    assert a.keys() == b.keys()
    assert any(a[k] != b[k] for k in a), "seed must change some trajectory"


def test_weighted_bias(spark):
    """With weight 1000:1 on 1->2 vs 1->3, (A-Res keys) virtually every
    iteration must route 1 -> 2."""
    we = spark.createDataFrame(
        [(1, 2, 1000.0), (1, 3, 0.0001), (2, 1, 1.0), (3, 1, 1.0)],
        "src long, dst long, w double")
    out = random_walks(we, steps=1, iterations=20, seed=5, weighted=True,
                       hash_fn="xxhash64")
    picks = [r["path"][1] for r in out.filter("start = 1").collect()]
    assert len(picks) == 20
    assert picks.count("2") >= 18, picks


def test_zero_weight_edges_never_taken(spark):
    we = spark.createDataFrame(
        [(1, 2, 0.0), (1, 3, 5.0), (3, 1, 1.0)],
        "src long, dst long, w double")
    out = random_walks(we, steps=3, iterations=4, seed=11, weighted=True)
    for r in out.filter("start = 1").collect():
        assert "2" not in r["path"][1:2], r["path"]


def test_engine_dispatch(spark, edges):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.register_dataframe("e", edges)
    out = db.run_script_df(
        "?[start, it, path] <~ RandomWalkDist(*e[], steps: 3, seed: 9)")
    rows = out.collect()
    assert len(rows) == 7
    assert all(len(r["path"]) >= 1 for r in rows)


def test_no_single_partition_exchange(spark, edges):
    from cozo_spark.plans.inspect import plan_properties

    p = plan_properties(random_walks(edges, steps=4, seed=3))
    assert "Exchange SinglePartition" not in p["plan"]
    for node in ("ArrowEvalPython", "BatchEvalPython",
                 "FlatMapGroupsInPandas", "MapInPandas"):
        assert node not in p["plan"]


# ---------------------------------------------------------------------------
# distributed Borůvka MSF (r5)
# ---------------------------------------------------------------------------

def _forest_stats(df):
    rows = df.collect()
    return len(rows), round(sum(r["weight"] for r in rows), 9)


def test_boruvka_matches_kruskal_random(spark):
    import random

    from cozo_spark.fixed_rules.graphs import minimum_spanning_forest_boruvka
    from cozo_spark.fixed_rules.local_graphs import (
        minimum_spanning_forest_kruskal)

    rnd = random.Random(17)
    edges = [(rnd.randrange(30), rnd.randrange(30),
              round(rnd.random() * 10, 3)) for _ in range(90)]
    edges += [(200, 201, 2.5), (201, 202, 1.5)]  # disconnected component
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    bn, bw = _forest_stats(minimum_spanning_forest_boruvka(df))
    kn, kw = _forest_stats(minimum_spanning_forest_kruskal(df))
    assert (bn, bw) == (kn, kw)


def test_boruvka_duplicate_weights_stay_acyclic(spark):
    """All weights equal: only the (weight, src, dst) total order prevents
    cycles. Forest must still have exactly n_nodes - n_components edges."""
    from cozo_spark.fixed_rules.graphs import minimum_spanning_forest_boruvka

    # complete-ish graph on 8 nodes, every weight 1.0
    edges = [(i, j, 1.0) for i in range(8) for j in range(8) if i < j]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    out = minimum_spanning_forest_boruvka(df)
    rows = [(r["src"], r["dst"]) for r in out.collect()]
    assert len(rows) == 7  # spanning tree on 8 nodes
    # acyclic: union-find check
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rows:
        ra, rb = find(a), find(b)
        assert ra != rb, f"cycle through {(a, b)}"
        parent[ra] = rb


def test_boruvka_engine_dispatch(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.register_dataframe(
        "we", spark.createDataFrame(
            [(1, 2, 3.0), (2, 3, 1.0), (1, 3, 2.0)],
            "src long, dst long, w double"))
    out = db.run_script_df(
        "?[src, dst, weight] <~ MinimumSpanningForestBoruvka(*we[])")
    rows = sorted((r["src"], r["dst"], r["weight"]) for r in out.collect())
    assert rows == [(1, 3, 2.0), (2, 3, 1.0)]


def test_all_zero_weight_node_retires_walk(spark):
    """A node whose out-edges are ALL weight-0 must retire the walk (like
    a dead end), not silently drop it from the output."""
    we = spark.createDataFrame(
        [(1, 2, 0.0), (1, 3, 0.0), (2, 1, 1.0)],
        "src long, dst long, w double")
    rows = {(r["start"], r["it"]): list(r["path"])
            for r in random_walks(we, steps=3, seed=2,
                                  weighted=True).collect()}
    assert rows[(1, 0)] == ["1"]          # retired immediately, kept
    assert rows[(2, 0)] == ["2", "1"]     # 2 -> 1, then stuck at 1
    assert set(rows) == {(1, 0), (2, 0), (3, 0)}
