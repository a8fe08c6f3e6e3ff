"""Round-6 VERDICT directive regressions.

Directive 6: size-adaptive k-means assignment — above KMEANS_LITERAL_MAX_K
the literal-centroid argmin switches to the PQ-style broadcast-join +
min(struct) argmin so plan size stays bounded at large k.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vecs(spark, n: int, dim: int = 4, seed: int = 7):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_join_path_matches_literal_path(spark, monkeypatch):
    import cozo_spark.operators.similarity as S

    corpus = _vecs(spark, 120)
    # force the literal fan-out even at k=20 to produce the ground truth
    monkeypatch.setattr(S, "KMEANS_LITERAL_MAX_K", 1000)
    cents_lit, assign_lit = S.kmeans_lloyd(corpus, k=20, iters=2)
    lit_rows = sorted(tuple(r) for r in assign_lit.collect())
    monkeypatch.setattr(S, "KMEANS_LITERAL_MAX_K", 4)
    cents_join, assign_join = S.kmeans_lloyd(corpus, k=20, iters=2)
    join_rows = sorted(tuple(r) for r in assign_join.collect())
    assert cents_lit == cents_join
    assert lit_rows == join_rows


def test_kmeans_small_k_stays_literal(spark):
    import cozo_spark.operators.similarity as S

    corpus = _vecs(spark, 40)
    _, assign = S.kmeans_lloyd(corpus, k=4, iters=1)
    plan = assign._jdf.queryExecution().executedPlan().toString()
    # k=4 must remain the map-only codegen argmin: no join operator at all
    assert "Join" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# Directive 5: fused (broadcast-adjacency, map-side) random-walk loop must
# produce bit-identical walks to the shuffle-path (join + min_by) loop.
# ---------------------------------------------------------------------------

def _walk_rows(edges, **kw):
    from cozo_spark.fixed_rules.graphs import random_walks

    return sorted((r["start"], r["it"], tuple(r["path"]))
                  for r in random_walks(edges, **kw).collect())


@pytest.mark.parametrize("weighted,hash_fn", [
    (False, "md5"), (True, "md5"), (False, "xxhash64"),
])
def test_random_walk_fused_matches_shuffle_path(spark, monkeypatch,
                                                weighted, hash_fn):
    import cozo_spark.fixed_rules.graphs as G

    if weighted:
        edges = spark.createDataFrame(
            [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (2, 4, 0.0),
             (3, 4, 5.0), (4, 1, 1.0), (5, 1, 2.0), (9, 6, 1.0)],
            "src long, dst long, weight double")
    else:
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 1), (5, 1), (9, 6)],
            "src long, dst long")
    kw = dict(steps=9, iterations=2, seed=11, weighted=weighted,
              hash_fn=hash_fn)
    fused = _walk_rows(edges, **kw)          # small graph -> fused default
    monkeypatch.setattr(G, "RANDOM_WALK_BROADCAST_BYTES", 0)
    shuffled = _walk_rows(edges, **kw)
    assert fused == shuffled
    assert len(fused) == 14                  # 7 start nodes x 2 iterations


def test_random_walk_fused_plan_is_map_side(spark):
    from cozo_spark.fixed_rules.graphs import random_walks
    from cozo_spark.plans.inspect import plan_properties

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 1)],
        "src long, dst long")
    p = plan_properties(random_walks(edges, steps=6, seed=3))
    assert "Exchange SinglePartition" not in p["plan"]
    # the fused loop must not shuffle per step: no hash aggregate between
    # the walk joins (the only aggregate allowed is the adjacency build)
    assert "BroadcastHashJoin" in p["plan"] or "BroadcastNestedLoop" in p["plan"]
    assert p["plan"].count("min_by") == 0


# ---------------------------------------------------------------------------
# Directive 4: distributed Louvain (CommunityDetectionLouvainDist) — golden
# agreement with the driver-side sequential rule on separable graphs, plan
# free of single-partition exchanges.
# ---------------------------------------------------------------------------

def _partition(df, comm_col="community", node_col="node"):
    """Community labels are min-member so identical partitions compare
    equal directly."""
    out = {}
    for r in df.collect():
        out.setdefault(r[comm_col], set()).add(r[node_col])
    return sorted((sorted(v) for v in out.values()), key=str)


def _clique_edges(members):
    return [(a, b, 1.0) for a in members for b in members if a < b]


def test_louvain_dist_matches_local_on_separable_graph(spark):
    from cozo_spark.fixed_rules.graphs import louvain_communities
    from cozo_spark.fixed_rules.local_graphs import (
        community_detection_louvain)

    rows = (_clique_edges([1, 2, 3, 4, 5])
            + _clique_edges([10, 11, 12, 13, 14])
            + _clique_edges([20, 21, 22, 23])
            + [(5, 10, 0.5), (14, 20, 0.5)])   # weak bridges
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    dist = _partition(louvain_communities(edges, local_threshold=0))
    local = _partition(community_detection_louvain(edges))
    assert dist == local == [[1, 2, 3, 4, 5], [10, 11, 12, 13, 14],
                             [20, 21, 22, 23]]


def test_louvain_dist_weighted_and_string_nodes(spark):
    from cozo_spark.fixed_rules.graphs import louvain_communities

    rows = [("a", "b", 5.0), ("b", "c", 5.0), ("a", "c", 5.0),
            ("x", "y", 5.0), ("y", "z", 5.0), ("x", "z", 5.0),
            ("c", "x", 0.2)]
    edges = spark.createDataFrame(rows, "src string, dst string, weight double")
    assert _partition(louvain_communities(edges, local_threshold=0)) == \
        [["a", "b", "c"], ["x", "y", "z"]]


def test_louvain_dist_multilevel_contracts(spark):
    from cozo_spark.fixed_rules.graphs import louvain_communities

    # ring of 4 triangles lightly chained: level 1 finds the triangles,
    # level 2 may merge neighbors — result must still be a valid partition
    # covering every node exactly once
    rows = []
    for base in (0, 10, 20, 30):
        rows += _clique_edges([base, base + 1, base + 2])
    rows += [(2, 10, 0.1), (12, 20, 0.1), (22, 30, 0.1), (32, 0, 0.1)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    part = _partition(louvain_communities(edges, local_threshold=0))
    flat = sorted(n for grp in part for n in grp)
    assert flat == sorted({a for r in rows for a in r[:2]})
    # triangles must never be split across communities
    for base in (0, 10, 20, 30):
        tri = {base, base + 1, base + 2}
        assert any(tri <= set(grp) for grp in part)


def test_louvain_dist_engine_dispatch_and_plan(spark):
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.plans.inspect import plan_properties
    from cozo_spark.fixed_rules.graphs import louvain_communities

    db = CozoDb(spark)
    db.run_script("""
    ?[src, dst, w] <- [[1,2,1.0],[2,3,1.0],[1,3,1.0],[4,5,1.0],[5,6,1.0],[4,6,1.0],[3,4,0.1]]
    :create e {src, dst => w}
    """)
    res = db.run_script("""
    edges[src, dst, w] := *e{src, dst, w}
    ?[community, node] <~ CommunityDetectionLouvainDist(edges[])
    """)
    got = {}
    for c, n in res.rows:
        got.setdefault(c, set()).add(n)
    assert sorted(sorted(v) for v in got.values()) == [[1, 2, 3], [4, 5, 6]]

    edges = spark.createDataFrame(
        _clique_edges([1, 2, 3]) + _clique_edges([7, 8, 9]) + [(3, 7, 0.1)],
        "src long, dst long, weight double")
    p = plan_properties(louvain_communities(edges, local_threshold=0))
    assert "Exchange SinglePartition" not in p["plan"]
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in p["plan"]


# ---------------------------------------------------------------------------
# Compounding-stats regression (found building distributed Louvain):
# checkpoint() keeps the pre-checkpoint plan's size estimate, and
# iterative join loops compound it geometrically until every optimizer
# pass grinds in BigInteger.multiply. _sane_stats must keep the estimate
# bounded across unlimited epochs.
# ---------------------------------------------------------------------------

def test_checkpoint_stats_stay_bounded_across_epochs(spark):
    from pyspark.sql import functions as F

    from cozo_spark.datalog.fixpoint import _checkpoint

    def bits(df):
        try:
            return int(df._jdf.queryExecution().optimizedPlan().stats()
                       .sizeInBytes()).bit_length()
        except ValueError:  # py4j cannot even convert the BigInteger
            return 1 << 30
    df = _checkpoint(spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") % 3).alias("b")))
    for i in range(8):
        j = (df.alias("l").join(df.alias("r"), F.col("l.b") == F.col("r.b"))
             .join(df.alias("s"), F.col("l.a") == F.col("s.a"))
             .select(F.col("l.a").alias("a"), F.col("r.b").alias("b"))
             .distinct())
        df = _checkpoint(j)
        assert bits(df) < 2048, f"estimate exploded at epoch {i}"
    assert df.count() == 10


# ---------------------------------------------------------------------------
# Directive 7: sampled distributed Brandes betweenness — exact at full
# sampling, all-node output, engine dispatch, bounded plan.
# ---------------------------------------------------------------------------

def _bc_rows(df):
    return {r["node"]: round(r["centrality"], 9) for r in df.collect()}


@pytest.mark.parametrize("undirected", [False, True])
def test_betweenness_dist_exact_at_full_sampling(spark, undirected):
    from cozo_spark.fixed_rules.graphs import betweenness_centrality_sampled
    from cozo_spark.fixed_rules.local_graphs import betweenness_centrality

    rows = [(1, 2), (2, 3), (3, 4), (2, 4), (4, 5), (5, 1), (6, 2), (3, 6)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    dist = _bc_rows(betweenness_centrality_sampled(
        edges, undirected=undirected))
    local = _bc_rows(betweenness_centrality(edges, undirected=undirected))
    assert dist == local


def test_betweenness_dist_multiedge_and_random_graph(spark):
    import random

    from cozo_spark.fixed_rules.graphs import betweenness_centrality_sampled
    from cozo_spark.fixed_rules.local_graphs import betweenness_centrality

    rng = random.Random(5)
    rows = [(rng.randrange(12), rng.randrange(12)) for _ in range(40)]
    rows = [(a, b) for a, b in rows if a != b] + [(1, 2), (1, 2)]  # multi-edge
    edges = spark.createDataFrame(rows, "src long, dst long")
    assert _bc_rows(betweenness_centrality_sampled(edges)) == \
        _bc_rows(betweenness_centrality(edges))


def test_betweenness_dist_sampled_estimator(spark):
    from cozo_spark.fixed_rules.graphs import betweenness_centrality_sampled

    # path graph: exact centrality known; a k<n sample must stay unbiased
    # in shape (all nodes present, non-negative, endpoints zero)
    rows = [(i, i + 1) for i in range(10)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    est = _bc_rows(betweenness_centrality_sampled(edges, sources=4, seed=3))
    assert len(est) == 11
    assert all(v >= 0 for v in est.values())
    assert est[0] == 0.0  # a source-only endpoint lies on no inner path


def test_betweenness_dist_engine_dispatch(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script("""
    ?[src, dst] <- [[1,2],[2,3],[3,4]]
    :create be {src, dst}
    """)
    res = db.run_script("""
    edges[src, dst] := *be{src, dst}
    ?[node, centrality] <~ BetweennessCentralityDist(edges[])
    """)
    got = {r[0]: r[1] for r in res.rows}
    # directed path 1->2->3->4: node 2 on paths (1,3),(1,4); node 3 on (1,4),(2,4)
    assert got == {1: 0.0, 2: 2.0, 3: 2.0, 4: 0.0}


def test_betweenness_dist_plan_bounded(spark):
    from cozo_spark.fixed_rules.graphs import betweenness_centrality_sampled
    from cozo_spark.plans.inspect import plan_properties

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long")
    p = plan_properties(betweenness_centrality_sampled(edges))
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in p["plan"]


# ---------------------------------------------------------------------------
# Distributed closeness (free-roam r6): exact at full sampling vs the
# driver-side rule; sampled mode covers every node via reversed pivots.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("undirected", [False, True])
def test_closeness_dist_exact_matches_local(spark, undirected):
    from cozo_spark.fixed_rules.graphs import closeness_centrality_dist
    from cozo_spark.fixed_rules.local_graphs import closeness_centrality

    rows = [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0), (2, 4, 5.0),
            (4, 1, 1.0), (5, 1, 0.5), (9, 6, 1.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    dist = {r["node"]: round(r["centrality"], 9)
            for r in closeness_centrality_dist(
                edges, undirected=undirected).collect()}
    local = {r["node"]: round(r["centrality"], 9)
             for r in closeness_centrality(
                 edges, undirected=undirected).collect()}
    assert dist == local


def test_closeness_dist_sampled_covers_all_nodes(spark):
    from cozo_spark.fixed_rules.graphs import closeness_centrality_dist

    rows = [(i, i + 1, 1.0) for i in range(10)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    est = {r["node"]: r["centrality"]
           for r in closeness_centrality_dist(edges, sources=3,
                                              seed=5).collect()}
    assert len(est) == 11
    # the sink node (10) reaches nothing: closeness 0 in any sample
    assert est[10] == 0.0
    assert all(v >= 0 for v in est.values())


def test_closeness_dist_engine_dispatch(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    res = db.run_script("""
    edges[src, dst] <- [[1,2],[2,3]]
    ?[node, centrality] <~ ClosenessCentralityDist(edges[])
    """)
    got = {r[0]: round(r[1], 6) for r in res.rows}
    # 1: dists {2:1, 3:2} -> 2/3; 2: {3:1} -> 1; 3: unreachable -> 0
    assert got == {1: round(2 / 3, 6), 2: 1.0, 3: 0.0}


def test_kmeans_large_k_uses_bounded_join_plan(spark):
    import cozo_spark.operators.similarity as S

    corpus = _vecs(spark, 200)
    _, assign = S.kmeans_lloyd(corpus, k=64, iters=1)
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    # bounded plan: no O(k) literal fan-out — a 64-branch literal argmin
    # would put >64 aggregate() lambdas in the plan string
    assert plan.count("lambdafunction") < 40, plan.count("lambdafunction")
    rows = assign.collect()
    assert len(rows) == 200
    assert len({r["cid"] for r in rows}) > 1
