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
