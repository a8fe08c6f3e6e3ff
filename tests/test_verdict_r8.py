"""Round-8 VERDICT directives.

#1: LouvainDist size gate — graphs under LOUVAIN_LOCAL_MAX_EDGES undirected
    edges route to the driver-side sequential rule (reference semantics,
    ~1 s) instead of paying the distributed rounds' 40 s per-action
    constant; local_threshold=0 forces the distributed path.
"""

from __future__ import annotations

import logging

from pyspark.sql import functions as F


def _partition(df, comm_col="community", node_col="node"):
    out = {}
    for r in df.collect():
        out.setdefault(r[comm_col], set()).add(r[node_col])
    return sorted((sorted(v) for v in out.values()), key=str)


def _clique_edges(members):
    return [(a, b, 1.0) for a in members for b in members if a < b]


def _sep_graph(spark):
    rows = (_clique_edges([1, 2, 3, 4, 5])
            + _clique_edges([10, 11, 12, 13, 14])
            + _clique_edges([20, 21, 22, 23])
            + [(5, 10, 0.5), (14, 20, 0.5)])
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_louvain_gate_routes_small_graph_to_driver_rule(spark, caplog):
    from cozo_spark.fixed_rules.graphs import louvain_communities
    from cozo_spark.fixed_rules.local_graphs import (
        community_detection_louvain)

    edges = _sep_graph(spark)
    with caplog.at_level(logging.INFO, logger="cozo_spark.graphs"):
        gated = _partition(louvain_communities(edges))
    assert any("dispatching the sequential" in r.message
               for r in caplog.records), "gate should fire below threshold"
    want = [[1, 2, 3, 4, 5], [10, 11, 12, 13, 14], [20, 21, 22, 23]]
    assert gated == want
    # all three paths agree: gated == forced-dist == driver-side
    assert _partition(louvain_communities(edges, local_threshold=0)) == want
    assert _partition(community_detection_louvain(edges)) == want


def test_louvain_gate_forced_dist_logs_nothing(spark, caplog):
    from cozo_spark.fixed_rules.graphs import louvain_communities

    edges = _sep_graph(spark)
    with caplog.at_level(logging.INFO, logger="cozo_spark.graphs"):
        louvain_communities(edges, local_threshold=0).collect()
    assert not any("dispatching the sequential" in r.message
                   for r in caplog.records)


def test_louvain_gate_weight_semantics_identical(spark):
    """The gate feeds the deduped symmetric half-edges to the driver rule —
    multi-edges must still sum, weights must not double."""
    from cozo_spark.fixed_rules.graphs import louvain_communities
    from cozo_spark.fixed_rules.local_graphs import (
        community_detection_louvain)

    # duplicate + reversed edges: (1,2) appears three times with w 1+1+3
    rows = [(1, 2, 1.0), (2, 1, 1.0), (1, 2, 3.0),
            (2, 3, 5.0), (1, 3, 5.0),
            (7, 8, 5.0), (8, 9, 5.0), (7, 9, 5.0),
            (3, 7, 0.2)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    assert (_partition(louvain_communities(edges))
            == _partition(community_detection_louvain(edges))
            == [[1, 2, 3], [7, 8, 9]])


def test_louvain_gate_engine_dispatch_option(spark):
    """The engine `<~` dispatch forwards local_threshold like any option."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script("""
    ?[src, dst, w] <- [[1,2,1.0],[2,3,1.0],[1,3,1.0],[4,5,1.0],[5,6,1.0],[4,6,1.0],[3,4,0.1]]
    :create e8 {src, dst => w}
    """)
    for opt in ("", ", local_threshold: 0"):
        res = db.run_script(f"""
        edges[src, dst, w] := *e8{{src, dst, w}}
        ?[community, node] <~ CommunityDetectionLouvainDist(edges[]{opt})
        """)
        got = {}
        for c, n in res.rows:
            got.setdefault(c, set()).add(n)
        assert sorted(sorted(v) for v in got.values()) == [[1, 2, 3], [4, 5, 6]]
