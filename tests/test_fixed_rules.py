"""Graph fixed-rule tests on small deterministic graphs with closed-form
golden outputs (the reference's approach for algorithms DuckDB can't oracle —
SURVEY §5 implication (c))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def g(spark):
    # diamond + tail:  1→2, 1→3, 2→4, 3→4, 4→5   (weights = dst)
    edges = spark.createDataFrame(
        [(1, 2, 2.0), (1, 3, 3.0), (2, 4, 4.0), (3, 4, 4.0), (4, 5, 5.0)],
        "src long, dst long, weight double")
    return edges


@pytest.fixture(scope="module")
def cyc(spark):
    # two directed cycles joined by a bridge: 1→2→3→1, 4→5→4, 3→4
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 4)], "src long, dst long")


def test_degree_centrality(g):
    from cozo_spark.fixed_rules.graphs import degree_centrality

    d = {r["node"]: (r["total_degree"], r["out_degree"], r["in_degree"])
         for r in degree_centrality(g).collect()}
    assert d == {1: (2, 2, 0), 2: (2, 1, 1), 3: (2, 1, 1), 4: (3, 1, 2), 5: (1, 0, 1)}


def test_shortest_hops(g):
    from cozo_spark.fixed_rules.graphs import shortest_hops

    hops = {(r["src"], r["dst"]): r["hops"] for r in shortest_hops(g).collect()}
    assert hops[(1, 4)] == 2 and hops[(1, 5)] == 3 and hops[(1, 2)] == 1


def test_shortest_path_costs(g, spark):
    from cozo_spark.fixed_rules.graphs import shortest_path_costs

    starts = spark.createDataFrame([(1,)], "n long")
    costs = {r["node"]: r["cost"] for r in shortest_path_costs(g, starts).collect()}
    assert costs[4] == 6.0  # 1→2→4 (2+4) beats 1→3→4 (3+4)
    assert costs[5] == 11.0


def test_dijkstra_paths(g, spark):
    from cozo_spark.fixed_rules.local_graphs import shortest_path_dijkstra

    starts = spark.createDataFrame([(1,)], "n long")
    goals = spark.createDataFrame([(5,)], "n long")
    rows = shortest_path_dijkstra(g, starts, goals).collect()
    assert len(rows) == 1
    assert rows[0]["cost"] == 11.0
    assert rows[0]["path"] == ["1", "2", "4", "5"]


def test_yen_k_shortest(g, spark):
    from cozo_spark.fixed_rules.local_graphs import k_shortest_path_yen

    starts = spark.createDataFrame([(1,)], "n long")
    goals = spark.createDataFrame([(5,)], "n long")
    rows = sorted(k_shortest_path_yen(g, starts, goals, k=3).collect(),
                  key=lambda r: r["cost"])
    assert [r["cost"] for r in rows] == [11.0, 12.0]  # only two loopless paths
    assert rows[0]["path"] == ["1", "2", "4", "5"]
    assert rows[1]["path"] == ["1", "3", "4", "5"]


def test_astar(g, spark):
    from cozo_spark.fixed_rules.local_graphs import shortest_path_astar

    sg = spark.createDataFrame([(1, 5)], "s long, g long")
    rows = shortest_path_astar(g, sg).collect()
    assert rows[0]["cost"] == 11.0 and rows[0]["path"] == ["1", "2", "4", "5"]


def test_bfs_dfs_paths(g, spark):
    from cozo_spark.fixed_rules.local_graphs import bfs_paths, dfs

    starts = spark.createDataFrame([(1,)], "n long")
    b = {r["reached"]: r["path"] for r in bfs_paths(g, starts).collect()}
    assert b[4] == ["1", "2", "4"]  # BFS finds via first-expanded neighbor
    d = {r["reached"]: r["path"] for r in dfs(g, starts).collect()}
    assert d[4] == ["1", "2", "4"]  # lexicographic DFS goes 1→2 first
    assert set(b) == {2, 3, 4, 5}


def test_connected_components(cyc):
    from cozo_spark.fixed_rules.graphs import connected_components

    comp = {r["node"]: r["component"] for r in connected_components(cyc).collect()}
    assert len(set(comp.values())) == 1  # bridge joins everything (undirected)


def test_scc(cyc):
    from cozo_spark.fixed_rules.graphs import strongly_connected_components

    comp = {r["node"]: r["component"] for r in strongly_connected_components(cyc).collect()}
    assert comp[1] == comp[2] == comp[3]
    assert comp[4] == comp[5]
    assert comp[1] != comp[4]  # bridge is one-way: separate SCCs


def test_scc_diamond_not_merged(spark):
    """1→5, 1→6, 5→2, 6→2: nodes 5 and 6 share min-reaching (1) and
    min-reached (2) nodes but are NOT mutually reachable — every SCC is a
    singleton. (Regression for the label-pair shortcut, which merged them.)"""
    from cozo_spark.fixed_rules.graphs import strongly_connected_components

    e = spark.createDataFrame([(1, 5), (1, 6), (5, 2), (6, 2)], "src long, dst long")
    comp = {r["node"]: r["component"] for r in strongly_connected_components(e).collect()}
    assert len(comp) == 4 and len(set(comp.values())) == 4


def test_scc_two_cycles_bridged(spark):
    """Two 2-cycles joined by a one-way bridge stay separate components."""
    from cozo_spark.fixed_rules.graphs import strongly_connected_components

    e = spark.createDataFrame(
        [(10, 11), (11, 10), (11, 20), (20, 21), (21, 20)], "src long, dst long")
    comp = {r["node"]: r["component"] for r in strongly_connected_components(e).collect()}
    assert comp[10] == comp[11] and comp[20] == comp[21]
    assert comp[10] != comp[20]


def test_topsort(g):
    from cozo_spark.fixed_rules.graphs import top_sort

    order = {r["node"]: r["order"] for r in top_sort(g).collect()}
    assert order[1] < order[2] < order[4] < order[5]
    assert order[1] < order[3] < order[4]


def test_pagerank_sums_to_one(g):
    from cozo_spark.fixed_rules.graphs import pagerank

    rows = pagerank(g, iterations=20).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-6
    ranks = {r["node"]: r["rank"] for r in rows}
    assert ranks[4] > ranks[2]  # 4 collects two in-flows


def test_mst(g):
    from cozo_spark.fixed_rules.local_graphs import (
        minimum_spanning_forest_kruskal, minimum_spanning_tree_prim)

    for fn in (minimum_spanning_tree_prim, minimum_spanning_forest_kruskal):
        rows = fn(g).collect()
        assert len(rows) == 4  # 5 nodes → 4 edges
        assert sum(r["weight"] for r in rows) == 14.0  # 2+3+4+5

def test_betweenness(spark):
    from cozo_spark.fixed_rules.local_graphs import betweenness_centrality

    # path graph 1→2→3: only 2 lies between
    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    c = {r["node"]: r["centrality"] for r in betweenness_centrality(path).collect()}
    assert c[2] == 1.0 and c[1] == 0.0 and c[3] == 0.0


def test_closeness(spark):
    from cozo_spark.fixed_rules.local_graphs import closeness_centrality

    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    c = {r["node"]: r["centrality"] for r in closeness_centrality(path).collect()}
    assert c[1] == pytest.approx(2 / 3)  # dists 1,2 → 2/(1+2)
    assert c[2] == pytest.approx(1.0)


def test_louvain(spark):
    from cozo_spark.fixed_rules.local_graphs import community_detection_louvain

    # two triangles + one weak bridge
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0),
         (4, 5, 1.0), (5, 6, 1.0), (6, 4, 1.0), (3, 4, 0.1)],
        "src long, dst long, weight double")
    rows = community_detection_louvain(e).collect()
    comm = {r["node"]: r["community"] for r in rows}
    assert comm[1] == comm[2] == comm[3]
    assert comm[4] == comm[5] == comm[6]
    assert comm[1] != comm[4]


def test_louvain_registered_rule_hierarchy_shape(spark):
    """The REGISTERED CommunityDetectionLouvain returns the reference's
    exact output shape (louvain.rs:44-56): (labels_list, node) with the
    TOP level first and keep_depth truncating to the top-k levels; an
    uncontractable graph yields empty lists."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    # ring of 10 triangles: two contraction levels (10 -> 5 communities)
    rows = []
    for i in range(10):
        b = i * 10
        rows += [[b, b + 1, 1.0], [b + 1, b + 2, 1.0], [b, b + 2, 1.0],
                 [b + 2, ((i + 1) % 10) * 10, 1.0]]
    lit = ", ".join(str(r) for r in rows)
    db.run_script(f"?[a,b,w] <- [{lit}] :create e_tri {{a, b => w}}")
    res = db.run_script("""
    edges[a, b, w] := *e_tri{a, b, w}
    ?[grp, idx] <~ CommunityDetectionLouvain(edges[])
    """)
    labels = {r[1]: r[0] for r in res.rows}
    assert all(isinstance(v, list) and len(v) == 2 for v in labels.values())
    # top level first: 5 distinct top labels, 10 distinct level-1 labels
    assert len({tuple(v)[0] for v in labels.values()}) == 5
    assert len({tuple(v)[1] for v in labels.values()}) == 10
    res1 = db.run_script("""
    edges[a, b, w] := *e_tri{a, b, w}
    ?[grp, idx] <~ CommunityDetectionLouvain(edges[], keep_depth: 1)
    """)
    l1 = {r[1]: r[0] for r in res1.rows}
    assert all(len(v) == 1 for v in l1.values())
    assert {tuple(v)[0] for v in l1.values()} == \
        {tuple(v)[0] for v in labels.values()}  # the TOP level survives


def test_random_walk_deterministic(g, spark):
    from cozo_spark.fixed_rules.local_graphs import random_walk

    starts = spark.createDataFrame([(1,)], "n long")
    a = [tuple(r) for r in random_walk(g, starts, steps=5, seed=7).collect()]
    b = [tuple(r) for r in random_walk(g, starts, steps=5, seed=7).collect()]
    assert a == b and len(a) == 1
    assert a[0][2][0] == "1"


def test_label_propagation(spark):
    from cozo_spark.fixed_rules.graphs import label_propagation

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)], "src long, dst long")
    rows = label_propagation(e, iterations=5).collect()
    lab = {r["node"]: r["label"] for r in rows}
    assert lab[1] == lab[2] == lab[3]
    assert lab[4] == lab[5] == lab[6]


def test_clustering_coefficients(spark):
    from cozo_spark.fixed_rules.graphs import clustering_coefficients

    # triangle 1-2-3 plus pendant 3-4
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long")
    rows = {r["node"]: r for r in clustering_coefficients(e).collect()}
    assert rows[1]["cc"] == 1.0 and rows[1]["n_triangles"] == 1
    assert rows[3]["degree"] == 3 and rows[3]["cc"] == pytest.approx(1 / 3)
    assert rows[4]["n_triangles"] == 0


def test_scc_empty_edges(spark):
    """Regression: empty edge relation must yield an empty (node, component)
    frame, not IndexError from indexing an empty parts list."""
    from pyspark.sql.types import LongType, StructField, StructType
    from cozo_spark.fixed_rules.graphs import strongly_connected_components

    e = spark.createDataFrame(
        [], StructType([StructField("src", LongType()), StructField("dst", LongType())]))
    out = strongly_connected_components(e)
    assert out.columns == ["node", "component"]
    assert out.count() == 0


def test_pipeline_fixed_rules_in_cozoscript(spark):
    """LLM-pipeline operators are callable as CozoScript fixed rules:
    near-dup pairs -> clusters, packing, quality, language-id — the whole
    dedup pipeline composes inside one script."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create docs {id: Int => t: String}")
    d.run_script("""
    ?[id, t] <- [
      [1, 'the quick brown fox jumps over the lazy dog'],
      [2, 'the quick brown fox jumps over the lazy cat'],
      [3, 'completely different content about spark engines'],
      [4, 'the quick brown fox jumps over the lazy dog']
    ] :put docs {id => t}
    """)
    r = d.run_script("""
    pairs[a, b, j] <~ MinHashPairs(*docs[], threshold: 0.5, n_gram: 2)
    ?[a, b] := pairs[a, b, j]
    """)
    pair_set = sorted(tuple(x) for x in r.rows)
    assert (1, 4) in pair_set  # exact dups always pair
    r2 = d.run_script("""
    mh[a, b, j] <~ MinHashPairs(*docs[], threshold: 0.5, n_gram: 2)
    pairs[a, b] := mh[a, b, j]
    ?[doc, canon] <~ DedupClusters(pairs[a, b])
    """)
    clus = dict(tuple(x) for x in r2.rows)
    assert clus[4] == 1  # 4 clusters with canonical keeper 1
    r3 = d.run_script("?[id, n, chunk] <~ PackSequences(*docs[], capacity: 10, shards: 2)")
    assert len(r3.rows) == 4
    r4 = d.run_script("""
    q[doc_id, n_chars, n_words, mwl, ar, pr, sr, uwr, qual] <~ QualityScores(*docs[])
    ?[doc_id, n_words] := q[doc_id, n_chars, n_words, mwl, ar, pr, sr, uwr, qual]
    """)
    assert dict(tuple(x) for x in r4.rows)[1] == 9
    r5 = d.run_script("""
    corpus[id, t] := *docs[id, t], id <= 2
    bench[id, t] := *docs[id, t], id == 4
    ?[doc, b, ratio] <~ NgramContamination(corpus[], bench[], n: 2, threshold: 0.5)
    """)
    assert any(row[0] == 1 and row[1] == 4 for row in r5.rows)  # doc1 == doc4


def test_pipeline_fixed_rules_pii_repetition_sample_keywords(spark):
    """Round-3 pipeline rules: PiiRedact, RepetitionSignals, BalancedSample,
    KeywordTopK — callable from CozoScript and composable with filters."""
    from cozo_spark.datalog.engine import CozoDb

    d = CozoDb(spark)
    d.run_script(":create docs2 {id: Int => t: String, src: String}")
    d.run_script("""
    ?[id, t, src] <- [
      [1, 'mail me at bob@example.com or +1-555-123-4567 thanks', 'a'],
      [2, 'server at 10.1.2.3 went down down down down down', 'a'],
      [3, 'clean text with no identifiers at all here', 'b'],
      [4, 'spam spam spam spam spam spam spam spam', 'b']
    ] :put docs2 {id => t, src}
    """)
    r = d.run_script("""
    red[id, clean, ne, np, ni] <~ PiiRedact(*docs2[])
    ?[id, ne, np, ni] := red[id, clean, ne, np, ni]
    """)
    by_id = {row[0]: tuple(row[1:]) for row in r.rows}
    assert by_id[1] == (1, 1, 0)   # one email, one phone
    assert by_id[2] == (0, 0, 1)   # one IP
    assert by_id[3] == (0, 0, 0)
    clean1 = d.run_script("""
    red[id, clean, ne, np, ni] <~ PiiRedact(*docs2[])
    ?[clean] := red[1, clean, ne, np, ni]
    """).rows[0][0]
    assert "<EMAIL>" in clean1 and "<PHONE>" in clean1
    assert "bob@example.com" not in clean1

    r2 = d.run_script("""
    rep[id, u, b, t3] <~ RepetitionSignals(*docs2[])
    ?[id, u] := rep[id, u, b, t3], u > 0.9
    """)
    assert [row[0] for row in r2.rows] == [4]  # all-'spam' doc flagged

    r3 = d.run_script(
        "?[id, stratum] <~ BalancedSample(*docs2[], per_stratum: 1)")
    assert len(r3.rows) == 2  # one per stratum
    assert sorted(row[1] for row in r3.rows) == ["a", "b"]

    r4 = d.run_script("""
    kw[id, term, score, rank] <~ KeywordTopK(*docs2[], k: 1)
    ?[id, term] := kw[id, term, score, rank]
    """)
    top = dict(tuple(row) for row in r4.rows)
    assert top[4] == "spam"
