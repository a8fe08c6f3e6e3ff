"""Measure the r6 distributed graph rules at a given SF (VERDICT r6 #1).

LouvainDist / BetweennessCentralityDist / ClosenessCentralityDist get their
BASELINE.md rows from this script. Unlike the 50-node oracle graph in
queries.py (sized for exact DuckDB replay), the graph here SCALES with the
data: src = o_custkey, dst = o_orderkey % |customers| — ~0.9|orders| edges
over ~|customers| nodes (sf0.1: ~15k nodes / ~135k edges; sf1: 10x), which
puts the node count past AUTO_EXACT_MAX_NODES so the DEFAULT auto-sampled
path (the one a user hits at scale) is what gets timed.

Usage: python scripts/bench_graph_rules.py [sf_dir] [--exact]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    exact = "--exact" in sys.argv

    from pyspark.sql import functions as F
    from cozo_spark.session import get_spark
    spark = get_spark("bench_graph_rules")
    spark.sparkContext.setLogLevel("ERROR")

    from cozo_spark.fixed_rules import graphs as G

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_cust = o.select("o_custkey").distinct().count()
    edges = (o.select(F.col("o_custkey").alias("src"),
                      (F.col("o_orderkey") % n_cust).alias("dst"))
             .filter(F.col("src") != F.col("dst")).distinct())
    edges = G._checkpoint(edges)
    n_edges = edges.count()
    n_nodes = (edges.select(F.col("src").alias("n"))
               .unionByName(edges.select(F.col("dst").alias("n")))
               .distinct().count())

    kw = {"sources": n_nodes} if exact else {}
    timings: dict = {}

    t0 = time.perf_counter()
    nb = G.betweenness_centrality_sampled(edges, **kw).count()
    timings["betweenness_dist"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    nc = G.closeness_centrality_dist(edges, **kw).count()
    timings["closeness_dist"] = round(time.perf_counter() - t0, 2)

    # default path (r8: small graphs route to the driver-side rule) AND
    # the forced distributed path, so the gate's effect and the paired
    # -round Dist improvement are both visible
    t0 = time.perf_counter()
    nl = G.louvain_communities(edges).count()
    timings["louvain_auto"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    nld = G.louvain_communities(edges, local_threshold=0).count()
    timings["louvain_dist"] = round(time.perf_counter() - t0, 2)
    assert nl == nld, (nl, nld)

    assert nb == nc == n_nodes, (nb, nc, n_nodes)
    print(json.dumps({
        "sf_dir": sf_dir, "nodes": n_nodes, "edges": n_edges,
        "mode": "exact" if exact else "default(auto)",
        "auto_pivots": (None if exact or n_nodes <= G.AUTO_EXACT_MAX_NODES
                        else G._auto_pivots(n_nodes)),
        "louvain_rows": nl, "timings_sec": timings,
        "total_sec": round(sum(timings.values()), 2),
    }))


if __name__ == "__main__":
    main()
