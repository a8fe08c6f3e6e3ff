"""Above-1M-edge BetweennessCentralityDist row (r10, VERDICT r9 #8).

Graph: 1/10 sample of the sf10 orders projection (the same construction
as the r9 above-gate LouvainDist row — ~1.0M nodes / ~1.5M edges,
naturally above the Louvain gate and well past AUTO_EXACT_MAX_NODES, so
the DEFAULT auto-sampled pivot path is what gets timed). Runs in
reliable-checkpoint mode (COZO_SPARK_CHECKPOINT_DIR) — the documented
requirement for big-state centrality on a single node, established by the
sf3 boundary (localCheckpoint block eviction under GC pressure).

Usage: python scripts/bench_betweenness_sf10.py [sf10_dir] [ck_dir]
Prints one JSON line with wall, nodes/edges, pivots, and state-row bound.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
    ck_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/ck_bw"
    os.environ["COZO_SPARK_CHECKPOINT_DIR"] = ck_dir

    from pyspark.sql import functions as F
    from cozo_spark.session import get_spark

    spark = get_spark("bench_betweenness_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    from cozo_spark.fixed_rules import graphs as G

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_cust = o.select("o_custkey").distinct().count()
    edges = (o.filter(F.col("o_orderkey") % 10 == 0)  # the 1/10 sample
             .select(F.col("o_custkey").alias("src"),
                     (F.col("o_orderkey") % n_cust).alias("dst"))
             .filter(F.col("src") != F.col("dst")).distinct())
    edges = G._checkpoint(edges)
    n_edges = edges.count()
    n_nodes = (edges.select(F.col("src").alias("n"))
               .unionByName(edges.select(F.col("dst").alias("n")))
               .distinct().count())
    pivots = G._auto_pivots(n_nodes)
    t0 = time.perf_counter()
    nb = G.betweenness_centrality_sampled(edges).count()
    wall = round(time.perf_counter() - t0, 1)
    info = G.take_run_info() or {}
    print(json.dumps({
        "metric": "betweenness_dist_above_gate",
        "nodes": n_nodes, "edges": n_edges, "auto_pivots": pivots,
        "state_rows_bound_kV": pivots * n_nodes,
        "result_rows": nb, "wall_sec": wall,
        "checkpoint_mode": "reliable", "run_info": info,
    }))


if __name__ == "__main__":
    main()
