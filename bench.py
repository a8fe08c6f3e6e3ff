"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion (collect or count on the final result —
results are small top-k/aggregate outputs, so the driver-side cost is nil and
the measurement is scan+shuffle+compute).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cozo_spark import queries as Q  # noqa: E402
from cozo_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "agg_basic",
    "join_multiway",
    "scan_filter_project",
    "sort_topk",
    "reorder_sort_rank",
    "validity_asof",
    "neg_join_anti",
    "graph_reachability",
    "graph_shortest_hops",
    "graph_degree_centrality",
    "dedup_exact",
    "text_word_topk",
    "ann_cosine_topk",
    "minhash_lsh_pairs",
    "sessionize",
    "window_running_sum",
    "datalog_recursion",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("cozo_spark_bench")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    Q.flagship(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
