"""sf10 rows for the operator tails not yet measured at 100x
(r9, VERDICT r8 directive #7): dedup_clusters, ann_ivf_topk, ann_pq_topk,
kmeans_clusters, asof_join_events, events_rollup.

Drives the SAME callables the driver runs (cozo_spark.queries.QUERIES) at
two scale points so wall-clock ratios are apples-to-apples with
CORRECTNESS/BENCH rows. Each query runs twice; the WARM (second) time is
reported — steady-state, not JVM/footer warmup — plus the cold first run.

Usage: python scripts/stress_tails_ops.py <sf_dir> [label] [names...]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_NAMES = ("dedup_clusters", "ann_ivf_topk", "ann_pq_topk",
                 "kmeans_clusters", "asof_join_events", "events_rollup")


def main() -> None:
    sf_dir = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else sf_dir
    names = sys.argv[3:] or list(DEFAULT_NAMES)

    from cozo_spark.session import get_spark
    from cozo_spark import queries as Q

    spark = get_spark("stress_tails_ops")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict = {"label": label}
    for name in names:
        fn = Q.QUERIES[name]
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        warm = time.perf_counter() - t0
        out[name] = {"rows": rows, "cold_s": round(cold, 2),
                     "warm_s": round(warm, 2)}
        print(f"# {name}: {rows} rows cold {cold:.2f}s warm {warm:.2f}s",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
