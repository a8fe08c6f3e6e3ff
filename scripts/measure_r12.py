"""Optimization-round measurement harness (guide §1).

For each declared query (or a named subset): capture .explain("formatted")
to plans/r12/<query>_<tag>.txt, and time the computation with the noop sink
(guide §1.4) — build (plan construction) and execution timed separately,
best-of-N execution. Jobs are labelled (guide §1.5).

Usage:
    python scripts/measure_r12.py [--tag before] [--queries a,b,c]
        [--sf-dir /root/testdata/sf0.1] [--attempts 3] [--no-plans]
        [--headline-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def plan_stats(plan_text: str) -> dict:
    import re

    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan_text)),
        "sort_merge_joins": plan_text.count("SortMergeJoin"),
        "broadcast_hash_joins": plan_text.count("BroadcastHashJoin"),
        "shuffled_hash_joins": plan_text.count("ShuffledHashJoin"),
        "nested_loop_joins": plan_text.count("BroadcastNestedLoopJoin"),
        "batch_eval_python": plan_text.count("BatchEvalPython"),
        "arrow_eval_python": plan_text.count("ArrowEvalPython"),
        "map_in_arrow": plan_text.count("MapInArrow") + plan_text.count("MapInPandas"),
        "wholestage_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan_text))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--attempts", type=lambda v: max(1, int(v)), default=3)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from cozo_spark import queries as Q
    from cozo_spark.session import get_spark

    import bench as B

    spark = get_spark("measure_r12")
    sf_dir = args.sf_dir

    # same warm-up discipline as bench.py: JVM, parquet footers, python
    # worker pool, interpreted-HOF JIT
    Q.flagship(spark, sf_dir).collect()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _noop(s):
        import numpy  # noqa: F401
        return s

    _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
    warm = F.pandas_udf(T.LongType())(_noop)
    spark.range(0, 1024, 1, 32).select(warm("id")).count()
    from cozo_spark.operators.dedup import minhash_lsh_dedup_pairs
    minhash_lsh_dedup_pairs(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(50),
        threshold=0.3).count()
    Q.flagship(spark, sf_dir).collect()
    time.sleep(3)

    if args.queries:
        names = args.queries.split(",")
    elif args.headline_only:
        names = list(B.HEADLINE)
    else:
        names = list(Q.ordered_queries().keys())

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    plans_dir.mkdir(parents=True, exist_ok=True)

    results = {}
    for name in names:
        fn = Q.QUERIES[name]
        rec: dict = {}
        # build time (plan construction incl. engine translate) — first call
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        rec["build_first_s"] = round(time.perf_counter() - t0, 4)
        # warm build
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        rec["build_warm_s"] = round(time.perf_counter() - t0, 4)

        if not args.no_plans:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
            rec["plan"] = plan_stats(plan)

        # noop-sink execution, best of N (computes every column, guide §1.4)
        best_noop = None
        for i in range(args.attempts):
            df = fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name} noop #{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best_noop = el if best_noop is None else min(best_noop, el)
        rec["noop_best_s"] = round(best_noop, 4)

        # count execution (the bench methodology), best of N
        best_count = None
        nrows = 0
        for i in range(args.attempts):
            df = fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name} count #{i}")
            t0 = time.perf_counter()
            nrows = df.count()
            el = time.perf_counter() - t0
            best_count = el if best_count is None else min(best_count, el)
        rec["count_best_s"] = round(best_count, 4)
        rec["rows"] = nrows
        spark.sparkContext.setJobDescription(None)
        results[name] = rec
        pstr = ""
        if "plan" in rec:
            p = rec["plan"]
            pstr = (f" | ex={p['exchanges']} smj={p['sort_merge_joins']}"
                    f" bhj={p['broadcast_hash_joins']} py={p['batch_eval_python'] + p['arrow_eval_python'] + p['map_in_arrow']}")
        print(f"# {name}: noop={rec['noop_best_s']:.3f}s count={rec['count_best_s']:.3f}s "
              f"build={rec['build_warm_s']:.3f}s rows={nrows}{pstr}", file=sys.stderr)

    out = {"tag": args.tag, "sf_dir": sf_dir, "results": results,
           "total_noop": round(sum(r["noop_best_s"] for r in results.values()), 4),
           "total_count": round(sum(r["count_best_s"] for r in results.values()), 4)}
    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
