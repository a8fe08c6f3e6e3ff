"""Template bind cost vs full re-translation (VERDICT r10 #5).

The last-resort prepared TEMPLATE claims every shape the flat skeleton
refuses (negation params, aggregation-argument params, multi-clause
entries). For recursive programs the bind runs the fixpoint per seed by
nature; for the NON-recursive shapes the bind should be measurably
cheaper than re-translating the literal script — this publishes that
number so the "prepared" label carries measured meaning on every path
it claims (the deterministic translate-count assert lives in
tests/test_prepared_recursive.py::test_bind_beats_retranslation).

Method: per family, alternate bind-call and literal-call N times in one
session (interleaved — host noise hits both arms equally), timing ONLY
run_script_df (plan construction; these shapes are non-recursive, so no
jobs run inside the call). Reports medians and the ratio. Prints ONE
JSON line.

Usage: python scripts/bench_template_bind.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FAMILIES = {
    # param under a negated atom: flat skeleton refuses the hoist
    "negation_param": """
    half[a, b] := *edge{fr: a, to: b}, b % 2 == 0
    ?[a, b] := *edge{fr: a, to: b}, not half[b, $x]
    """,
    # param inside an aggregation argument
    "agg_arg_param": """
    contrib[a, s] := *edge{fr: a, to: b}, s = b * $w
    ?[a, sum(s)] := contrib[a, s]
    """,
    # disjunctive (multi-clause) entry
    "multi_clause_entry": """
    ?[b] := *edge{fr: $s, to: b}
    ?[b] := *edge{fr: b, to: $s}
    """,
    # r11 prefix template's sweet spot: a multi-join param-free PREFIX
    # before the param-dependent tail — the join pipeline caches, only
    # the tail re-translates per call
    "heavy_prefix": """
    joined[a, c, s0] := *edge{fr: a, to: b}, *edge{fr: b, to: c},
                        *edge{fr: c, to: d}, d % 3 == 0, s0 = d + a
    ?[a, sum(s)] := joined[a, c, s0], s = s0 * $w
    """,
}
# a FRESH param value per rep: a repeated value would hit the per-value
# plan cache (prepared binds land there too) and measure a dict lookup,
# not the template bind
PARAMS = {
    "negation_param": lambda i: {"x": 2 * i},
    "agg_arg_param": lambda i: {"w": i + 2},
    "multi_clause_entry": lambda i: {"s": i + 1},
    "heavy_prefix": lambda i: {"w": i + 2},
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 15

    import pyspark.sql.functions as F

    from cozo_spark.session import get_spark
    from cozo_spark.datalog.engine import CozoDb

    spark = get_spark("bench_template_bind")
    spark.sparkContext.setLogLevel("ERROR")
    db = CozoDb(spark)
    n = 400
    edges = spark.range(2 * n).select(
        (F.col("id") % n).alias("fr"),
        ((F.col("id") * 7 + 1) % n).alias("to"))
    db.register_dataframe("edge", edges, keys=["fr", "to"])

    def literal(script, params):
        s = script
        for k, v in params.items():
            s = s.replace(f"${k}", str(v))
        return s

    out = {}
    for fam, script in FAMILIES.items():
        mkp = PARAMS[fam]
        db.run_script_df(script, mkp(1000))  # build the template once
        binds, fulls = [], []
        for i in range(reps):
            p = mkp(i)  # fresh value: template bind, not a cache hit
            t0 = time.time()
            db.run_script_df(script, p)
            binds.append(time.time() - t0)
            t0 = time.time()
            db.run_script_df(literal(script, p) + f" # r{i}")  # bust cache
            fulls.append(time.time() - t0)
        b = statistics.median(binds)
        f = statistics.median(fulls)
        out[fam] = {"bind_ms": round(b * 1000, 1),
                    "full_ms": round(f * 1000, 1),
                    "ratio": round(f / b, 2) if b else None}
    print(json.dumps({"families": out, "reps": reps}))


if __name__ == "__main__":
    main()
