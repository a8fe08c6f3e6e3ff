"""Session-8 probe: split each headline query's warm cost into
(a) plan-BUILD wall (the fn(spark, sf_dir) call: py4j DataFrame
construction, engine dispatch, any build-time actions) and
(b) EXEC wall (the bench's own .count() action),
over N warm reps in one session. Fixpoint-style queries do their real
work at build time by design — the split shows exactly which queries
still pay a per-call driver constant that a stable plan identity
(the _t/_edges memo idiom) would remove.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_build_vs_exec.py [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cozo_spark import queries as Q  # noqa: E402
from cozo_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402  (single source of truth)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("cozo_spark_profile_build")
    Q.flagship(spark, sf_dir).collect()

    # warm every query once (JIT, parquet footers, plan caches)
    for name in HEADLINE:
        Q.QUERIES[name](spark, sf_dir).count()

    out = {}
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        out[name] = {
            "build_min": round(min(builds), 4),
            "exec_min": round(min(execs), 4),
            "build_med": round(sorted(builds)[len(builds) // 2], 4),
            "exec_med": round(sorted(execs)[len(execs) // 2], 4),
        }
        print(f"# {name}: build {out[name]['build_min']:.3f}s "
              f"exec {out[name]['exec_min']:.3f}s (min of {reps})",
              file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
