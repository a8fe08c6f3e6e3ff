"""40-put burst micro-benchmark (the BASELINE.md mutation-path row).

Creates a tiny relation, warms the put path, then times 40 one-row const
puts plus a read right after. Prints ONE JSON line. Used for interleaved
A/B runs (run alternating variants in the same minute; compare ratios,
not absolute numbers — the host band is ±35%, BASELINE.md).

Usage: python scripts/bench_put_burst.py [label]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "burst"

    from cozo_spark.session import get_spark
    from cozo_spark.datalog.engine import CozoDb

    spark = get_spark("bench_put_burst")
    spark.sparkContext.setLogLevel("ERROR")
    db = CozoDb(spark)
    db.run_script(":create t {k: Int => v: Int}")
    for i in range(6):  # warm the parse/translate/put path
        db.run_script(f"?[k, v] <- [[{i + 1000}, {i}]] :put t {{k => v}}")
    db.run_script("?[k, v] := *t[k, v]")

    lat = []
    t0 = time.time()
    for i in range(40):
        s = time.time()
        db.run_script(f"?[k, v] <- [[{i}, {i * 10}]] :put t {{k => v}}")
        lat.append(time.time() - s)
    wall = time.time() - t0
    r0 = time.time()
    rows = db.run_script("?[k, v] := *t[k, v]")
    read = time.time() - r0
    assert len(rows.rows) == 46, len(rows.rows)
    print(json.dumps({
        "label": label,
        "burst_wall_s": round(wall, 2),
        "puts_per_s": round(40 / wall, 2),
        "max_put_s": round(max(lat), 2),
        "p50_put_s": round(sorted(lat)[len(lat) // 2], 3),
        "read_after_s": round(read, 2),
    }))


if __name__ == "__main__":
    main()
