"""Deterministic 10x scale-up of the driver's sf0.1 testdata -> local sf1.

Scale-cliff validation data (VERDICT r5 directive 1): everything green at
sf0.1 may hide broadcast-threshold / skew / epoch-count cliffs that only
show at 10x. This tiles each sf0.1 table N times with per-copy
perturbations chosen so the scaled data stays REPRESENTATIVE:

- fact/dim keys get disjoint per-copy offsets (referential integrity holds);
- timestamps shift per copy (temporal density per user/order unchanged);
- document text gets a per-copy word suffix (cross-copy Jaccard ~ 0, so
  dedup pair counts scale linearly like a real corpus, not quadratically
  like a cloned one);
- embeddings are cyclically dim-rotated per copy (intra-copy geometry —
  cluster structure, pairwise dots — preserved EXACTLY; cross-copy cosine
  scrambled, so ANN/near-dup candidate volume scales linearly).

Usage: python scripts/gen_sf.py [N] [out_dir]   (defaults: 10, .localdata/sf1)
Output is plain parquet directories readable by spark.read.parquet and
duckdb's 'dir/*.parquet' glob. Deterministic: no RNG anywhere.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

OFFSETS = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1 << 32},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
}
TS_SHIFT = {"orders": "o_orderdate", "lineitem": "l_shipdate",
            "events": "ts"}
COPY_AS_IS = ("nation", "region")


# Opt-in value-domain widening (--widen-values, VERDICT r7 #7): the default
# tiling repeats prices over a FIXED domain, so range-join candidate volume
# densifies superlinearly by construction. A real 100x corpus widens its
# value domain instead; these per-copy shifts keep each copy's price bands
# aligned with its own lineitems (l_extendedprice shift = 20x the
# p_retailprice shift — the band is retailprice*20 +/- 500), so matches
# scale linearly like a real corpus.
VALUE_SHIFT = {
    "part": {"p_retailprice": 5_000.0},
    "lineitem": {"l_extendedprice": 100_000.0},
}
WIDEN = False


def _copy(df, table: str, c: int):
    out = df
    for col, off in OFFSETS.get(table, {}).items():
        out = out.withColumn(col, F.col(col) + F.lit(c * off))
    if WIDEN:
        for col, off in VALUE_SHIFT.get(table, {}).items():
            out = out.withColumn(col, F.col(col) + F.lit(c * off))
    ts_col = TS_SHIFT.get(table)
    if ts_col and c:
        out = out.withColumn(
            ts_col, F.col(ts_col) + F.expr(f"INTERVAL {c * 7} DAYS"))
    if table == "documents" and c:
        # per-copy vocabulary: cross-copy shingle overlap drops to ~0
        out = (out.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", rf"$1q{c}"))
            .withColumn("n_chars", F.length("text").cast("long")))
    if table == "embeddings" and c:
        dim = F.size("embedding")
        k = F.lit(c % 8 + 1)
        out = out.withColumn(
            "embedding",
            F.concat(F.slice("embedding", k + 1, dim - k),
                     F.slice("embedding", F.lit(1), k)))
    return out


def main() -> None:
    global WIDEN
    args = [a for a in sys.argv[1:] if a != "--widen-values"]
    WIDEN = "--widen-values" in sys.argv[1:]
    n = int(args[0]) if args else 10
    out_dir = args[1] if len(args) > 1 else str(
        Path(__file__).resolve().parents[1] / ".localdata" / "sf1")
    os.makedirs(out_dir, exist_ok=True)
    from cozo_spark.session import get_spark

    spark = get_spark("gen_sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        if t in COPY_AS_IS:
            scaled = df
        else:
            parts = [_copy(df, t, c) for c in range(n)]
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        dest = f"{out_dir}/{t}.parquet"
        scaled.repartition(max(1, min(32, n))).write.mode("overwrite") \
            .parquet(dest)
        print(f"{t}: {spark.read.parquet(dest).count()} rows -> {dest}")


if __name__ == "__main__":
    main()
