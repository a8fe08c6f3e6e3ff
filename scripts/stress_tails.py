"""sf10 stress of the two superlinear-by-construction tails
(VERDICT r7 directive 7).

substring_dedup's sf5 growth is intrinsic shingle volume; range_join's is
an artifact of the default generator densifying a FIXED price domain. This
script measures both on data generated with `gen_sf.py N out --widen-values`
(per-copy price-domain shifts — the "real corpus widens its domain" shape)
and reports, for the range join, the candidate volume (binned equi-join
rows BEFORE the residual between-filter) against the final match count —
the scale-right shape is candidates ≈ 2x matches.

Usage: python scripts/stress_tails.py <sf_dir> [label]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    sf_dir = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else sf_dir

    from pyspark.sql import functions as F
    from cozo_spark.session import get_spark

    spark = get_spark("stress_tails")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict = {"label": label}

    # --- substring_dedup ---
    from cozo_spark.operators.dedup import substring_dup_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out["n_docs"] = docs.count()
    t0 = time.perf_counter()
    out["substring_dedup_rows"] = substring_dup_spans(docs, k=8).count()
    out["substring_dedup_s"] = round(time.perf_counter() - t0, 2)

    # --- range join: same bands as the range_join_prices query ---
    from cozo_spark.operators.rangejoin import range_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_extendedprice")
    bands = (spark.read.parquet(f"{sf_dir}/part.parquet")
             .filter(F.col("p_partkey") % 100 == 0)
             .select("p_partkey",
                     (F.col("p_retailprice") * 20 - 500).alias("lo"),
                     (F.col("p_retailprice") * 20 + 500).alias("hi")))
    out["n_lineitem"] = li.count()
    out["n_bands"] = bands.count()
    # candidate volume: binned equi-join WITHOUT the residual filter
    w = 1000.0
    lb = li.withColumn("__bin", F.floor(F.col("l_extendedprice") / w))
    rb = bands.withColumn("__bin", F.explode(F.sequence(
        F.floor(F.col("lo") / w).cast("long"),
        F.floor(F.col("hi") / w).cast("long"))))
    t0 = time.perf_counter()
    out["range_candidates"] = lb.join(rb, "__bin").count()
    out["range_candidates_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["range_matches"] = range_join(
        li, bands, "l_extendedprice", bin_width=w).count()
    out["range_join_s"] = round(time.perf_counter() - t0, 2)
    out["cand_over_match"] = round(
        out["range_candidates"] / max(1, out["range_matches"]), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
