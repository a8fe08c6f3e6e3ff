"""Cluster-scale physical-layout helpers: bucketing and skew salting.

The operator battery's plans are declarative, so Catalyst + AQE pick
strategies; these helpers cover the two layout decisions Spark cannot make
by itself at 100 TB:

- **Bucketing**: a fact table joined repeatedly on the same key should be
  written bucketed+sorted on that key once — every subsequent join/agg on
  the key then runs exchange-free (SortMergeJoin over pre-bucketed scans).
  The reference needs no analogue (its B-tree primary keys ARE the layout);
  for Spark this is the equivalent decision.
- **Salting**: AQE's skew-join splitting handles moderate skew; pathological
  hot keys (one key = half the table) still serialize a join partition.
  `salt_explode`/`salt_join` implement the standard N-way salt: the small
  side replicates N×, the big side scatters uniformly, and the join key
  becomes (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_bucketed(df: DataFrame, table: str, keys: list, buckets: int = 64,
                  sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table. Joins and
    aggregations on ``keys`` between tables bucketed the same way run
    without a shuffle (assert with `join_is_exchange_free`)."""
    w = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_exchange_free(joined: DataFrame) -> bool:
    """True iff the executed plan contains no shuffle Exchange — the
    property bucketed co-located joins are for."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan


def salt_join(big: DataFrame, small: DataFrame, key: str,
              n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: scatter the big side over ``n_salts``
    sub-keys and replicate the small side once per salt. Output columns =
    big's ∪ small's (minus the duplicate key), like df.join(on=key).

    Use when ONE key dominates (AQE skew splitting caps at partition
    granularity); cost = small side replicated n_salts× (keep it the
    genuinely small side)."""
    salted_big = big.withColumn(
        "__salt", (F.xxhash64(F.monotonically_increasing_id()) % n_salts
                   + n_salts) % n_salts)
    salted_small = (small
                    .withColumn("__salt", F.explode(F.array(
                        *[F.lit(i) for i in range(n_salts)])))
                    .withColumn("__salt", F.col("__salt").cast("bigint")))
    out = salted_big.join(salted_small, on=[key, "__salt"], how=how)
    return out.drop("__salt")
