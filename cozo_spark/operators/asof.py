"""As-of (point-in-time) join — one shuffle, no range cross product.

The classic time-series lookup Spark's built-ins lack: for every left row,
the latest right row whose timestamp is <= the left timestamp, per key
(the semantics of the reference's validity time travel `@ ts`
(cozo-core/src/data/program.rs validity handling) generalized to joining
two arbitrary relations, and of DuckDB/kdb ASOF JOIN).

A naive range join (l.ts >= r.ts filtered to the max) is a per-key cross
product — quadratic in rows per key. This implementation is the classic
union trick: tag both sides, sort ONCE per key on (ts, side), and carry
the right side's payload forward with last(ignorenulls) over an
unbounded-preceding row frame. One hash shuffle on the key, one sort, no
window ever sees more than one key's rows, nothing quadratic — the same
plan shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame, right: DataFrame, by: list[str] | str,
    ts_left: str = "ts", ts_right: str = "ts",
    right_cols: list[str] | None = None, suffix: str = "_r",
    strict: bool = False, tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right
    row with right.ts <= left.ts (or < when ``strict``) in the same key
    group; right columns arrive suffixed, NULL when nothing precedes.

    ``tolerance`` (same unit as a ts difference) voids matches older than
    ``left.ts - tolerance`` — the "don't join stale quotes" guard. If
    several right rows share one (key, ts), the last one in (ts) order
    wins deterministically only if the caller pre-dedupes; pass a unique
    right side for reproducible results (mirrors DuckDB ASOF JOIN, which
    also assumes unique right timestamps per key).
    """
    keys = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != ts_right]
    lcols = [c for c in left.columns if c not in keys and c != ts_left]

    # side tag orders right rows BEFORE left at equal ts (inclusive <=);
    # strict mode orders them after instead
    r_tag, l_tag = (0, 1) if not strict else (1, 0)
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_right).cast("double").alias("__ts"),
        F.lit(r_tag).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols],
                 F.col(ts_right).cast("double").alias("__rts"))
        .alias("__pay"))
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_left).cast("double").alias("__ts"),
        F.lit(l_tag).alias("__side"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        *[F.col(c) for c in lcols])
    tagged = r.select(*keys, "__ts", "__side", "__pay",
                      *[F.lit(None).cast(dict(zip(left.columns,
                                                  [f.dataType for f in left.schema]))[c])
                        .alias(c) for c in lcols]) \
              .unionByName(l)

    w = (W.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = tagged.withColumn(
        "__match", F.last("__pay", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == l_tag)
    match = F.col("__match")
    if tolerance is not None:
        stale = match["__rts"] < (F.col("__ts") - F.lit(float(tolerance)))
        match = F.when(match.isNotNull() & ~stale, F.col("__match"))
    sel = ([F.col(k) for k in keys]
           + [F.col("__ts").alias(ts_left)]
           + [F.col(c) for c in lcols]
           + [match[c].alias(c + suffix) for c in right_cols]
           + [match["__rts"].alias(ts_right + suffix)])
    return out.select(*sel)
