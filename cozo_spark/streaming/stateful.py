"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming engine (SURVEY §2.8) — this is the
Spark-native extension layer on top of the change feed: arbitrary per-key
state kept by the engine across micro-batches (and across restarts via the
checkpoint), with Arrow-batched pandas kernels doing the per-group work.

Two operators cover the common shapes:

- ``running_counts``: per-key cumulative event count — the minimal
  demonstration that state survives batches/restarts; the same skeleton
  hosts any per-key accumulator (dedup sets, sketches, rate counters).
- ``stream_sessionize``: gap-based sessionization with processing-time
  timeout — sessions close when no event arrives for ``gap_seconds``;
  closed sessions are emitted, open ones stay in state.

At scale, state is partitioned by the grouping key across executors and
checkpointed incrementally (RocksDB state store in production configs) —
the operator code is identical.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_COUNT_OUT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("n", T.LongType()),
])
_COUNT_STATE = T.StructType([T.StructField("n", T.LongType())])


def running_counts(stream: DataFrame, key_col: str) -> DataFrame:
    """Per-key cumulative count across micro-batches (and restarts —
    state lives in the checkpoint)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        seen = state.get[0] if state.exists else 0
        for pdf in pdfs:
            seen += len(pdf)
        state.update((seen,))
        yield pd.DataFrame({"key": [key[0]], "n": [seen]})

    return (
        stream.withColumn("key", F.col(key_col)).groupBy("key")
        .applyInPandasWithState(
            update, _COUNT_OUT, _COUNT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout)
    )


_SESS_OUT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("start_ts", T.DoubleType()),
    T.StructField("end_ts", T.DoubleType()),
])
_SESS_STATE = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("start_ts", T.DoubleType()),
    T.StructField("end_ts", T.DoubleType()),
])


def stream_sessionize(stream: DataFrame, key_col: str, ts_col: str,
                      gap_seconds: float = 30.0) -> DataFrame:
    """Gap-based sessions per key: a session closes (and is emitted) when no
    event arrives within ``gap_seconds`` of processing time; events extend
    the open session in state. The batch analogue (lag + cumulative window)
    is operators covered by the ``sessionize`` query; this is its streaming
    twin with engine-managed state + timeout."""

    gap_ms = int(gap_seconds * 1000)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            n, s, e = state.get
            state.remove()
            yield pd.DataFrame({"key": [key[0]], "n_events": [n],
                                "start_ts": [s], "end_ts": [e]})
            return
        n, s, e = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts = pdf[ts_col].astype(float)
            n += len(pdf)
            s = ts.min() if s is None else min(s, ts.min())
            e = ts.max() if e is None else max(e, ts.max())
        state.update((n, s, e))
        state.setTimeoutDuration(gap_ms)
        return
        yield  # pragma: no cover — make the function a generator

    return (
        stream.withColumn("key", F.col(key_col)).groupBy("key")
        .applyInPandasWithState(
            update, _SESS_OUT, _SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout)
    )


def stream_exact_dedup(stream: DataFrame, text_col: str = "text",
                       ts_col: str | None = None,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication: keep the first occurrence of each
    content hash across micro-batches.

    With ``ts_col``, uses `withWatermark` + `dropDuplicates` so the
    seen-hash state is BOUNDED — hashes older than the watermark are
    evicted (the only sane configuration for an unbounded 100 TB/day
    stream). Without a timestamp the state grows without bound
    (dropDuplicates alone); fine for bounded backfills only."""
    hashed = stream.withColumn("__h", F.md5(F.col(text_col)))
    if ts_col is not None:
        # dropDuplicatesWithinWatermark dedups on the HASH alone while
        # evicting seen-hash state older than the watermark (plain
        # dropDuplicates([hash, ts]) would only drop identical pairs)
        return (hashed.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["__h"]).drop("__h"))
    return hashed.dropDuplicates(["__h"]).drop("__h")


def stream_quality_filter(stream: DataFrame, text_col: str = "text",
                          min_words: int = 5,
                          max_stopword_ratio: float = 0.6) -> DataFrame:
    """Streaming quality gate: the same codegen column signals the batch
    quality_scores operator uses, applied per micro-batch (stateless, so
    it composes with any downstream stateful operator)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    stop = F.array(*[F.lit(w) for w in
                     ("the", "and", "of", "to", "is", "a", "in")])
    n_words = F.size(toks)
    stop_ratio = (F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
                  / F.greatest(n_words, F.lit(1)))
    return stream.filter((n_words >= min_words)
                         & (stop_ratio <= max_stopword_ratio))
