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

import re
from contextlib import contextmanager
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


@contextmanager
def streaming_state_conf(spark, state_partitions: int | None = 8,
                         rocksdb: bool = False,
                         changelog: bool = False):
    """Session-conf window for DEFINING AND STARTING stateful streams
    (r9, VERDICT r8 directive #4 — the per-micro-batch fixed cost).

    The dominant per-batch constant on small/medium state is NOT data
    volume but state-store bookkeeping: every stateful operator keeps one
    state-store instance PER SHUFFLE PARTITION, and every micro-batch
    snapshots/commits every instance (delta file + fsync each). At the
    default 32 shuffle partitions that is 32 commit paths per operator
    per batch regardless of row count. ``state_partitions`` pins
    ``spark.sql.shuffle.partitions`` (which the query bakes into its
    checkpoint at FIRST start) to a value sized to the state, cutting the
    constant proportionally; measured at sf0.1 in
    scripts/bench_fts_streaming.py. On a real cluster size it to
    max(expected_state_rows / ~1M, executors) — the setting is per-query
    and recorded in the checkpoint, so batch queries in the same session
    are unaffected outside this window.

    ``rocksdb=True`` additionally selects the RocksDB state store
    provider (incremental, off-heap — the right provider for state that
    exceeds executor memory; for small state the default HDFS-backed
    in-memory store has the lower constant).

    ``changelog=True`` (implies rocksdb) enables RocksDB CHANGELOG
    checkpointing (Spark 3.4+): per batch only the changed keys are
    written to the checkpoint instead of a full snapshot upload — the
    incremental-commit variant built for the per-batch fixed cost that
    dominated the r9 RocksDB negative result (full-snapshot uploads per
    batch). Measured in scripts/bench_fts_streaming.py.
    """
    conf = spark.conf
    saved: dict = {}

    def _set(k, v):
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)

    if state_partitions is not None:
        _set("spark.sql.shuffle.partitions", str(int(state_partitions)))
    if rocksdb or changelog:
        _set("spark.sql.streaming.stateStore.providerClass",
             "org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    if changelog:
        _set("spark.sql.streaming.stateStore.rocksdb."
             "changelogCheckpointing.enabled", "true")
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)

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


_NEARDUP_OUT = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("band_idx", T.IntegerType()),
    T.StructField("first_doc_id", T.LongType()),
])
_NEARDUP_STATE = T.StructType([T.StructField("first_doc_id", T.LongType())])


def _stream_minhash_sig(text_col: str, num_perm: int, shingle_n: int,
                        seed: int = 42):
    """Per-row MinHash signature as ONE Arrow-batched pandas-UDF column.

    The batch path (operators/dedup.minhash_signatures) explodes tokens and
    runs 64 codegen min-aggs — the right plan for a table scan, but window
    functions and groupBy-reuse don't apply per-row on a stream. A pure
    column-expression formulation was tried first and rejected: inlining the
    md5-gram chain into 64 array_min terms and then 16 band slices builds a
    >10k-node expression tree that Catalyst re-analyzes EVERY micro-batch —
    minutes of driver time for rows that take microseconds to process. The
    UDF is a single opaque node (tree stays small), Arrow-batched, and the
    Python workers are reused across batches.

    The hash is bit-identical to the batch operator (md5 digest bytes 8:12
    little-endian masked to [0, 2^31) == _md5_le31; same _perm_params), so
    a doc flagged by the stream is exactly a doc the batch LSH would pair —
    pinned by test_stream_minhash_sig_matches_batch."""
    import hashlib

    import numpy as np

    from cozo_spark.operators.dedup import _MERSENNE, _perm_params

    params = np.array(_perm_params(num_perm, seed), dtype=np.int64)
    av, bv = params[:, 0:1], params[:, 1:2]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            # Java's \s+ (the batch _word_ngrams splitter) is ASCII-only;
            # Python str.split() breaks on ANY Unicode whitespace, which
            # would change signatures for e.g. non-breaking spaces — match
            # the batch tokenization exactly (bit-identical-signature pin)
            toks = [w for w in
                    re.split(r"[ \t\n\x0b\f\r]+", (t or "").lower()) if w]
            if not toks:  # identity signature, as the batch operator
                out.append(np.full(num_perm, _MERSENNE, dtype=np.int64))
                continue
            hi = max(len(toks) - (shingle_n - 1), 1)
            grams = [" ".join(toks[i:i + shingle_n]) for i in range(hi)]
            hs = np.array(
                [int.from_bytes(hashlib.md5(g.encode()).digest()[8:12],
                                "little") & 0x7FFFFFFF for g in grams],
                dtype=np.int64)
            out.append(((av * hs[None, :] + bv) % _MERSENNE).min(axis=1))
        return pd.Series(out)

    return sig_udf(F.col(text_col))


def stream_neardup_candidates(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 64, bands: int = 16, shingle_n: int = 3,
    bucket_ttl_seconds: float | None = None,
) -> DataFrame:
    """Streaming near-duplicate detection against ALL history: each arriving
    document is flagged when any of its LSH band buckets is already occupied
    by an earlier (different) document.

    Emits (doc_id, band_idx, first_doc_id) per colliding band — the
    streaming twin of the batch MinHash+LSH candidate generator, with the
    bucket table as engine-managed per-key state instead of a shuffle join:
    state key = (band_idx, band_hash), value = first doc seen there.
    Signatures use the same hash family as the batch operator, so a doc
    flagged here is exactly a doc the batch pipeline would pair.

    State is partitioned across executors by bucket key and checkpointed;
    with ``bucket_ttl_seconds`` idle buckets are evicted on a processing-time
    timeout, bounding state for unbounded streams (the analogue of the
    watermark in stream_exact_dedup — without it, use only for bounded
    backfills)."""
    rows_per_band = max(1, num_perm // bands)
    sig = _stream_minhash_sig(text_col, num_perm, shingle_n)
    banded = (
        stream.withColumn("__sig", sig)
        .select(
            F.col(id_col).cast("long").alias("__doc_id"),
            F.posexplode(F.array(*[
                F.xxhash64(F.slice("__sig", i * rows_per_band + 1,
                                   rows_per_band))
                for i in range(bands)
            ])).alias("__band_idx", "__band_hash"))
    )
    ttl_ms = int(bucket_ttl_seconds * 1000) if bucket_ttl_seconds else None

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first = state.get[0] if state.exists else None
        out_docs, out_firsts = [], []
        for pdf in pdfs:
            for doc in pdf["__doc_id"]:
                doc = int(doc)
                if first is None:
                    first = doc
                elif doc != first:
                    out_docs.append(doc)
                    out_firsts.append(first)
        state.update((first,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out_docs:
            yield pd.DataFrame({
                "doc_id": out_docs,
                "band_idx": [int(key[0])] * len(out_docs),
                "first_doc_id": out_firsts,
            })

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return (
        banded.groupBy("__band_idx", "__band_hash")
        .applyInPandasWithState(
            update, _NEARDUP_OUT, _NEARDUP_STATE,
            outputMode="append", timeoutConf=timeout)
    )


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


def stream_windowed_counts(stream: DataFrame, ts_col: str,
                           key_col: str | None = None,
                           window_duration: str = "1 minute",
                           slide: str | None = None,
                           watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling/sliding-window event counts — the canonical
    late-data-tolerant streaming aggregation (built-in `window()` +
    `withWatermark`; Spark's state store evicts windows older than the
    watermark, so state stays bounded on an unbounded stream; rows later
    than the watermark are DROPPED, not misassigned).

    Output: (window_start, window_end[, key], n) in append mode — a window
    emits once, when the watermark passes its end. The batch analogue is a
    plain groupBy(window(...)); this wrapper exists because getting the
    watermark-before-groupBy ordering wrong silently disables eviction.
    """
    w = F.window(F.col(ts_col), window_duration, slide or window_duration)
    keys = [w] + ([F.col(key_col)] if key_col else [])
    agg = (stream.withWatermark(ts_col, watermark)
           .groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n")))
    cols = [F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end")]
    if key_col:
        cols.append(F.col(key_col))
    return agg.select(*cols, "n")


_ASOF_OUT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.DoubleType()),
    T.StructField("matched_ts", T.DoubleType()),
    T.StructField("matched_value", T.DoubleType()),
])
_ASOF_STATE = T.StructType([
    T.StructField("ts", T.DoubleType()),
    T.StructField("value", T.DoubleType()),
])


def stream_asof_enrich(left: DataFrame, right: DataFrame,
                       key_col: str = "key", ts_col: str = "ts",
                       id_col: str = "event_id",
                       value_col: str = "value") -> DataFrame:
    """Streaming point-in-time enrichment: each left event picks up the
    latest right value at-or-before its timestamp — the streaming twin of
    operators/asof.asof_join, which Spark's native stream-stream joins
    cannot express (they only do windowed equality ranges).

    State per key = the single newest right row seen so far (the standard
    streaming-enrichment trade-off: a right update older than the
    retained one is ignored, and a left event older than the retained
    right gets NULL rather than a time-travel rewind — exact as-of over
    late data needs the batch operator). Within a micro-batch rows ARE
    ordered by event time with right-before-left at ties, so a quote and
    a trade arriving together enrich exactly like the batch join."""
    l_ = left.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(id_col).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("side"))
    r_ = right.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("double").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
        F.lit(0).alias("side"))
    merged = l_.unionByName(r_)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        best_ts, best_v = state.get if state.exists else (None, None)
        out = []
        for pdf in pdfs:
            for _, row in pdf.sort_values(["ts", "side"]).iterrows():
                if row["side"] == 0:  # right update
                    if best_ts is None or row["ts"] >= best_ts:
                        best_ts, best_v = float(row["ts"]), \
                            float(row["value"])
                else:  # left event: enrich with the retained right
                    hit = best_ts is not None and best_ts <= row["ts"]
                    out.append({
                        "key": key[0], "event_id": int(row["event_id"]),
                        "ts": float(row["ts"]),
                        "matched_ts": best_ts if hit else None,
                        "matched_value": best_v if hit else None,
                    })
        if best_ts is not None:
            state.update((best_ts, best_v))
        yield pd.DataFrame(out, columns=[f.name for f in _ASOF_OUT])

    return (merged.groupBy("key")
            .applyInPandasWithState(
                update, _ASOF_OUT, _ASOF_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
