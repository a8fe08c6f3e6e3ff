"""Deduplication operators for training-data pipelines.

- exact: content-hash groupBy (the only one with a trivially SQL-expressible
  oracle);
- MinHash + LSH banding: shingle → minhash signature → band buckets →
  bucket self-join → Jaccard verify. Mirrors the reference's MinHash-LSH
  index (cozo-core/src/runtime/minhash_lsh.rs:1-389) as a batch operator;
- SimHash: 64-bit hyperplane-free simhash over token hashes, hamming
  banding for candidate pairs;
- n-gram Jaccard: exact set-similarity join (verification path / small data).

Scale design (100 TB): every candidate-generation step shuffles *hashes*, not
documents — text leaves the scan only to compute signatures (JVM-side xxhash
via F.xxhash64, no Python). The band-bucket join keys are (band_id, band_hash)
so the self-join is an equi-join Catalyst can shuffle-partition; enormous
buckets (stop-shingle pathologies) are capped to bound the quadratic verify.
"""

from __future__ import annotations

import logging
import threading

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from cozo_spark.plans.memo import plan_memo

_log = logging.getLogger("cozo_spark.operators.dedup")

_CACHE_SLOTS: dict = {}
_CACHE_GEN: dict = {}
_CACHE_LOCK = threading.Lock()


def _cache_rotating(df: DataFrame, slot: str) -> DataFrame:
    """.cache() with a one-table-per-operator retention contract (r8
    ADVICE: the returned plans are lazy, so there is no safe in-function
    unpersist point, and plain .cache() accumulated signature tables in
    executor storage across calls in a long-lived session). Each call
    unpersists the PREVIOUS call's cached table for the same slot —
    bounded storage, and correctness is unaffected if a stale lazy plan is
    still held (Spark recomputes uncached branches). An eager
    localCheckpoint was A/B-tested instead and rejected: +0.3-0.5 s on the
    minhash headline (the extra materialization job) vs lazy cache.

    An identical re-invocation (same input plan — e.g. a re-run of the
    same query in a benchmark or dashboard loop) returns the PREVIOUS
    cached frame instead of rotating, preserving the cross-call cache hit
    plain .cache() gave for free."""
    with _CACHE_LOCK:
        prev = _CACHE_SLOTS.get(slot)
        if prev is not None:
            try:
                if (prev.sparkSession is df.sparkSession
                        and prev._jdf.queryExecution().analyzed().sameResult(
                            df._jdf.queryExecution().analyzed())):
                    return prev  # same plan: reuse the cached table
            except Exception:
                pass
            try:
                prev.unpersist()
            except Exception:
                pass
            _CACHE_SLOTS.pop(slot, None)
            # rotation invalidates any memoized plan built over the
            # unpersisted table: consumers key their plan_memo on this
            # generation, so a later identical call rebuilds (and
            # re-caches) instead of serving a plan that silently lost its
            # cached subtree (r11 review finding)
            _CACHE_GEN[slot] = _CACHE_GEN.get(slot, 0) + 1
        out = df.cache()
        _CACHE_SLOTS[slot] = out
    return out

# Mersenne prime 2^61-1: standard universal-hash modulus; keeps products in
# the 64-bit range when operands are < 2^31.
_MERSENNE = (1 << 61) - 1
_MAX_BUCKET = 1000  # cap quadratic blowup inside one LSH bucket
_MAX_CROSS = 1_000_000  # cap per-signature-pair doc-pair expansion (simhash)
_OBS_COUNTER = [0]  # uniquifies DataFrame.observe names within a session


def _observe_logged(df: DataFrame, name: str, metrics: dict,
                    warn_keys: tuple, timeout: float = 900.0) -> DataFrame:
    """Attach DataFrame.observe metrics AND give them a runtime signal.

    Observe metrics ride the normal action for free but are write-only
    unless someone reads them — the r7 ADVICE finding. This helper attaches
    a pyspark Observation and a daemon watcher thread that polls the JVM
    Observation's non-blocking ``getRowOrEmpty`` until the first action
    completes (or `timeout` passes, if the DataFrame is never executed),
    then logs a WARNING for any `warn_keys` metric > 0. Zero extra Spark
    jobs; the thread exits after one poll success, and the poll interval
    backs off 0.2s → 5s so a never-executed DataFrame costs a handful of
    wakeups, not 900 at 1 Hz. Falls back to a plain (unwatched) .observe
    under Spark Connect, where the JVM handle isn't reachable — logged at
    INFO, as is ANY watcher bail-out (r8 ADVICE: the degradation of the
    cap warnings must itself be visible, never silent). Polling the
    private ``Observation._jo`` handle is deliberate: a
    QueryExecutionListener would be public API but is session-global
    (leaks across concurrent operators and needs explicit deregistration);
    the failure mode here is benign and now observable."""
    _OBS_COUNTER[0] += 1
    uname = f"{name}_{_OBS_COUNTER[0]}"
    cols = [c.alias(k) for k, c in metrics.items()]
    try:
        from pyspark.sql import Observation

        obs = Observation(uname)
        odf = df.observe(obs, *cols)
        jo = obs._jo
        if jo is None:  # Connect: no JVM-side handle to poll
            _log.info(
                "%s: no JVM Observation handle (Spark Connect?) — cap "
                "metrics are recorded but cap WARNINGs are disabled", uname)
            return odf
    except Exception as exc:
        _log.info(
            "%s: Observation attach failed (%s) — cap metrics ride a plain "
            "observe; cap WARNINGs are disabled", uname, exc)
        return df.observe(uname, *cols)

    def _watch() -> None:
        import time

        deadline = time.time() + timeout
        interval = 0.2
        while time.time() < deadline:
            try:
                if jo.getRowOrEmpty().isDefined():
                    vals = obs.get
                    for k in warn_keys:
                        v = vals.get(k) or 0
                        if v and v > 0:
                            _log.warning(
                                "%s: %s=%s — a cap fired; results in the "
                                "affected buckets are connectivity-preserving "
                                "but not exhaustive (see operator docstring)",
                                uname, k, v)
                    return
            except Exception as exc:
                # visible degradation (r8 ADVICE): API change / JVM
                # teardown must not silently re-silence the cap warnings
                _log.info("%s: observe watcher stopped (%s) — cap "
                          "WARNINGs disabled for this run", uname, exc)
                return
            time.sleep(interval)
            interval = min(interval * 2, 5.0)

    threading.Thread(target=_watch, daemon=True,
                     name=f"obs-watch-{uname}").start()
    return odf


def _integrate(f, a: float, b: float, n: int = 256) -> float:
    """Composite Simpson's rule (n even panels). The reference integrates to
    1e-3 absolute tolerance (minhash_lsh.rs _ALLOWED_INTEGRATE_ERR); Simpson
    at n=256 on these smooth monotone integrands is far inside that."""
    if b <= a:
        return 0.0
    h = (b - a) / n
    s = f(a) + f(b)
    for i in range(1, n):
        s += f(a + i * h) * (4.0 if i % 2 else 2.0)
    return s * h / 3.0


def find_optimal_lsh_params(
    threshold: float, num_perm: int,
    false_positive_weight: float = 1.0,
    false_negative_weight: float = 1.0,
) -> tuple[int, int]:
    """(n_bands, n_rows_in_band) minimizing the weighted false-positive +
    false-negative probability of the banding S-curve, exactly the
    reference's planner (runtime/minhash_lsh.rs:260-290 find_optimal_params;
    defaults per parse/sys.rs: threshold 0.9, weights 1.0/1.0):

      P(candidate | s) = 1 - (1 - s^r)^b
      FP = ∫_0^t P(s) ds,   FN = ∫_t^1 (1 - P(s)) ds

    Note the reference then uses b·r as the effective num_perm (may be less
    than requested, relation.rs:793-801)."""
    min_error = float("inf")
    opt = (1, 1)
    for b in range(1, num_perm + 1):
        for r in range(1, num_perm // b + 1):
            fp = _integrate(lambda s: 1.0 - (1.0 - s ** r) ** b, 0.0, threshold)
            fn = _integrate(lambda s: (1.0 - s ** r) ** b, threshold, 1.0)
            error = fp * false_positive_weight + fn * false_negative_weight
            if error < min_error:
                min_error = error
                opt = (b, r)
    return opt


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(content_hash, keeper_id, n_copies) per distinct content.

    md5 of the raw content as group key; keeper = min id (deterministic).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (min id wins)."""
    w = W.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def _spread_small_input(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition doc-level rows by id when the source has fewer partitions
    than the cluster's parallelism. A single-row-group parquet file scans as
    ONE task, so the tokenize/explode stage would run single-threaded; the
    doc-level shuffle is tiny (raw text rows) and downstream per-doc windows
    reuse the hash partitioning. At real scale the source already has
    >= defaultParallelism partitions and this is a no-op (no added shuffle)."""
    sc = df.sparkSession.sparkContext
    defp = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n < defp:
        return df.repartition(defp, id_col)
    return df


def _shingles(df: DataFrame, text_col: str, n: int,
              id_col: str | None = None) -> DataFrame:
    """Explode each doc into its distinct word n-gram shingles, pre-hashed to
    64-bit (xxhash64, JVM-side) so downstream never touches strings.

    ``id_col`` routes the input through _spread_small_input first (r12):
    the split/transform/explode/xxhash64 map work otherwise runs inside
    the scan stage, which for a small single-row-group parquet file is ONE
    task — single-threaded shingling no matter how many cores. No-op at
    real scale (source partitions >= parallelism)."""
    if id_col is not None:
        df = _spread_small_input(df, id_col)
    words = F.split(F.lower(F.col(text_col)), "\\s+")
    # sliding word windows via transform over index sequence
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    return df.withColumn("_gram", F.explode(F.array_distinct(grams))).withColumn(
        "_gram_hash", F.xxhash64("_gram")
    )


def _perm_params(num_perm: int, seed: int):
    import random

    rnd = random.Random(seed)
    # coefficient ranges sized so a*x + b < 2^61 — no int64 overflow
    # (a < 2^30, x < 2^31, b < 2^30)
    return [(rnd.randrange(1, 1 << 30), rnd.randrange(0, 1 << 30)) for _ in range(num_perm)]


def _md5_le31(c):
    """Low 31 bits of DuckDB-compatible md5_number_lower(s): md5 digest bytes
    8:16 little-endian, masked to [0, 2^31). Pure codegen — md5 + hex
    shuffling + conv."""
    hexp = F.md5(F.encode(c, "UTF-8"))
    le = F.concat(F.substring(hexp, 23, 2), F.substring(hexp, 21, 2),
                  F.substring(hexp, 19, 2), F.substring(hexp, 17, 2))
    return F.conv(le, 16, 10).cast("long").bitwiseAND(F.lit(0x7FFFFFFF))


def _md5_le64(c):
    """Full md5_number_lower(s) as a signed int64 (two's complement), via
    conv(hex, 16, -10) — Spark's signed-target base conversion."""
    hexp = F.md5(F.encode(c, "UTF-8"))
    le = F.concat(*[F.substring(hexp, 31 - 2 * i, 2) for i in range(8)])
    return F.conv(le, 16, -10).cast("long")


def _word_ngrams(df: DataFrame, text_col: str, id_col: str, n: int,
                 keep_empty: bool = False) -> DataFrame:
    """(id, gram) rows: lowercase word n-grams, built JVM-side and
    MAP-ONLY — zero shuffles (higher-order functions are CodegenFallback
    and Pandas UDFs carry variable multi-second stage costs; the previous
    window-lead formulation shuffled + sorted the token stream per doc).
    Docs with fewer than n words yield their single shorter gram; token-less
    docs yield no rows — unless ``keep_empty``, which emits ONE (id, NULL)
    sentinel row per token-less doc (outer generators) so a downstream
    per-doc aggregation covers every doc without a join-back to the
    source (r12: the join-back was a full-table exchange + broadcast
    barrier at scale)."""
    ws = F.array_remove(F.split(F.lower(F.col(text_col)), "\\s+"), "")
    base = (_spread_small_input(df.select(F.col(id_col), F.col(text_col)),
                                id_col)
            .select(F.col(id_col), ws.alias("_ws")))
    if n == 1:
        gen = F.explode_outer if keep_empty else F.explode
        return base.select(id_col, gen("_ws").alias("gram"))
    # MAP-ONLY shingling (r7, replaces the window-lead formulation whose
    # partitionBy-doc shuffle + sort was ~half the signature-build cost):
    # arrays_zip over n shifted slices of the token array gives the struct
    # (w[p], w[p+1], ..., w[p+n-1]) at each position, padded with nulls at
    # the tail. slice/arrays_zip/concat_ws are regular codegen expressions
    # (unlike lambda HOFs, which are CodegenFallback), so the whole stage
    # stays in whole-stage codegen and never shuffles — shingling at scale
    # is embarrassingly parallel.
    shifted = [F.col("_ws").alias("_w0")] + [
        F.slice("_ws", i + 1,
                F.greatest(F.size("_ws") - i, F.lit(0))).alias(f"_w{i}")
        for i in range(1, n)]
    gen = F.posexplode_outer if keep_empty else F.posexplode
    g = base.select(
        id_col, F.size("_ws").alias("_nw"),
        gen(F.arrays_zip(*shifted)).alias("_pos", "_g"))
    # full grams only, except: a doc shorter than n words keeps its single
    # (shorter) leading gram — concat_ws skips the null tail
    keep = (F.col(f"_g._w{n-1}").isNotNull()
            | ((F.col("_nw") < n) & (F.col("_pos") == 0)))
    gram = F.concat_ws(" ", *[F.col(f"_g._w{i}") for i in range(n)])
    if keep_empty:
        # the outer generator's sentinel row (empty/null token array) has
        # NULL pos; keep it, with a NULL gram (not concat_ws's "")
        keep = keep | F.col("_pos").isNull()
        gram = F.when(F.col("_pos").isNotNull(), gram)
    return g.filter(keep).select(id_col, gram.alias("gram"))


def _shingle_hash31(c, hash_fn: str):
    """Shingle → [0, 2^31) hash column, JVM-side either way.

    'md5' (default): DuckDB's md5_number_lower low bits — the gate/oracle
    path, SQL-reproducible but ~6 codegen string ops per gram.
    'xxhash64': one native hash call, the production path for corpora that
    don't need a DuckDB-checkable pipeline (measured ~0.3 s cheaper at
    sf0.1 on the headline LSH query — see BASELINE.md)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(c).bitwiseAND(F.lit(0x7FFFFFFF))
    if hash_fn == "md5":
        return _md5_le31(c)
    raise ValueError(f"unknown shingle hash {hash_fn!r} (md5|xxhash64)")


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 64, shingle_n: int = 3, seed: int = 42,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures.

    Permutation i is the universal hash (a_i * x + b_i) mod M over the
    shingle hashes; sig_i = min over shingles. Fully JVM-side: n-gram rows
    from _word_ngrams, then ONE hash-aggregate with 64 codegen'd min
    expressions. Map-side partial aggregation collapses each doc to a single
    64-long row before the shuffle, so shuffle volume is |docs|·512B no
    matter how long the documents are. (An Arrow/numpy-kernel variant was
    used previously; Pandas-UDF stages showed multi-second variable
    scheduling costs, while this plan is flat and whole-stage codegen.)

    Shingle hash = low 64 bits of md5 (little-endian bytes 8:16 — exactly
    DuckDB's ``md5_number_lower``, so the whole pipeline is SQL-checkable),
    folded to [0, 2^31). Docs with no tokens get the identity signature
    [M]*num_perm — via a sentinel (id, NULL) gram row folded to M inside
    the one aggregation (r12), NOT a LeftOuter join-back to the source:
    the join-back was a broadcast barrier plus a SECOND scan of the
    document table, a full-table exchange at 100 TB scale.
    """
    params = _perm_params(num_perm, seed)
    grams = _word_ngrams(df.select(id_col, text_col), text_col, id_col,
                         shingle_n, keep_empty=True)
    # min is duplicate-insensitive, so no distinct on grams is needed
    h = _shingle_hash31(F.col("gram"), hash_fn)
    if hash_fn != "md5":
        # xxhash64(NULL) returns the seed, not NULL — keep the token-less
        # sentinel NULL so nvl below folds it to the identity value
        h = F.when(F.col("gram").isNotNull(), h)
    hashed = grams.select(id_col, h.alias("h"))
    # the num_perm min-aggregates as ONE parsed expression: building them as
    # individual Column ops cost ~1 s of py4j round-trips PER CALL (measured
    # r11, guide §7.3 driver-side work); the parsed tree and therefore the
    # computed values are identical (aL*h long math, same fold).
    # nvl(_, M): only the token-less sentinel row is NULL, and no real
    # shingle can reach M ((a*h+b) % M < M), so non-empty docs are untouched
    # and empty docs aggregate to the identity signature.
    mins = ", ".join(
        f"min(nvl(({a}L * h + {b}L) % {_MERSENNE}L, {_MERSENNE}L))"
        for a, b in params)
    return (hashed.groupBy(id_col)
            .agg(F.expr(f"array({mins})").alias("sig")))


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 16, rows_per_band: int = 4,
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs via banding.

    Signature is split into `bands` bands of `rows_per_band` values; docs
    sharing any band hash land in the same bucket. Bucket key is
    (band_idx, hash(band_slice)) — a plain equi-join key, so the self-join is
    one shuffle. Buckets above _MAX_BUCKET members fall back to STAR pairing
    (every member against the bucket's min id) instead of all-pairs — O(n)
    output instead of O(n^2) (r8; the previous behavior dropped the bucket
    entirely, which silently zeroed out clusters of >_MAX_BUCKET
    near-identical documents — exactly the heaviest dedup targets).

    Star-pairing caveat (r8 ADVICE): connectivity through the bucket is
    guaranteed only AT THE CANDIDATE level. minhash_lsh_dedup_pairs then
    verifies candidates by est_jaccard >= threshold, so two bucket members
    that are similar to each other but NOT to the min-id representative can
    lose their pair after verification (unlike the simhash stage-1 star
    fallback, where all group members share an identical signature and
    every star edge verifies at hamming 0). Such members usually share
    another, smaller band bucket — a >_MAX_BUCKET bucket whose members
    split into multiple genuine similarity clusters means >1000 docs agree
    on one band but diverge elsewhere, which is the stop-shingle pathology
    this cap exists to bound. The `star_buckets` observe metric counts the
    fallback and is logged as a warning by a watcher thread when it fires.
    """
    # band-hash array as ONE parsed expression (same xxhash64-over-slice
    # tree as the former per-Column build; r11 py4j-build-cost cut)
    band_arr = ", ".join(
        f"xxhash64(slice(sig, {i * rows_per_band + 1}, {rows_per_band}))"
        for i in range(bands))
    b = (
        sigs.select(
            id_col,
            F.expr(f"posexplode(array({band_arr}))")
            .alias("band_idx", "band_hash"),
        )
    )
    # one shuffle: group ids per bucket, expand pairs in-bucket (quadratic
    # only within a bucket, capped) — avoids the window + self-join (which
    # cost two extra shuffles of the full banded table)
    all_buckets = (
        b.groupBy("band_idx", "band_hash")
        .agg(F.collect_list(id_col).alias("ids"))
    )
    # no-silent-caps: star-fallback stats ride the normal action via
    # DataFrame.observe (zero extra jobs) and a watcher thread logs a
    # warning when the fallback fires (_observe_logged)
    all_buckets = _observe_logged(
        all_buckets, "lsh_bucket_cap",
        {"star_buckets": F.sum((F.size("ids") > _MAX_BUCKET).cast("long")),
         "max_bucket_size": F.max(F.size("ids"))},
        warn_keys=("star_buckets",))
    buckets = all_buckets.filter(F.size("ids") >= 2)

    # in-bucket pair expansion as two codegen'd generators (posexplode ×2 +
    # positional filter) — whole-stage codegen end to end. Both the Arrow
    # numpy kernel (np.triu_indices) and the higher-order-function
    # formulation were tried and rejected: pandas-UDF stages carry a
    # multi-second scheduling/worker fixed cost that dominates at bench
    # scale (measured 2.9-18.8s for identical work vs 0.4s here), and HOFs
    # are CodegenFallback with JIT-code-cache-dependent latency.
    # Over-cap buckets: the first generator shrinks to the bucket's min id
    # (star pairing) so output stays O(n) and the cluster stays connected.
    over = F.size("ids") > _MAX_BUCKET
    e1_src = F.when(over, F.array(F.array_min("ids"))).otherwise(F.col("ids"))
    e1 = buckets.select(
        "ids", over.alias("_star"), F.posexplode(e1_src).alias("i", "ida"))
    e2 = (e1.select("_star", "i", "ida", F.posexplode("ids").alias("j", "idb"))
          .filter(F.when(F.col("_star"), F.col("ida") != F.col("idb"))
                  .otherwise(F.col("j") > F.col("i"))))
    return (
        e2.select(F.least("ida", "idb").alias("id_a"),
                  F.greatest("ida", "idb").alias("id_b"))
        .distinct()
    )


@plan_memo(extra_key=lambda *a, **k: _CACHE_GEN.get("minhash_sigs", 0))
def minhash_lsh_dedup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.7, num_perm: int = 64, shingle_n: int = 3,
    bands: int = 16, seed: int = 42, hash_fn: str = "md5",
) -> DataFrame:
    """(id_a, id_b, est_jaccard): near-duplicate pairs above threshold.

    Candidate pairs from LSH banding, then verified by estimated Jaccard =
    fraction of matching signature positions (the minhash estimator). For the
    reference's semantics see runtime/minhash_lsh.rs:1-389 + parse/sys.rs:62-74
    (n_perm / target threshold → band planning).

    ``hash_fn`` selects the shingle hash: 'md5' (default, DuckDB-oracle-
    reproducible) or 'xxhash64' (production; same plan shape, one native
    hash call instead of the md5+conv chain).
    """
    rows_per_band = max(1, num_perm // bands)
    # shared by three consumers (banding + both verify joins); rotating
    # cache bounds storage to one signature table per operator (r8 ADVICE)
    sigs = _cache_rotating(
        minhash_signatures(df, text_col, id_col, num_perm, shingle_n,
                           seed, hash_fn=hash_fn), "minhash_sigs")
    pairs = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    bdf = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))

    # signature match fraction as a flat 64-term codegen expression
    # (element_at equality sum). Both the Arrow numpy kernel and the
    # zip_with/aggregate HOF were tried and rejected: the kernel's
    # pandas-UDF stage carries a multi-second variable fixed cost on loaded
    # hosts, and HOFs are CodegenFallback (interpreted, code-cache
    # sensitive). This stays in whole-stage codegen with the joins.
    # (CASE WHEN sig_a[i]=sig_b[i] THEN 1 ELSE 0 END) sum as ONE parsed
    # expression — identical tree to the former per-Column build (SQL [i]
    # is 0-based where element_at is 1-based), ~0.5 s less py4j per call
    terms = " + ".join(
        f"(CASE WHEN sig_a[{i}] = sig_b[{i}] THEN 1 ELSE 0 END)"
        for i in range(num_perm))
    est = F.expr(f"({terms})") / F.lit(float(num_perm))
    return (
        pairs.join(a, "id_a").join(bdf, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


@plan_memo
def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, jaccard): EXACT n-gram Jaccard similarity join.

    Shingle-explode + equi-join on shingle hash + count intersection;
    |A∪B| = |A|+|B|-|A∩B|. Quadratic only within shared shingles — fine as a
    verification pass or at moderate cardinality; the LSH path is the
    candidate generator at scale.
    """
    sh = _shingles(df.select(id_col, text_col), text_col, shingle_n,
                   id_col=id_col).select(
        F.col(id_col).alias("id"), F.col("_gram_hash").alias("g")).distinct()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("a").join(sh.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 2) -> DataFrame:
    """(id, simhash: long): 64-bit SimHash over shingle hashes.

    bit_j(sig) = majority over DISTINCT shingles of bit_j(md5_le64(shingle)).
    Fully JVM-side: distinct (id, gram-hash) rows, then one hash-aggregate
    with 64 codegen'd conditional sums; map-side partial aggregation
    collapses each doc before the shuffle. Token-less docs get simhash 0 —
    via a sentinel (id, NULL) gram row whose NULL bit-sums drive every
    majority CASE to its 0 branch (r12), NOT a LeftOuter join-back to the
    source (which was a broadcast barrier + second document-table scan).
    The hash is DuckDB's md5_number_lower (signed int64), so the whole
    pipeline is SQL-checkable."""
    grams = _word_ngrams(df.select(id_col, text_col), text_col, id_col,
                         shingle_n, keep_empty=True)
    # majority vote IS duplicate-sensitive: dedup gram hashes per doc
    # (md5(NULL) is NULL, so the token-less sentinel survives as one NULL h)
    hashed = grams.select(id_col, _md5_le64(F.col("gram")).alias("h")).distinct()
    # 64 bit-count aggregates + the 64-term majority reconstruction as TWO
    # parsed expressions instead of ~400 Column ops (r11 py4j-build-cost
    # cut; identical trees — shiftleft(1L, 63) is the same min-long weight
    # the former F.lit(-(1 << 63)) embedded)
    agg = hashed.groupBy(id_col).agg(
        F.count("*").alias("_c"),
        *[F.expr(f"sum(shiftrightunsigned(h, {j}) & 1)").alias(f"_o{j}")
          for j in range(64)])
    # a token-less doc's only row has h NULL: every _o{j} aggregates to NULL,
    # NULL * 2 > _c is NULL ⇒ CASE takes ELSE 0L ⇒ simhash 0, same as the
    # former coalesce(simhash, 0) after the join-back
    sig_terms = " + ".join(
        f"(CASE WHEN _o{j} * 2 > _c THEN shiftleft(1L, {j}) ELSE 0L END)"
        for j in range(64))
    return agg.select(id_col, F.expr(f"({sig_terms})").alias("simhash"))


@plan_memo(extra_key=lambda *a, **k: _CACHE_GEN.get("simhash_sigs", 0))
def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, shingle_n: int = 2,
) -> DataFrame:
    """(id_a, id_b, hamming): pairs within hamming distance via 4×16-bit
    block banding (pigeonhole: ≤3 differing bits ⇒ ≥1 identical 16-bit
    block).

    r8 (ADVICE r7 fix — the r7 cap silently dropped the HEAVIEST duplicate
    clusters): identical simhash values are pre-collapsed BEFORE banding,
    so banding runs over DISTINCT signatures and a cluster of a million
    byte-identical documents contributes ONE banding row, not a
    bucket-overflowing million. The three stages, none of which silently
    drops a cluster:

    1. identical-signature pairs (hamming 0): an equi-self-join on simhash
       for groups of size <= _MAX_BUCKET (exact all-pairs); larger groups
       fall back to star pairing against the min-id representative —
       connectivity-preserving for downstream dedup_clusters, O(n) output
       instead of O(n^2), counted by the `star_groups` observe metric.
    2. banding over distinct signatures: buckets collect (sig, rep, n)
       structs; a bucket over _MAX_BUCKET distinct signatures is TRUNCATED
       to its _MAX_BUCKET smallest signatures (sorted, deterministic)
       rather than dropped — counted by `capped_buckets`. Worked miss
       example (VERDICT r8 nit): a 16-bit block shared by 1,500 DISTINCT
       signatures keeps the 1,000 numerically smallest; two truncated-out
       signatures at hamming 2 from each other lose THIS bucket's pair,
       and survive only if another block also matches. Reaching that state
       needs >1000 distinct 64-bit signatures agreeing on one block while
       differing elsewhere — an adversarial corpus shape; identical-
       signature clusters (the real-world heavy case) are immune because
       stage 1 pairs them before banding.
    3. signature-pair expansion: each in-bucket signature pair with
       1 <= hamming <= max_hamming is deduped (tiny: one row per sig pair,
       not per doc pair) then expanded to doc pairs by joining the
       signature table twice; a pair of groups whose cross product exceeds
       _MAX_CROSS emits only the representative pair (connectivity is
       preserved through each group's stage-1 pairs) — counted by
       `capped_cross`.

    All three cap metrics ride the normal action via DataFrame.observe and
    are logged as warnings by a watcher thread when they fire
    (_observe_logged) — the caps are no longer silent. Below every cap the
    output is EXACTLY the r7 semantics (all pairs sharing >=1 16-bit block
    with hamming <= max_hamming), which is what the DuckDB oracle checks."""
    sigs = _cache_rotating(simhash(df, text_col, id_col, shingle_n),
                           "simhash_sigs")
    groups = sigs.groupBy("simhash").agg(
        F.min(id_col).alias("rep"), F.count("*").alias("n"))
    groups = _observe_logged(
        groups, "simhash_groups",
        {"star_groups": F.sum((F.col("n") > _MAX_BUCKET).cast("long")),
         "max_group_size": F.max("n")},
        warn_keys=("star_groups",))

    # --- stage 1: hamming-0 pairs inside identical-signature groups ---
    # join strategy is left to Catalyst/AQE: the duplicated-signature set
    # can itself be huge at corpus scale (100M+ rows on a 1B-doc crawl),
    # so a forced broadcast would pin it on the driver; AQE broadcasts it
    # only when the runtime size allows
    dup_groups = groups.filter(F.col("n") >= 2)
    small_ids = sigs.join(
        dup_groups.filter(F.col("n") <= _MAX_BUCKET).select("simhash"),
        "simhash")
    intra_small = (
        small_ids.alias("a")
        .join(small_ids.alias("b"),
              (F.col("a.simhash") == F.col("b.simhash"))
              & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.lit(0).cast("long").alias("hamming")))
    big_groups = dup_groups.filter(F.col("n") > _MAX_BUCKET)
    intra_star = (
        sigs.join(big_groups.select("simhash", "rep"), "simhash")
        .filter(F.col(id_col) != F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col(id_col).alias("id_b"),
                F.lit(0).cast("long").alias("hamming")))

    # --- stage 2: band DISTINCT signatures into 4x16-bit block buckets ---
    blocks = groups.select(
        F.struct(F.col("simhash").alias("s"), F.col("rep").alias("r"),
                 F.col("n").alias("n")).alias("g"),
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("block_idx", "block_val"))
    buckets = (blocks.groupBy("block_idx", "block_val")
               .agg(F.collect_list("g").alias("xs")))
    buckets = _observe_logged(
        buckets, "simhash_bucket_cap",
        {"capped_buckets": F.sum((F.size("xs") > _MAX_BUCKET).cast("long")),
         "max_bucket_size": F.max(F.size("xs"))},
        warn_keys=("capped_buckets",))
    xs_eff = F.when(F.size("xs") > _MAX_BUCKET,
                    F.slice(F.sort_array("xs"), 1, _MAX_BUCKET)
                    ).otherwise(F.col("xs"))
    buckets = (buckets.filter(F.size("xs") >= 2)
               .select(xs_eff.alias("xs")))
    e1 = buckets.select("xs", F.posexplode("xs").alias("i", "a"))
    e2 = (e1.select("i", "a", F.posexplode("xs").alias("j", "b"))
          .filter(F.col("j") > F.col("i")))
    hamming = F.bit_count(F.col("a.s").bitwiseXOR(F.col("b.s"))).cast("long")
    # one row per signature pair (canonical struct order so the same pair
    # from different block indices dedupes), then distinct — the dedup now
    # happens on signature pairs, not doc pairs, so no final wide distinct
    sig_pairs = (
        e2.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"),
                  hamming.alias("hamming"))
        .filter((F.col("hamming") >= 1) & (F.col("hamming") <= max_hamming))
        .distinct())

    # --- stage 3: expand signature pairs to doc pairs ---
    sig_pairs = sig_pairs.select(
        "a", "b", "hamming",
        ((F.col("a.n") * F.col("b.n")) <= _MAX_CROSS).alias("full"))
    sig_pairs = _observe_logged(
        sig_pairs, "simhash_cross_cap",
        {"capped_cross": F.sum((~F.col("full")).cast("long"))},
        warn_keys=("capped_cross",))
    ids_a = sigs.select(F.col("simhash").alias("_sa"),
                        F.col(id_col).alias("_ia"))
    ids_b = sigs.select(F.col("simhash").alias("_sb"),
                        F.col(id_col).alias("_ib"))
    cross_full = (
        sig_pairs.filter("full")
        .join(ids_a, F.col("a.s") == F.col("_sa"))
        .join(ids_b, F.col("b.s") == F.col("_sb"))
        .select(F.least("_ia", "_ib").alias("id_a"),
                F.greatest("_ia", "_ib").alias("id_b"), "hamming"))
    cross_star = (
        sig_pairs.filter(~F.col("full"))
        .select(F.least("a.r", "b.r").alias("id_a"),
                F.greatest("a.r", "b.r").alias("id_b"), "hamming"))
    return (intra_small.unionByName(intra_star)
            .unionByName(cross_full).unionByName(cross_star))


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b") -> DataFrame:
    """(doc_id, canonical_id): duplicate clusters from near-dup pairs.

    Connected components over the pair graph (min-id label propagation,
    fixed_rules.graphs.connected_components — the same distributed CC the
    graph battery uses); canonical = min doc id in the component, the
    standard keeper-selection rule of a dedup pipeline. At 100 TB the pair
    graph is tiny relative to the corpus (only near-dups appear), so the CC
    fixpoint runs on the pruned graph, not the documents."""
    from cozo_spark.fixed_rules.graphs import connected_components

    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    cc = connected_components(edges)
    return cc.select(F.col("node").alias("doc_id"),
                     F.col("component").alias("canonical_id"))


def ngram_contamination(
    corpus: DataFrame, bench: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", shingle_n: int = 3, threshold: float = 0.1,
) -> DataFrame:
    """(doc_id, bench_id, overlap_ratio): benchmark decontamination scan.

    For each corpus document, the fraction of its distinct word n-grams that
    also occur in a benchmark/eval document — the standard train/test
    contamination check (n-gram overlap). Grams are hashed JVM-side
    (xxhash64) so the join shuffles 8-byte keys, never text; the bench side
    is typically small enough to broadcast."""
    shc = (_shingles(corpus.select(id_col, text_col), text_col, shingle_n,
                     id_col=id_col)
           .select(F.col(id_col).alias("doc_id"), F.col("_gram_hash").alias("g"))
           .distinct())
    shb = (_shingles(bench.select(id_col, text_col), text_col, shingle_n,
                     id_col=id_col)
           .select(F.col(id_col).alias("bench_id"), F.col("_gram_hash").alias("g"))
           .distinct())
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("sz"))
    hits = (shc.join(shb, "g")
            .groupBy("doc_id", "bench_id").agg(F.count("*").alias("shared")))
    return (
        hits.join(sizes, "doc_id")
        .withColumn("overlap_ratio", F.col("shared") / F.col("sz"))
        .filter(F.col("overlap_ratio") >= threshold)
        .select("doc_id", "bench_id", F.round("overlap_ratio", 6).alias("overlap_ratio"))
    )


def substring_dup_spans(
    docs: DataFrame, k: int = 8,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_dup_spans, n_dup_tokens, dup_fraction): exact cross-
    document substring duplication, the Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" operation re-expressed as
    shuffles Spark can bound.

    Their suffix-array scan finds verbatim token runs repeated across the
    corpus; the distributed equivalent is (1) hash every k-token shingle
    (md5 of the joined window — engine-portable), (2) keep hashes seen in
    MORE THAN ONE document (one hash-keyed shuffle, never text), (3) per
    document, merge the flagged [pos, pos+k) windows into maximal islands
    with a doc-partitioned running-max window (gaps-and-islands), (4)
    report span count / covered tokens / covered fraction. Only documents
    containing at least one cross-doc duplicate span appear. At 100 TB
    every stage is bounded: the shingle shuffle carries hashes, the island
    merge is per-doc, and no stage is quadratic in documents.

    r11 (guide §2.4/§1.2): step (2) used to be groupBy(h)+count_distinct
    then a join back onto the shingle stream — which computed the expensive
    md5-shingling subtree TWICE (plan audit: no ReusedExchange, the two
    sides project differently) and paid a broadcast build. It is now ONE
    window over h (min(doc_id) != max(doc_id) ⇔ the hash spans >1 doc), so
    the shingle pass runs once and the duplicate flag rides the same
    exchange. 2.22 → ~1.2 s noop at sf0.1; plan 6 → 4 exchanges, 2 → 0
    broadcasts; bit-identical rows (min≠max is exactly count_distinct>1).
    """
    # r12: spread the doc rows first — the tokenize + per-window md5 map
    # below otherwise runs inside the scan stage, ONE task for a small
    # single-row-group parquet (single-threaded shingling); no-op at real
    # scale where the source already has >= parallelism partitions
    toks = _spread_small_input(docs.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"),
                 lambda t: t != "").alias("toks"))
    sh = (
        toks.select(
            "doc_id", F.size("toks").alias("n_toks"),
            F.posexplode(F.transform(
                F.sequence(F.lit(1),
                           F.greatest(F.size("toks") - k, F.lit(0)) + 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i, k)))
            )).alias("pos", "h"))
    )
    wh = W.partitionBy("h")
    fl = (sh.withColumn(
              "_dup", F.min("doc_id").over(wh) != F.max("doc_id").over(wh))
          # token-less docs: no spans, no 0-division
          .filter("_dup AND n_toks > 0")
          .select("doc_id", "n_toks", "pos",
                  F.least(F.col("pos") + k, F.col("n_toks")).alias("fin")))
    w_prev = (W.partitionBy("doc_id").orderBy("pos")
              .rowsBetween(W.unboundedPreceding, -1))
    brk = F.when(F.col("pos") > F.coalesce(F.max("fin").over(w_prev),
                                           F.lit(-1)), 1).otherwise(0)
    grp = (fl.withColumn("brk", brk)
           .withColumn("gid", F.sum("brk").over(
               W.partitionBy("doc_id").orderBy("pos")))
           .groupBy("doc_id", "n_toks", "gid")
           .agg(F.min("pos").alias("s"), F.max("fin").alias("e")))
    return (grp.groupBy("doc_id", "n_toks")
            .agg(F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
                 F.sum(F.col("e") - F.col("s")).cast("long")
                 .alias("n_dup_tokens"))
            .select("doc_id", "n_dup_spans", "n_dup_tokens",
                    F.round(F.col("n_dup_tokens") / F.col("n_toks"), 9)
                    .alias("dup_fraction")))
