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

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: standard universal-hash modulus; keeps products in
# the 64-bit range when operands are < 2^31.
_MERSENNE = (1 << 61) - 1
_MAX_BUCKET = 1000  # cap quadratic blowup inside one LSH bucket


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


def _shingles(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Explode each doc into its distinct word n-gram shingles, pre-hashed to
    64-bit (xxhash64, JVM-side) so downstream never touches strings."""
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


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the kernel runs on all cores: a small table read from one
    parquet file arrives as one partition, serializing the Arrow-batched UDF.
    At real scale input splits already provide parallelism and this is a
    no-op; the repartition only fires when partitions < defaultParallelism
    (and then shuffles only the id+text projection it's called on)."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 64, shingle_n: int = 3, seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures.

    Permutation i is the universal hash (a_i * x + b_i) mod M over the
    shingle hashes; sig_i = min over shingles. Implemented as an
    Arrow-batched Pandas UDF with a vectorized numpy kernel: the inner
    (num_perm × n_shingles) min runs in C. This is the documented exception
    to "stay JVM-side" — Spark's higher-order array functions are
    CodegenFallback (interpreted), measured ~6× slower than this kernel,
    and an explode+groupBy(64 aggs) formulation shuffles |docs|·|shingles|
    rows. Zero shuffles here; scales linearly with executor count.

    Shingle hash = low 64 bits of md5 (little-endian bytes 8:16 — exactly
    DuckDB's ``md5_number_lower``, so the whole pipeline is SQL-checkable),
    folded to [0, 2^31). Stable across processes, unlike Python's salted
    ``hash``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    params = _perm_params(num_perm, seed)
    A = np.array([a for a, _ in params], dtype=np.int64)
    B = np.array([b for _, b in params], dtype=np.int64)
    M = np.int64(_MERSENNE)
    n = shingle_n

    # NB: `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't infer — set them as real objects post-hoc
    def _sig(texts):
        from hashlib import md5

        out = []
        empty = [int(M)] * len(A)
        for t in texts:
            if not t:
                out.append(empty)
                continue
            words = t.lower().split()
            hi = max(len(words) - n, 0) + 1
            grams = {" ".join(words[i:i + n]) for i in range(hi)}
            X = np.fromiter(
                (int.from_bytes(md5(g.encode("utf-8")).digest()[8:16], "little")
                 & 0x7FFFFFFF for g in grams),
                dtype=np.int64, count=len(grams))
            if X.size == 0:
                out.append(empty)
                continue
            # (num_perm, n_shingles) products stay < 2^61: exact in int64
            mins = ((A[:, None] * X[None, :] + B[:, None]) % M).min(axis=1)
            out.append(mins.tolist())
        return pd.Series(out)

    _sig.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    sig_udf = F.pandas_udf(T.ArrayType(T.LongType()))(_sig)
    return _spread(df.select(id_col, text_col)).select(
        F.col(id_col), sig_udf(F.col(text_col)).alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 16, rows_per_band: int = 4,
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs via banding.

    Signature is split into `bands` bands of `rows_per_band` values; docs
    sharing any band hash land in the same bucket. Bucket key is
    (band_idx, hash(band_slice)) — a plain equi-join key, so the self-join is
    one shuffle. Buckets above _MAX_BUCKET rows are dropped (pathological
    stop-shingles), logged by the caller if needed.
    """
    b = (
        sigs.select(
            id_col,
            F.posexplode(
                F.array(*[
                    F.xxhash64(F.slice("sig", i * rows_per_band + 1, rows_per_band))
                    for i in range(bands)
                ])
            ).alias("band_idx", "band_hash"),
        )
    )
    # one shuffle: group ids per bucket, expand pairs in-bucket (quadratic
    # only within a bucket, capped) — avoids the window + self-join (which
    # cost two extra shuffles of the full banded table)
    buckets = (
        b.groupBy("band_idx", "band_hash")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= _MAX_BUCKET))
    )

    # in-bucket pair expansion as an Arrow numpy kernel (np.triu_indices).
    # The higher-order-function formulation is slightly faster when the JVM
    # has it JIT-compiled (0.9s vs ~1.2s at sf0.1) but CodegenFallback
    # interpretation makes its latency depend on code-cache state (measured
    # 10s+ outliers mid-bench); the kernel's C inner loop is flat.
    import pandas as pd
    from pyspark.sql import types as T

    def _bucket_pairs(ids_series):
        import numpy as np

        out = []
        for ids in ids_series:
            x = np.asarray(ids, dtype=np.int64)
            i, j = np.triu_indices(len(x), k=1)
            lo = np.minimum(x[i], x[j])
            hi = np.maximum(x[i], x[j])
            out.append([(int(a), int(b)) for a, b in zip(lo, hi)])
        return pd.Series(out)

    _bucket_pairs.__annotations__ = {"ids_series": pd.Series, "return": pd.Series}
    pairs_udf = F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType())])))(_bucket_pairs)
    return (
        buckets.select(F.explode(pairs_udf("ids")).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.7, num_perm: int = 64, shingle_n: int = 3,
    bands: int = 16, seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, est_jaccard): near-duplicate pairs above threshold.

    Candidate pairs from LSH banding, then verified by estimated Jaccard =
    fraction of matching signature positions (the minhash estimator). For the
    reference's semantics see runtime/minhash_lsh.rs:1-389 + parse/sys.rs:62-74
    (n_perm / target threshold → band planning).
    """
    import pandas as pd
    from pyspark.sql import types as T

    rows_per_band = max(1, num_perm // bands)
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n, seed).cache()
    pairs = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    bdf = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))

    # signature match fraction as an Arrow-batched numpy kernel: the
    # zip_with+aggregate formulation is CodegenFallback (interpreted) and its
    # latency depends on whether the JVM has JIT-compiled the interpreter path
    # at that moment (measured 1.2s warm / 6-14s after code-cache eviction);
    # the kernel is flat ~1.2s regardless and shuffles nothing extra
    def _frac(sa, sb):
        import numpy as np

        if len(sa) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(sa.values)
        B = np.stack(sb.values)
        return pd.Series((A == B).mean(axis=1))

    _frac.__annotations__ = {"sa": pd.Series, "sb": pd.Series, "return": pd.Series}
    frac_udf = F.pandas_udf(T.DoubleType())(_frac)
    return (
        pairs.join(a, "id_a").join(bdf, "id_b")
        .withColumn("est_jaccard", frac_udf("sig_a", "sig_b"))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


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
    sh = _shingles(df.select(id_col, text_col), text_col, shingle_n).select(
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

    bit_i(sig) = majority over shingles of bit_i(hash(shingle)). Expressed as
    64 conditional sums over the exploded shingles — stays in codegen; one
    shuffle on id.
    """
    # Arrow-batched numpy kernel (see minhash_signatures for why not HOFs):
    # per doc, 64-bit shingle hashes → per-bit majority vote, vectorized.
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n = shingle_n

    def _simhash(texts):
        from hashlib import md5

        bits = np.arange(64, dtype=np.uint64)
        out = []
        for t in texts:
            words = (t or "").lower().split()
            hi = max(len(words) - n, 0) + 1
            grams = {" ".join(words[i:i + n]) for i in range(hi)}
            if not grams:
                out.append(0)
                continue
            # stable 64-bit hash = md5 bytes 8:16 little-endian (DuckDB's
            # md5_number_lower), so the oracle can reproduce it in SQL
            X = np.fromiter(
                (int.from_bytes(md5(g.encode("utf-8")).digest()[8:16], "little")
                 for g in grams),
                dtype=np.uint64, count=len(grams))
            ones = ((X[:, None] >> bits[None, :]) & np.uint64(1)).sum(axis=0)
            maj = (ones * 2 > len(X))
            sig = np.uint64(0)
            for i in range(64):
                if maj[i]:
                    sig |= np.uint64(1) << np.uint64(i)
            out.append(int(sig.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    _simhash.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    simhash_udf = F.pandas_udf(T.LongType())(_simhash)
    return _spread(df.select(id_col, text_col)).select(
        F.col(id_col), simhash_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, shingle_n: int = 2,
) -> DataFrame:
    """(id_a, id_b, hamming): pairs within hamming distance via 4×16-bit
    block banding (pigeonhole: ≤3 differing bits ⇒ ≥1 identical 16-bit block)."""
    sigs = simhash(df, text_col, id_col, shingle_n).cache()
    blocks = sigs.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)) for i in range(4)
        ])).alias("block_idx", "block_val"),
    )
    cand = (
        blocks.alias("a").join(
            blocks.alias("b"),
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.simhash").alias("sig_a"), F.col("b.simhash").alias("sig_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
