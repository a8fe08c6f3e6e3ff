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


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 64, shingle_n: int = 3, seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures.

    Permutation i is the universal hash (a_i * x + b_i) mod M over the
    shingle hashes; min per doc per permutation. All JVM-side: explode →
    per-perm expression → groupBy(min). One shuffle on doc id.
    """
    import random

    rnd = random.Random(seed)
    # coefficient ranges sized so a*x + b < 2^61 — no int64 overflow under
    # ANSI arithmetic (a < 2^30, x < 2^31, b < 2^30)
    params = [(rnd.randrange(1, 1 << 30), rnd.randrange(0, 1 << 30)) for _ in range(num_perm)]
    sh = _shingles(df.select(id_col, text_col), text_col, shingle_n)
    x = F.pmod(F.col("_gram_hash"), F.lit(1 << 31))
    aggs = [
        F.min(F.pmod(F.lit(a) * x + F.lit(b), F.lit(_MERSENNE))).alias(f"_h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(id_col, F.array(*[f"_h{i}" for i in range(num_perm)]).alias("sig"))


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
    sized = b.withColumn("_n", F.count("*").over(W.partitionBy("band_idx", "band_hash")))
    b = sized.filter(F.col("_n") <= _MAX_BUCKET).drop("_n")
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(right, (F.col("l.band_idx") == F.col("r.band_idx"))
                  & (F.col("l.band_hash") == F.col("r.band_hash"))
                  & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
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
    rows_per_band = max(1, num_perm // bands)
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n, seed).cache()
    pairs = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    bdf = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    ) / F.lit(float(num_perm))
    return (
        pairs.join(a, "id_a").join(bdf, "id_b")
        .withColumn("est_jaccard", est)
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
    sh = _shingles(df.select(id_col, text_col), text_col, shingle_n)
    # bit 63 would overflow a Python-side long literal; shiftleft computes the
    # mask JVM-side where 1<<63 wraps to Long.MIN as intended
    def mask(i):
        return F.shiftleft(F.lit(1).cast("long"), i)

    aggs = [
        F.sum(F.when(F.col("_gram_hash").bitwiseAND(mask(i)) != 0, 1).otherwise(-1)).alias(f"_b{i}")
        for i in range(64)
    ]
    per_doc = sh.groupBy(id_col).agg(*aggs)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"_b{i}") > 0, mask(i)).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return per_doc.select(id_col, sig.alias("simhash"))


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
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
