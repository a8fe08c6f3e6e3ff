"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

These extend the reference's FTS tokenizer stack (cozo-core/src/fts/
tokenizer/*) into pipeline-shaped whole-table operators. Everything is
built-in pyspark functions (whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = "[A-Za-z0-9]+"

# tiny per-language stopword markers for the n-gram/stopword-ratio heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    """Simple tokenizer (reference fts/tokenizer/simple): lowercase + split on
    non-alphanumerics, empties dropped."""
    return df.withColumn(out_col, F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')"))


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars_m, n_tokens, n_spaces): cheap token/size statistics."""
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars_m"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_TOKEN_RE), 0)).cast("long").alias("n_tokens"),
        (F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), " ", ""))).cast("long").alias("n_spaces"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_words, mean_word_len, alpha_ratio, punct_ratio,
    stopword_ratio, uniq_word_ratio, quality): heuristic quality signals in the
    Gopher/C4-rules style — all codegen'd column expressions."""
    toks = F.expr(f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')")
    n_chars = F.length(text_col)
    n_words = F.size(toks)
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[^.,;:!?'\"()-]", ""))
    stop_lit = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, t)))
    n_uniq = F.size(F.array_distinct(toks))
    safe_words = F.greatest(n_words, F.lit(1))
    mean_wl = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / safe_words
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / safe_words
    uniq_ratio = n_uniq / safe_words
    quality = (
        F.when((n_words >= 5) & (mean_wl.between(2.0, 12.0)) & (alpha_ratio > 0.5), 1.0)
        .otherwise(0.0)
        * (F.lit(0.5) + F.lit(0.5) * uniq_ratio)
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(uniq_ratio, 4).alias("uniq_word_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred, lang_score): stopword-marker language heuristic.

    Scores each candidate language by marker-token hit count; argmax wins
    (ties → lexicographically LAST language, via struct-max — deterministic).
    A real deployment swaps in a fastText-style model via Pandas UDF; the
    plumbing (one pass, argmax over a small score struct) is identical.
    """
    toks = F.expr(f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')")
    d = df.withColumn("_toks", toks)
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        lit = F.array(*[F.lit(w) for w in markers])
        scores.append(F.struct(
            F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(lit, t))).alias("score"),
            F.lit(lang).alias("lang"),
        ))
    # array_max over (score, lang) structs: max score, ties → max lang;
    # to make ties deterministic-min on lang we negate via sort+last instead
    best = F.array_max(F.array(*scores))
    return d.select(
        F.col(id_col),
        best["lang"].alias("lang_pred"),
        F.round(best["score"] / F.greatest(F.size("_toks"), F.lit(1)), 6).alias("lang_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                window: int = 8) -> DataFrame:
    """(id, fingerprint): winnowing-style document fingerprint — min rolling
    token-window hash. Robust to small edits at the ends; used as a cheap
    near-dup prefilter. Hash is md5 of the joined window (engine-portable, so
    the result is oracle-checkable; swap in xxhash64 for cheaper hashing when
    cross-engine comparability doesn't matter)."""
    toks = F.expr(f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')")
    d = df.withColumn("_toks", toks)
    idx = F.sequence(F.lit(0), F.greatest(F.size("_toks") - window, F.lit(0)))
    win_hashes = F.transform(idx, lambda i: F.md5(F.array_join(F.slice("_toks", i + 1, window), " ")))
    return d.select(F.col(id_col), F.array_min(win_hashes).alias("fingerprint"))


def pack_sequences(df: DataFrame, capacity: int = 2048, shards: int = 32,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, chunk_id): assign documents to fixed-capacity
    training chunks (context-window packing).

    Documents are processed in id order within a shard (id % shards);
    chunk boundary = whitespace-token running total crossing a capacity
    multiple (greedy fill, overflow document closes the chunk — the
    split-at-boundary packing GPT-style pipelines use). A single global
    greedy pack is inherently sequential; sharding gives a deterministic,
    embarrassingly-parallel equivalent whose only cost is one window
    shuffle on the shard key. chunk_id = shard * 2^32 + local chunk, so ids
    are globally unique and reproducible."""
    from pyspark.sql import Window as W

    toks = F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != ""))
    d = df.select(F.col(id_col), toks.alias("n_tokens"),
                  (F.col(id_col) % shards).alias("__shard"))
    w = (W.partitionBy("__shard").orderBy(id_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = F.sum("n_tokens").over(w)
    local_chunk = F.floor((cum - F.col("n_tokens")) / F.lit(capacity))
    return d.select(
        id_col, F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("__shard") * F.lit(1 << 32) + local_chunk).alias("chunk_id"))
