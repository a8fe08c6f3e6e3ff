"""Regressions for the round-7 ADVICE findings (fixed in round 8).

1 (medium, dedup.py): simhash_near_pairs dropped ALL pairs in any banding
   bucket over _MAX_BUCKET members. A cluster of >_MAX_BUCKET identical (or
   near-identical) documents shares all four 16-bit blocks, so every one of
   its buckets overflowed and the cluster yielded ZERO pairs — the heaviest
   duplicate clusters, the primary dedup target, were silently invisible.
   Fix: identical signatures are pre-collapsed before banding (banding runs
   over DISTINCT simhashes), giant identical groups fall back to star
   pairing, over-cap cross expansions fall back to representative pairs —
   all connectivity-preserving, all counted by observe metrics that a
   watcher thread now logs as warnings (they were previously write-only).
   The same silent-drop existed in lsh_candidate_pairs; it now star-pairs
   over-cap buckets instead of dropping them.
"""

from __future__ import annotations

import logging
import time

import pytest
from pyspark.sql import functions as F

import cozo_spark.operators.dedup as dd
from cozo_spark.operators.dedup import (
    dedup_clusters,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_near_pairs,
)


def _clusters(pairs_df):
    rows = dedup_clusters(pairs_df).collect()
    by_canon: dict = {}
    for r in rows:
        by_canon.setdefault(r["canonical_id"], set()).add(r["doc_id"])
    return by_canon


def test_simhash_giant_identical_cluster_not_dropped(spark, monkeypatch):
    """The ADVICE scenario: a duplicate cluster larger than _MAX_BUCKET must
    still come out CONNECTED (star fallback), not silently empty."""
    monkeypatch.setattr(dd, "_MAX_BUCKET", 5)
    docs = spark.createDataFrame(
        # 12 identical docs (>cap) + 3 distinct singletons
        [(i, "the exact same duplicated content block") for i in range(12)]
        + [(100, "alpha beta gamma delta"), (101, "epsilon zeta eta theta"),
           (102, "completely different words here now")],
        "doc_id long, text string")
    pairs = simhash_near_pairs(docs, max_hamming=3)
    got = pairs.collect()
    assert len(got) > 0, "over-cap identical cluster yielded zero pairs"
    # every pair is hamming 0 within the identical cluster
    ids = set(range(12))
    for r in got:
        if r["id_a"] in ids or r["id_b"] in ids:
            assert r["hamming"] == 0
    comp = _clusters(pairs)
    clusters = [m for m in comp.values() if m & ids]
    assert len(clusters) == 1 and ids <= clusters[0], (
        "identical cluster must be one connected component")


def test_simhash_small_groups_exact_all_pairs(spark):
    """Below every cap the semantics are the r7 exact set: identical docs in
    a small group produce ALL intra pairs, not just the star."""
    docs = spark.createDataFrame(
        [(i, "same text body for everyone") for i in range(4)]
        + [(50, "unrelated content entirely")],
        "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           simhash_near_pairs(docs, max_hamming=3).collect()}
    want = {(a, b) for a in range(4) for b in range(4) if a < b}
    assert got == want


# Two single-word documents have exactly one shingle, so their simhash IS
# md5_le64(word): 'w0005' and 'w0982' were searched offline to share 16-bit
# block 0 at hamming distance 14 — a deterministic cross-signature pair.
_WORD_A, _WORD_B, _AB_HAMMING = "w0005", "w0982", 14


def test_simhash_cross_group_pairs_survive_collapse(spark):
    """Near-but-not-identical groups still pair across signatures after the
    distinct-signature collapse (stage 2+3)."""
    docs = spark.createDataFrame(
        [(1, _WORD_A), (2, _WORD_A), (3, _WORD_B), (4, _WORD_B)],
        "doc_id long, text string")
    got = simhash_near_pairs(docs, max_hamming=_AB_HAMMING).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in got}
    assert pairs.get((1, 2)) == 0 and pairs.get((3, 4)) == 0
    cross = {k for k in pairs if (k[0] in (1, 2)) != (k[1] in (1, 2))}
    assert cross == {(1, 3), (1, 4), (2, 3), (2, 4)}, pairs
    assert all(pairs[k] == _AB_HAMMING for k in cross)


def test_simhash_capped_cross_emits_representative_pair(spark, monkeypatch):
    """When a signature-pair's doc cross-product exceeds _MAX_CROSS, the
    representative pair must still appear (connectivity), not nothing."""
    monkeypatch.setattr(dd, "_MAX_CROSS", 3)
    docs = spark.createDataFrame(
        [(1, _WORD_A), (2, _WORD_A), (3, _WORD_B), (4, _WORD_B)],
        "doc_id long, text string")
    pairs = simhash_near_pairs(docs, max_hamming=_AB_HAMMING)
    comp = _clusters(pairs)
    merged = [m for m in comp.values() if {1, 2, 3, 4} <= m]
    assert merged, (
        "capped cross expansion must keep the two groups connected "
        f"(components: {list(comp.values())})")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    cross = {k for k in got if (k[0] in (1, 2)) != (k[1] in (1, 2))}
    assert cross == {(1, 3)}, (
        "capped expansion should emit exactly the representative pair")


def test_lsh_giant_bucket_star_fallback(spark, monkeypatch):
    """lsh_candidate_pairs: an over-cap bucket star-pairs against its min id
    instead of being dropped."""
    monkeypatch.setattr(dd, "_MAX_BUCKET", 4)
    docs = spark.createDataFrame(
        [(i, "identical minhash content for the whole cluster")
         for i in range(10)],
        "doc_id long, text string")
    sigs = minhash_signatures(docs, num_perm=16, shingle_n=2)
    got = {(r["id_a"], r["id_b"])
           for r in lsh_candidate_pairs(sigs, bands=4, rows_per_band=4).collect()}
    want = {(0, i) for i in range(1, 10)}  # star around min id
    assert got == want


def test_lsh_small_bucket_still_all_pairs(spark):
    docs = spark.createDataFrame(
        [(i, "identical minhash content for the whole cluster")
         for i in range(5)],
        "doc_id long, text string")
    sigs = minhash_signatures(docs, num_perm=16, shingle_n=2)
    got = {(r["id_a"], r["id_b"])
           for r in lsh_candidate_pairs(sigs, bands=4, rows_per_band=4).collect()}
    want = {(a, b) for a in range(5) for b in range(5) if a < b}
    assert got == want


def test_cap_metrics_logged_by_watcher(spark, monkeypatch, caplog):
    """The observe metrics are no longer write-only: the watcher thread logs
    a WARNING when a cap fires on the executed action."""
    monkeypatch.setattr(dd, "_MAX_BUCKET", 3)
    docs = spark.createDataFrame(
        [(i, "the exact same duplicated content block") for i in range(8)],
        "doc_id long, text string")
    with caplog.at_level(logging.WARNING, logger="cozo_spark.operators.dedup"):
        simhash_near_pairs(docs, max_hamming=3).count()
        deadline = time.time() + 15
        while time.time() < deadline:
            if any("star_groups" in r.message for r in caplog.records):
                break
            time.sleep(0.5)
    assert any("star_groups" in r.message for r in caplog.records), (
        "watcher thread should log the fired star_groups cap")


def test_simhash_oracle_shape_unchanged(spark):
    """Schema contract with the DuckDB oracle: (id_a, id_b, hamming:long)."""
    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb cc"), (3, "zz yy xx")],
        "doc_id long, text string")
    df = simhash_near_pairs(docs, max_hamming=8)
    assert [f.name for f in df.schema.fields] == ["id_a", "id_b", "hamming"]
    assert dict(df.dtypes)["hamming"] == "bigint"


# --- ADVICE r7 lows: exact-mode centrality never silently depth-truncates ---

def _chain(spark, n):
    return spark.createDataFrame([(i, i + 1) for i in range(n)],
                                 "src long, dst long")


def test_betweenness_exact_mode_autoextends_past_max_depth(spark, caplog):
    """Exact (all-sources) Brandes with a too-small max_depth auto-extends —
    results equal the uncapped run, with a logged warning — instead of
    silently dropping far nodes from the dependency sums."""
    from cozo_spark.fixed_rules.graphs import betweenness_centrality_sampled

    edges = _chain(spark, 9)  # diameter 9 > max_depth 3
    with caplog.at_level(logging.WARNING, logger="cozo_spark.graphs"):
        capped = sorted(map(tuple, betweenness_centrality_sampled(
            edges, max_depth=3).collect()))
    assert any("auto-extending" in r.message for r in caplog.records)
    full = sorted(map(tuple, betweenness_centrality_sampled(
        edges, max_depth=64).collect()))
    assert capped == full


def test_betweenness_sampled_mode_still_caps(spark, caplog):
    """Sampled mode keeps max_depth as a cost cap (warning, no extension)."""
    from cozo_spark.fixed_rules.graphs import betweenness_centrality_sampled

    edges = _chain(spark, 9)
    with caplog.at_level(logging.WARNING, logger="cozo_spark.graphs"):
        betweenness_centrality_sampled(
            edges, sources=3, max_depth=3).collect()
    msgs = [r.message for r in caplog.records]
    assert any("max_depth" in m and "dropped" in m for m in msgs)
    assert not any("auto-extending" in m for m in msgs)


def test_closeness_exact_mode_autoextends(spark, caplog):
    """Exact closeness on a high-diameter chain with a tiny iteration cap
    matches the uncapped result (Bellman-Ford auto-extends to |V|)."""
    from cozo_spark.fixed_rules.graphs import closeness_centrality_dist

    edges = _chain(spark, 9)
    with caplog.at_level(logging.WARNING, logger="cozo_spark.graphs"):
        capped = sorted(map(tuple, closeness_centrality_dist(
            edges, max_iterations=3).collect()))
    assert any("auto-extending" in r.message for r in caplog.records)
    full = sorted(map(tuple, closeness_centrality_dist(
        edges, max_iterations=64).collect()))
    assert capped == full


def test_shortest_path_costs_warns_when_cap_exhausted(spark, caplog):
    """Without extend_to, an unconverged iteration cap logs a warning
    (previously: silent non-minimal costs)."""
    from cozo_spark.fixed_rules.graphs import shortest_path_costs

    edges = _chain(spark, 9)
    starts = spark.createDataFrame([(0,)], "node long")
    with caplog.at_level(logging.WARNING, logger="cozo_spark.graphs"):
        shortest_path_costs(edges, starts, max_iterations=3).collect()
    assert any("before" in r.message and "convergence" in r.message
               for r in caplog.records)
