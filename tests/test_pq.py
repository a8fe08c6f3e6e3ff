"""Product-quantization ANN unit tests (beyond oracle parity).

Covers: code well-formedness, ADC recall vs exact brute force, the
TakeOrdered (not single-partition window) codebook sample, and the
lm_quality_score invariants.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_pq_codes_wellformed(spark, emb):
    from cozo_spark.operators.similarity import pq_build

    codebook, codes = pq_build(emb, m=4, k_codes=8)
    n = emb.count()
    assert codes.count() == n
    bad = codes.filter(
        (F.size("codes") != 4)
        | F.exists("codes", lambda c: (c < 0) | (c >= 8))
    ).count()
    assert bad == 0
    # codebook: one centroid slice per (subspace, code)
    assert codebook.count() == 4 * 8
    dim = len(emb.select("embedding").first()[0])
    sub_len = codebook.select(F.size("cvec")).first()[0]
    assert sub_len == dim // 4


def test_pq_adc_matches_reconstructed_ip(spark, emb):
    """ADC is exact w.r.t. the quantized corpus: approx_ip(q, x) must equal
    ip(q, reconstruct(codes(x))) — the defining identity of PQ asymmetric
    distance. (Recall against the un-quantized corpus is data-dependent and
    meaningless on isotropic random embeddings, so we test the identity,
    not recall.)"""
    from cozo_spark.operators.similarity import pq_build, pq_ip_topk

    codebook, codes = pq_build(emb, m=4, k_codes=8)
    q = emb.filter("vec_id < 3")
    approx = {(r["qid"], r["vec_id"]): r["approx_ip"]
              for r in pq_ip_topk(q, codebook, codes, k=10).collect()}
    assert len(approx) == 30
    cb = {(r["s"], r["cid"]): list(r["cvec"]) for r in codebook.collect()}
    recon = {
        r["vec_id"]: [x for s, code in enumerate(r["codes"])
                      for x in cb[(s, code)]]
        for r in codes.collect()
    }
    qv = {r["vec_id"]: list(r["embedding"]) for r in q.collect()}
    for (qid, vid), got in approx.items():
        # mirror the engine's integerized sum: per-subspace round(ip*1e9)
        dim = len(qv[qid])
        sub = dim // 4
        ip9 = sum(
            round(sum(a * b for a, b in zip(
                qv[qid][s * sub:(s + 1) * sub],
                recon[vid][s * sub:(s + 1) * sub])) * 1e9)
            for s in range(4)
        )
        assert abs(got - round(ip9 / 1e9, 6)) < 1e-9, (qid, vid)


def test_pq_build_no_single_partition_window(spark, emb):
    """The codebook sample must compile to TakeOrderedAndProject, not an
    unpartitioned row_number window (the 100 TB scale-killer pattern)."""
    from cozo_spark.operators.similarity import pq_build

    codebook, codes = pq_build(emb, m=4, k_codes=8)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]


def test_lm_quality_score_invariants(spark):
    from cozo_spark.queries import QUERIES

    df = QUERIES["lm_quality_score"](spark, SF_SMALL)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["n_tokens"] >= 1
        # mean relative frequency of tokens lies in (0, 1]
        assert 0.0 < r["mean_tok_freq"] <= 1.0


def test_substring_dedup_span_merge(spark):
    """Two docs share one verbatim 12-token run → overlapping 8-token
    shingles must merge into ONE maximal span covering exactly 12 tokens;
    a doc with no cross-doc run must not appear."""
    from cozo_spark.operators.dedup import substring_dup_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    docs = spark.createDataFrame(
        [(1, f"intro one two {shared} outro unique tokens here"),
         (2, f"{shared} completely different tail words follow now"),
         (3, "nothing in common with anything else at all truly")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in substring_dup_spans(docs, k=8).collect()}
    assert set(rows) == {1, 2}
    for d in (1, 2):
        assert rows[d]["n_dup_spans"] == 1
        assert rows[d]["n_dup_tokens"] == 12
    # doc 1 has 3 + 12 + 4 = 19 tokens
    assert abs(rows[1]["dup_fraction"] - 12 / 19) < 1e-9


def test_substring_dedup_fuzz_vs_python_reference(spark):
    """Randomized docs with planted shared runs: substring_dup_spans must
    agree with a direct per-doc interval-merge reference implementation."""
    import random
    import re

    from cozo_spark.operators.dedup import substring_dup_spans

    rnd = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    shared_runs = [
        " ".join(rnd.choice(vocab) for _ in range(rnd.randint(8, 14)))
        for _ in range(3)]
    docs = []
    for d in range(12):
        parts = [rnd.choice(vocab) for _ in range(rnd.randint(0, 10))]
        for run in shared_runs:
            if rnd.random() < 0.5:
                parts.append(run)
                parts.extend(rnd.choice(vocab)
                             for _ in range(rnd.randint(0, 5)))
        docs.append((d, " ".join(parts)))

    k = 8
    toks = {d: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
            for d, s in docs}
    occur = {}
    for d, ts in toks.items():
        for p in range(max(len(ts) - k, 0) + 1):
            occur.setdefault(" ".join(ts[p:p + k]), set()).add(d)
    expected = {}
    for d, ts in toks.items():
        ivs = [(p, min(p + k, len(ts)))
               for p in range(max(len(ts) - k, 0) + 1)
               if len(occur[" ".join(ts[p:p + k])]) > 1]
        if not ivs:
            continue
        spans = []
        cs, ce = ivs[0]
        for s, e in ivs[1:]:
            if s > ce:
                spans.append((cs, ce))
                cs, ce = s, e
            else:
                ce = max(ce, e)
        spans.append((cs, ce))
        cov = sum(e - s for s, e in spans)
        expected[d] = (len(spans), cov, round(cov / len(ts), 9))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_dup_spans"], r["n_dup_tokens"],
                         round(r["dup_fraction"], 9))
           for r in substring_dup_spans(df, k=k).collect()}
    assert got == expected


def test_kmeans_lloyd_matches_python_model(spark, emb):
    """Distributed Lloyd vs a direct Python implementation: integerized
    arithmetic must make centroids AND assignments identical."""
    import hashlib
    import math

    from cozo_spark.operators.similarity import kmeans_lloyd

    cents, assign = kmeans_lloyd(emb, k=4, iters=2)
    data = {r["vec_id"]: [int(math.floor(x * 1e6 + 0.5)) if x >= 0
                          else -int(math.floor(-x * 1e6 + 0.5))
                          for x in r["embedding"]]
            for r in emb.collect()}
    order = sorted(data, key=lambda i:
                   (hashlib.md5(str(i + 42).encode()).hexdigest(), i))
    pc = [list(data[i]) for i in order[:4]]
    dim = len(pc[0])

    def assign_all(cs):
        return {vid: min(range(len(cs)), key=lambda cid: (
            sum((a - b) ** 2 for a, b in zip(x, cs[cid])), cid))
            for vid, x in data.items()}

    def half_away(x):
        return int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))

    for _ in range(2):
        a = assign_all(pc)
        acc = {}
        for vid, cid in a.items():
            s, n = acc.setdefault(cid, ([0] * dim, 0))
            for d in range(dim):
                s[d] += data[vid][d]
            acc[cid] = (s, n + 1)
        pc = [[half_away(acc[c][0][d] / acc[c][1]) for d in range(dim)]
              if c in acc else pc[c] for c in range(4)]
    assert cents == pc
    got = {r["vec_id"]: r["cid"] for r in assign.collect()}
    assert got == assign_all(pc)


def test_ivf_refined_centroids(spark, emb):
    """refine_iters > 0 runs Lloyd over the sampled centroids: every
    vector still lands in exactly one cell, probing still works, and the
    refined cells have no larger total within-cluster distance than the
    raw sample."""
    from cozo_spark.operators.similarity import (
        ivf_build, ivf_cosine_topk, l2_dist_col)

    def sse(cents, assigned):
        j = assigned.join(cents, "cid")
        return (j.select(F.sum(
            F.pow(l2_dist_col(F.col("v"), F.col("cvec")), 2)).alias("s"))
            .first()["s"])

    c0, a0 = ivf_build(emb, n_centroids=8)
    c1, a1 = ivf_build(emb, n_centroids=8, refine_iters=2)
    n = emb.count()
    assert a1.count() == n and a1.select("vec_id").distinct().count() == n
    assert sse(c1, a1) <= sse(c0, a0) + 1e-6  # Lloyd never increases SSE
    q = emb.filter("vec_id < 2")
    hits = ivf_cosine_topk(q, c1, a1, k=5, nprobe=3)
    assert hits.groupBy("qid").count().filter("count != 5").count() == 0


def test_chunk_documents_windows(spark):
    """Chunk boundaries: overlap windows, remainder chunk, short docs one
    chunk, empty docs none."""
    import hashlib

    from cozo_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, words), (2, "solo"), (3, "")], "doc_id long, text string")
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_md5"])
         for r in chunk_documents(docs, size=4, overlap=1).collect()))
    toks = [f"w{i}" for i in range(10)]
    # stride 3, n=10: ceil((10-1)/3) = 3 chunks at 0/3/6 — [6,10) already
    # reaches the final token, so no 4th chunk starts past the end
    want = []
    for i in range(3):
        seg = toks[i * 3:i * 3 + 4]
        want.append((1, i, len(seg),
                     hashlib.md5(" ".join(seg).encode()).hexdigest()))
    want.append((2, 0, 1, hashlib.md5(b"solo").hexdigest()))
    assert rows == sorted(want)


def test_dataset_split_deterministic_proportions(spark):
    from cozo_spark.operators.text import dataset_split

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    assert a == b  # pure function of (id, seed)
    from collections import Counter

    c = Counter(a.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert 0.03 < c["val"] / 2000 < 0.08
    assert 0.03 < c["test"] / 2000 < 0.08
    # different seed reshuffles membership but keeps proportions
    d = {r["doc_id"]: r["split"]
         for r in dataset_split(docs, seed=7).collect()}
    assert d != a
