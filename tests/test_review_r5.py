"""Regression tests for the round-5 self-review findings."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_now_read_not_plan_cached(spark):
    """A `@ "NOW"` read must re-resolve the clock on every run — the
    compiled-plan cache may not freeze the first compile's timestamp."""
    import time

    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create nv {a, v: Validity => d}")
    db.run_script('?[a, v, d] <- [[1, [0, true], 0]] :put nv {a, v => d}')
    assert len(db.run_script('?[a, v, d] := *nv{a, v, d @ "NOW"}').rows) == 1
    # assert a fact slightly in the future, with NO other write in between
    fut = int(time.time() * 1_000_000) + 1_500_000
    db.run_script(f'?[a, v, d] <- [[1, [{fut}, false], 1]] '
                  ':put nv {a, v => d}')
    assert len(db.run_script('?[a, v, d] := *nv{a, v, d @ "NOW"}').rows) == 1
    time.sleep(2)
    # the retraction's ts has now passed: a fresh read must see it — a
    # stale cached plan would still return the old row
    assert len(db.run_script('?[a, v, d] := *nv{a, v, d @ "NOW"}').rows) == 0


def test_imperative_as_returns_whole_chain(spark):
    """%-program `as` statements flatten the page chain into a temp
    relation — the returned NamedRows must still carry EVERY row."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.row_page_size = 3
    try:
        res = db.run_script("""
        {
            ?[x] <- [[1], [2], [3], [4], [5], [6], [7], [8]]
        } as _t
        """)
        pages = res.flatten() if hasattr(res, "flatten") else [res]
        rows = [r for p in pages for r in p.rows]
        assert len(rows) == 8
    finally:
        db.row_page_size = None


def test_range_join_left_outer(spark):
    from cozo_spark.operators.rangejoin import range_join

    vals = spark.createDataFrame([(5.0,), (500.0,)], "v double")
    ivs = spark.createDataFrame([(1, 0.0, 10.0)],
                                "iid long, lo double, hi double")
    out = {r["v"]: r["iid"]
           for r in range_join(vals, ivs, "v", bin_width=10.0,
                               how="left").collect()}
    assert out == {5.0: 1, 500.0: None}


def test_pq_and_kmeans_small_corpus_errors(spark):
    from cozo_spark.operators.similarity import kmeans_lloyd, pq_build

    tiny = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(3)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="k_codes"):
        pq_build(tiny, m=2, k_codes=8)
    with pytest.raises(ValueError, match="k="):
        kmeans_lloyd(tiny, k=8)


def test_rollup_null_detail_rows_stay_null(spark):
    """GROUPING vs coalesce: a genuine NULL group value must not collide
    with the subtotal label."""
    df = spark.createDataFrame(
        [("d1", None, 1), ("d1", "x", 2)], "day string, t string, v int")
    out = (df.rollup("day", "t")
           .agg(F.count(F.lit(1)).alias("n"), F.grouping("t").alias("_g"))
           .filter(F.col("day").isNotNull())
           .select("day", F.when(F.col("_g") == 1, "(all)")
                   .otherwise(F.col("t")).alias("t"), "n"))
    rows = {(r["day"], r["t"]): r["n"] for r in out.collect()}
    assert rows == {("d1", None): 1, ("d1", "x"): 1, ("d1", "(all)"): 2}


def test_avi_sampling_covers_trailing_interval(spark):
    import numpy as np

    from cozo_spark.operators.avi import encode_avi_mjpeg
    from cozo_spark.operators.jpeg import encode_jpeg
    from cozo_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    jf = [encode_jpeg(np.full((8, 8, 3), i, np.uint8)) for i in range(62)]
    avi = encode_avi_mjpeg(jf, fps=25)  # 2480 ms
    media = spark.createDataFrame(
        [(1, "video/x-msvideo", avi,
          {"width": 8, "height": 8, "duration_ms": 2480,
           "sample_rate": None})], MEDIA_SCHEMA)
    ts = sorted(r["frame_ts_ms"]
                for r in sample_frames(media, every_ms=1000).collect())
    assert ts == [0, 1000, 2000]  # 2000 lies inside the 2480ms video


def test_mp3_resyncs_after_midstream_corruption():
    from cozo_spark.operators.mp3 import encode_mp3_silence, probe_mp3

    a = encode_mp3_silence(n_frames=10)
    b = encode_mp3_silence(n_frames=30)
    blob = a + b"\x00garbage\xff\xfb junk" + b
    m = probe_mp3(blob)
    assert m["n_frames"] == 40
    # but a trailing ID3v1-style tag does NOT resurrect frame counting
    m2 = probe_mp3(a + b"TAG" + b"x" * 125)
    assert m2["n_frames"] == 10


def test_chunking_fuzz_vs_python_model(spark):
    import hashlib
    import random
    import re

    from cozo_spark.operators.text import chunk_documents

    rnd = random.Random(3)
    docs = [(d, " ".join(rnd.choice("abcdefgh")
                         for _ in range(rnd.randint(0, 40))))
            for d in range(25)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for size, overlap in ((8, 0), (8, 3), (5, 4), (16, 15)):
        stride = size - overlap
        want = set()
        for d, s in docs:
            toks = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
            if not toks:
                continue
            n_chunks = max(-(-(len(toks) - overlap) // stride), 1)
            for i in range(n_chunks):
                seg = toks[i * stride:i * stride + size]
                want.add((d, i, len(seg),
                          hashlib.md5(" ".join(seg).encode()).hexdigest()))
        got = {(r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"],
                r["chunk_md5"])
               for r in chunk_documents(df, size=size,
                                        overlap=overlap).collect()}
        assert got == want, (size, overlap)
