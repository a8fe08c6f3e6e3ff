"""As-of join operator (operators/asof.py): backward semantics, equal-ts
inclusive vs strict, tolerance staleness, NULL on no-match, plan shape."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cozo_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("A", 10.0, 1), ("A", 25.0, 2), ("B", 5.0, 3), ("A", 3.0, 4),
         ("A", 20.0, 5)],
        "sym string, ts double, trade_id long")


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [("A", 5.0, 100.0), ("A", 20.0, 101.5), ("B", 6.0, 50.0)],
        "sym string, ts double, px double")


def _px(df):
    return {r["trade_id"]: r["px_r"] for r in df.collect()}


def test_backward_inclusive(spark, trades, quotes):
    px = _px(asof_join(trades, quotes, by="sym"))
    assert px == {1: 100.0, 2: 101.5, 3: None, 4: None, 5: 101.5}


def test_strict_excludes_equal_ts(spark, trades, quotes):
    px = _px(asof_join(trades, quotes, by="sym", strict=True))
    assert px[5] == 100.0  # trade@20 must not see quote@20
    assert px[2] == 101.5


def test_tolerance_voids_stale_matches(spark, trades, quotes):
    px = _px(asof_join(trades, quotes, by="sym", tolerance=5.0))
    assert px == {1: 100.0, 2: 101.5, 3: None, 4: None, 5: 101.5}
    px = _px(asof_join(trades, quotes, by="sym", tolerance=4.0))
    assert px == {1: None, 2: None, 3: None, 4: None, 5: 101.5}


def test_matched_right_ts_exposed(spark, trades, quotes):
    rows = {r["trade_id"]: r["ts_r"]
            for r in asof_join(trades, quotes, by="sym").collect()}
    assert rows[1] == 5.0 and rows[2] == 20.0 and rows[3] is None


def test_left_rows_all_preserved(spark, trades, quotes):
    out = asof_join(trades, quotes, by="sym")
    assert out.count() == trades.count()
    assert set(out.columns) == {"sym", "ts", "trade_id", "px_r", "ts_r"}


def test_keys_never_cross(spark, trades, quotes):
    # B's only quote is at ts 6 > trade ts 5 → no match, and A quotes
    # must never leak into B
    r = asof_join(trades, quotes, by="sym").filter("sym = 'B'").collect()
    assert len(r) == 1 and r[0]["px_r"] is None


def test_plan_one_key_shuffle_no_python(spark, trades, quotes):
    from cozo_spark.plans.inspect import plan_properties

    p = plan_properties(asof_join(trades, quotes, by="sym"))
    assert "Exchange SinglePartition" not in p["plan"]
    for node in ("ArrowEvalPython", "BatchEvalPython",
                 "FlatMapGroupsInPandas", "MapInPandas"):
        assert node not in p["plan"]
    # nothing quadratic: no nested-loop / cartesian node
    assert "CartesianProduct" not in p["plan"]
    assert "BroadcastNestedLoopJoin" not in p["plan"]


# ---------------------------------------------------------------------------
# binned range join (r5)
# ---------------------------------------------------------------------------

def test_range_join_boundaries_and_bins(spark):
    from cozo_spark.operators.rangejoin import range_join

    vals = spark.createDataFrame([(float(v),) for v in
                                  (0.0, 5.0, 10.0, 10.5, 99.9, 100.0)],
                                 "v double")
    ivs = spark.createDataFrame(
        [(1, 5.0, 10.0), (2, 10.0, 100.0), (3, -1.0, 0.0)],
        "iid long, lo double, hi double")
    got = {(r["iid"], r["v"]) for r in
           range_join(vals, ivs, "v", bin_width=7.0).collect()}
    want = {(1, 5.0), (1, 10.0),             # closed [5,10]
            (2, 10.0), (2, 10.5), (2, 99.9), (2, 100.0),
            (3, 0.0)}
    assert got == want
    # result independent of bin width
    for bw in (0.5, 3.0, 1000.0):
        got2 = {(r["iid"], r["v"]) for r in
                range_join(vals, ivs, "v", bin_width=bw).collect()}
        assert got2 == want, bw


def test_range_join_plan_is_hash_join(spark):
    from cozo_spark.operators.rangejoin import range_join
    from cozo_spark.plans.inspect import plan_properties

    vals = spark.range(1000).select((F.col("id") * 1.0).alias("v"))
    ivs = spark.createDataFrame([(i, i * 10.0, i * 10.0 + 25.0)
                                 for i in range(50)],
                                "iid long, lo double, hi double")
    p = plan_properties(range_join(vals, ivs, "v", bin_width=10.0))
    assert "BroadcastNestedLoopJoin" not in p["plan"]
    assert "CartesianProduct" not in p["plan"]
    assert (p["n_broadcast_joins"] + p["n_sortmerge_joins"] >= 1
            or "ShuffledHashJoin" in p["plan"])


def test_asof_fuzz_vs_duckdb_native(spark):
    """Randomized instances vs DuckDB's native ASOF JOIN — ties at equal
    ts, empty keys, interleaved histories. Right side unique per (key,ts)
    (both implementations assume it)."""
    import random

    import duckdb

    rnd = random.Random(31)
    for trial in range(3):
        lrows = [(f"k{rnd.randrange(6)}", float(rnd.randrange(100)), i)
                 for i in range(80)]
        seen = set()
        rrows = []
        for j in range(60):
            key = (f"k{rnd.randrange(8)}", float(rnd.randrange(100)))
            if key in seen:
                continue
            seen.add(key)
            rrows.append((key[0], key[1], round(rnd.random() * 100, 3)))
        left = spark.createDataFrame(lrows, "k string, ts double, lid long")
        right = spark.createDataFrame(rrows, "k string, ts double, px double")
        got = sorted(
            (r["lid"], r["px_r"])
            for r in asof_join(left, right, by="k").collect())

        con = duckdb.connect()
        con.execute("CREATE TABLE l (k VARCHAR, ts DOUBLE, lid BIGINT)")
        con.execute("CREATE TABLE r (k VARCHAR, ts DOUBLE, px DOUBLE)")
        con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
        con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
        want = sorted(con.execute(
            "SELECT l.lid, r.px FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.ts").fetchall())
        assert got == want, f"trial {trial}"


# ---------------------------------------------------------------------------
# round-5 UDTF (`<~`) dispatch surface
# ---------------------------------------------------------------------------

def test_r5_rules_through_engine(spark):
    import numpy as np

    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.operators.jpeg import encode_jpeg
    from cozo_spark.operators.multimodal import MEDIA_SCHEMA

    db = CozoDb(spark)
    shared = " ".join(f"t{i}" for i in range(10))
    db.register_dataframe("docs", spark.createDataFrame(
        [(1, f"a b c {shared}"), (2, f"{shared} x y z"), (3, "nothing here at all")],
        "doc_id long, text string"))
    spans = db.run_script_df(
        "?[doc_id, n_dup_spans, n_dup_tokens, dup_fraction] <~ "
        "SubstringDedup(*docs[], k: 8)").collect()
    assert {r["doc_id"] for r in spans} == {1, 2}

    db.register_dataframe("trades", spark.createDataFrame(
        [("A", 10.0, 1), ("A", 25.0, 2)], "sym string, ts double, tid long"))
    db.register_dataframe("quotes", spark.createDataFrame(
        [("A", 5.0, 100.0), ("A", 20.0, 101.5)],
        "sym string, ts double, px double"))
    pit = db.run_script_df(
        "?[k, ts, tid, px_r, ts_r] <~ AsofJoin(*trades[], *quotes[])")
    assert {(r["tid"], r["px_r"]) for r in pit.collect()} == \
        {(1, 100.0), (2, 101.5)}

    db.register_dataframe("vals", spark.createDataFrame(
        [(7.0,), (55.0,)], "v double"))
    db.register_dataframe("bands", spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 50.0, 60.0)], "iid long, lo double, hi double"))
    rj = db.run_script_df(
        "?[value, interval_id, lo, hi] <~ RangeJoin(vals[], bands[], "
        "bin_width: 10) vals[v] := *vals[v] bands[i, l, h] := *bands[i, l, h]")
    assert {(r["interval_id"], r["value"]) for r in rj.collect()} == \
        {(1, 7.0), (2, 55.0)}

    img = np.zeros((4, 4, 3), np.uint8)
    media = spark.createDataFrame(
        [(9, "image/png", encode_jpeg(img),
          {"width": None, "height": None, "duration_ms": None,
           "sample_rate": None})], MEDIA_SCHEMA)
    db.register_dataframe("media", media)
    probed = db.run_script_df(
        "?[media_id, declared_type, sniffed_type, type_mismatch, width, "
        "height, duration_ms, sample_rate, bitrate_kbps, n_frames, valid] "
        "<~ ProbeMedia(*media[])").collect()
    assert probed[0]["sniffed_type"] == "image/jpeg"
    assert probed[0]["type_mismatch"] is True
