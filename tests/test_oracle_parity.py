"""Replicates the driver's correctness gate locally: run every entry in
__spark_entry__.queries() at sf0.01 and compare with its DuckDB oracle —
row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from tests.conftest import SF_ORACLE

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def _query_names():
    import __spark_entry__ as E

    return sorted(E.queries())


@pytest.mark.parametrize("name", _query_names())
def test_oracle_parity(spark, name):
    import __spark_entry__ as E

    sdf = E.queries()[name](spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    oracle = E.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check, mirrors the driver
        return

    pdf = _duck(oracle)
    duck_cols = list(pdf.columns)
    duck_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")
    s_norm = _norm_rows(spark_cols, spark_rows)
    d_norm = _norm_rows(duck_cols, duck_rows)
    if s_norm != d_norm:
        diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns


def test_engine_path_rows_inside_driver_cap():
    """Regression guard for the round-2 failure mode: the driver checks only
    the FIRST 50 queries() entries, and a reordering once pushed every
    engine-path (CozoScript-compiled) row past the cap. Pin them inside."""
    import __spark_entry__ as E

    first50 = list(E.queries())[:50]
    # r9 rotation: datalog_filter_join + datalog_magic_reach demoted
    # (r7+r8 double-verified); the family stays covered by these
    engine_rows = {
        "datalog_agg", "datalog_negation", "datalog_recursion",
        "datalog_shortest_min", "datalog_magic_var_seed",
        "fts_engine_search",
    }
    missing = engine_rows - set(first50)
    assert not missing, f"engine-path rows past the driver cap: {missing}"


@pytest.mark.skipif("not __import__('os').environ.get('SPARK_GRAFT_SF01_PARITY')",
                    reason="10x-scale parity sweep; set SPARK_GRAFT_SF01_PARITY=1")
def test_sf01_parity_sweep(spark):
    """Value-parity at sf0.1 (10x the driver gate's sf0.01) for ten
    representative queries — reproduces the evidence row in BASELINE.md."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    names = ["agg_basic", "join_multiway", "datalog_recursion",
             "datalog_shortest_min", "minhash_lsh_pairs", "dedup_exact",
             "sessionize", "graph_shortest_hops", "text_word_topk",
             "validity_asof",
             # r5 additions — the new operator families at 10x scale
             "substring_dedup", "asof_join_events", "graph_random_walk",
             "lm_quality_score", "pq_code_dedup", "events_rollup",
             "range_join_prices", "ann_pq_topk",
             "kmeans_clusters", "doc_chunking", "dataset_split",
             # r6: the new closeness scale path at 10x
             "graph_closeness"]
    def n6(v):
        v = _norm_cell(v)
        # at 10x data the engines' float SUMS differ in the final ulps
        # (summation order), and values pre-rounded inside the query can
        # straddle a rounding boundary — compare at 9 significant digits
        if isinstance(v, float):
            return float(f"{v:.9g}")
        return v

    for name in names:
        got = sorted(tuple(n6(c) for c in r)
                     for r in E.queries()[name](spark, sf).collect())
        want = sorted(tuple(n6(c) for c in r)
                      for r in con.execute(E.oracle_sql()[name]).fetchall())
        assert got == want, name
