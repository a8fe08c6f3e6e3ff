"""TPC-H queries expressed in CozoScript, checked against DuckDB.

The operator battery proves each relational operator in isolation; this
suite proves the COMPOSITIONS a real analytical workload needs — multi-join
+ aggregation + top-k + conditional aggregates — all through the full
parse → rewrite → translate → Catalyst path, value-compared with DuckDB
running the classic SQL formulation on the same parquet (sf0.001).

Queries are the standard TPC-H shapes adapted to the driver's synthetic
columns (Q1 is the `agg_basic` driver row; Q3/Q5/Q6/Q10/Q12/Q14 live here).
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem")


@pytest.fixture(scope="module")
def db(spark):
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.queries import _PKS, _t

    d = CozoDb(spark)
    for t in TABLES:
        d.register_dataframe(t, _t(spark, SF, t), keys=_PKS.get(t))
    return d


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(rows):
    out = []
    for r in rows:
        t = []
        for v in r:
            if isinstance(v, float):
                t.append("NaN" if math.isnan(v) else round(v, 6))
            elif hasattr(v, "item"):
                x = v.item()
                t.append(round(x, 6) if isinstance(x, float) else x)
            else:
                t.append(v)
        out.append(tuple(t))
    return sorted(out)


def _check(db, oracle, cozo, sql, ordered=False):
    got = [list(r) for r in db.run_script(cozo).rows]
    want = [list(r) for r in oracle.execute(sql).fetchall()]
    if ordered:
        assert [_norm([g])[0] for g in got] == [_norm([w])[0] for w in want]
    else:
        assert _norm(got) == _norm(want), (len(got), len(want))


def test_q3_shipping_priority(db, oracle):
    _check(db, oracle, """
    agg[ok, sum(rev), od] :=
        *customer{c_custkey: ck, c_mktsegment: 'BUILDING'},
        *orders{o_orderkey: ok, o_custkey: ck, o_orderdate: od},
        od < '1999-03-15',
        *lineitem{l_orderkey: ok, l_extendedprice: p, l_discount: dc,
                  l_shipdate: sd},
        sd > '1998-11-15',
        rev = p * (1 - dc)
    ?[ok, revenue, od] := agg[ok, s, od], revenue = round(s, 2)
    :sort -revenue, ok
    :limit 10
    """, """
    SELECT l_orderkey,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-03-15'
      AND l_shipdate > TIMESTAMP '1998-11-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """, ordered=True)


def test_q3_with_timestamp_arithmetic(db, oracle):
    """Same Q3, but with the classic date arithmetic spelled the way the
    reference's float-seconds timestamp model allows: parse_timestamp(...)
    minus seconds, compared against the TIMESTAMP column (the translator
    coerces the column to epoch seconds)."""
    _check(db, oracle, """
    agg[ok, sum(rev), od] :=
        *customer{c_custkey: ck, c_mktsegment: 'BUILDING'},
        *orders{o_orderkey: ok, o_custkey: ck, o_orderdate: od},
        od < '1999-03-15',
        *lineitem{l_orderkey: ok, l_extendedprice: p, l_discount: dc,
                  l_shipdate: sd},
        sd > parse_timestamp('1999-03-15') - 86400 * 120,
        rev = p * (1 - dc)
    ?[ok, revenue, od] := agg[ok, s, od], revenue = round(s, 2)
    :sort -revenue, ok
    :limit 10
    """, """
    SELECT l_orderkey,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-03-15'
      AND l_shipdate > TIMESTAMP '1999-03-15' - INTERVAL 120 DAY
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """, ordered=True)


def test_q5_local_supplier_volume(db, oracle):
    # the classic two-way nationkey equality (customer and supplier in the
    # SAME nation) arises from the shared variable nk
    _check(db, oracle, """
    agg[n_name, sum(rev)] :=
        *region{r_regionkey: rk, r_name: 'ASIA'},
        *nation{n_nationkey: nk, n_regionkey: rk, n_name},
        *customer{c_custkey: ck, c_nationkey: nk},
        *orders{o_orderkey: ok, o_custkey: ck},
        *lineitem{l_orderkey: ok, l_suppkey: sk, l_extendedprice: p,
                  l_discount: dc},
        *supplier{s_suppkey: sk, s_nationkey: nk},
        rev = p * (1 - dc)
    ?[n_name, rev] := agg[n_name, s], rev = round(s, 2)
    """, """
    SELECT n_name, ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON s_suppkey = l_suppkey
                            AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """)


def test_q6_forecasting_revenue(db, oracle):
    _check(db, oracle, """
    agg[sum(rev)] :=
        *lineitem{l_extendedprice: p, l_discount: dc, l_quantity: q,
                  l_shipdate: sd},
        sd >= '1996-01-01', sd < '1997-01-01',
        dc >= 0.05, dc <= 0.07, q < 24,
        rev = p * dc
    ?[rev] := agg[s], rev = round(s, 2)
    """, """
    SELECT ROUND(sum(l_extendedprice * l_discount), 2) AS rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """)


def test_q10_returned_items(db, oracle):
    _check(db, oracle, """
    agg[ck, name, sum(rev), bal] :=
        *customer{c_custkey: ck, c_name: name, c_acctbal: bal},
        *orders{o_orderkey: ok, o_custkey: ck, o_orderdate: od},
        od >= '1996-10-01', od < '1997-01-01',
        *lineitem{l_orderkey: ok, l_returnflag: 'R', l_extendedprice: p,
                  l_discount: dc},
        rev = p * (1 - dc)
    ?[ck, name, revenue, bal] := agg[ck, name, s, bal], revenue = round(s, 2)
    :sort -revenue, ck
    :limit 20
    """, """
    SELECT c_custkey, c_name,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal
    FROM customer JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """, ordered=True)


def test_q12_priority_counts(db, oracle):
    # Q12's conditional aggregation (no l_shipmode column in the synthetic
    # schema — o_orderpriority plays its role): sum(if(...)) per linestatus
    _check(db, oracle, """
    ?[ls, sum(hi), sum(lo)] :=
        *orders{o_orderkey: ok, o_orderpriority: pri},
        *lineitem{l_orderkey: ok, l_linestatus: ls, l_shipdate: sd},
        sd >= '1996-01-01', sd < '1997-01-01',
        hi = if(pri == '1-URGENT' || pri == '2-HIGH', 1, 0),
        lo = if(pri != '1-URGENT' && pri != '2-HIGH', 1, 0)
    """, """
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS hi,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS lo
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """)


def test_q4_order_priority_exists(db, oracle):
    """Q4: EXISTS-style semi-join (a lineitem shipped late) + count per
    priority. In Datalog the EXISTS is an auxiliary projection rule —
    set semantics make it a semi-join."""
    _check(db, oracle, """
    late[ok] := *lineitem{l_orderkey: ok, l_shipdate: sd},
                *orders{o_orderkey: ok, o_orderdate: od},
                sd > od
    ?[pri, count(ok)] :=
        *orders{o_orderkey: ok, o_orderdate: od, o_orderpriority: pri},
        od >= '1996-07-01', od < '1996-10-01',
        late[ok]
    """, """
    SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """)


def test_q18_large_volume_customers(db, oracle):
    """Q18: HAVING over an aggregate — in Datalog, a filter atom on the
    aggregated rule's output (its own stratum)."""
    _check(db, oracle, """
    qty[ok, sum(q)] := *lineitem{l_orderkey: ok, l_quantity: q}
    ?[name, ok, total] :=
        qty[ok, total], total > 300.0,
        *orders{o_orderkey: ok, o_custkey: ck},
        *customer{c_custkey: ck, c_name: name}
    :sort -total, ok
    :limit 20
    """, """
    SELECT c_name AS name, o_orderkey AS ok, sum(l_quantity) AS total
    FROM customer JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_name, o_orderkey
    HAVING sum(l_quantity) > 300.0
    ORDER BY total DESC, ok LIMIT 20
    """, ordered=True)


def test_q14_promo_revenue(db, oracle):
    # two aggregates over the same match stream, then scalar arithmetic in
    # a SECOND rule reading the first (the reference's parallel_counts shape)
    _check(db, oracle, """
    sums[sum(promo), sum(total)] :=
        *lineitem{l_partkey: pk, l_extendedprice: p, l_discount: dc,
                  l_shipdate: sd},
        sd >= '1996-03-01', sd < '1996-04-01',
        *part{p_partkey: pk, p_type: pt},
        rev = p * (1 - dc),
        promo = if(pt == 'PROMO', rev, 0.0),
        total = rev
    ?[pct] := sums[pr, tot], pct = round(100.0 * pr / tot, 4)
    """, """
    SELECT ROUND(100.0 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """)
