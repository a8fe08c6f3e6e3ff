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


def test_q1_pricing_summary(db, oracle):
    """Q1: the full 8-aggregate pricing summary. Head variables must be
    distinct, so each aggregated expression gets its own alias binding."""
    _check(db, oracle, """
    agg[rf, ls, sum(q), sum(p), sum(dp), sum(ch), mean(q2), mean(p2),
        mean(dc), count(ok)] :=
        *lineitem{l_orderkey: ok, l_returnflag: rf, l_linestatus: ls,
                  l_quantity: q, l_extendedprice: p, l_discount: dc,
                  l_tax: tx, l_shipdate: sd},
        sd <= '1998-09-02',
        dp = p * (1 - dc), ch = p * (1 - dc) * (1 + tx),
        q2 = q, p2 = p
    ?[rf, ls, sq, sp, sdp, sch, aq, ap, adc, n] :=
        agg[rf, ls, a, b, c, d, e, f, g, n],
        sq = round(a, 2), sp = round(b, 2), sdp = round(c, 2),
        sch = round(d, 2), aq = round(e, 4), ap = round(f, 4),
        adc = round(g, 4)
    """, """
    SELECT l_returnflag, l_linestatus,
           ROUND(sum(l_quantity), 2) AS sq,
           ROUND(sum(l_extendedprice), 2) AS sp,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS sdp,
           ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sch,
           ROUND(avg(l_quantity), 4) AS aq,
           ROUND(avg(l_extendedprice), 4) AS ap,
           ROUND(avg(l_discount), 4) AS adc,
           count(*) AS n
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """)


def test_q2_minimum_cost_supplier(db, oracle):
    """Q2's correlated-minimum shape: the supplier(s) matching the
    groupwise-minimum price per small part (no partsupp in the synthetic
    schema — lineitem prices play supplycost)."""
    _check(db, oracle, """
    minp[pk, min(p)] := *lineitem{l_partkey: pk, l_extendedprice: p}
    ?[pk, sk, p] :=
        *part{p_partkey: pk, p_size: sz}, sz < 5,
        minp[pk, p],
        *lineitem{l_partkey: pk, l_suppkey: sk, l_extendedprice: p}
    """, """
    SELECT DISTINCT l.l_partkey AS pk, l.l_suppkey AS sk,
                    l.l_extendedprice AS p
    FROM lineitem l JOIN part ON p_partkey = l.l_partkey
    WHERE p_size < 5
      AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)
    """)


def test_q7_volume_shipping_disjunction(db, oracle):
    """Q7: supplier-nation/customer-nation flows for a symmetric nation
    pair — a disjunctive filter over two join-reachable attributes."""
    _check(db, oracle, """
    agg[sn, cn, sum(rev)] :=
        *supplier{s_suppkey: sk, s_nationkey: snk},
        *nation{n_nationkey: snk, n_name: sn},
        *lineitem{l_orderkey: ok, l_suppkey: sk, l_extendedprice: p,
                  l_discount: dc},
        *orders{o_orderkey: ok, o_custkey: ck},
        *customer{c_custkey: ck, c_nationkey: cnk},
        *nation{n_nationkey: cnk, n_name: cn},
        (sn == 'NATION_1' && cn == 'NATION_2') ||
            (sn == 'NATION_2' && cn == 'NATION_1'),
        rev = p * (1 - dc)
    ?[sn, cn, rev] := agg[sn, cn, s], rev = round(s, 2)
    """, """
    SELECT sn.n_name AS s_nation, cn.n_name AS c_nation,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
    FROM supplier JOIN nation sn ON sn.n_nationkey = s_nationkey
                  JOIN lineitem ON l_suppkey = s_suppkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY sn.n_name, cn.n_name
    """)


def test_q9_profit_by_nation_year(db, oracle):
    """Q9: profit per nation per order-year — format_timestamp('%Y') on a
    native timestamp column is the year extraction."""
    _check(db, oracle, """
    agg[n, yr, sum(rev)] :=
        *part{p_partkey: pk, p_name: pn}, str_includes(pn, '1'),
        *lineitem{l_partkey: pk, l_suppkey: sk, l_orderkey: ok,
                  l_extendedprice: p, l_discount: dc},
        *supplier{s_suppkey: sk, s_nationkey: nk},
        *nation{n_nationkey: nk, n_name: n},
        *orders{o_orderkey: ok, o_orderdate: od},
        yr = format_timestamp(od, '%Y'),
        rev = p * (1 - dc)
    ?[n, yr, profit] := agg[n, yr, s], profit = round(s, 2)
    """, """
    SELECT n_name AS n, strftime(o_orderdate, '%Y') AS yr,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
    FROM part JOIN lineitem ON l_partkey = p_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation ON n_nationkey = s_nationkey
              JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%1%'
    GROUP BY n_name, strftime(o_orderdate, '%Y')
    """)


def test_q11_important_stock_share(db, oracle):
    """Q11's HAVING-against-a-scalar-subquery: per-part revenue kept only
    when above a fraction of the global total (two independent aggregation
    strata joined in the entry rule)."""
    _check(db, oracle, """
    perpart[pk, sum(rev)] :=
        *lineitem{l_partkey: pk, l_extendedprice: p, l_discount: dc},
        rev = p * (1 - dc)
    total[sum(rev)] :=
        *lineitem{l_extendedprice: p, l_discount: dc},
        rev = p * (1 - dc)
    ?[pk, value] := perpart[pk, s], total[t], s > t * 0.008,
                    value = round(s, 2)
    """, """
    SELECT l_partkey AS pk,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS value
    FROM lineitem GROUP BY l_partkey
    HAVING sum(l_extendedprice * (1 - l_discount)) >
           (SELECT sum(l_extendedprice * (1 - l_discount)) FROM lineitem)
           * 0.008
    """)


def test_q13_customer_distribution(db, oracle):
    """Q13: order-count distribution INCLUDING zero-order customers — the
    left-outer join spelled as aggregation ∪ negation."""
    _check(db, oracle, """
    cnt[ck, count(ok)] := *customer{c_custkey: ck},
                          *orders{o_orderkey: ok, o_custkey: ck}
    dist[ck, n] := cnt[ck, n]
    dist[ck, n] := *customer{c_custkey: ck}, not *orders{o_custkey: ck},
                   n = 0
    ?[n, count(ck)] := dist[ck, n]
    """, """
    SELECT n, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS n
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey)
    GROUP BY n
    """)


def test_q15_top_supplier(db, oracle):
    """Q15: supplier(s) with the maximum revenue — aggregate, take the max
    of the aggregate, join back."""
    _check(db, oracle, """
    rev[sk, sum(r)] :=
        *lineitem{l_suppkey: sk, l_extendedprice: p, l_discount: dc,
                  l_shipdate: sd},
        sd >= '1996-01-01', sd < '1996-04-01',
        r = p * (1 - dc)
    top[max(t)] := rev[_, t]
    ?[sk, name, total] := rev[sk, t], top[t],
                          *supplier{s_suppkey: sk, s_name: name},
                          total = round(t, 2)
    """, """
    WITH rev AS (
        SELECT l_suppkey AS sk, sum(l_extendedprice * (1 - l_discount)) AS t
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT sk, s_name AS name, ROUND(t, 2) AS total
    FROM rev JOIN supplier ON s_suppkey = sk
    WHERE t = (SELECT max(t) FROM rev)
    """)


def test_q16_supplier_part_counts(db, oracle):
    """Q16: distinct-supplier counts per part attribute with an excluded
    supplier set (negation against an aggregating stratum's input)."""
    _check(db, oracle, """
    excl[sk] := *supplier{s_suppkey: sk, s_acctbal: b}, b < 0
    ?[brand, sz, count_unique(sk)] :=
        *part{p_partkey: pk, p_brand: brand, p_size: sz},
        brand != 'Brand#1',
        is_in(sz, [9, 14, 23, 45]),
        *lineitem{l_partkey: pk, l_suppkey: sk},
        not excl[sk]
    """, """
    SELECT p_brand AS brand, p_size AS sz,
           count(DISTINCT l_suppkey) AS n
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (9, 14, 23, 45)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """)


def test_q17_small_quantity_revenue(db, oracle):
    """Q17: average-quantity correlated subquery — the per-part mean joins
    back into the fact scan as a filter bound."""
    _check(db, oracle, """
    avgq[pk, mean(q)] := *lineitem{l_partkey: pk, l_quantity: q}
    s[sum(p)] := *part{p_partkey: pk, p_brand: 'Brand#13'},
                 *lineitem{l_partkey: pk, l_quantity: q, l_extendedprice: p},
                 avgq[pk, a], q < 0.5 * a
    ?[yearly] := s[t], yearly = round(t / 7.0, 2)
    """, """
    SELECT ROUND(sum(l.l_extendedprice) / 7.0, 2) AS yearly
    FROM lineitem l JOIN part ON p_partkey = l.l_partkey
    WHERE p_brand = 'Brand#13'
      AND l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = l.l_partkey)
    """)


def test_q19_disjunctive_predicates(db, oracle):
    """Q19: three-way disjunction of conjunctive brand/size/quantity
    envelopes over the join."""
    _check(db, oracle, """
    sums[sum(rev)] :=
        *lineitem{l_partkey: pk, l_quantity: q, l_extendedprice: p,
                  l_discount: dc},
        *part{p_partkey: pk, p_brand: b, p_size: sz},
        (b == 'Brand#13' && q >= 1 && q <= 11 && sz <= 5) ||
            (b == 'Brand#20' && q >= 10 && q <= 20 && sz <= 10) ||
            (b == 'Brand#23' && q >= 20 && q <= 30 && sz <= 15),
        rev = p * (1 - dc)
    ?[rev] := sums[s], rev = round(s, 2)
    """, """
    SELECT ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 11
           AND p_size <= 5)
       OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 10 AND 20
           AND p_size <= 10)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 20 AND 30
           AND p_size <= 15)
    """)


def test_q21_waiting_supplier(db, oracle):
    """Q21's EXISTS/max-correlation shape: suppliers whose line is the
    latest-shipping in a finished multi-supplier order."""
    _check(db, oracle, """
    latest[ok, max(sd)] := *lineitem{l_orderkey: ok, l_shipdate: sd}
    multi[ok] := *lineitem{l_orderkey: ok, l_suppkey: a},
                 *lineitem{l_orderkey: ok, l_suppkey: b}, a != b
    ?[name, count_unique(ok)] :=
        *supplier{s_suppkey: sk, s_name: name},
        *lineitem{l_orderkey: ok, l_suppkey: sk, l_shipdate: sd},
        *orders{o_orderkey: ok, o_orderstatus: 'F'},
        latest[ok, sd], multi[ok]
    """, """
    SELECT s_name AS name, count(DISTINCT l.l_orderkey) AS n
    FROM supplier JOIN lineitem l ON l.l_suppkey = s_suppkey
                  JOIN orders ON o_orderkey = l.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l.l_shipdate = (SELECT max(l2.l_shipdate) FROM lineitem l2
                          WHERE l2.l_orderkey = l.l_orderkey)
      AND EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l.l_orderkey
                    AND l3.l_suppkey <> l.l_suppkey)
    GROUP BY s_name
    """)


def test_q22_global_sales_opportunity(db, oracle):
    """Q22: positive-balance average as a scalar stratum + anti-join on
    customers with no orders."""
    _check(db, oracle, """
    avgbal[mean(b)] := *customer{c_acctbal: b}, b > 0.0
    agg[nk, count(ck), sum(b2)] :=
        *customer{c_custkey: ck, c_nationkey: nk, c_acctbal: b},
        avgbal[a], b > a,
        not *orders{o_custkey: ck},
        b2 = b
    ?[nk, n, total] := agg[nk, n, s], total = round(s, 2)
    """, """
    SELECT c_nationkey AS nk, count(*) AS n,
           ROUND(sum(c_acctbal), 2) AS total
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """)
