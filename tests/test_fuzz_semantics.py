"""Seeded differential fuzz: scalar-function semantics vs exact Python
references over hundreds of random inputs, one Spark action per family.
Complements the example-based unit tests (reference tests/functions.rs) with
breadth — especially the sign/overflow/unicode corners.

Cozo semantics under test (data/functions.rs):
- `div` is ALWAYS float division (functions.rs:615-668);
- `mod` truncates toward zero (Rust `%`), NOT Python's floor mod;
- arithmetic keeps Int when all-Int, else Float;
- `length` counts unicode chars, not bytes;
- list `get` is 0-indexed; `slice` is [start, end).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def _cases_df(spark, seed: int, n: int = 250):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        a = rnd.randint(-10**9, 10**9)
        b = rnd.choice([rnd.randint(-1000, 1000), rnd.randint(1, 50)])
        if b == 0:
            b = 7
        x = rnd.uniform(-1e6, 1e6)
        y = rnd.uniform(0.1, 100.0)
        s = "".join(rnd.choice("aàbBçDé fĝ😀ß ") for _ in range(rnd.randint(0, 12)))
        t = "".join(rnd.choice("ab ") for _ in range(rnd.randint(0, 4)))
        rows.append((i, a, b, x, y, s, t))
    return rows, spark.createDataFrame(
        rows, "i long, a long, b long, x double, y double, s string, t string")


def test_fuzz_numeric_semantics(spark):
    from cozo_spark.functions.scalar import SCALAR_FUNCTIONS as S

    rows, df = _cases_df(spark, seed=1234)
    got = df.select(
        "i",
        S["add"](F.col("a"), F.col("b")).alias("add"),
        S["sub"](F.col("a"), F.col("b")).alias("sub"),
        S["mul"](F.col("b"), F.col("b")).alias("mul"),
        S["div"](F.col("a"), F.col("b")).alias("div"),
        S["mod"](F.col("a"), F.col("b")).alias("mod"),
        S["abs"](F.col("a")).alias("abs"),
        S["signum"](F.col("a")).alias("sig"),
        S["floor"](F.col("x")).alias("fl"),
        S["ceil"](F.col("x")).alias("ce"),
        S["sqrt"](F.col("y")).alias("sq"),
        S["ln"](F.col("y")).alias("ln"),
        S["pow"](F.col("y"), F.lit(2)).alias("pw"),
        S["max"](F.col("a"), F.col("b")).alias("mx"),
        S["min"](F.col("a"), F.col("b")).alias("mn"),
    ).collect()
    by_i = {r["i"]: r for r in got}
    for (i, a, b, x, y, s, t) in rows:
        r = by_i[i]
        assert r["add"] == a + b and r["sub"] == a - b and r["mul"] == b * b
        assert r["div"] == float(a) / float(b)  # always float division
        # truncated-toward-zero remainder (Rust %), not Python floor mod
        assert r["mod"] == a - int(a / b) * b if b != 0 else True
        assert r["abs"] == abs(a)
        assert r["sig"] == (0 if a == 0 else (1 if a > 0 else -1))
        assert r["fl"] == math.floor(x) and r["ce"] == math.ceil(x)
        assert r["sq"] == math.sqrt(y)
        assert abs(r["ln"] - math.log(y)) < 1e-9
        assert abs(r["pw"] - y * y) < max(1e-6, abs(y * y) * 1e-12)
        assert r["mx"] == max(a, b) and r["mn"] == min(a, b)


def test_fuzz_string_semantics(spark):
    from cozo_spark.functions.scalar import SCALAR_FUNCTIONS as S

    rows, df = _cases_df(spark, seed=987)
    got = df.select(
        "i",
        S["concat"](F.col("s"), F.col("t")).alias("cat"),
        S["lowercase"](F.col("s")).alias("lo"),
        S["uppercase"](F.col("s")).alias("up"),
        S["length"](F.col("s")).alias("ln"),
        S["trim"](F.col("s")).alias("tr"),
        S["starts_with"](F.col("s"), F.col("t")).alias("sw"),
        S["ends_with"](F.col("s"), F.col("t")).alias("ew"),
        S["str_includes"](F.col("s"), F.col("t")).alias("inc"),
        S["reverse_string"](F.col("s")).alias("rev"),
    ).collect()
    by_i = {r["i"]: r for r in got}
    for (i, a, b, x, y, s, t) in rows:
        r = by_i[i]
        assert r["cat"] == s + t
        assert r["lo"] == s.lower() and r["up"] == s.upper()
        assert r["ln"] == len(s)  # unicode chars, not bytes
        assert r["tr"] == s.strip(" ")
        assert r["sw"] == s.startswith(t) and r["ew"] == s.endswith(t)
        assert r["inc"] == (t in s)
        assert r["rev"] == s[::-1]


def test_fuzz_list_semantics(spark):
    from cozo_spark.functions.scalar import SCALAR_FUNCTIONS as S

    rnd = random.Random(55)
    rows = []
    for i in range(200):
        lst = [rnd.randint(-50, 50) for _ in range(rnd.randint(0, 8))]
        k = rnd.randint(0, max(len(lst) - 1, 0))
        rows.append((i, lst, k))
    df = spark.createDataFrame(rows, "i long, lst array<long>, k long")
    got = df.select(
        "i",
        S["sorted"](F.col("lst")).alias("srt"),
        S["reverse"](F.col("lst")).alias("rev"),
        S["list_length"](F.col("lst")).alias("ln"),
        S["append"](F.col("lst"), F.lit(99)).alias("ap"),
        S["prepend"](F.col("lst"), F.lit(-99)).alias("pre"),
        S["maybe_get"](F.col("lst"), F.col("k")).alias("get"),
        S["slice"](F.col("lst"), F.lit(0), F.col("k")).alias("sl"),
    ).collect()
    by_i = {r["i"]: r for r in got}
    for (i, lst, k) in rows:
        r = by_i[i]
        assert r["srt"] == sorted(lst)
        assert r["rev"] == lst[::-1]
        assert r["ln"] == len(lst)
        assert r["ap"] == lst + [99] and r["pre"] == [-99] + lst
        if lst:
            assert r["get"] == lst[k]          # 0-indexed
            assert r["sl"] == lst[0:k]         # [start, end)
        else:
            assert r["get"] is None            # maybe_get → NULL out of range


def test_fuzz_fd_elision_differential(spark):
    """Key-FD distinct elision must never change results: for random
    keyed tables and random conjunctive queries, running with declared PKs
    (elision may fire) and without (every rule deduped) must agree."""
    import random

    from cozo_spark.datalog.engine import CozoDb

    rnd = random.Random(77)
    n_a, n_b = 40, 15
    a_rows = [(i, rnd.randint(0, n_b - 1), rnd.randint(0, 5)) for i in range(n_a)]
    b_rows = [(j, rnd.randint(0, 9), chr(97 + j % 5)) for j in range(n_b)]
    adf = spark.createDataFrame(a_rows, "ak long, fk long, av long")
    bdf = spark.createDataFrame(b_rows, "bk long, bv long, bs string")

    scripts = [
        "?[ak, av] := *a{ak, av}, av > 2",
        "?[ak, fk, av] := *a{ak, fk, av}",
        "?[av] := *a{ak, av}",                      # key dropped -> dedup
        "?[ak, bs] := *a{ak, fk}, *b{bk: fk, bs}",  # join on b's full key
        "?[bk, av] := *b{bk, bv}, *a{fk: bk, av}",  # duplicating join
        "?[ak, x] := *a{ak, av}, x = av * 2 + 1",
        "?[ak] := *a{ak, fk}, not *b{bk: fk, bv: 0}",
        "?[fk, count(ak), sum(av)] := *a{ak, fk, av}",
        "?[ak, y] := *a{ak, av}, y in [av, av + 1]",
    ]
    keyed, unkeyed = CozoDb(spark), CozoDb(spark)
    keyed.register_dataframe("a", adf, keys=["ak"])
    keyed.register_dataframe("b", bdf, keys=["bk"])
    unkeyed.register_dataframe("a", adf)
    unkeyed.register_dataframe("b", bdf)
    for script in scripts:
        r1 = sorted(tuple(x) for x in keyed.run_script(script).rows)
        r2 = sorted(tuple(x) for x in unkeyed.run_script(script).rows)
        assert r1 == r2, (script, r1[:5], r2[:5])
