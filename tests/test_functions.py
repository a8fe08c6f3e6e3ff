"""Scalar function & aggregation unit tests — the analogue of the
reference's cozo-core/src/data/tests/functions.rs (112 direct op_* calls)
and tests/aggrs.rs. Batched into a handful of Spark actions for speed."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def SCALAR(name):
    from cozo_spark.functions.scalar import SCALAR_FUNCTIONS

    return SCALAR_FUNCTIONS[name]


def _eval_batch(spark, exprs: dict):
    """Evaluate many scalar expressions in one action; returns name -> value."""
    from cozo_spark.functions.scalar import build_call

    cols = []
    for name, (fn, args) in exprs.items():
        cols.append(build_call(fn, [F.lit(a) if not hasattr(a, "_jc") else a for a in args]).alias(name))
    row = spark.range(1).select(*cols).collect()[0]
    return row.asDict()


def test_arithmetic(spark):
    r = _eval_batch(spark, {
        "add_int": ("add", [1, 2]),
        "add_float": ("add", [1, 2.5]),
        "sub": ("sub", [5, 3]),
        "mul": ("mul", [6, 7]),
        "div_ints": ("div", [7, 2]),          # always float (functions.rs:615-668)
        "minus": ("minus", [3]),
        "abs": ("abs", [-4.5]),
        "signum_neg": ("signum", [-9]),
        "floor": ("floor", [3.7]),
        "ceil": ("ceil", [3.2]),
        "round": ("round", [2.567, 2]),
        "mod": ("mod", [10, 3]),
        "pow": ("pow", [2, 10]),
        "sqrt": ("sqrt", [16]),
        "exp2": ("exp2", [3]),
        "ln": ("ln", [math.e]),
        "log2": ("log2", [8]),
        "log10": ("log10", [1000]),
        "maxv": ("max", [3, 9, 5]),
        "minv": ("min", [3, 9, 5]),
        "atan2": ("atan2", [1.0, 1.0]),
    })
    assert r["add_int"] == 3
    assert r["add_float"] == 3.5
    assert r["sub"] == 2 and r["mul"] == 42
    assert r["div_ints"] == 3.5
    assert r["minus"] == -3
    assert r["abs"] == 4.5
    assert r["signum_neg"] == -1
    assert r["floor"] == 3 and r["ceil"] == 4
    assert r["round"] == 2.57
    assert r["mod"] == 1
    assert r["pow"] == 1024.0
    assert r["sqrt"] == 4.0
    assert r["exp2"] == 8.0
    assert abs(r["ln"] - 1.0) < 1e-12
    assert r["log2"] == 3.0 and r["log10"] == 3.0
    assert r["maxv"] == 9 and r["minv"] == 3
    assert abs(r["atan2"] - math.pi / 4) < 1e-12


def test_comparison_logic(spark):
    r = _eval_batch(spark, {
        "eq_num": ("eq", [1, 1.0]),   # Int vs Float compares numerically
        "neq": ("neq", [1, 2]),
        "gt": ("gt", [2, 1]),
        "le": ("le", [2, 2]),
        "and3": ("and", [True, True, False]),
        "or3": ("or", [False, False, True]),
        "negate": ("negate", [False]),
        "coalesce": ("coalesce", [None, None, 42]),
        "if_t": ("if", [True, "yes", "no"]),
    })
    assert r["eq_num"] is True
    assert r["neq"] is True and r["gt"] is True and r["le"] is True
    assert r["and3"] is False and r["or3"] is True and r["negate"] is True
    assert r["coalesce"] == 42
    assert r["if_t"] == "yes"


def test_strings(spark):
    r = _eval_batch(spark, {
        "concat": ("concat", ["ab", "cd", "ef"]),
        "includes": ("str_includes", ["hello world", "lo w"]),
        "lower": ("lowercase", ["HeLLo"]),
        "upper": ("uppercase", ["HeLLo"]),
        "trim": ("trim", ["  x  "]),
        "trim_start": ("trim_start", ["  x  "]),
        "trim_end": ("trim_end", ["  x  "]),
        "starts": ("starts_with", ["hello", "he"]),
        "ends": ("ends_with", ["hello", "lo"]),
        "len_str": ("length", ["hello"]),
        "rx_match": ("regex_matches", ["abc123", "[a-c]+\\d+"]),
        "rx_repl": ("regex_replace_all", ["a1b2", "\\d", "_"]),
        "rx_first": ("regex_extract_first", ["a12b34", "\\d+"]),
        "pad": ("pad_start", ["7", 3, "0"]),
        "rev": ("reverse_string", ["abc"]),
    })
    assert r["concat"] == "abcdef"
    assert r["includes"] is True
    assert r["lower"] == "hello" and r["upper"] == "HELLO"
    assert r["trim"] == "x" and r["trim_start"] == "x  " and r["trim_end"] == "  x"
    assert r["starts"] is True and r["ends"] is True
    assert r["len_str"] == 5
    assert r["rx_match"] is True
    assert r["rx_repl"] == "a_b_"
    assert r["rx_first"] == "12"
    assert r["pad"] == "007"
    assert r["rev"] == "cba"


def test_lists(spark):
    arr = F.array(F.lit(3), F.lit(1), F.lit(2))
    r = _eval_batch(spark, {
        "mk": ("list", [1, 2, 3]),
        "append": ("append", [arr, 9]),
        "prepend": ("prepend", [arr, 0]),
        "sorted": ("sorted", [arr]),
        "reversed": ("reverse", [arr]),
        "first": ("first", [arr]),
        "last": ("last", [arr]),
        "get1": ("get", [arr, 1]),          # 0-indexed → element 2
        "slice": ("slice", [arr, 0, 2]),
        "is_in": ("is_in", [2, arr]),
        "union": ("union", [arr, F.array(F.lit(2), F.lit(4))]),
        "inter": ("intersection", [arr, F.array(F.lit(2), F.lit(4))]),
        "diff": ("difference", [arr, F.array(F.lit(1))]),
        "chunks": ("chunks", [F.array(*[F.lit(i) for i in range(5)]), 2]),
        "chunks_ex": ("chunks_exact", [F.array(*[F.lit(i) for i in range(5)]), 2]),
        "windows": ("windows", [F.array(*[F.lit(i) for i in range(4)]), 2]),
    })
    assert r["mk"] == [1, 2, 3]
    assert r["append"] == [3, 1, 2, 9] and r["prepend"] == [0, 3, 1, 2]
    assert r["sorted"] == [1, 2, 3] and r["reversed"] == [2, 1, 3]
    assert r["first"] == 3 and r["last"] == 2 and r["get1"] == 1
    assert r["slice"] == [3, 1]
    assert r["is_in"] is True
    assert sorted(r["union"]) == [1, 2, 3, 4]
    assert r["inter"] == [2]
    assert r["diff"] == [3, 2]
    assert r["chunks"] == [[0, 1], [2, 3], [4]]
    assert r["chunks_ex"] == [[0, 1], [2, 3]]
    assert r["windows"] == [[0, 1], [1, 2], [2, 3]]


def test_types_and_casts(spark):
    r = _eval_batch(spark, {
        "is_null": ("is_null", [None]),
        "to_int": ("to_int", ["42"]),
        "to_float": ("to_float", ["2.5"]),
        "to_string": ("to_string", [42]),
        "to_bool": ("to_bool", ["true"]),
        "unity_zero": ("to_unity", [0]),
        "unity_str": ("to_unity", ["x"]),
        "unity_empty": ("to_unity", [""]),
        "is_nan": ("is_nan", [float("nan")]),
        "is_inf": ("is_infinite", [float("inf")]),
        "is_fin": ("is_finite", [1.5]),
    })
    assert r["is_null"] is True
    assert r["to_int"] == 42 and r["to_float"] == 2.5
    assert r["to_string"] == "42" and r["to_bool"] is True
    assert r["unity_zero"] == 0 and r["unity_str"] == 1 and r["unity_empty"] == 0
    assert r["is_nan"] is True and r["is_inf"] is True and r["is_fin"] is True


def test_vectors_and_geo(spark):
    a = F.array(F.lit(1.0), F.lit(0.0))
    b = F.array(F.lit(0.0), F.lit(1.0))
    r = _eval_batch(spark, {
        "l2": ("l2_dist", [a, b]),
        "cos": ("cos_dist", [a, b]),
        "ip": ("ip_dist", [a, b]),
        "l2n": ("l2_normalize", [F.array(F.lit(3.0), F.lit(4.0))]),
        # London→Paris great-circle, degrees input (reference functions.rs:2134+)
        "hav": ("haversine_deg_input", [51.5074, -0.1278, 48.8566, 2.3522]),
        "d2r": ("deg_to_rad", [180.0]),
        "r2d": ("rad_to_deg", [math.pi]),
    })
    assert abs(r["l2"] - math.sqrt(2)) < 1e-12
    assert abs(r["cos"] - 1.0) < 1e-12
    assert abs(r["ip"] - 1.0) < 1e-12
    assert r["l2n"] == [0.6, 0.8]
    assert abs(r["hav"] * 6371 - 343.5) < 1.0  # ~343.5 km
    assert abs(r["d2r"] - math.pi) < 1e-12 and abs(r["r2d"] - 180.0) < 1e-12


def test_json_and_encoding(spark):
    from cozo_spark.functions.scalar import SCALAR_FUNCTIONS as S

    r = _eval_batch(spark, {
        "b64e": ("encode_base64", [F.lit("hi").cast("binary")]),
        "int_range2": ("int_range", [2, 6]),
    })
    assert r["b64e"] == "aGk="
    assert r["int_range2"] == [2, 3, 4, 5]
    row = spark.range(1).select(
        S["json_get"](F.lit('{"a": {"b": 5}}'), "a").alias("jget")).collect()[0]
    assert row["jget"] == '{"b":5}'


def test_aggregations_direct(spark):
    from cozo_spark.functions.aggregates import AGGREGATIONS

    df = spark.createDataFrame(
        [(1, 2.0, True, [1, 2]), (1, 3.0, False, [2, 3]), (2, 4.0, True, [3])],
        "k long, v double, b boolean, lst array<long>")
    r = df.groupBy("k").agg(
        AGGREGATIONS["count"].build(F.col("v")).alias("cnt"),
        AGGREGATIONS["sum"].build(F.col("v")).alias("s"),
        AGGREGATIONS["mean"].build(F.col("v")).alias("m"),
        AGGREGATIONS["min"].build(F.col("v")).alias("mn"),
        AGGREGATIONS["max"].build(F.col("v")).alias("mx"),
        AGGREGATIONS["and"].build(F.col("b")).alias("ba"),
        AGGREGATIONS["or"].build(F.col("b")).alias("bo"),
        AGGREGATIONS["union"].build(F.col("lst")).alias("u"),
        AGGREGATIONS["product"].build(F.col("v")).alias("p"),
        AGGREGATIONS["choice"].build(F.col("v")).alias("ch"),
    ).orderBy("k").collect()
    r1, r2 = r[0], r[1]
    assert r1["cnt"] == 2 and r1["s"] == 5.0 and r1["m"] == 2.5
    assert r1["mn"] == 2.0 and r1["mx"] == 3.0
    assert r1["ba"] is False and r1["bo"] is True
    assert r1["u"] == [1, 2, 3]
    assert abs(r1["p"] - 6.0) < 1e-9
    assert r1["ch"] == 2.0
    assert r2["cnt"] == 1 and r2["p"] == 4.0


def test_product_signs(spark):
    from cozo_spark.functions.aggregates import AGGREGATIONS

    df = spark.createDataFrame([(1, -2.0), (1, 3.0), (2, -2.0), (2, -3.0), (3, 0.0), (3, 5.0)],
                               "k long, v double")
    r = {row["k"]: row["p"] for row in df.groupBy("k").agg(
        AGGREGATIONS["product"].build(F.col("v")).alias("p")).collect()}
    assert abs(r[1] - (-6.0)) < 1e-9   # odd negatives → negative
    assert abs(r[2] - 6.0) < 1e-9      # even negatives → positive
    assert r[3] == 0.0                 # any zero → zero


def test_trig_and_conversions(spark):
    r = _eval_batch(spark, {
        "sin": ("sin", [math.pi / 2]),
        "cos": ("cos", [0.0]),
        "tan": ("tan", [0.0]),
        "asin": ("asin", [1.0]),
        "acos": ("acos", [1.0]),
        "atan": ("atan", [1.0]),
        "sinh": ("sinh", [0.0]),
        "cosh": ("cosh", [0.0]),
        "tanh": ("tanh", [0.0]),
        "exp": ("exp", [1.0]),
        "d2r": ("deg_to_rad", [180.0]),
        "r2d": ("rad_to_deg", [math.pi]),
        "hav": ("haversine_deg_input", [0.0, 0.0, 0.0, 180.0]),
    })
    assert abs(r["sin"] - 1.0) < 1e-12 and r["cos"] == 1.0 and r["tan"] == 0.0
    assert abs(r["asin"] - math.pi / 2) < 1e-12 and r["acos"] == 0.0
    assert abs(r["atan"] - math.pi / 4) < 1e-12
    assert r["sinh"] == 0.0 and r["cosh"] == 1.0 and r["tanh"] == 0.0
    assert abs(r["exp"] - math.e) < 1e-12
    assert abs(r["d2r"] - math.pi) < 1e-12 and abs(r["r2d"] - 180.0) < 1e-12
    # antipodal points: half the great circle (functions.rs haversine tests)
    assert abs(r["hav"] - math.pi) < 1e-9


def test_string_tail(spark):
    r = _eval_batch(spark, {
        "chars": ("chars", ["abc"]),
        "from_sub": ("from_substrings", [F.array(F.lit("ab"), F.lit("cd"))]),
        "nfc": ("unicode_normalize", ["é", "nfc"]),
        "nfd": ("unicode_normalize", ["é", "nfd"]),
        "rx_replace_one": ("regex_replace", ["a1b2", "\\d", "_"]),
        "rx_extract": ("regex_extract", ["a12b34", "\\d+"]),
        "slice_str": ("slice_string", ["hello", 1, 3]),
        "t2s": ("t2s", ["中國學會"]),
    })
    assert r["chars"] == ["a", "b", "c"]
    assert r["from_sub"] == "abcd"
    assert r["nfc"] == "é"
    assert r["nfd"] == "é"
    assert r["rx_replace_one"] == "a_b2"
    assert r["rx_extract"] == ["12", "34"]
    assert r["slice_str"] == "el"
    assert r["t2s"] == "中国学会"


def test_t2s_full_table():
    """The t2s table covers running Chinese text (~1400 single-char
    mappings incl. the systematic radical series), is conflict-free, and
    leaves simplified/rare text unchanged."""
    from cozo_spark.functions.scalar import _T2S, _T2S_PAIRS

    seen = {}
    for p in _T2S_PAIRS.split():
        assert len(p) == 2, p
        if p[0] == p[1]:
            continue
        assert seen.get(p[0], p[1]) == p[1], f"conflicting mapping {p!r}"
        seen[p[0]] = p[1]
    assert len(seen) >= 1300
    conv = lambda s: s.translate(_T2S)  # noqa: E731
    # sentence-level conversions (each char hand-checked vs OpenCC output)
    assert conv("繁體中文轉換測試") == "繁体中文转换测试"
    assert conv("這個國家的經濟發展") == "这个国家的经济发展"
    assert conv("雙方辯論陸地隸屬關係") == "双方辩论陆地隶属关系"
    assert conv("銀行貸款賬戶與飛機場鐵路") == "银行贷款账户与飞机场铁路"
    # simplified input is a fixed point; ASCII passes through
    assert conv("这个国家的经济发展") == "这个国家的经济发展"
    assert conv("hello 123") == "hello 123"


def test_bits_uuid_rand(spark):
    import re as _re

    r = _eval_batch(spark, {
        "band": ("bit_and", [12, 10]),
        "bor": ("bit_or", [12, 10]),
        "bxor": ("bit_xor", [12, 10]),
        "bnot": ("bit_not", [0]),
        "pack": ("encode_base64", [SCALAR("pack_bits")(F.array(
            F.lit(True), F.lit(False), F.lit(True)))]),
        "unpack": ("unpack_bits", [F.lit(bytes([0b10100000]))]),
        "u4": ("rand_uuid_v4", []),
        "u1ts": ("uuid_timestamp", [SCALAR("rand_uuid_v1")()]),
        "rf": ("rand_float", []),
        "ri": ("rand_int", [1, 6]),
        "rb": ("rand_bernoulli", [1.0]),
        "now": ("now", []),
    })
    assert r["band"] == 8 and r["bor"] == 14 and r["bxor"] == 6 and r["bnot"] == -1
    assert r["pack"] == "oA=="  # 0b10100000
    assert r["unpack"][:3] == [True, False, True] and len(r["unpack"]) == 8
    assert _re.match(r"^[0-9a-f-]{36}$", r["u4"])
    assert r["u1ts"] is not None and r["u1ts"] > 1.5e9  # sane epoch seconds
    assert 0.0 <= r["rf"] < 1.0
    assert 1 <= r["ri"] <= 6
    assert r["rb"] is True
    assert r["now"] > 1.5e9


def test_type_predicates_and_uuid_casts(spark):
    r = _eval_batch(spark, {
        "isu_t": ("is_uuid", ["f47ac10b-58cc-4372-a567-0e02b2c3d479"]),
        "isu_f": ("is_uuid", ["not-a-uuid"]),
        "tou": ("to_uuid", ["F47AC10B-58CC-4372-A567-0E02B2C3D479"]),
        "tou_bad": ("to_uuid", ["nope"]),
        "isl_f": ("is_list", ["str"]),
        "isv_f": ("is_vec", [1]),
        "isb_f": ("is_bytes", [1.5]),
    })
    assert r["isu_t"] is True and r["isu_f"] is False
    assert r["tou"] == "f47ac10b-58cc-4372-a567-0e02b2c3d479"
    assert r["tou_bad"] is None
    assert r["isl_f"] is False and r["isv_f"] is False and r["isb_f"] is False


def test_type_predicates_static_dispatch(spark):
    """compile_expr answers is_list/is_vec/is_bytes/is_int/... from the
    DataFrame schema (the type oracle), including NULL → false."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    r = db.run_script("""
    ?[il, iv, ii, fs, nn] := x in [[1, 2]], v = vec([1.0, 2.0]), n = 3,
        il = is_list(x), iv = is_vec(v), ii = is_int(n),
        fs = is_string(n), nn = is_null(n)
    """)
    assert list(r.rows[0]) == [True, True, True, False, False]


def test_json_path_edit(spark):
    r = _eval_batch(spark, {
        "setp": ("set_json_path", [
            '{"a":{"b":1},"c":[1,2]}', F.array(F.lit("a"), F.lit("b")), 9]),
        "setp_new": ("set_json_path", [
            '{}', F.array(F.lit("x"), F.lit("y")), "v"]),
        "remp": ("remove_json_path", ['{"a":{"b":1,"c":2}}',
                                      F.array(F.lit("a"), F.lit("b"))]),
        "scalar_str": ("json_to_scalar", ['"hi"']),
        "scalar_num": ("json_to_scalar", ['5']),
        "validity": ("dump_json", [SCALAR("validity")(F.lit(123))]),
    })
    import json
    assert json.loads(r["setp"]) == {"a": {"b": 9}, "c": [1, 2]}
    assert json.loads(r["setp_new"]) == {"x": {"y": "v"}}
    assert json.loads(r["remp"]) == {"a": {"c": 2}}
    assert r["scalar_str"] == "hi" and r["scalar_num"] == "5"
    assert json.loads(r["validity"]) == {"ts": 123, "is_assert": True}


def test_json_merge(spark):
    # ++ deep-merge semantics (op_concat json arm, functions.rs:1280-1310)
    r = _eval_batch(spark, {
        "m": ("json_merge", ['{"a":{"x":1},"b":[1]}', '{"a":{"y":2},"b":[2],"c":3}']),
    })
    import json
    assert json.loads(r["m"]) == {"a": {"x": 1, "y": 2}, "b": [1, 2], "c": 3}


def test_aggregations_tail(spark):
    """The rest of the 25-aggregation registry (reference tests/aggrs.rs)."""
    from cozo_spark.functions.aggregates import AGGREGATIONS as A

    df = spark.createDataFrame(
        [(1, 5.0, 3, [1, 2]),
         (1, 2.0, 6, [2, 3]),
         (1, 2.0, 12, [2])],
        "k long, v double, i long, lst array<long>")
    r = df.groupBy("k").agg(
        A["count_unique"].build(F.col("v")).alias("cu"),
        A["variance"].build(F.col("v")).alias("var"),
        A["std_dev"].build(F.col("v")).alias("sd"),
        A["unique"].build(F.col("v")).alias("uq"),
        A["collect"].build(F.col("v")).alias("cl"),
        A["collect"].build(F.col("v"), 2).alias("cl2"),
        A["group_count"].build(F.col("v")).alias("gc"),
        A["intersection"].build(F.col("lst")).alias("ix"),
        A["bit_and"].build(F.col("i")).alias("ba"),
        A["bit_or"].build(F.col("i")).alias("bo"),
        A["bit_xor"].build(F.col("i")).alias("bx"),
        A["shortest"].build(F.col("lst")).alias("sh"),
        A["choice_rand"].build(F.col("v")).alias("cr"),
    ).collect()[0]
    assert r["cu"] == 2
    assert abs(r["var"] - 3.0) < 1e-9          # var_samp of (5,2,2)
    assert abs(r["sd"] - 3.0 ** 0.5) < 1e-9
    assert sorted(r["uq"]) == [2.0, 5.0]
    assert sorted(r["cl"]) == [2.0, 2.0, 5.0] and len(r["cl2"]) == 2
    assert [(p["value"], p["count"]) for p in r["gc"]] == [(2.0, 2), (5.0, 1)]
    assert r["ix"] == [2]                       # common to all three lists
    assert r["ba"] == 3 & 6 & 12 and r["bo"] == 3 | 6 | 12 and r["bx"] == 3 ^ 6 ^ 12
    assert r["sh"] == [2]                       # shortest list
    assert r["cr"] in (2.0, 5.0)
    # [data, key] pairs (aggr.rs:719-882): all three return the data element
    paired = spark.createDataFrame(
        [(1, [5.0, 10.0]), (1, [2.0, 12.0]), (1, [7.0, 9.0])],
        "k long, dv array<double>")
    r2 = paired.groupBy("k").agg(
        A["latest_by"].build(F.col("dv")).alias("lb"),
        A["smallest_by"].build(F.col("dv")).alias("sb"),
        A["min_cost"].build(F.col("dv")).alias("mc"),
    ).collect()[0]
    assert r2["lb"] == 2.0   # data at max key 12
    assert r2["sb"] == 7.0   # data at min key 9
    assert list(r2["mc"]) == [7.0, 9.0]  # min_cost returns the full [data, cost] pair (aggr.rs:838)


def test_aggregations_sketch_extensions(spark):
    """Beyond-reference sketch aggregations (SURVEY §2.3): usable from
    CozoScript heads like any registry entry."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.register_dataframe(
        "vals", spark.createDataFrame([(i % 7, float(i)) for i in range(100)],
                                      "k long, v double"))
    r = db.run_script("?[approx_count_unique(k), percentile(v, 0.5), median(v)] := *vals[k, v]")
    acd, p50, med = r.rows[0]
    assert 6 <= acd <= 8          # ~7 distinct keys within rsd
    assert 40.0 <= p50 <= 60.0
    assert med == 49.5


def test_strftime_translation_quotes_literals():
    from cozo_spark.functions.scalar import _fmt_to_java

    assert _fmt_to_java("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"
    assert _fmt_to_java("%Y/%m/%d") == "yyyy/MM/dd"
    assert _fmt_to_java("%b %e, %Y") == "MMM d, yyyy"
    assert _fmt_to_java("%H:%M %p") == "HH:mm a"
    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        _fmt_to_java("%Q")
