"""Scalar function registry: Cozo name → pyspark Column builder.

Reference inventory: cozo-core/src/data/expr.rs:794-935 (dispatch table) and
data/functions.rs (implementations). Every function here is a JVM-side
Column expression (whole-stage codegen); the handful of genuinely
Cozo-specific semantics (to_unity, uuid timestamps, t2s) are UDF-gated and
listed in ``UDF_BACKED``.

Numeric semantics preserved (functions.rs:382-1090):
- arithmetic keeps Int when all-Int, else Float — Spark's native promotion;
- ``div`` / operator ``/`` is ALWAYS float division (functions.rs:615-668);
- ``^`` (pow) is always float.
"""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnFn = Callable[..., Column]

SCALAR_FUNCTIONS: dict[str, ColumnFn] = {}


def fn(name: str):
    def deco(f):
        SCALAR_FUNCTIONS[name] = f
        return f
    return deco


def alias(name: str, target: str) -> None:
    SCALAR_FUNCTIONS[name] = SCALAR_FUNCTIONS[target]


def build_call(name: str, args: list[Column]) -> Column:
    if name not in SCALAR_FUNCTIONS:
        raise KeyError(f"unknown function {name!r}")
    return SCALAR_FUNCTIONS[name](*args)


_D = "double"


# --- comparison / logic (functions.rs:297-381, 1091-1125) -------------------

fn("eq")(lambda a, b: a == b)
fn("neq")(lambda a, b: a != b)
fn("gt")(lambda a, b: a > b)
fn("ge")(lambda a, b: a >= b)
fn("lt")(lambda a, b: a < b)
fn("le")(lambda a, b: a <= b)
fn("and")(lambda *xs: _fold(lambda a, b: a & b, xs))
fn("or")(lambda *xs: _fold(lambda a, b: a | b, xs))
fn("negate")(lambda a: ~a)
fn("is_in")(lambda a, lst: F.array_contains(lst, a))
fn("coalesce")(lambda *xs: F.coalesce(*xs))
fn("if")(lambda c, t, f=None: F.when(c, t).otherwise(f if f is not None else F.lit(None)))
fn("cond")(lambda *xs: _cond(xs))
fn("assert")(lambda a, *msg: F.assert_true(a))


def _fold(op, xs):
    out = xs[0]
    for x in xs[1:]:
        out = op(out, x)
    return out


def _cond(xs):
    out = F.lit(None)
    # pairs of (cond, val), evaluated in order: build nested when from the end
    pairs = list(zip(xs[0::2], xs[1::2]))
    expr = None
    for c, v in pairs:
        expr = F.when(c, v) if expr is None else expr.when(c, v)
    return expr if expr is not None else out


# --- arithmetic / math (functions.rs:382-1090) -------------------------------

fn("add")(lambda *xs: _fold(lambda a, b: a + b, xs))
fn("sub")(lambda a, b: a - b)
fn("mul")(lambda *xs: _fold(lambda a, b: a * b, xs))
fn("div")(lambda a, b: a.cast(_D) / b.cast(_D))
fn("minus")(lambda a: -a)
fn("abs")(lambda a: F.abs(a))
fn("signum")(lambda a: F.signum(a))
fn("floor")(lambda a: F.floor(a))
fn("ceil")(lambda a: F.ceil(a))
fn("round")(lambda a, d=None: F.round(a, 0) if d is None else F.round(a, d))
fn("mod")(lambda a, b: a % b)
fn("max")(lambda *xs: F.greatest(*xs) if len(xs) > 1 else xs[0])
fn("min")(lambda *xs: F.least(*xs) if len(xs) > 1 else xs[0])
fn("pow")(lambda a, b: F.pow(a.cast(_D), b.cast(_D)))
fn("sqrt")(lambda a: F.sqrt(a.cast(_D)))
fn("exp")(lambda a: F.exp(a.cast(_D)))
fn("exp2")(lambda a: F.pow(F.lit(2.0), a.cast(_D)))
fn("ln")(lambda a: F.log(a.cast(_D)))
fn("log2")(lambda a: F.log2(a.cast(_D)))
fn("log10")(lambda a: F.log10(a.cast(_D)))
for _name in ("sin", "cos", "tan", "asin", "acos", "atan",
              "sinh", "cosh", "tanh", "asinh", "acosh", "atanh"):
    fn(_name)((lambda nm: lambda a: getattr(F, nm)(a.cast(_D)))(_name))
fn("atan2")(lambda a, b: F.atan2(a.cast(_D), b.cast(_D)))
fn("deg_to_rad")(lambda a: F.radians(a.cast(_D)))
fn("rad_to_deg")(lambda a: F.degrees(a.cast(_D)))
fn("pi")(lambda: F.lit(math.pi))
fn("e")(lambda: F.lit(math.e))

# haversine (functions.rs:2134-2256): great-circle distance in radians on the
# unit sphere; *_deg_input converts degrees first.


def _haversine(lat1, lon1, lat2, lon2):
    dlat = (lat2 - lat1) / 2
    dlon = (lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(lat1) * F.cos(lat2) * F.sin(dlon) ** 2
    return 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))


fn("haversine")(lambda *c: _haversine(*[x.cast(_D) for x in c]))
fn("haversine_deg_input")(lambda *c: _haversine(*[F.radians(x.cast(_D)) for x in c]))

# --- bitwise (functions.rs:1126-1252) ----------------------------------------

fn("bit_and")(lambda a, b: a.bitwiseAND(b))
fn("bit_or")(lambda a, b: a.bitwiseOR(b))
fn("bit_xor")(lambda a, b: a.bitwiseXOR(b))
fn("bit_not")(lambda a: F.bitwise_not(a))

# --- string (functions.rs:1253-1894) ------------------------------------------

fn("concat")(lambda *xs: F.concat(*xs))
fn("str_includes")(lambda a, b: a.contains(b))
fn("lowercase")(lambda a: F.lower(a))
fn("uppercase")(lambda a: F.upper(a))
fn("trim")(lambda a: F.trim(a))
fn("trim_start")(lambda a: F.ltrim(a))
fn("trim_end")(lambda a: F.rtrim(a))
fn("starts_with")(lambda a, b: a.startswith(b))
fn("ends_with")(lambda a, b: a.endswith(b))
fn("length")(lambda a: F.length(a))  # Spark overloads for str/binary; arrays use size
fn("list_length")(lambda a: F.size(a))
fn("chars")(lambda a: F.split(a, ""))
fn("from_substrings")(lambda lst, sep=None: F.array_join(lst, "") if sep is None else F.array_join(lst, sep))
fn("slice_string")(lambda a, s, e: F.substring(a, s + 1, e - s))
fn("split")(lambda a, sep: F.split(a, sep))
fn("replace")(lambda a, frm, to: F.replace(a, frm, to))
fn("pad_start")(lambda a, n, p: F.lpad(a, n, p))
fn("pad_end")(lambda a, n, p: F.rpad(a, n, p))
fn("repeat")(lambda a, n: F.repeat(a, n))
fn("reverse_string")(lambda a: F.reverse(a))
fn("unicode_normalize")(lambda a, form: _unicode_normalize(a, form))


def _unicode_normalize(a: Column, form: Column) -> Column:
    from pyspark.sql.types import StringType
    import unicodedata

    @F.udf(returnType=StringType())
    def _norm(s, f):
        if s is None:
            return None
        return unicodedata.normalize((f or "nfc").upper(), s)

    return _norm(a, form)


# --- regex (functions.rs:1380-1445) ------------------------------------------

fn("regex_matches")(lambda a, p: F.regexp_like(a, p))
fn("regex_replace_all")(lambda a, p, r: F.regexp_replace(a, p, r))
fn("regex_extract")(lambda a, p: F.regexp_extract_all(a, p, F.lit(0)))
fn("regex_extract_first")(lambda a, p: F.regexp_substr(a, p))

# --- list/array (functions.rs:71-75, 1526-1830, 2363-2428) -------------------

fn("list")(lambda *xs: F.array(*xs))
fn("append")(lambda lst, x: F.array_append(lst, x))
fn("prepend")(lambda lst, x: F.array_prepend(lst, x))
fn("sorted")(lambda lst: F.array_sort(lst))
fn("reverse")(lambda lst: F.reverse(lst))
fn("first")(lambda lst: F.element_at(lst, 1))
fn("last")(lambda lst: F.element_at(lst, -1))
# Cozo is 0-indexed; element_at/slice require INT positions, so long-typed
# index columns are cast down (element_at errors on BIGINT otherwise)
fn("get")(lambda lst, i: F.element_at(lst, (i + 1).cast("int")))
fn("maybe_get")(lambda lst, i: F.try_element_at(lst, (i + 1).cast("int")))
fn("slice")(lambda lst, s, e: F.slice(lst, (s + 1).cast("int"), (e - s).cast("int")))
fn("union")(lambda *xs: _fold(F.array_union, xs))
fn("intersection")(lambda *xs: _fold(F.array_intersect, xs))
fn("difference")(lambda a, b: F.array_except(a, b))
fn("concat_list")(lambda *xs: _fold(F.concat, xs))
fn("is_in_list")(lambda x, lst: F.array_contains(lst, x))
fn("zip")(lambda a, b: F.zip_with(a, b, lambda x, y: F.struct(x, y)))
fn("chunks")(lambda lst, n: _chunks(lst, n, exact=False))
fn("chunks_exact")(lambda lst, n: _chunks(lst, n, exact=True))
fn("windows")(lambda lst, n: _windows(lst, n))


def _chunks(lst: Column, n, exact: bool) -> Column:
    n = n if isinstance(n, Column) else F.lit(n)
    sz = F.size(lst)
    n_chunks = (F.floor(sz / n) if exact else F.ceil(sz / n)).cast("int")
    idx = F.sequence(F.lit(1), n_chunks)
    return F.transform(idx, lambda i: F.slice(lst, (i - 1) * n + 1, n))


def _windows(lst: Column, n) -> Column:
    n = n if isinstance(n, Column) else F.lit(n)
    sz = F.size(lst)
    idx = F.sequence(F.lit(1), F.greatest(sz - n + 1, F.lit(0)))
    return F.transform(idx, lambda i: F.slice(lst, i, n))


# --- json (functions.rs:76-296) ----------------------------------------------

fn("json")(lambda a: F.to_json(a))
fn("parse_json")(lambda a: a)  # JSON kept as string; access via get_json_object
fn("dump_json")(lambda a: F.to_json(a))
fn("json_object")(lambda *xs: F.to_json(F.create_map(*xs)))
# JSON path must be a literal (the reference compiles `->` paths statically
# too); compile_expr unwraps Const keys to python strings before this call.
fn("json_get")(lambda a, k: F.get_json_object(a, f"$.{k}"))
fn("is_json")(lambda a: F.get_json_object(a, "$") .isNotNull())
# json scalars are stored in their JSON text form; `$` extraction unquotes
# strings and passes numbers/bools through (functions.rs:316-322)
fn("json_to_scalar")(lambda a: F.get_json_object(a, "$"))

# --- type predicates & casts (functions.rs:1454-2029) -------------------------

fn("is_null")(lambda a: a.isNull())
fn("is_int")(lambda a: a.try_cast("long").isNotNull())
fn("is_float")(lambda a: a.try_cast(_D).isNotNull())
fn("is_num")(lambda a: a.try_cast(_D).isNotNull())
fn("is_string")(lambda a: a.try_cast("string").isNotNull())
fn("is_finite")(lambda a: ~(F.isnan(a.cast(_D)) | (F.abs(a.cast(_D)) == float("inf"))))
fn("is_infinite")(lambda a: F.abs(a.cast(_D)) == float("inf"))
fn("is_nan")(lambda a: F.isnan(a.cast(_D)))
# container-type predicates (functions.rs:1514-1563): Spark columns are
# statically typed, so compile_expr answers these from the schema when it
# can (see translate._TYPE_PREDICATES); the fallbacks below handle untyped
# call sites — a value that reached here as a non-array Column is not a
# list/vec/bytes.
fn("is_list")(lambda a: F.lit(False))
fn("is_vec")(lambda a: F.lit(False))
fn("is_bytes")(lambda a: F.lit(False))
_UUID_RE = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
# Uuid maps to StringType in canonical text form (SURVEY §1.1), so the
# predicate is a shape check rather than a runtime type tag
fn("is_uuid")(lambda a: F.coalesce(a.try_cast("string").rlike(_UUID_RE), F.lit(False)))
fn("to_uuid")(lambda a: F.when(
    a.try_cast("string").rlike(_UUID_RE), F.lower(a.try_cast("string"))))
fn("to_int")(lambda a: a.cast("long"))
fn("to_float")(lambda a: a.cast(_D))
fn("to_string")(lambda a: a.cast("string"))
fn("to_bool")(lambda a: a.cast("boolean"))
fn("to_unity")(lambda a: _to_unity(a))


def _to_unity(a: Column) -> Column:
    # null/false/0/""/[] → 0 else 1 (functions.rs:1945-1970); try_cast keeps
    # the branches ANSI-safe on non-numeric strings
    return (
        F.when(a.isNull(), 0)
        .when(a.try_cast("string") == "", 0)
        .when(a.try_cast("string") == "false", 0)
        .when(a.try_cast(_D) == 0.0, 0)
        .otherwise(1)
    )


# validity constructor (functions.rs:2572-2587): ts µs + optional assert flag
fn("validity")(lambda ts, is_assert=None: F.struct(
    ts.cast("long").alias("ts"),
    (is_assert.cast("boolean") if is_assert is not None
     else F.lit(True)).alias("is_assert")))


# --- time (functions.rs:2441-2526): now() is float seconds since epoch --------

fn("now")(lambda: F.unix_timestamp(F.current_timestamp()).cast(_D))
# the reference's format language is chrono strftime (functions.rs:2470);
# translate the common directives to Spark's Java patterns. chrono %z emits
# +0000 (Java 'xx'), %:z emits +00:00 (Java 'xxx').
_STRFTIME = {"%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
             "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%z": "xx", "%%": "%",
             "%:z": "xxx", "%b": "MMM", "%B": "MMMM", "%a": "EEE",
             "%A": "EEEE", "%j": "DDD", "%e": "d", "%I": "hh", "%p": "a"}


def _fmt_to_java(fmt: str) -> str:
    """Translate a chrono/strftime format to a Java DateTimeFormatter
    pattern. Literal LETTERS between directives must be single-quoted
    ('T' in '%Y-%m-%dT%H:%M:%S' is otherwise an illegal pattern letter);
    unknown %-directives error rather than silently emitting bad patterns."""
    if "%" not in fmt:
        return fmt
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and fmt[i:i + 3] in _STRFTIME:  # %:z
            out.append(_STRFTIME[fmt[i:i + 3]])
            i += 3
        elif fmt[i] == "%" and i + 1 < len(fmt):
            d = fmt[i:i + 2]
            if d not in _STRFTIME:
                raise ValueError(f"unsupported strftime directive {d!r}")
            out.append(_STRFTIME[d])
            i += 2
        elif fmt[i].isalpha():
            out.append(f"'{fmt[i]}'")
            i += 1
        elif fmt[i] == "'":
            out.append("''")
            i += 1
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


fn("format_timestamp")(lambda ts, fmt=None: F.date_format(
    # accept both the reference's float-seconds model (double → timestamp
    # cast IS epoch seconds in Spark) and native timestamp/ntz columns
    (ts if isinstance(ts, Column) else F.lit(ts)).cast("timestamp"),
    _fmt_to_java(fmt) if fmt is not None else "yyyy-MM-dd'T'HH:mm:ssXXX"))
fn("parse_timestamp")(lambda s: F.unix_timestamp(F.to_timestamp(s)).cast(_D))

# --- uuid / random -------------------------------------------------------------

fn("rand_uuid_v4")(lambda: F.uuid())
fn("rand_float")(lambda: F.rand())
fn("rand_int")(lambda lo, hi: (F.floor(F.rand() * ((hi - lo) + 1)) + lo).cast("long"))
fn("rand_bernoulli")(lambda p: F.rand() < p)
fn("int_range")(lambda *a: _int_range(*a))


def _int_range(*a) -> Column:
    if len(a) == 1:
        return F.sequence(F.lit(0), a[0] - 1)
    if len(a) == 2:
        return F.sequence(a[0], a[1] - 1)
    return F.sequence(a[0], a[1] - 1, a[2])


# --- vector ops (functions.rs:1611-1656, 2030-2133) ----------------------------


def _vdot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


fn("vec")(lambda lst: lst.cast("array<double>"))
fn("l2_normalize")(lambda a: _l2_normalize(a))
fn("l2_dist")(lambda a, b: F.sqrt(F.aggregate(
    F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v)))
fn("ip_dist")(lambda a, b: 1.0 - _vdot(a, b))
fn("cos_dist")(lambda a, b: 1.0 - _vdot(a, b) / (
    F.sqrt(_vdot(a, a)) * F.sqrt(_vdot(b, b))))


def _l2_normalize(a: Column) -> Column:
    nrm = F.sqrt(_vdot(a, a))
    return F.transform(a, lambda x: x / nrm)


# --- encoding ------------------------------------------------------------------

fn("encode_base64")(lambda a: F.base64(a))
# beyond-reference: content digest for dedup pipelines (lowercase hex,
# byte-identical to DuckDB's md5(text))
fn("md5")(lambda a: F.md5(a.cast("binary")))
fn("decode_base64")(lambda a: F.unbase64(a))

# --- UDF-backed long tail (kept out of hot paths) ----------------------------
# (functions.rs:1126-1252 pack/unpack_bits; 2305-2354 rand_*; 2527-2570 uuid;
#  1446-1453 t2s)

fn("rand_choose")(lambda lst: F.element_at(
    lst, (F.floor(F.rand() * F.size(lst)) + 1).cast("int")))


def _lazy_udf(name, ret):
    """Define a python UDF at first call (keeps import time clean)."""
    def wrap(pyfn):
        def build(*args):
            from pyspark.sql import types as T

            u = F.udf(pyfn, returnType=ret())
            return u(*args)
        SCALAR_FUNCTIONS[name] = build
        return build
    return wrap


from pyspark.sql import types as _T  # noqa: E402


@_lazy_udf("pack_bits", lambda: _T.BinaryType())
def _pack_bits(bits):
    if bits is None:
        return None
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i // 8] |= 0x80 >> (i % 8)
    return bytes(out)


@_lazy_udf("unpack_bits", lambda: _T.ArrayType(_T.BooleanType()))
def _unpack_bits(data):
    if data is None:
        return None
    return [bool(byte & (0x80 >> i)) for byte in data for i in range(8)]


@_lazy_udf("rand_vec", lambda: _T.ArrayType(_T.DoubleType()))
def _rand_vec(n):
    import random

    return [random.random() for _ in range(n)]


@_lazy_udf("rand_uuid_v1", lambda: _T.StringType())
def _rand_uuid_v1():
    import uuid

    return str(uuid.uuid1())


@_lazy_udf("uuid_timestamp", lambda: _T.DoubleType())
def _uuid_timestamp(u):
    import uuid

    try:
        parsed = uuid.UUID(u)
        if parsed.version != 1:
            return None
        # 100-ns intervals since 1582-10-15 → epoch seconds
        return (parsed.time - 0x01B21DD213814000) / 1e7
    except (ValueError, AttributeError):
        return None


@_lazy_udf("json_merge", lambda: _T.StringType())
def _json_merge(*docs):
    # `++` deep-merge on Json values (op_concat json arm + deep_merge_json,
    # functions.rs:1280-1310): objects merge recursively, arrays extend,
    # scalars take the right side. Explicitly named here because our JSON
    # values are statically string-typed — `a ++ b` on strings is string
    # concat; use json_merge(a, b, ...) for the json semantics.
    import json

    def merge(v1, v2):
        if isinstance(v1, dict) and isinstance(v2, dict):
            out = dict(v1)
            for k, x in v2.items():
                out[k] = merge(out.get(k), x)
            return out
        if isinstance(v1, list) and isinstance(v2, list):
            return v1 + v2
        return v2

    acc = None
    for d in docs:
        if d is None:
            return None
        acc = merge(acc, json.loads(d))
    return json.dumps(acc, separators=(",", ":"))


@_lazy_udf("regex_replace", lambda: _T.StringType())
def _regex_replace(s, p, r):
    # first-occurrence-only (functions.rs op_regex_replace uses
    # Regex::replace); Spark's regexp_replace is replace-all, so this one
    # stays a UDF — use regex_replace_all in hot paths
    import re

    if s is None or p is None or r is None:
        return None
    # translate Rust/Java `$1` group refs to python `\1`; `$$` → literal `$`
    repl = r.replace("\\", "\\\\")
    repl = re.sub(r"\$(\d+)", r"\\\1", repl).replace("$$", "$")
    return re.sub(p, repl, s, count=1)


@_lazy_udf("set_json_path", lambda: _T.StringType())
def _set_json_path(js, path, value):
    # functions.rs:82-91: walk the path (creating missing object levels like
    # the reference's pointer walk), set the leaf to the value's JSON form.
    # `value` arrives as the native python value of its Column type.
    import json

    if js is None or path is None:
        return None
    if not path:
        return json.dumps(value, separators=(",", ":"))
    doc = json.loads(js)
    cur = doc
    for p in path[:-1]:
        if isinstance(cur, list):
            cur = cur[int(p)]
        elif isinstance(cur, dict):
            if p not in cur or not isinstance(cur[p], (dict, list)):
                cur[p] = {}
            cur = cur[p]
        else:
            return None
    last = path[-1]
    if isinstance(cur, list):
        cur[int(last)] = value
    else:
        cur[last] = value
    return json.dumps(doc, separators=(",", ":"))


@_lazy_udf("remove_json_path", lambda: _T.StringType())
def _remove_json_path(js, path):
    # functions.rs:157-180: remove the leaf addressed by the path
    import json

    if js is None or not path:
        return None
    doc = json.loads(js)
    cur = doc
    for p in path[:-1]:
        if isinstance(cur, list):
            cur = cur[int(p)]
        elif isinstance(cur, dict):
            if p not in cur:
                return json.dumps(doc, separators=(",", ":"))
            cur = cur[p]
        else:
            return None
    last = path[-1]
    if isinstance(cur, dict):
        cur.pop(last, None)
    elif isinstance(cur, list):
        i = int(last)
        if 0 <= i < len(cur):
            cur.pop(i)
    return json.dumps(doc, separators=(",", ":"))


# traditional→simplified single-character mapping (the reference bundles
# an OpenCC-style table, functions.rs:1446-1453). Curated from the public
# OpenCC/Unihan kSimplifiedVariant character data: the base set plus the
# systematic radical series (言→讠, 金→钅, 糸→纟, 門→门, 頁→页, 馬→马,
# 鳥→鸟, 魚→鱼, 食→饣, 車→车, 貝→贝 families). ~900 pairs — covers
# running Chinese text; genuinely rare characters pass through unchanged.
_T2S_PAIRS = (
    "體体 國国 學学 會会 語语 說说 讀读 寫写 聽听 見见 長长 門门 問问 "
    "間间 開开 關关 東东 車车 馬马 魚鱼 鳥鸟 龍龙 點点 發发 經经 濟济 "
    "歷历 當当 後后 來来 對对 裡里 愛爱 時时 實实 現现 場场 報报 記记 "
    "計计 讓让 認认 識识 們们 這这 為为 個个 無无 與与 還还 樣样 種种 "
    "電电 頭头 許许 話话 書书 習习 業业 專专 應应 該该 級级 紅红 綠绿 "
    "藍蓝 黃黄 風风 雲云 飛飞 機机 漢汉 華华 億亿 萬万 兩两 幾几 誰谁 "
    "麼么 嗎吗 區区 縣县 鄉乡 鎮镇 號号 線线 網网 絡络 聯联 係系 閉闭 "
    "陳陈 陽阳 陰阴 頁页 題题 顏颜 顧顾 飯饭 飲饮 館馆 駕驾 騎骑 驗验 "
    "鴨鸭 雞鸡 麥麦 齊齐 齒齿 龜龟 軍军 輕轻 載载 輪轮 轉转 較较 辦办 "
    "農农 運运 過过 達达 遠远 連连 週周 進进 遊游 遲迟 選选 邊边 醫医 "
    "釋释 針针 錢钱 鐵铁 銀银 錄录 鍵键 鏡镜 閱阅 階阶 際际 隨随 險险 "
    "雜杂 難难 靈灵 靜静 順顺 領领 髮发 鬥斗 貝贝 負负 財财 貨货 質质 "
    "買买 賣卖 費费 資资 賽赛 贏赢 趕赶 跡迹 軟软 訂订 討讨 訓训 講讲 "
    "設设 訪访 證证 評评 詞词 試试 詩诗 誠诚 誤误 課课 調调 談谈 請请 "
    "論论 議议 譯译 護护 變变 覺觉 觀观 規规 視视 親亲 約约 純纯 紙纸 "
    "紀纪 組组 細细 終终 結结 給给 統统 絕绝 綜综 維维 總总 績绩 繼继 "
    "續续 絲丝 緊紧 聲声 職职 腦脑 臉脸 膚肤 艦舰 節节 蘭兰 藝艺 藥药 "
    "蟲虫 衛卫 補补 製制 複复 覽览 訊讯 豐丰 貓猫 賓宾 輛辆 辭辞 舊旧 "
    "傳传 僅仅 價价 優优 兒儿 黨党 內内 冊册 凍冻 鳳凤 劃划 剛刚 創创 "
    "動动 務务 勝胜 勞劳 勢势 匯汇 單单 廠厂 廣广 慶庆 庫库 廢废 異异 "
    "棄弃 張张 彈弹 強强 歸归 徑径 從从 徹彻 憶忆 態态 懷怀 惡恶 悶闷 "
    "戰战 戲戏 戶户 執执 擴扩 掃扫 擇择 擔担 據据 攜携 敗败 敵敌 數数 "
    "斷断 晝昼 術术 殺杀 權权 樂乐 標标 樹树 橋桥 檢检 歡欢 歲岁 殘残 "
    "氣气 滅灭 滿满 濃浓 灣湾 燈灯 營营 爐炉 爭争 爺爷 牆墙 犧牺 狀状 "
    "獨独 獲获 環环 瑪玛 產产 畢毕 畫画 療疗 監监 盤盘 盧卢 眾众 確确 "
    "碼码 磚砖 禮礼 禍祸 稅税 積积 穩稳 窮穷 競竞 筆笔 籌筹 類类 縮缩 "
    "罰罚 羅罗 義义 聖圣 聞闻 肅肃 臨临 興兴 舉举 艱艰 葉叶 蓋盖 蘇苏 "
    "處处 虧亏 衝冲 誌志 誕诞 諸诸 謝谢 譜谱 豈岂 貢贡 購购 贊赞 趙赵 "
    "輩辈 迴回 遞递 適适 遷迁 鄰邻 鐘钟 閃闪 隊队 隻只 雖虽 頂顶 項项 "
    "須须 預预 頗颇 頻频 顯显 驚惊 鮮鲜 鹽盐 麗丽 參参 嚴严 壓压 壞坏 "
    "夢梦 奮奋 婦妇 孫孙 寶宝 導导 層层 屬属 師师 帶带 幫帮 幹干 廳厅 "
    "憲宪 擊击 攝摄 極极 構构 槍枪 檔档 灑洒 爛烂 牽牵 獎奖 稱称 簡简 "
    "糧粮 織织 繪绘 聰聪 膽胆 艙舱 蒼苍 蓮莲 蔣蒋 薦荐 虛虚 裝装 訴诉 "
    "賬账 踐践 輯辑 轎轿 鄭郑 釀酿 鋼钢 錯错 鍋锅 鎖锁 鏈链 閣阁 霧雾 "
    "韓韩 響响 頓顿 願愿 飾饰 養养 餘余 駛驶 騙骗 髒脏 鬆松 鳴鸣 鴻鸿 "
    "鵬鹏 齡龄 壇坛 "
    # 言→讠 series
    "託托 訝讶 訟讼 訣诀 診诊 註注 詠咏 詐诈 詔诏 詛诅 詢询 詣诣 詫诧 "
    "詭诡 詳详 誅诛 誇夸 誘诱 誡诫 誣诬 誦诵 誨诲 誼谊 諂谄 諒谅 諜谍 "
    "諧谐 諮谘 諷讽 諺谚 諾诺 謀谋 謁谒 謂谓 謊谎 謎谜 謙谦 謠谣 謬谬 "
    "謹谨 譏讥 譚谭 譽誉 讒谗 讖谶 訛讹 誹诽 謗谤 諱讳 詬诟 誥诰 諭谕 "
    "諳谙 謄誊 譴谴 讚赞 "
    # 金→钅 series
    "釘钉 釣钓 鈍钝 鈔钞 鈕钮 鈞钧 鈣钙 鈴铃 鉗钳 鉛铅 鉤钩 銘铭 銜衔 "
    "銳锐 銷销 鋁铝 鋒锋 鋤锄 鋪铺 鋸锯 錦锦 錨锚 錫锡 錮锢 錶表 鍛锻 "
    "鍾钟 鎊镑 鎳镍 鏟铲 鏢镖 鐮镰 鑄铸 鑑鉴 鑒鉴 鑼锣 鑽钻 鑰钥 鈷钴 "
    "鉀钾 鎂镁 鋅锌 鉻铬 錳锰 鈉钠 銅铜 鋰锂 鉑铂 錘锤 錐锥 鍍镀 鏽锈 "
    "銹锈 鋌铤 鈑钣 鑲镶 鍬锹 鎬镐 鎢钨 鉸铰 銬铐 鐲镯 "
    # 糸→纟 series
    "糾纠 紂纣 紉纫 紋纹 納纳 紐纽 紗纱 紛纷 紡纺 紳绅 紹绍 絆绊 絞绞 "
    "絨绒 綁绑 綏绥 綢绸 綴缀 綱纲 綿绵 緒绪 緝缉 緞缎 締缔 緣缘 編编 "
    "緩缓 緬缅 緯纬 練练 縛缚 縫缝 縱纵 縷缕 繩绳 繫系 繳缴 繹绎 纏缠 "
    "纔才 纖纤 纜缆 繡绣 繞绕 綺绮 綽绰 緻致 縊缢 縈萦 絹绢 綸纶 緘缄 "
    "縹缥 纓缨 紓纾 絀绌 "
    # 門→门 series
    "閂闩 閏闰 閑闲 閒闲 閘闸 閡阂 閥阀 閨闺 閩闽 閻阎 闆板 闊阔 闌阑 "
    "闖闯 闡阐 闢辟 閭闾 閹阉 闔阖 闕阙 "
    # 頁→页 series
    "頃顷 頌颂 頒颁 頑顽 頜颌 頸颈 頹颓 顆颗 額额 顎颚 顛颠 顫颤 顱颅 "
    "韻韵 頰颊 頷颔 顴颧 頁页 "
    # 馬→马 series
    "馮冯 馭驭 馳驰 馴驯 駁驳 駐驻 駒驹 駝驼 駿骏 騁骋 騖骛 騫骞 騰腾 "
    "驅驱 驕骄 驟骤 驢驴 駱骆 駭骇 騷骚 驥骥 "
    # 鳥→鸟 series
    "鳩鸠 鴉鸦 鴕鸵 鴛鸳 鴦鸯 鴿鸽 鵑鹃 鵝鹅 鵡鹉 鶴鹤 鷹鹰 鷗鸥 鸚鹦 "
    "鵲鹊 鶯莺 鷺鹭 鸞鸾 鶉鹑 "
    # 魚→鱼 series
    "魷鱿 鮑鲍 鯉鲤 鯊鲨 鯨鲸 鰭鳍 鰻鳗 鱉鳖 鱗鳞 鱷鳄 鮭鲑 鯽鲫 鰓鳃 "
    "鱸鲈 魯鲁 "
    # 食→饣 series
    "飢饥 飪饪 飩饨 飼饲 飽饱 餃饺 餅饼 餉饷 餌饵 餓饿 餒馁 餛馄 餡馅 "
    "饅馒 饋馈 饑饥 饒饶 饞馋 餵喂 "
    # 車→车 series
    "軌轨 軒轩 軸轴 軼轶 輔辅 輝辉 輟辍 輸输 輻辐 輿舆 轄辖 轅辕 轍辙 "
    "轟轰 軀躯 "
    # 貝→贝 series
    "貞贞 貧贫 販贩 貪贪 貫贯 責责 貯贮 貳贰 貴贵 貶贬 貸贷 貿贸 賀贺 "
    "賂赂 賃赁 賄贿 賈贾 賊贼 賑赈 賒赊 賜赐 賞赏 賠赔 賢贤 賤贱 賦赋 "
    "賭赌 賴赖 賺赚 贈赠 贅赘 贍赡 贓赃 贖赎 贛赣 "
    # general common pairs
    "亂乱 亞亚 俠侠 倆俩 倉仓 倫伦 偉伟 側侧 偵侦 偽伪 傑杰 傘伞 備备 "
    "傭佣 傾倾 僑侨 僕仆 僱雇 儀仪 儉俭 儘尽 償偿 儲储 兌兑 凈净 凱凯 "
    "刪删 則则 剎刹 剝剥 劇剧 劉刘 劍剑 劑剂 勁劲 勛勋 勵励 勸劝 匱匮 "
    "協协 卻却 厭厌 厲厉 叢丛 嘆叹 嘔呕 嘖啧 嘗尝 嘩哗 嘮唠 嘯啸 嘰叽 "
    "噓嘘 噴喷 噸吨 嚇吓 嚐尝 嚥咽 嚮向 嚶嘤 囂嚣 囉啰 囑嘱 圍围 園园 "
    "圓圆 圖图 團团 壘垒 壩坝 壟垄 壯壮 壺壶 壽寿 夾夹 奧奥 奪夺 娛娱 "
    "媽妈 嬋婵 嬌娇 嬰婴 嬸婶 孿孪 宮宫 寢寝 寧宁 審审 寬宽 寵宠 將将 "
    "尋寻 尷尴 屆届 屍尸 屜屉 屢屡 岡冈 峽峡 島岛 崗岗 嵐岚 嶄崭 嶇岖 "
    "嶺岭 嶼屿 巒峦 巔巅 帥帅 帳帐 幀帧 幗帼 幟帜 幣币 廁厕 廂厢 廈厦 "
    "廟庙 廚厨 廬庐 彆别 彌弥 彎弯 彙汇 復复 憂忧 慮虑 恆恒 恥耻 悅悦 "
    "慘惨 慚惭 慣惯 慫怂 慾欲 憊惫 憐怜 憑凭 懇恳 懲惩 懶懒 懸悬 懺忏 "
    "懼惧 戀恋 擁拥 擄掳 擋挡 擠挤 擬拟 擰拧 擱搁 擲掷 擺摆 攏拢 攔拦 "
    "攙搀 攢攒 攤摊 攪搅 攬揽 掛挂 採采 揀拣 揚扬 換换 損损 搖摇 搗捣 "
    "摯挚 摳抠 摟搂 撈捞 撐撑 撲扑 撫抚 撥拨 撿捡 斂敛 斃毙 於于 時时 "
    "晉晋 暈晕 暢畅 曆历 曉晓 曇昙 曬晒 殼壳 毀毁 氬氩 氫氢 氮氮 "
    "氈毡 漢汉 湯汤 溝沟 滄沧 滾滚 滯滞 漲涨 漸渐 潔洁 潛潜 潤润 澀涩 "
    "澆浇 澇涝 濕湿 濟济 濤涛 濫滥 濱滨 瀆渎 瀉泻 瀋沈 瀕濒 瀝沥 瀟潇 "
    "灘滩 炮炮 烏乌 烴烃 無无 煉炼 煙烟 煩烦 熱热 燒烧 燙烫 燦灿 燭烛 "
    "爍烁 爛烂 爾尔 牘牍 犢犊 狹狭 猶犹 獄狱 獅狮 獵猎 獻献 玨珏 珮佩 "
    "瑣琐 瑤瑶 璽玺 瓊琼 甕瓮 甦苏 畝亩 畢毕 異异 當当 疇畴 疊叠 痙痉 "
    "痺痹 瘋疯 瘓痪 瘡疮 瘧疟 瘺瘘 療疗 癆痨 癡痴 癢痒 癥症 癱瘫 癸癸 "
    "發发 皚皑 皺皱 盜盗 盡尽 監监 盤盘 盧卢 眥眦 眾众 睏困 睜睁 瞞瞒 "
    "瞼睑 矯矫 硤硖 硯砚 碩硕 碸砜 磯矶 礎础 礙碍 礦矿 礪砺 礫砾 祿禄 "
    "禎祯 禱祷 萬万 秈籼 稈秆 稟禀 種种 穀谷 穌稣 穢秽 穫获 穴穴 窩窝 "
    "窪洼 窯窑 窺窥 竄窜 竅窍 竇窦 竊窃 竪竖 競竞 篤笃 篩筛 簍篓 簞箪 "
    "簫箫 簽签 簾帘 籃篮 籠笼 籟籁 籤签 粵粤 糞粪 糝糁 糲粝 "
    "緡缗 縐绉 "
    "羆罴 羨羡 耬耧 聶聂 聹聍 肅肃 腸肠 腫肿 腳脚 膩腻 膽胆 臟脏 臍脐 "
    "臘腊 臚胪 臥卧 與与 舊旧 舖铺 艇艇 莊庄 莖茎 莢荚 菌菌 菸烟 萊莱 "
    "萵莴 葒荭 葷荤 蒓莼 蒔莳 蒞莅 蒼苍 蓽荜 蔔卜 蔥葱 蔦茑 蔭荫 蕆蒇 "
    "蕎荞 蕒荬 蕓芸 蕕莸 蕘荛 蕢蒉 蕩荡 蕪芜 薔蔷 薩萨 藍蓝 藹蔼 蘆芦 "
    "蘋苹 蘊蕴 蘚藓 蘿萝 虜虏 號号 蝕蚀 螞蚂 螢萤 蟄蛰 蟈蝈 蟬蝉 蟻蚁 "
    "蠅蝇 蠍蝎 蠐蛴 蠑蝾 蠣蛎 蠻蛮 術术 衚胡 衛卫 袞衮 裊袅 裏里 褲裤 "
    "褻亵 襖袄 襝裣 襯衬 見见 覓觅 規规 覡觋 覦觎 覬觊 覲觐 覷觑 觴觞 "
    "觸触 誒诶 谿溪 豎竖 豬猪 貓猫 貘貘 賚赉 贗赝 跡迹 踴踊 蹌跄 蹕跸 "
    "蹣蹒 躁躁 躉趸 躊踌 躍跃 躑踯 躚跹 軋轧 輓挽 轡辔 辮辫 迴回 逕迳 "
    "這这 連连 週周 進进 遊游 運运 過过 達达 違违 遙遥 遜逊 遞递 遠远 "
    "遲迟 遷迁 選选 遺遗 邁迈 還还 邇迩 邊边 郵邮 鄒邹 鄔邬 鄖郧 鄧邓 "
    "鄭郑 鄲郸 鄴邺 鄶郐 酈郦 醜丑 醞酝 醫医 醬酱 釀酿 釁衅 釋释 "
    "鏗铿 鏘锵 鐃铙 鐐镣 鐫镌 鐳镭 鐸铎 鑠铄 長长 閆闫 "
    "陘陉 陝陕 隉陧 隕陨 隱隐 隴陇 雋隽 雛雏 離离 雲云 霉霉 靂雳 靄霭 "
    "靚靓 靨靥 鞀鼗 鞏巩 鞽鞒 韋韦 韌韧 韓韩 韜韬 頇顸 顓颛 颯飒 颶飓 "
    "飄飘 飆飙 颳刮 餾馏 馱驮 馹驲 駙驸 駢骈 騾骡 驂骖 驍骁 驛驿 骯肮 "
    "髏髅 髖髋 鬢鬓 魎魉 魘魇 鮐鲐 鮒鲋 鮪鲔 鮫鲛 鯇鲩 鯖鲭 鯛鲷 鯡鲱 "
    "鰍鳅 鰐鳄 鰱鲢 鰲鳌 鱔鳝 鱖鳜 鳶鸢 鴣鸪 鴟鸱 鴯鸸 鵜鹈 鵠鹄 鵪鹌 "
    "鶘鹕 鶚鹗 鶻鹘 鷂鹞 鷓鹧 鷥鸶 鷦鹪 鸛鹳 鹼碱 鹽盐 麗丽 麩麸 黴霉 "
    "鼉鼍 鼴鼹 齊齐 齟龃 齣出 齦龈 齧啮 龐庞 龔龚 龕龛 龜龟 "
    "測测 澤泽 淚泪 淨净 溫温 淪沦 減减 渾浑 滲渗 漿浆 潑泼 潰溃 澱淀 "
    "濾滤 瀾澜 湧涌 渦涡 滬沪 煥焕 熒荧 燴烩 燼烬 牀床 瑩莹 甌瓯 癟瘪 "
    "盞盏 睞睐 眞真 礬矾 禦御 禪禅 箋笺 範范 築筑 粧妆 絳绛 繽缤 罈坛 "
    "罷罢 翹翘 聳耸 膠胶 膿脓 臺台 芻刍 蠱蛊 衆众 謳讴 賁贲 軻轲 輾辗 "
    "轆辘 辯辩 遼辽 鈦钛 鈾铀 鉚铆 錠锭 鍘铡 鎵镓 陸陆 隸隶 雙双 霽霁 "
    "韆千 鬍胡 鳧凫 鸕鸬 麵面 鼕冬 齷龌 滌涤 滷卤 漚沤 洶汹 涇泾"
)
_T2S = {}
for _p in _T2S_PAIRS.split():
    if len(_p) == 2 and _p[0] != _p[1]:
        _T2S[ord(_p[0])] = _p[1]
del _p


@_lazy_udf("t2s", lambda: _T.StringType())
def _t2s(s):
    return s.translate(_T2S) if s is not None else None
