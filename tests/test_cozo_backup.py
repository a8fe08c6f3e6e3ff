"""Real-Cozo sqlite backup interop (sources/cozo_backup.py).

The byte-level golden vectors are hand-derived from the reference's format
definitions (data/memcmp.rs tag/group/num encodings, rmp-serde 1.2
externally-tagged msgpack), so the round-trip tests are grounded against
the documented encoding, not merely self-consistent.
"""

from __future__ import annotations

import sqlite3
import uuid

import pytest

from cozo_spark.datalog.engine import CozoDb
from cozo_spark.datalog.translate import QueryError
from cozo_spark.sources.cozo_backup import (
    dv_decode, dv_encode, is_cozo_sqlite_backup, memcmp_decode,
    memcmp_encode, mp_decode, mp_encode, read_cozo_backup,
)


# -- golden byte vectors (memcmp.rs) ----------------------------------------

def test_memcmp_golden_str():
    # STR_TAG 0x06; "hello" -> one 8-byte group padded with 3 zeros,
    # marker 0xFF-3 (memcmp.rs:147-163 encode_bytes)
    assert memcmp_encode(["hello"]) == bytes.fromhex("0668656c6c6f000000fc")
    # exactly 8 bytes -> full group + marker 0xFF, then an all-pad group
    assert memcmp_encode(["12345678"]) == \
        b"\x06" + b"12345678" + b"\xff" + bytes(8) + b"\xf7"


def test_memcmp_golden_nums():
    # NUM_TAG 0x05; f64 order-encoding flips sign bit for positives,
    # complements negatives; exact-int subtag 0x00, float subtag 0x10
    assert memcmp_encode([5]) == bytes.fromhex("05c01400000000000000")
    assert memcmp_encode([-3]) == bytes.fromhex("053ff7ffffffffffff00")
    assert memcmp_encode([1.5]) == bytes.fromhex("05bff800000000000010")


def test_memcmp_golden_misc():
    assert memcmp_encode([None, False, True]) == b"\x01\x02\x03"
    # VLD_TAG 0x0C: ts sign-flipped then complemented; assert -> 0x00
    assert memcmp_encode([{"ts": 100, "is_assert": True}]) == \
        bytes.fromhex("0c7fffffffffffff9b00")


def test_memcmp_roundtrip():
    vals = [None, True, False, 0, 5, -3, 2**60, -(2**60), 1.5, -2.25,
            "", "hello", "exactly8", "a" * 23, b"\x00\xff\x01",
            ["nested", 1, [2.5, None]], {"ts": -7, "is_assert": False}]
    enc = memcmp_encode(vals)
    assert memcmp_decode(enc) == [
        v if not isinstance(v, tuple) else list(v) for v in vals]


def test_msgpack_golden_datavalue():
    # rmp-serde 1.2: newtype variants as {name: payload}
    assert mp_encode(dv_encode(5)) == bytes.fromhex("81a34e756d81a3496e7405")
    assert mp_encode(dv_encode(None)) == bytes.fromhex("a44e756c6c")  # "Null"
    assert dv_decode(mp_decode(mp_encode(dv_encode("hi")))) == "hi"


def test_msgpack_roundtrip_values():
    vals = [None, True, 42, -42, 3.5, "str", b"\x01\x02",
            uuid.UUID("12345678-1234-5678-1234-567812345678"),
            [1, "two", [3.0]], {"ts": 9, "is_assert": True}]
    for v in vals:
        got = dv_decode(mp_decode(mp_encode(dv_encode(v))))
        if isinstance(v, uuid.UUID):
            assert got == str(v)
        else:
            assert got == v


# -- full backup round-trip through the engine ------------------------------

def _populated_db(spark) -> CozoDb:
    db = CozoDb(spark)
    db.run_script(":create bk1 {k: Int => s: String, f: Float?, b: Bool}")
    db.run_script("""?[k, s, f, b] <- [[1, 'one', 1.5, true],
                                       [2, 'two', null, false],
                                       [3, 'three', -2.25, true]]
                     :put bk1 {k => s, f, b}""")
    db.run_script(":create bk2 {name: String, tag: String => xs: [Int]}")
    db.run_script("""?[name, tag, xs] <- [['a', 't1', [1, 2]],
                                          ['b', 't2', []]]
                     :put bk2 {name, tag => xs}""")
    db.run_script("::access_level read_only bk1")
    return db


def test_sqlite_backup_roundtrip(spark, tmp_path):
    src = _populated_db(spark)
    path = str(tmp_path / "snap.db")
    src.backup(path)
    assert is_cozo_sqlite_backup(path)

    # the file really is the reference's layout: one cozo(k,v) table,
    # catalog rows under relation id 0, a [Null] id-counter row
    con = sqlite3.connect(path)
    ks = [bytes(r[0]) for r in con.execute("SELECT k FROM cozo")]
    con.close()
    sys_keys = [k for k in ks if k[:8] == bytes(8)]
    assert bytes(8) + memcmp_encode([None]) in sys_keys
    assert bytes(8) + memcmp_encode(["bk1"]) in sys_keys

    dst = CozoDb(spark)
    dst.restore(path)
    assert sorted(tuple(r) for r in
                  dst.run_script("?[k, s, f, b] := *bk1[k, s, f, b]").rows) \
        == [(1, "one", 1.5, True), (2, "two", None, False),
            (3, "three", -2.25, True)]
    assert sorted(tuple(r[:2]) + (tuple(r[2]),) for r in
                  dst.run_script("?[n, t, xs] := *bk2[n, t, xs]").rows) \
        == [("a", "t1", (1, 2)), ("b", "t2", ())]
    assert dst.relations["bk1"].access_level == "read_only"
    assert dst.relations["bk1"].key_names == ["k"]
    assert dst.relations["bk2"].key_names == ["name", "tag"]

    # restore refuses a non-empty engine, like db.rs:668-676
    with pytest.raises(QueryError, match="data exists"):
        dst.restore(path)


def test_backup_refuses_nonempty_target(spark, tmp_path):
    src = _populated_db(spark)
    path = str(tmp_path / "full.db")
    src.backup(path)
    with pytest.raises(ValueError, match="data exists in the target"):
        src.backup(path)


def test_read_backup_catalog_shape(spark, tmp_path):
    src = _populated_db(spark)
    path = str(tmp_path / "cat.db")
    src.backup(path)
    payload = read_cozo_backup(path)
    assert set(payload) == {"bk1", "bk2"}
    assert payload["bk1"]["keys"] == ["k"]
    assert payload["bk1"]["non_keys"] == ["s", "f", "b"]
    assert payload["bk1"]["key_types"] == ["Int"]
    assert payload["bk1"]["non_key_types"] == ["String", "Float?", "Bool"]
    assert payload["bk1"]["access_level"] == "read_only"
    assert len(payload["bk1"]["rows"]) == 3


def test_compat_import_from_sqlite_backup(spark, tmp_path):
    from cozo_spark.compat import CozoDb as CompatDb

    src = _populated_db(spark)
    path = str(tmp_path / "mig.db")
    src.backup(path)

    client = CompatDb(spark=spark)
    client.run_script(":create bk1 {k: Int => s: String, f: Float?, b: Bool}")
    client.import_from_backup(path, ["bk1"])
    got = client.run_script("?[k, s] := *bk1[k, s, _, _]")
    assert sorted(map(tuple, got["rows"])) == \
        [(1, "one"), (2, "two"), (3, "three")]
    # absent destination relation errors, like dst_tx.get_relation
    with pytest.raises(KeyError):
        client.import_from_backup(path, ["bk2"])


def test_simulated_reference_backup_file(spark, tmp_path):
    """Build a backup file key-by-key, exactly as the reference's storage
    writes it (catalog handle with struct-map fields, big-endian id
    prefixes, msgpack non-key values), WITHOUT write_cozo_backup — then
    restore it through the engine."""
    path = str(tmp_path / "ref.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE cozo (k BLOB PRIMARY KEY, v BLOB)")
    handle = {
        "name": "people", "id": 1,
        "metadata": {
            "keys": [{"name": "pid",
                      "typing": {"coltype": "Int", "nullable": False},
                      "default_gen": None}],
            "non_keys": [{"name": "pname",
                          "typing": {"coltype": "String", "nullable": False},
                          "default_gen": None},
                         {"name": "score",
                          "typing": {"coltype": "Float", "nullable": True},
                          "default_gen": None}]},
        "put_triggers": [], "rm_triggers": [], "replace_triggers": [],
        "access_level": "Normal", "is_temp": False,
        "indices": {}, "hnsw_indices": {}, "fts_indices": {},
        "lsh_indices": {}, "description": "",
    }
    rows = [(10, "ada", 99.5), (11, "bob", None)]
    with con:
        con.execute("INSERT INTO cozo VALUES (?, ?)",
                    (bytes(8) + memcmp_encode(["people"]),
                     mp_encode(handle)))
        con.execute("INSERT INTO cozo VALUES (?, ?)",
                    (bytes(8) + memcmp_encode([None]),
                     (1).to_bytes(8, "big")))
        rid = (1).to_bytes(8, "big")
        for pid, pname, score in rows:
            con.execute("INSERT INTO cozo VALUES (?, ?)",
                        (rid + memcmp_encode([pid]),
                         rid + mp_encode([dv_encode(pname),
                                          dv_encode(score)])))
    con.close()

    db = CozoDb(spark)
    db.restore(path)
    assert sorted(tuple(r) for r in
                  db.run_script("?[a, b, c] := *people[a, b, c]").rows) \
        == [(10, "ada", 99.5), (11, "bob", None)]


# -- property fuzz over the codecs ------------------------------------------

from hypothesis import given, settings, strategies as st

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    # spans the exact-int bound 2^53 (memcmp.rs EXACT_INT_BOUND) and the
    # i64 range ends
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.integers(min_value=2**53 - 2, max_value=2**53 + 2),
    st.floats(allow_nan=False, width=64),
    st.text(max_size=40),  # any unicode incl. astral
    # byte lengths straddling the 8-byte group boundary, any content
    st.binary(max_size=20),
    st.builds(lambda ts, a: {"ts": ts, "is_assert": a},
              st.integers(min_value=-(2**62), max_value=2**62),
              st.booleans()),
)
_values = st.recursive(_scalars, lambda c: st.lists(c, max_size=4),
                       max_leaves=12)


@settings(max_examples=300, deadline=None)
@given(st.lists(_values, max_size=5))
def test_fuzz_memcmp_roundtrip(vals):
    assert memcmp_decode(memcmp_encode(vals)) == vals


@settings(max_examples=300, deadline=None)
@given(_values)
def test_fuzz_dv_msgpack_roundtrip(v):
    assert dv_decode(mp_decode(mp_encode(dv_encode(v)))) == v


@settings(max_examples=200, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=25), min_size=1, max_size=4))
def test_fuzz_memcmp_bytes_order_preserved(bss):
    """The point of the memcomparable encoding: byte-wise key order equals
    value order (within one type). Check for Bytes, the trickiest case
    (group padding + markers)."""
    encs = [(memcmp_encode([b]), b) for b in bss]
    assert sorted(e for e, _ in encs) == \
        [e for e, _ in sorted(encs, key=lambda p: p[1])]


def test_memcmp_num_order_port():
    """Port of memcmp.rs::encode_decode_num (scaled): the shifted-int
    family (i64::MAX >> i) - j with negations, random floats and their
    reciprocals, ±inf — roundtrip exactly AND byte order == numeric order
    (ints and floats interleave in one key space)."""
    import random
    import struct as _s

    rnd = random.Random(7)
    nums = []
    n = (1 << 63) - 1
    for i in range(0, 54, 6):
        for j in (0, 1, 7, 999):
            vb = (n >> i) - j
            nums += [vb, -vb - 1]
    nums += [0, 1, -1]
    floats = [float("inf"), float("-inf")]
    for _ in range(500):
        f = (rnd.random() - 0.5) * 2.0
        floats += [f, 1.0 / f if f else 0.0]

    encs = []
    for v in nums + floats:
        e = memcmp_encode([v])
        (dec,) = memcmp_decode(e)
        if isinstance(v, int):
            assert dec == v and isinstance(dec, int), v
        else:
            assert _s.pack(">d", dec) == _s.pack(">d", v), v
        encs.append((e, float(v)))
    # byte-wise order == numeric order across the MIXED int/float space
    by_bytes = [v for _, v in sorted(encs, key=lambda p: p[0])]
    by_value = sorted((v for _, v in encs))
    assert by_bytes == by_value
