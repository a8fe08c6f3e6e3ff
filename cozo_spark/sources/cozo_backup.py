"""Real-Cozo sqlite backup interop: read AND write the reference's backup
format with stdlib only (sqlite3 + hand-rolled msgpack/memcomparable codecs).

A Cozo backup (db.rs:642-660 backup_db / 661-686 restore_backup) is a
sqlite file with ONE table ``cozo(k BLOB PRIMARY KEY, v BLOB)`` holding the
raw key space (storage/sqlite.rs:43-49):

* every key starts with an 8-byte big-endian relation id
  (tuple.rs:28-38 encode_as_key, relation.rs:63-71 raw_encode);
* relation id 0 is the system catalog (relation.rs:62 RelationId::SYSTEM):
  - key ``[Str(rel_name)]`` -> msgpack (struct-as-map) serialization of the
    RelationHandle (relation.rs:625-630: name, id, metadata{keys,non_keys},
    triggers, access_level, is_temp, index maps, description);
  - key ``[Null]`` -> 8-byte BE of the latest relation id, read back by
    Db::initialize/load_last_ids (db.rs:286-289, 865-871);
* data rows: key = id ++ memcomparable-encoded KEY columns
  (relation.rs:247-267 encode_key_for_store; data/memcmp.rs for the value
  encoding), value = id ++ msgpack array of the NON-key columns as
  externally-tagged DataValues (relation.rs:275-296 encode_val_for_store,
  decoded at relation.rs:520-533 decode_tuple_from_kv).

msgpack enum conventions follow rmp-serde 1.2 defaults: unit variants as
their NAME string, data variants as one-entry maps {name: payload};
structs as arrays in row values (plain Serializer) and as field-name maps
in the catalog (Serializer::with_struct_map, relation.rs:626-628).
serde_bytes fields are msgpack bin; Uuid is 16 raw bytes; Vector is
[tag_u8, native-endian raw float bytes] (value.rs:226-252).
"""

from __future__ import annotations

import json
import os
import sqlite3
import struct
import uuid as _uuid
from typing import Any, Optional

# ---------------------------------------------------------------------------
# minimal msgpack (only what rmp-serde emits for the structures above)
# ---------------------------------------------------------------------------


def mp_decode(buf: bytes) -> Any:
    val, off = _mp_one(buf, 0)
    return val


def _mp_one(b: bytes, i: int):
    t = b[i]
    i += 1
    if t <= 0x7F:
        return t, i
    if t >= 0xE0:
        return t - 0x100, i
    if 0x80 <= t <= 0x8F:
        return _mp_map(b, i, t & 0x0F)
    if 0x90 <= t <= 0x9F:
        return _mp_arr(b, i, t & 0x0F)
    if 0xA0 <= t <= 0xBF:
        n = t & 0x1F
        return b[i:i + n].decode("utf-8"), i + n
    if t == 0xC0:
        return None, i
    if t == 0xC2:
        return False, i
    if t == 0xC3:
        return True, i
    if t in (0xC4, 0xC5, 0xC6):          # bin8/16/32
        w = 1 << (t - 0xC4)
        n = int.from_bytes(b[i:i + w], "big")
        i += w
        return bytes(b[i:i + n]), i + n
    if t == 0xCA:
        return struct.unpack_from(">f", b, i)[0], i + 4
    if t == 0xCB:
        return struct.unpack_from(">d", b, i)[0], i + 8
    if t in (0xCC, 0xCD, 0xCE, 0xCF):    # uint8/16/32/64
        w = 1 << (t - 0xCC)
        return int.from_bytes(b[i:i + w], "big"), i + w
    if t in (0xD0, 0xD1, 0xD2, 0xD3):    # int8/16/32/64
        w = 1 << (t - 0xD0)
        return int.from_bytes(b[i:i + w], "big", signed=True), i + w
    if t in (0xD9, 0xDA, 0xDB):          # str8/16/32
        w = 1 << (t - 0xD9)
        n = int.from_bytes(b[i:i + w], "big")
        i += w
        return b[i:i + n].decode("utf-8"), i + n
    if t in (0xDC, 0xDD):                # array16/32
        w = 2 << (t - 0xDC)
        n = int.from_bytes(b[i:i + w], "big")
        return _mp_arr(b, i + w, n)
    if t in (0xDE, 0xDF):                # map16/32
        w = 2 << (t - 0xDE)
        n = int.from_bytes(b[i:i + w], "big")
        return _mp_map(b, i + w, n)
    raise ValueError(f"unsupported msgpack byte 0x{t:02x} at {i - 1}")


def _mp_arr(b, i, n):
    out = []
    for _ in range(n):
        v, i = _mp_one(b, i)
        out.append(v)
    return out, i


def _mp_map(b, i, n):
    out = {}
    for _ in range(n):
        k, i = _mp_one(b, i)
        v, i = _mp_one(b, i)
        out[k] = v
    return out, i


def mp_encode(obj: Any, out: Optional[bytearray] = None) -> bytes:
    o = out if out is not None else bytearray()
    _mp_enc(obj, o)
    return bytes(o)


class MpBin(bytes):
    """Marker: encode as msgpack bin (serde_bytes), not str."""


def _mp_enc(v: Any, o: bytearray) -> None:
    if v is None:
        o.append(0xC0)
    elif v is True:
        o.append(0xC3)
    elif v is False:
        o.append(0xC2)
    elif isinstance(v, int):
        if 0 <= v <= 0x7F:
            o.append(v)
        elif -32 <= v < 0:
            o.append(v & 0xFF)
        elif 0 < v:
            for code, w in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if v < (1 << (8 * w)):
                    o.append(code)
                    o += v.to_bytes(w, "big")
                    return
            raise OverflowError(v)
        else:
            for code, w in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
                if -(1 << (8 * w - 1)) <= v:
                    o.append(code)
                    o += v.to_bytes(w, "big", signed=True)
                    return
            raise OverflowError(v)
    elif isinstance(v, float):
        o.append(0xCB)
        o += struct.pack(">d", v)
    elif isinstance(v, MpBin) or isinstance(v, (bytes, bytearray)):
        b = bytes(v)
        for code, w in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if len(b) < (1 << (8 * w)):
                o.append(code)
                o += len(b).to_bytes(w, "big")
                o += b
                return
    elif isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) <= 31:
            o.append(0xA0 | len(b))
        elif len(b) < 256:
            o += bytes((0xD9, len(b)))
        elif len(b) < 65536:
            o.append(0xDA)
            o += len(b).to_bytes(2, "big")
        else:
            o.append(0xDB)
            o += len(b).to_bytes(4, "big")
        o += b
    elif isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            o.append(0x90 | n)
        elif n < 65536:
            o.append(0xDC)
            o += n.to_bytes(2, "big")
        else:
            o.append(0xDD)
            o += n.to_bytes(4, "big")
        for x in v:
            _mp_enc(x, o)
    elif isinstance(v, dict):
        n = len(v)
        if n <= 15:
            o.append(0x80 | n)
        elif n < 65536:
            o.append(0xDE)
            o += n.to_bytes(2, "big")
        else:
            o.append(0xDF)
            o += n.to_bytes(4, "big")
        for k, x in v.items():
            _mp_enc(k, o)
            _mp_enc(x, o)
    else:
        raise TypeError(f"cannot msgpack-encode {type(v)}")


# ---------------------------------------------------------------------------
# memcomparable key codec (data/memcmp.rs)
# ---------------------------------------------------------------------------

_NULL, _FALSE, _TRUE = 0x01, 0x02, 0x03
_VEC, _NUM, _STR, _BYTES = 0x04, 0x05, 0x06, 0x07
_UUID, _REGEX, _LIST, _SET = 0x08, 0x09, 0x0A, 0x0B
_VLD, _JSON, _BOT, _INIT = 0x0C, 0x0D, 0xFF, 0x00
_IS_FLOAT, _IS_APPROX_INT, _IS_EXACT_INT = 0x10, 0x04, 0x00
_EXACT_INT_BOUND = 0x20_0000_0000_0000
_SIGN = 0x8000_0000_0000_0000
_GROUP = 8
_MARKER = 0xFF


def _enc_i64(v: int) -> int:
    return (v & 0xFFFF_FFFF_FFFF_FFFF) ^ _SIGN


def _dec_i64(u: int) -> int:
    u ^= _SIGN
    return u - (1 << 64) if u >= (1 << 63) else u


def _enc_f64(v: float) -> int:
    (u,) = struct.unpack(">Q", struct.pack(">d", v))
    return (u | _SIGN) if not (u >> 63) else (~u) & 0xFFFF_FFFF_FFFF_FFFF


def _dec_f64(u: int) -> float:
    u = (u & ~_SIGN) if (u & _SIGN) else (~u) & 0xFFFF_FFFF_FFFF_FFFF
    return struct.unpack(">d", struct.pack(">Q", u))[0]


def _enc_group_bytes(data: bytes, o: bytearray) -> None:
    ln, idx = len(data), 0
    while idx <= ln:
        remain = ln - idx
        if remain > _GROUP:
            o += data[idx:idx + _GROUP]
            o.append(_MARKER)
        else:
            pad = _GROUP - remain
            o += data[idx:]
            o += bytes(pad)
            o.append(_MARKER - pad)
        idx += _GROUP


def _dec_group_bytes(b: bytes, i: int):
    out = bytearray()
    while True:
        chunk, marker = b[i:i + _GROUP], b[i + _GROUP]
        i += _GROUP + 1
        pad = _MARKER - marker
        if pad == 0:
            out += chunk
            continue
        out += chunk[:_GROUP - pad]
        return bytes(out), i


def memcmp_encode(vals: list, o: Optional[bytearray] = None) -> bytes:
    o = o if o is not None else bytearray()
    for v in vals:
        _memcmp_enc_one(v, o)
    return bytes(o)


def _memcmp_enc_one(v: Any, o: bytearray) -> None:
    if v is None:
        o.append(_NULL)
    elif v is True:
        o.append(_TRUE)
    elif v is False:
        o.append(_FALSE)
    elif isinstance(v, int):
        o.append(_NUM)
        o += struct.pack(">Q", _enc_f64(float(v)))
        if -_EXACT_INT_BOUND < v < _EXACT_INT_BOUND:
            o.append(_IS_EXACT_INT)
        else:
            o.append(_IS_APPROX_INT)
            o += struct.pack(">Q", _enc_i64(v))
    elif isinstance(v, float):
        o.append(_NUM)
        o += struct.pack(">Q", _enc_f64(v))
        o.append(_IS_FLOAT)
    elif isinstance(v, str):
        o.append(_STR)
        _enc_group_bytes(v.encode("utf-8"), o)
    elif isinstance(v, (bytes, bytearray)):
        o.append(_BYTES)
        _enc_group_bytes(bytes(v), o)
    elif isinstance(v, _uuid.UUID):
        o.append(_UUID)
        b = v.bytes  # BE fields: time_low(4) time_mid(2) time_hi(2) rest(8)
        o += b[6:8] + b[4:6] + b[0:4] + b[8:16]
    elif isinstance(v, dict) and set(v) == {"ts", "is_assert"}:
        o.append(_VLD)
        o += struct.pack(">Q", (~_enc_i64(int(v["ts"]))) & 0xFFFF_FFFF_FFFF_FFFF)
        o.append(0 if v["is_assert"] else 1)
    elif isinstance(v, (list, tuple)):
        o.append(_LIST)
        for x in v:
            _memcmp_enc_one(x, o)
        o.append(_INIT)
    else:
        raise TypeError(f"cannot memcmp-encode {type(v)}")


def memcmp_decode(b: bytes) -> list:
    out, i = [], 0
    while i < len(b):
        v, i = _memcmp_dec_one(b, i)
        out.append(v)
    return out


def _memcmp_dec_one(b: bytes, i: int):
    t = b[i]
    i += 1
    if t == _NULL:
        return None, i
    if t == _FALSE:
        return False, i
    if t == _TRUE:
        return True, i
    if t == _NUM:
        (u,) = struct.unpack_from(">Q", b, i)
        i += 8
        f = _dec_f64(u)
        tag = b[i]
        i += 1
        if tag == _IS_FLOAT:
            return f, i
        if tag == _IS_EXACT_INT:
            return int(f), i
        (iu,) = struct.unpack_from(">Q", b, i)
        return _dec_i64(iu), i + 8
    if t in (_STR, _REGEX, _JSON):
        raw, i = _dec_group_bytes(b, i)
        return raw.decode("utf-8"), i
    if t == _BYTES:
        return _dec_group_bytes(b, i)
    if t == _UUID:
        h, m = b[i:i + 2], b[i + 2:i + 4]
        lo, rest = b[i + 4:i + 8], b[i + 8:i + 16]
        return str(_uuid.UUID(bytes=lo + m + h + rest)), i + 16
    if t in (_LIST, _SET):
        out = []
        while b[i] != _INIT:
            v, i = _memcmp_dec_one(b, i)
            out.append(v)
        return out, i + 1
    if t == _VLD:
        (flipped,) = struct.unpack_from(">Q", b, i)
        i += 8
        ts = _dec_i64((~flipped) & 0xFFFF_FFFF_FFFF_FFFF)
        is_assert = b[i] == 0
        return {"ts": ts, "is_assert": is_assert}, i + 1
    if t == _VEC:
        ttag = b[i]
        (ln,) = struct.unpack_from(">Q", b, i + 1)
        i += 9
        w, fmt = (4, ">f") if ttag == 0x01 else (8, ">d")
        out = [struct.unpack_from(fmt, b, i + k * w)[0] for k in range(ln)]
        return out, i + ln * w
    if t == _BOT:
        return None, i
    raise ValueError(f"unknown memcmp tag 0x{t:02x}")


# ---------------------------------------------------------------------------
# DataValue <-> python (rmp-serde externally-tagged msgpack form)
# ---------------------------------------------------------------------------


def dv_decode(obj: Any) -> Any:
    if obj == "Null":
        return None
    if obj == "Bot":
        return None
    if not isinstance(obj, dict) or len(obj) != 1:
        raise ValueError(f"not a DataValue: {obj!r}")
    (tag, val), = obj.items()
    if tag == "Bool":
        return bool(val)
    if tag == "Num":
        (ntag, n), = val.items()
        return int(n) if ntag == "Int" else float(n)
    if tag in ("Str", "Regex"):
        return val
    if tag == "Bytes":
        return bytes(val)
    if tag == "Uuid":
        return str(_uuid.UUID(bytes=bytes(val)))
    if tag in ("List", "Set"):
        return [dv_decode(x) for x in val]
    if tag == "Json":
        return json.dumps(val, separators=(",", ":"), sort_keys=False)
    if tag == "Validity":
        ts, is_assert = val  # struct-as-array: [ValidityTs, Reverse<bool>]
        return {"ts": int(ts), "is_assert": bool(is_assert)}
    if tag == "Vec":
        ttag, raw = val
        fmt = "<f" if ttag == 0 else "<d"  # native-endian raw floats
        w = 4 if ttag == 0 else 8
        return [struct.unpack_from(fmt, raw, k * w)[0]
                for k in range(len(raw) // w)]
    raise ValueError(f"unknown DataValue variant {tag!r}")


def dv_encode(v: Any) -> Any:
    if v is None:
        return "Null"
    if v is True or v is False:
        return {"Bool": v}
    if isinstance(v, int):
        return {"Num": {"Int": v}}
    if isinstance(v, float):
        return {"Num": {"Float": v}}
    if isinstance(v, str):
        return {"Str": v}
    if isinstance(v, (bytes, bytearray)):
        return {"Bytes": MpBin(v)}
    if isinstance(v, _uuid.UUID):
        return {"Uuid": MpBin(v.bytes)}
    if isinstance(v, dict) and set(v) == {"ts", "is_assert"}:
        return {"Validity": [int(v["ts"]), bool(v["is_assert"])]}
    if isinstance(v, (list, tuple)):
        return {"List": [dv_encode(x) for x in v]}
    raise TypeError(f"cannot encode {type(v)} as DataValue")


_ACCESS_FROM_RUST = {"Normal": "normal", "Protected": "protected",
                     "ReadOnly": "read_only", "Hidden": "hidden"}
_ACCESS_TO_RUST = {v: k for k, v in _ACCESS_FROM_RUST.items()}


def _coltype_render(t: Any) -> Optional[str]:
    """NullableColType (struct-map) -> the engine's rendered type string."""
    if not isinstance(t, dict):
        return None
    ct, nullable = t.get("coltype"), t.get("nullable", False)
    base = None
    if isinstance(ct, str):
        base = {"Any": "Any", "Bool": "Bool", "Int": "Int", "Float": "Float",
                "String": "String", "Bytes": "Bytes", "Uuid": "Uuid",
                "Json": "Json", "Validity": "Validity"}.get(ct)
    elif isinstance(ct, dict) and len(ct) == 1:
        (tag, payload), = ct.items()
        if tag == "List":
            inner = _coltype_render(payload.get("eltype")) or "Any"
            base = f"[{inner}]"
        elif tag == "Vec":
            el = payload.get("eltype")
            base = f"<{'F32' if el == 'F32' else 'F64'}; {payload.get('len', 0)}>"
        elif tag == "Tuple":
            base = "(" + ", ".join(
                _coltype_render(x) or "Any" for x in payload) + ")"
    if base is None:
        return None
    return base + ("?" if nullable else "")


def read_cozo_backup(path: str) -> dict:
    """Parse a reference-format sqlite backup into
    ``{rel_name: {keys, non_keys, key_types, non_key_types, access_level,
    put_triggers, rm_triggers, replace_triggers, description, rows}}``.
    Index sub-relations (nested handles) are skipped — indices are rebuilt,
    not imported, same as Db::import_from_backup refuses them
    (db.rs:713-728)."""
    con = sqlite3.connect(path)
    try:
        kvs = con.execute("SELECT k, v FROM cozo ORDER BY k").fetchall()
    finally:
        con.close()

    handles: dict[str, dict] = {}
    skip_ids: set[int] = set()

    def _collect_nested(h: dict) -> None:
        for m in ("indices", "hnsw_indices", "fts_indices", "lsh_indices"):
            for entry in (h.get(m) or {}).values():
                for part in entry if isinstance(entry, list) else []:
                    if isinstance(part, dict) and "id" in part:
                        skip_ids.add(int(part["id"]))

    for k, v in kvs:
        if int.from_bytes(k[:8], "big") != 0:
            continue
        sys_key = memcmp_decode(k[8:])
        if sys_key == [None]:  # latest-id bookkeeping row
            continue
        try:
            h = mp_decode(v)
        except Exception:
            continue  # raw id-pointer bytes, not a serialized handle
        if not isinstance(h, dict) or "id" not in h:
            continue
        _collect_nested(h)
        handles[h["name"]] = h

    by_id = {int(h["id"]): h for h in handles.values()}
    rows_by_id: dict[int, list] = {i: [] for i in by_id}
    for k, v in kvs:
        rid = int.from_bytes(k[:8], "big")
        if rid == 0 or rid in skip_ids or rid not in by_id:
            continue
        keys = memcmp_decode(k[8:])
        vals = [dv_decode(x) for x in mp_decode(v[8:])] if len(v) > 8 else []
        rows_by_id[rid].append(tuple(keys + vals))

    out = {}
    for name, h in handles.items():
        meta = h.get("metadata") or {}
        kdefs = meta.get("keys") or []
        ndefs = meta.get("non_keys") or []
        out[name] = {
            "keys": [c["name"] for c in kdefs],
            "non_keys": [c["name"] for c in ndefs],
            "key_types": [_coltype_render(c.get("typing")) for c in kdefs],
            "non_key_types": [_coltype_render(c.get("typing")) for c in ndefs],
            "access_level": _ACCESS_FROM_RUST.get(h.get("access_level"),
                                                  "normal"),
            "put_triggers": list(h.get("put_triggers") or []),
            "rm_triggers": list(h.get("rm_triggers") or []),
            "replace_triggers": list(h.get("replace_triggers") or []),
            "description": h.get("description") or "",
            "rows": rows_by_id.get(int(h["id"]), []),
        }
    return out


def write_cozo_backup(db, path: str) -> None:
    """Serialize the engine's relations into the reference's sqlite backup
    format (backup_db, db.rs:642-660) so an actual CozoDB can
    restore_backup() the file. Refuses a non-empty target, like the
    reference ('Cannot create backup: data exists in the target')."""
    if os.path.exists(path) and os.path.getsize(path) > 0:
        con = sqlite3.connect(path)
        try:
            n = con.execute(
                "SELECT count(*) FROM sqlite_master WHERE name='cozo'"
            ).fetchone()[0]
            if n and con.execute("SELECT count(*) FROM cozo").fetchone()[0]:
                raise ValueError(
                    "Cannot create backup: data exists in the target database.")
        finally:
            con.close()

    con = sqlite3.connect(path)
    try:
        con.execute("CREATE TABLE IF NOT EXISTS cozo (k BLOB PRIMARY KEY, v BLOB)")
        last_id = 0
        with con:
            for idx, (name, rel) in enumerate(sorted(db.relations.items())):
                rid = idx + 1
                last_id = rid
                handle = _handle_for(rel, rid)
                sys_key = bytes(8) + memcmp_encode([name])
                con.execute("INSERT OR REPLACE INTO cozo VALUES (?, ?)",
                            (sys_key, mp_encode(handle)))
                key_names = [c.name for c in rel.keys]
                n_keys = len(key_names)
                prefix = rid.to_bytes(8, "big")
                # stream partitions to the driver: the sqlite target is
                # inherently single-file/driver-side (same as the
                # reference's backup_db), but memory stays bounded at one
                # partition; the parquet backup remains the scale path
                for row in rel.df.toLocalIterator():
                    vals = _pyvals(row, key_names,
                                   [c.name for c in rel.non_keys])
                    k = prefix + memcmp_encode(vals[:n_keys])
                    v = prefix + mp_encode([dv_encode(x)
                                            for x in vals[n_keys:]])
                    con.execute("INSERT OR REPLACE INTO cozo VALUES (?, ?)",
                                (k, v))
            # the [Null] id-counter row Db::initialize reads back
            con.execute("INSERT OR REPLACE INTO cozo VALUES (?, ?)",
                        (bytes(8) + memcmp_encode([None]),
                         last_id.to_bytes(8, "big")))
    finally:
        con.close()


def _pyvals(row, key_names: list, non_key_names: list) -> list:
    out = []
    d = row.asDict(recursive=True)
    for c in key_names + non_key_names:
        v = d[c]
        if isinstance(v, dict) and set(v) == {"ts", "is_assert"}:
            v = {"ts": int(v["ts"]), "is_assert": bool(v["is_assert"])}
        out.append(v)
    return out


def _typing_to_coltype(typing: Optional[str], dtype: str) -> dict:
    """Engine ColDef.typing string (or Spark dtype fallback) -> msgpack
    NullableColType struct-map."""
    t = (typing or "").strip()
    nullable = t.endswith("?")
    if nullable:
        t = t[:-1]
    simple = {"Any": "Any", "Bool": "Bool", "Int": "Int", "Float": "Float",
              "String": "String", "Bytes": "Bytes", "Uuid": "Uuid",
              "Json": "Json", "Validity": "Validity"}
    if t in simple:
        return {"coltype": simple[t], "nullable": nullable}
    if t.startswith("[") and t.endswith("]"):
        inner = _typing_to_coltype(t[1:-1], "string")
        return {"coltype": {"List": {"eltype": inner, "len": None}},
                "nullable": nullable}
    by_dtype = {"bigint": "Int", "int": "Int", "smallint": "Int",
                "tinyint": "Int", "double": "Float", "float": "Float",
                "boolean": "Bool", "string": "String", "binary": "Bytes"}
    if dtype in by_dtype:
        return {"coltype": by_dtype[dtype], "nullable": True}
    if dtype.startswith("array<"):
        inner = _typing_to_coltype(None, dtype[6:-1])
        return {"coltype": {"List": {"eltype": inner, "len": None}},
                "nullable": True}
    if dtype.startswith("struct<ts"):
        return {"coltype": "Validity", "nullable": False}
    return {"coltype": "Any", "nullable": True}


def _handle_for(rel, rid: int) -> dict:
    dtypes = dict(rel.df.dtypes)

    def col(c):
        return {"name": c.name,
                "typing": _typing_to_coltype(c.typing, dtypes.get(c.name, "")),
                "default_gen": None}

    return {
        "name": rel.name,
        "id": rid,
        "metadata": {"keys": [col(c) for c in rel.keys],
                     "non_keys": [col(c) for c in rel.non_keys]},
        "put_triggers": list(rel.put_triggers),
        "rm_triggers": list(rel.rm_triggers),
        "replace_triggers": list(rel.replace_triggers),
        "access_level": _ACCESS_TO_RUST.get(rel.access_level, "Normal"),
        "is_temp": False,
        "indices": {},
        "hnsw_indices": {},
        "fts_indices": {},
        "lsh_indices": {},
        "description": "",
    }


def is_cozo_sqlite_backup(path: str) -> bool:
    if not os.path.isfile(path):
        return False
    try:
        with open(path, "rb") as f:
            if f.read(16) != b"SQLite format 3\x00":
                return False
        con = sqlite3.connect(path)
        try:
            return bool(con.execute(
                "SELECT count(*) FROM sqlite_master "
                "WHERE type='table' AND name='cozo'").fetchone()[0])
        finally:
            con.close()
    except Exception:
        return False


def restore_cozo_backup(db, path: str) -> None:
    """Load a reference-format backup into an EMPTY engine instance
    (restore_backup, db.rs:661-686 refuses a non-empty target)."""
    from pyspark.sql import types as T

    from cozo_spark.datalog.ast import ColDef
    from cozo_spark.datalog.engine import StoredRelation
    from cozo_spark.datalog.translate import QueryError

    if db.relations:
        raise QueryError(
            "Cannot restore backup: data exists in the current database.")
    payload = read_cozo_backup(path)
    for name, rel in payload.items():
        fields = []
        types = rel["key_types"] + rel["non_key_types"]
        names = rel["keys"] + rel["non_keys"]
        for cname, t in zip(names, types):
            fields.append(T.StructField(cname, _spark_type(t, rel["rows"],
                                                           names.index(cname)),
                                        True))
        schema = T.StructType(fields)
        from cozo_spark.plans.local import local_frame
        df = local_frame(db.spark, rel["rows"], schema)
        kdefs = [ColDef(n, t) for n, t in zip(rel["keys"], rel["key_types"])]
        ndefs = [ColDef(n, t) for n, t in
                 zip(rel["non_keys"], rel["non_key_types"])]
        sr = StoredRelation(name, kdefs, ndefs, df,
                            access_level=rel["access_level"],
                            put_triggers=rel["put_triggers"],
                            rm_triggers=rel["rm_triggers"],
                            replace_triggers=rel["replace_triggers"])
        db.relations[name] = sr


def _spark_type(t: Optional[str], rows: list, pos: int):
    from pyspark.sql import types as T

    base = (t or "").rstrip("?")
    simple = {"Bool": T.BooleanType(), "Int": T.LongType(),
              "Float": T.DoubleType(), "String": T.StringType(),
              "Uuid": T.StringType(), "Json": T.StringType(),
              "Bytes": T.BinaryType(),
              "Validity": T.StructType([
                  T.StructField("ts", T.LongType(), False),
                  T.StructField("is_assert", T.BooleanType(), False)])}
    if base in simple:
        return simple[base]
    if base.startswith("[") and base.endswith("]"):
        return T.ArrayType(_spark_type(base[1:-1], [], 0))
    if base.startswith("<F32"):
        return T.ArrayType(T.FloatType())
    if base.startswith("<F64"):
        return T.ArrayType(T.DoubleType())
    # Any / Tuple / unknown: infer from the first non-null value
    for r in rows:
        v = r[pos]
        if v is None:
            continue
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        if isinstance(v, (bytes, bytearray)):
            return T.BinaryType()
        if isinstance(v, list):
            return T.ArrayType(T.StringType() if not v else
                               _spark_type(None, [[x] for x in v[:1]], 0))
        if isinstance(v, dict):
            return T.StructType([
                T.StructField("ts", T.LongType(), False),
                T.StructField("is_assert", T.BooleanType(), False)])
        return T.StringType()
    return T.StringType()
