"""Drop-in compatibility layer for the reference's Python binding.

The reference ships ``cozo_embedded`` / pycozo's native class
(cozo-lib-python/src/lib.rs:216-420). Code written against that surface
runs unchanged on Spark by swapping the import::

    from cozo_spark.compat import CozoDb
    db = CozoDb("mem", "")               # engine/path accepted, Spark-backed
    db.run_script(":create t {k => v}", {})
    db.run_script("?[k, v] <- [[1, 2]] :put t {k => v}", {})
    print(db.run_script("?[k, v] := *t[k, v]", {})["rows"])

Signatures mirror lib.rs exactly: ``run_script(query, params, immutable)``
returns the NamedRows dict; ``register_callback(rel, cb) -> id`` delivers
``cb(op, new_rows, old_rows)`` as plain row lists;
``register_fixed_rule(name, arity, cb)`` gets ``cb(inputs, options)`` with
inputs as lists-of-rows and returns rows; ``multi_transact(write)`` yields
a tx with run_script/commit/abort.
"""

from __future__ import annotations

import tempfile
from typing import Any, Callable, Optional


class CozoDb:
    """pycozo-native-compatible facade over the Spark engine."""

    def __init__(self, engine: str = "mem", path: str = "",
                 options: str = "", *, spark=None,
                 row_page_size: Optional[int] = None):
        # engine/path/options are accepted for source compatibility; storage
        # is the Spark relation registry (persist via backup()/restore() or
        # CozoDb.persist_relation on the underlying engine).
        # row_page_size caps per-page row materialization: results come
        # back with the reference's `next` continuation chain in the dict
        # (db.rs:150-194) instead of one unbounded collect.
        from cozo_spark.datalog.engine import CozoDb as _Engine

        if spark is None:
            from cozo_spark.session import get_spark

            spark = get_spark()
        self._db: Optional[_Engine] = _Engine(spark)
        if row_page_size is not None:
            self._db.row_page_size = int(row_page_size)
        self._engine_name = engine
        self._path = path
        self._cb_seq = 0
        self._cbs: dict[int, tuple] = {}

    # -- lifecycle -----------------------------------------------------------

    def close(self) -> bool:
        if self._db is None:
            return False
        self._db = None
        return True

    def _require(self):
        if self._db is None:
            raise RuntimeError("database already closed")
        return self._db

    # -- queries -------------------------------------------------------------

    def run_script(self, query: str, params: Optional[dict] = None,
                   immutable: bool = False) -> dict:
        db = self._require()
        if immutable:
            res = db.run_script_read_only(query, params or {})
        else:
            res = db.run_script(query, params or {})
        if isinstance(res, list):  # multi-result %return
            return [r.as_dict() for r in res]
        return res.as_dict()

    # -- callbacks (lib.rs:256-277) -------------------------------------------

    def register_callback(self, rel: str, callback: Callable) -> int:
        db = self._require()
        feed = getattr(db, "changefeed", None)
        if feed is None:
            from cozo_spark.streaming.changefeed import attach_changefeed

            feed = attach_changefeed(db, tempfile.mkdtemp(prefix="cozo_cb_"))

        def adapter(op, new_rows, old_rows):
            # the feed delivers dicts (column → value, insertion-ordered);
            # the pycozo protocol wants plain row lists
            callback(op, [list(r.values()) for r in new_rows],
                     [list(r.values()) for r in (old_rows or [])])

        feed.register_callback(rel, adapter)
        self._cb_seq += 1
        self._cbs[self._cb_seq] = (rel, adapter)
        return self._cb_seq

    def unregister_callback(self, cb_id: int) -> bool:
        db = self._require()
        entry = self._cbs.pop(cb_id, None)
        if entry is None:
            return False
        rel, adapter = entry
        feed = getattr(db, "changefeed", None)
        return bool(feed and feed.unregister_callback(rel, adapter))

    # -- fixed rules (lib.rs:279-318) -----------------------------------------

    def register_fixed_rule(self, name: str, arity: int,
                            callback: Callable) -> None:
        db = self._require()

        def rule(inputs, options=None):
            rows_in = [[list(r) for r in df.collect()] for df in inputs]
            out_rows = callback(rows_in, dict(options or {}))
            rows = [tuple(r) for r in out_rows]
            if rows and len(rows[0]) != arity:
                raise ValueError(
                    f"fixed rule {name!r} returned arity {len(rows[0])}, "
                    f"declared {arity}")
            cols = [f"_{i}" for i in range(arity)]
            if not rows:
                from pyspark.sql import types as T

                return db.spark.createDataFrame([], T.StructType(
                    [T.StructField(c, T.StringType(), True) for c in cols]))
            from cozo_spark.plans.local import local_frame
            return local_frame(db.spark, rows, cols)

        db.register_fixed_rule(name, rule)

    def unregister_fixed_rule(self, name: str) -> bool:
        return self._require().unregister_fixed_rule(name)

    # -- import/export/backup (lib.rs:321-377) --------------------------------

    def export_relations(self, relations: list) -> dict:
        return self._require().export_relations(list(relations))

    def import_relations(self, data: dict) -> None:
        self._require().import_relations(dict(data))

    def backup(self, path: str) -> None:
        self._require().backup(path)

    def restore(self, path: str) -> None:
        self._require().restore(path)

    def import_from_backup(self, path: str, relations: list) -> None:
        """Restore only the named relations from a backup — either a
        parquet snapshot directory or an ACTUAL CozoDB sqlite backup file
        (the engine's restore() sniffs the format, so a pycozo user can
        point this at the .db file the reference's backup() produced)."""
        from cozo_spark.datalog.engine import CozoDb as _Engine

        staging = _Engine(self._require().spark)
        staging.restore(path)
        missing = [r for r in relations if r not in staging.relations]
        if missing:
            raise KeyError(
                f"relations not present in backup: {missing}")
        payload = staging.export_relations(list(relations))
        # destination relations must ALREADY exist (db.rs:695-730:
        # dst_tx.get_relation errors on absence) — pycozo code relies on
        # that error; auto-creating here would diverge from the reference
        db = self._require()
        absent = [r for r in payload if r not in db.relations]
        if absent:
            raise KeyError(
                f"cannot import into non-existent relations: {absent}")
        for rel_name in payload:
            db.import_relations({rel_name: payload[rel_name]})

    # -- transactions (lib.rs:381-419) ----------------------------------------

    def multi_transact(self, write: bool = False) -> "CozoDbMulTx":
        return CozoDbMulTx(self._require().multi_transaction(write=write))


class CozoDbMulTx:
    def __init__(self, tx):
        self._tx = tx

    def run_script(self, query: str, params: Optional[dict] = None) -> dict:
        res = self._tx.run_script(query, params or {})
        if isinstance(res, list):  # multi-result %return
            return [r.as_dict() for r in res]
        return res.as_dict()

    def commit(self) -> None:
        self._tx.commit()

    def abort(self) -> None:
        self._tx.abort()


def eval_expressions(expressions: str, params: Optional[dict] = None, *,
                     spark=None) -> Any:
    """Module-level expression evaluator (lib.rs:421-440)."""
    db = CozoDb(spark=spark)
    return db._require().evaluate_expressions(expressions, params or {})
