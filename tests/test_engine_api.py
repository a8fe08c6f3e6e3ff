"""Engine API surface: transactions, read-only, expression evaluator,
export/import, user fixed rules (reference entry points 2-3 + auxiliaries)."""

from __future__ import annotations

import pytest


def test_multi_transaction_commit(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create acct {id: Int => bal: Int}")
    db.run_script("?[i, b] <- [[1, 100], [2, 50]] :put acct {id => bal}")

    with db.multi_transaction() as tx:
        tx.run_script("?[i, b] <- [[1, 70]] :put acct {id => bal}")
        tx.run_script("?[i, b] <- [[2, 80]] :put acct {id => bal}")
        # staged state visible inside the tx
        r = tx.run_script("?[b] := *acct[1, b]")
        assert r.rows == [[70]]
        # base unchanged until commit
        r0 = db.run_script("?[b] := *acct[1, b]")
        assert r0.rows == [[100]]
    r1 = db.run_script("?[i, b] := *acct[i, b]")
    assert sorted(tuple(x) for x in r1.rows) == [(1, 70), (2, 80)]


def test_multi_transaction_abort(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create t2 {k: Int}")
    db.run_script("?[k] <- [[1]] :put t2 {k}")
    tx = db.multi_transaction()
    tx.run_script("?[k] <- [[2]] :put t2 {k}")
    tx.abort()
    assert db.run_script("?[k] := *t2[k]").rows == [[1]]


def test_multi_transaction_conflict(spark):
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.datalog.translate import QueryError

    db = CozoDb(spark)
    db.run_script(":create t3 {k: Int}")
    tx = db.multi_transaction()
    tx.run_script("?[k] <- [[1]] :put t3 {k}")
    # concurrent mutation on base → conflict at commit
    db.run_script("?[k] <- [[9]] :put t3 {k}")
    with pytest.raises(QueryError, match="conflict"):
        tx.commit()


def test_multi_transaction_untouched_concurrent_create_survives(spark):
    # per-relation conflict scope (reference's per-relation locking): a
    # relation created in base mid-txn that this txn never touched is NOT
    # a conflict, and must survive the commit's registry publish
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create t4 {k: Int}")
    tx = db.multi_transaction()
    tx.run_script("?[k] <- [[1]] :put t4 {k}")
    db.run_script("?[k] <- [[5]] :create t5 {k}")
    tx.commit()
    # base keeps both the txn's write and the concurrent create
    assert db.run_script("?[k] := *t4[k]").rows == [[1]]
    assert db.run_script("?[k] := *t5[k]").rows == [[5]]


def test_multi_transaction_conflict_on_concurrent_create_same_name(spark):
    # BOTH sides creating the same relation IS a write-write conflict
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.datalog.translate import QueryError

    db = CozoDb(spark)
    tx = db.multi_transaction()
    tx.run_script("?[k] <- [[1]] :create t5b {k}")
    db.run_script("?[k] <- [[5]] :create t5b {k}")
    with pytest.raises(QueryError, match="concurrently created"):
        tx.commit()
    assert db.run_script("?[k] := *t5b[k]").rows == [[5]]


def test_multi_transaction_untouched_concurrent_remove_survives(spark):
    # base dropping a relation this txn never touched is not a conflict,
    # and the drop survives the commit
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.datalog.translate import QueryError

    db = CozoDb(spark)
    db.run_script(":create t6 {k: Int}")
    db.run_script(":create t7 {k: Int}")
    tx = db.multi_transaction()
    tx.run_script("?[k] <- [[1]] :put t6 {k}")
    db.run_script("::remove t7")
    tx.commit()
    assert db.run_script("?[k] := *t6[k]").rows == [[1]]
    with pytest.raises(QueryError):
        db.run_script("?[k] := *t7[k]")


def test_multi_transaction_conflict_on_touched_concurrent_remove(spark):
    # a relation the txn WROTE that base removed mid-txn → conflict
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.datalog.translate import QueryError

    db = CozoDb(spark)
    db.run_script(":create t8 {k: Int}")
    tx = db.multi_transaction()
    tx.run_script("?[k] <- [[1]] :put t8 {k}")
    db.run_script("::remove t8")
    with pytest.raises(QueryError, match="concurrently removed"):
        tx.commit()


def test_named_rows_pagination(spark):
    """row_page_size caps per-page materialization (NamedRows::next,
    db.rs:150-194): a >N-row result comes back as a lazy page chain —
    page 1 immediately, later pages pulled on `.next` access."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.row_page_size = 4
    r = db.run_script("?[x] <- [[1],[2],[3],[4],[5],[6],[7],[8],[9],[10]] "
                      ":sort x")
    assert len(r.rows) == 4
    assert r.headers == ["x"]
    assert r.has_more()
    # as_dict serializes the whole chain recursively (into_json contract);
    # it is non-destructive, so it must come before the severing flatten()
    d = r.as_dict()
    assert [row[0] for row in d["rows"]] == [1, 2, 3, 4]
    assert [row[0] for row in d["next"]["rows"]] == [5, 6, 7, 8]
    assert d["next"]["next"]["rows"] == [[9], [10]]
    assert d["next"]["next"]["next"] is None
    pages = r.flatten()
    assert [len(p.rows) for p in pages] == [4, 4, 2]
    assert [v for p in pages for (v,) in p.rows] == list(range(1, 11))
    # flatten severs the chain (db.rs:163-177): each page stands alone
    assert all(not p.has_more() for p in pages)
    assert pages[0].as_dict()["next"] is None
    # an exact-multiple result has no dangling empty page
    r2 = db.run_script("?[x] <- [[1],[2],[3],[4]] :sort x")
    assert len(r2.rows) == 4 and not r2.has_more()
    # unbounded default unchanged
    db.row_page_size = None
    r3 = db.run_script("?[x] <- [[1],[2],[3],[4],[5],[6]]")
    assert len(r3.rows) == 6 and not r3.has_more()


def test_read_only_rejects_mutations(spark):
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.datalog.translate import QueryError

    db = CozoDb(spark)
    db.run_script(":create ro {k: Int}")
    with pytest.raises(QueryError, match="read-only"):
        db.run_script_read_only("?[k] <- [[1]] :put ro {k}")
    assert db.run_script_read_only("::relations").rows


def test_evaluate_expressions(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    assert db.evaluate_expressions("1 + 2 * 3") == 7
    assert db.evaluate_expressions("concat('a', 'b')") == "ab"
    assert db.evaluate_expressions("$x * 2", params={"x": 21}) == 42


def test_export_import(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create ex {k: Int => v: String}")
    db.run_script("?[k, v] <- [[1, 'a'], [2, 'b']] :put ex {k => v}")
    payload = db.export_relations(["ex"])
    assert payload["ex"]["headers"] == ["k", "v"]

    db2 = CozoDb(spark)
    db2.run_script(":create ex {k: Int => v: String}")
    db2.import_relations(payload)
    r = db2.run_script("?[k, v] := *ex[k, v]")
    assert sorted(tuple(x) for x in r.rows) == [(1, "a"), (2, "b")]


def test_user_fixed_rule(spark):
    """The UDTF surface: register a custom rule, call it from CozoScript."""
    from pyspark.sql import functions as F
    from cozo_spark.datalog.engine import CozoDb

    def doubler(inputs, options):
        factor = options.get("factor", 2)
        df = inputs[0]
        return df.select(*[(F.col(c) * factor).alias(c) for c in df.columns])

    db = CozoDb(spark)
    db.register_fixed_rule("Doubler", doubler)
    r = db.run_script("""
    nums[x] <- [[1], [2], [3]]
    ?[x] <~ Doubler(nums[x], factor: 10)
    """)
    assert sorted(x[0] for x in r.rows) == [10, 20, 30]


def test_explain_atom_table(spark):
    # ::explain emits the reference's per-atom plan table shape
    # (db.rs:968-1191): rule / clause / atom rows with op kinds
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.register_dataframe("edge", spark.createDataFrame([(1, 2)], "fr long, to long"))
    r = db.run_script("""::explain {
    reach[a, b] := *edge[a, b]
    reach[a, c] := reach[a, b], *edge[b, c], b > 0
    ?[a, b] := reach[a, b], not *edge[a, 9]
    }""")
    assert r.headers == ["rule", "kind", "clause", "atom", "op", "ref", "detail"]
    ops = [(row[0], row[4]) for row in r.rows]
    assert ("reach", "stored_scan") in ops
    assert ("reach", "stored_join") in ops
    assert ("reach", "filter") in ops
    assert ("?", "neg_join(anti)") in ops


def test_access_levels_enforced(spark):
    # AccessLevel ordering Hidden < ReadOnly < Protected < Normal
    # (runtime/relation.rs:122-128): mutation needs Normal (stored.rs:75),
    # reads need >= ReadOnly (compile.rs:221)
    import pytest

    from cozo_spark.datalog.engine import CozoDb, QueryError

    db = CozoDb(spark)
    db.run_script(":create al {k: Int => v: Int}")
    db.run_script("?[k, v] <- [[1, 10]] :put al {k => v}")
    db.run_script("::access_level protected al")
    with pytest.raises(QueryError):
        db.run_script("?[k, v] <- [[2, 20]] :put al {k => v}")
    assert db.run_script("?[k] := *al[k, _]").rows == [[1]]  # reads still ok
    db.run_script("?[k, v] <- [[1, 10]] :ensure al {k => v}")  # assertions ok on protected
    db.run_script("::access_level hidden al")
    with pytest.raises(QueryError):
        db.run_script("?[k] := *al[k, _]")
    db.run_script("::access_level normal al")
    db.run_script("?[k, v] <- [[2, 20]] :put al {k => v}")
    assert sorted(r[0] for r in db.run_script("?[k] := *al[k, _]").rows) == [1, 2]


def test_parquet_backup_restore_roundtrip(spark, tmp_path):
    # executor-side parquet snapshot (scale analogue of db.rs:621-758 backup)
    from cozo_spark.datalog.engine import CozoDb

    src = CozoDb(spark)
    src.run_script(":create bk {k: Int => v: String}")
    src.run_script("?[k, v] <- [[1, 'a'], [2, 'b']] :put bk {k => v}")
    src.run_script("::access_level read_only bk")
    src.backup(str(tmp_path / "snap"))

    dst = CozoDb(spark)
    dst.restore(str(tmp_path / "snap"))
    assert sorted(tuple(r) for r in
                  dst.run_script("?[k, v] := *bk[k, v]").rows) == [(1, "a"), (2, "b")]
    assert dst.relations["bk"].access_level == "read_only"
    assert dst.relations["bk"].key_names == ["k"]


def test_import_dedups_payload_keys(spark):
    """Regression (ADVICE r1): a payload with duplicate keys must keep the
    LAST row per key (reference per-row tx.put loop), preserving key
    uniqueness after import."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create imp {k: Int => v: String}")
    db.run_script("?[k, v] <- [[1, 'old']] :put imp {k => v}")
    db.import_relations({"imp": {"headers": ["k", "v"],
                                 "rows": [[1, "mid"], [2, "b"], [1, "new"]]}})
    r = db.run_script("?[k, v] := *imp[k, v]")
    assert sorted(tuple(x) for x in r.rows) == [(1, "new"), (2, "b")]


def test_compact_flushes_pending_merges(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create cf {k: Int => v: Int}")
    for i in range(3):
        db.run_script(f"?[k, v] <- [[{i}, {i}]] :put cf {{k => v}}")
    assert db.relations["cf"].pending_merges == 3
    db.run_script("::compact")
    assert db.relations["cf"].pending_merges == 0
    assert len(db.run_script("?[k, v] := *cf[k, v]").rows) == 3
