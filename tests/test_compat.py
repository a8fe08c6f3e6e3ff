"""pycozo-native compatibility facade (cozo-lib-python/src/lib.rs:216-440):
code written against the reference's Python binding runs unchanged."""

from __future__ import annotations

import pytest


@pytest.fixture()
def db(spark):
    from cozo_spark.compat import CozoDb

    d = CozoDb("mem", "", spark=spark)
    yield d
    d.close()


def test_run_script_dict_shape(db):
    db.run_script(":create t {k: Int => v: String}", {})
    db.run_script("?[k, v] <- [[1, 'a'], [2, 'b']] :put t {k => v}", {})
    res = db.run_script("?[k, v] := *t[k, v]", {})
    assert res["headers"] == ["k", "v"]
    assert sorted(map(tuple, res["rows"])) == [(1, "a"), (2, "b")]
    assert res["next"] is None


def test_immutable_rejects_writes(db):
    db.run_script(":create ro2 {k: Int}", {})
    with pytest.raises(Exception):
        db.run_script("?[k] <- [[1]] :put ro2 {k}", {}, immutable=True)


def test_params(db):
    res = db.run_script("?[x] := x = $a + $b", {"a": 40, "b": 2})
    assert res["rows"] == [[42]]


def test_register_fixed_rule_rows_protocol(db):
    def doubler(inputs, options):
        mult = options.get("mult", 2)
        return [[sum(r) * mult] for r in inputs[0]]

    db.register_fixed_rule("CompatSum", 1, doubler)
    res = db.run_script(
        "r[] <- [[1, 2], [3, 4]]\n?[s] <~ CompatSum(r[], mult: 10)", {})
    assert sorted(x[0] for x in res["rows"]) == [30, 70]
    assert db.unregister_fixed_rule("CompatSum") is True


def test_register_callback_row_lists(db):
    got = []
    cb_id = db.register_callback("cbt", lambda op, new, old: got.append((op, new, old)))
    db.run_script(":create cbt {k: Int => v: Int}", {})
    db.run_script("?[k, v] <- [[1, 10]] :put cbt {k => v}", {})
    db.run_script("?[k, v] <- [[1, 11]] :put cbt {k => v}", {})
    db._require().changefeed.flush()  # async dispatch (r10)
    assert got and got[0][0] == "put" and got[0][1] == [[1, 10]]
    # second put replaces (1, 10) — delivered as old rows
    assert got[1][1] == [[1, 11]] and got[1][2] == [[1, 10]]
    assert db.unregister_callback(cb_id) is True
    assert db.unregister_callback(cb_id) is False


def test_multi_transact(db):
    db.run_script(":create mt {k: Int => v: Int}", {})
    tx = db.multi_transact(write=True)
    tx.run_script("?[k, v] <- [[1, 5]] :put mt {k => v}", {})
    assert db.run_script("?[k, v] := *mt[k, v]", {})["rows"] == []
    tx.commit()
    assert db.run_script("?[k, v] := *mt[k, v]", {})["rows"] == [[1, 5]]


def test_backup_import_from_backup(db, spark, tmp_path):
    from cozo_spark.compat import CozoDb

    db.run_script(":create b1 {k: Int => v: Int}", {})
    db.run_script(":create b2 {k: Int => v: Int}", {})
    db.run_script("?[k, v] <- [[1, 1]] :put b1 {k => v}", {})
    db.run_script("?[k, v] <- [[2, 2]] :put b2 {k => v}", {})
    db.backup(str(tmp_path / "bk"))

    other = CozoDb(spark=spark)
    # destination relation must pre-exist (db.rs:695-730 dst_tx.get_relation)
    other.run_script(":create b2 {k: Int => v: Int}", {})
    other.import_from_backup(str(tmp_path / "bk"), ["b2"])
    assert other.run_script("?[k, v] := *b2[k, v]", {})["rows"] == [[2, 2]]
    with pytest.raises(Exception):
        other.run_script("?[k, v] := *b1[k, v]", {})
    # importing into a db where the destination does NOT exist errors,
    # matching the reference (no silent auto-create)
    third = CozoDb(spark=spark)
    with pytest.raises(KeyError, match="non-existent"):
        third.import_from_backup(str(tmp_path / "bk"), ["b2"])
    third.close()
    other.close()


def test_compat_row_page_size(spark):
    """The facade's opt-in pagination: results carry the reference's
    `next` continuation chain in the returned dict (db.rs:150-194)."""
    from cozo_spark.compat import CozoDb

    db = CozoDb(spark=spark, row_page_size=3)
    try:
        r = db.run_script("?[x] <- [[1],[2],[3],[4],[5],[6],[7]] :sort x", {})
        assert [row[0] for row in r["rows"]] == [1, 2, 3]
        assert [row[0] for row in r["next"]["rows"]] == [4, 5, 6]
        assert r["next"]["next"]["rows"] == [[7]]
        assert r["next"]["next"]["next"] is None
    finally:
        db.close()


def test_close_semantics(db):
    assert db.close() is False or True  # close() in fixture teardown too


def test_unregister_builtin_rule_protected(db):
    with pytest.raises(Exception, match="builtin"):
        db.unregister_fixed_rule("PageRank")
    assert db.unregister_fixed_rule("never_registered_rule") is False


def test_immutable_blocks_imperative_writes(db):
    db.run_script(":create imb {k: Int}", {})
    # brace-grouped / imperative scripts re-enter run_script per block; the
    # dynamic read-only guard must still block the inner :put
    with pytest.raises(Exception, match="read-only"):
        db.run_script("{?[k] <- [[1]] :put imb {k}}", {}, immutable=True)
    assert db.run_script("?[k] := *imb[k]", {})["rows"] == []


def test_import_from_backup_missing_relation_errors(db, spark, tmp_path):
    db.run_script(":create mb1 {k: Int}", {})
    db.run_script("?[k] <- [[1]] :put mb1 {k}", {})
    db.backup(str(tmp_path / "bk2"))
    from cozo_spark.compat import CozoDb

    other = CozoDb(spark=spark)
    with pytest.raises(KeyError, match="not present"):
        other.import_from_backup(str(tmp_path / "bk2"), ["mb1", "nope"])
    other.close()
