"""Regression tests for the round-3 ADVICE findings (fixed in round 4).

1. fixed-rule registry: no silent clobber of existing names (db.rs:760-777)
2. temp-store :put/:rm align spec columns by NAME (same rule as stored)
3. read-only / in-trigger flags are per-thread, not shared instance state
4. compat.import_from_backup requires destination relations (db.rs:695-730)
5. MultiTransaction conflicts scope to relations the txn touched
   (covered in test_engine_api.py)
"""

import threading

import pytest

from cozo_spark.datalog.engine import CozoDb
from cozo_spark.datalog.translate import QueryError


def test_register_fixed_rule_rejects_existing_names(spark):
    from cozo_spark.fixed_rules import _REGISTRY

    db = CozoDb(spark)
    # builtin clobber is rejected outright
    with pytest.raises(ValueError, match="already registered"):
        db.register_fixed_rule("PageRank", lambda inputs, options=None: None)
    assert _REGISTRY["PageRank"] is not None

    db.register_fixed_rule("AdviceR4UserRule",
                           lambda inputs, options=None: inputs[0])
    try:
        with pytest.raises(ValueError, match="already registered"):
            db.register_fixed_rule("AdviceR4UserRule",
                                   lambda inputs, options=None: inputs[0])
    finally:
        assert db.unregister_fixed_rule("AdviceR4UserRule") is True


def test_temp_put_spec_aligns_by_name(spark):
    db = CozoDb(spark)
    db.run_script(":create _kt {k: Int => v: Int}")
    # head order (v, k) deliberately swapped vs the declared (k, v): spec
    # names must pull from the same-named head binding, not by position
    db.run_script("?[v, k] <- [[10, 1], [20, 2]] :put _kt {k => v}")
    res = db.run_script("?[k, v] := *_kt[k, v] :sort k")
    assert res.rows == [[1, 10], [2, 20]]
    # upsert by key still works with the swapped head
    db.run_script("?[v, k] <- [[99, 1]] :put _kt {k => v}")
    res = db.run_script("?[k, v] := *_kt[k, v] :sort k")
    assert res.rows == [[1, 99], [2, 20]]


def test_temp_rm_composite_key_spec_aligns_by_name(spark):
    db = CozoDb(spark)
    db.run_script(":create _ct {k1: Int, k2: Int => v: Int}")
    db.run_script("?[k1, k2, v] <- [[1, 2, 7], [2, 1, 8]] :put _ct {k1, k2 => v}")
    # rm spec names the keys in REVERSED order; values must still land on
    # the right columns — only (k1=1, k2=2) goes away
    db.run_script("?[k2, k1] <- [[2, 1]] :rm _ct {k2, k1}")
    res = db.run_script("?[k1, k2, v] := *_ct[k1, k2, v]")
    assert res.rows == [[2, 1, 8]]


def test_read_only_flag_is_thread_local(spark):
    db = CozoDb(spark)
    db.run_script(":create tl_guard {k: Int}")

    inside = threading.Event()
    release = threading.Event()
    errors: list = []

    def ro_thread():
        # hold the read-only window open on THIS thread
        db._read_only = True
        try:
            inside.set()
            release.wait(timeout=30)
        finally:
            db._read_only = False

    t = threading.Thread(target=ro_thread)
    t.start()
    assert inside.wait(timeout=30)
    try:
        # a concurrent write on the main thread must NOT see the guard
        db.run_script("?[k] <- [[1]] :put tl_guard {k}")
    except QueryError as e:  # pragma: no cover - the regression
        errors.append(e)
    finally:
        release.set()
        t.join(timeout=30)
    assert not errors
    assert db.run_script("?[k] := *tl_guard[k]").rows == [[1]]


def test_read_only_still_rejects_same_thread(spark):
    db = CozoDb(spark)
    db.run_script(":create tl_guard2 {k: Int}")
    with pytest.raises(QueryError, match="read-only"):
        db.run_script_read_only("?[k] <- [[1]] :put tl_guard2 {k}")
