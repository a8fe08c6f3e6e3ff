"""Mutation-path differential fuzz: random :put/:rm/:update/:delete/:insert
sequences against a Python dict model of the reference's PK-upsert
semantics (query/stored.rs: put 208-369, update 520-667, rm 914-1124).

The mutation surface is otherwise example-tested; this drives it through
hundreds of generated operation interleavings and checks the FULL relation
contents after every step.
"""

from __future__ import annotations

import random

import pytest


def _apply_model(model: dict, op: str, rows: list[tuple]):
    """Reference semantics on a {key: (v1, v2)} dict for schema
    {k: Int => a: Int, b: Int}.

    Result rows are applied in SORTED tuple order with per-key overwrite
    (BTree iteration + stored.rs put), so within one batch the largest
    tuple per key wins; :insert conflicts on duplicate keys in the batch
    too (the second row sees the first's write)."""
    rows = sorted(rows)
    if op == "put":            # full-row upsert, last (= largest) wins
        for k, a, b in rows:
            model[k] = (a, b)
    elif op == "insert":       # like put but errors on existing keys
        for k, a, b in rows:
            if k in model:
                raise KeyError(k)
            model[k] = (a, b)
    elif op == "update":       # merge: only the named non-keys change
        for k, a in rows:      # rows carry (k, a) — b keeps its old value
            old = model.get(k)
            if old is None:    # stored.rs:590 "key to update does not exist"
                raise KeyError(k)
            model[k] = (a, old[1])
    elif op == "rm":           # lenient delete by key
        for (k,) in rows:
            model.pop(k, None)
    elif op == "delete":       # strict delete: all keys must exist
        for (k,) in rows:
            if k not in model:
                raise KeyError(k)
        for (k,) in rows:
            del model[k]


def _vals(rows):
    return ", ".join("[" + ", ".join(str(x) for x in r) + "]" for r in rows)


@pytest.mark.parametrize("seed", [7, 77, 777])
def test_fuzz_mutations_vs_model(spark, seed):
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.datalog.translate import QueryError

    rnd = random.Random(seed)
    db = CozoDb(spark)
    rel = f"mfz_{seed}"
    db.run_script(f":create {rel} {{k: Int => a: Int, b: Int}}")
    model: dict = {}

    for step in range(25):
        op = rnd.choice(["put", "put", "update", "rm", "delete", "insert"])
        n = rnd.randint(1, 4)
        keys = [rnd.randint(0, 12) for _ in range(n)]
        if op in ("put", "insert"):
            rows = [(k, rnd.randint(0, 99), rnd.randint(0, 99)) for k in keys]
            script = (f"?[k, a, b] <- [{_vals(rows)}] "
                      f":{op} {rel} {{k => a, b}}")
        elif op == "update":
            rows = [(k, rnd.randint(0, 99)) for k in keys]
            script = f"?[k, a] <- [{_vals(rows)}] :update {rel} {{k, a}}"
        else:
            rows = [(k,) for k in set(keys)]
            script = f"?[k] <- [{_vals(rows)}] :{op} {rel} {{k}}"

        model_copy = dict(model)
        model_err = None
        try:
            _apply_model(model_copy, op, rows)
        except KeyError as ex:
            model_err = ex

        try:
            db.run_script(script)
            engine_err = None
        except QueryError as ex:
            engine_err = ex

        assert (engine_err is None) == (model_err is None), (
            step, op, rows, engine_err, model_err)
        if model_err is None:
            model = model_copy
        # engine must have rolled back entirely on error (atomic-per-script)
        got = {r[0]: (r[1], r[2]) for r in
               db.run_script(f"?[k, a, b] := *{rel}{{k, a, b}}").rows}
        assert got == model, (step, op, rows, got, model)


@pytest.mark.parametrize("seed", [7, 77])
def test_fuzz_lazy_merge_interleavings(spark, seed):
    """The log-structured write path: random put/rm/update/::compact/read
    interleavings vs a dict model — reads must see identical state whether
    they hit a lazy merge chain, a freshly compacted frame, or anything
    between (put/rm/update cross the compaction boundary mid-sequence)."""
    import random

    from cozo_spark.datalog.engine import CozoDb

    rnd = random.Random(seed)
    db = CozoDb(spark)
    db.run_script(":create lzm {k: Int => a: Int, b: Int}")
    model: dict = {}
    for step in range(24):
        op = rnd.choice(["put", "put", "rm", "update", "compact", "read"])
        k = rnd.randint(0, 6)
        if op == "put":
            a, b = rnd.randint(0, 99), rnd.randint(0, 99)
            db.run_script(f"?[k, a, b] <- [[{k}, {a}, {b}]] :put lzm {{k => a, b}}")
            model[k] = (a, b)
        elif op == "rm":
            db.run_script(f"?[k] <- [[{k}]] :rm lzm {{k}}")
            model.pop(k, None)
        elif op == "update" and k in model:
            a = rnd.randint(100, 199)
            db.run_script(f"?[k, a] <- [[{k}, {a}]] :update lzm {{k => a}}")
            model[k] = (a, model[k][1])
        elif op == "compact":
            db.run_script("::compact")
            assert db.relations["lzm"].pending_merges == 0
        elif op == "read":
            got = {r[0]: (r[1], r[2]) for r in
                   db.run_script("?[k, a, b] := *lzm[k, a, b]").rows}
            assert got == model, (step, got, model)
    got = {r[0]: (r[1], r[2]) for r in
           db.run_script("?[k, a, b] := *lzm[k, a, b]").rows}
    assert got == model
