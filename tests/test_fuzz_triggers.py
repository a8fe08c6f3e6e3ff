"""Trigger-consistency fuzz: a mirror relation maintained exclusively by
put/rm triggers must track the source relation through random mutation
sequences (trigger firing: query/stored.rs:669-773 — triggers run inside
the mutating transaction with _new/_old bound).
"""

from __future__ import annotations

import random

import pytest


@pytest.mark.parametrize("seed", [3, 33])
def test_fuzz_triggers_mirror(spark, seed):
    from cozo_spark.datalog.engine import CozoDb

    rnd = random.Random(seed)
    db = CozoDb(spark)
    src, mir = f"tsrc_{seed}", f"tmir_{seed}"
    db.run_script(f":create {src} {{k: Int => v: Int}}")
    db.run_script(f":create {mir} {{k: Int => v: Int}}")
    db.run_script(f"""
    ::set_triggers {src}
    on put {{ ?[k, v] := _new[k, v] :put {mir} {{k => v}} }}
    on rm {{ ?[k] := _old[k, v] :rm {mir} {{k}} }}
    """)

    model: dict = {}
    for step in range(18):
        op = rnd.choice(["put", "put", "rm"])
        n = rnd.randint(1, 3)
        if op == "put":
            rows = {rnd.randint(0, 9): rnd.randint(0, 99) for _ in range(n)}
            vals = ", ".join(f"[{k}, {v}]" for k, v in rows.items())
            db.run_script(f"?[k, v] <- [{vals}] :put {src} {{k => v}}")
            model.update(rows)
        else:
            keys = {rnd.randint(0, 9) for _ in range(n)}
            vals = ", ".join(f"[{k}]" for k in keys)
            db.run_script(f"?[k] <- [{vals}] :rm {src} {{k}}")
            for k in keys:
                model.pop(k, None)
        got_src = {r[0]: r[1] for r in
                   db.run_script(f"?[k, v] := *{src}{{k, v}}").rows}
        got_mir = {r[0]: r[1] for r in
                   db.run_script(f"?[k, v] := *{mir}{{k, v}}").rows}
        assert got_src == model, (step, op, got_src, model)
        assert got_mir == model, (step, op, got_mir, model)
