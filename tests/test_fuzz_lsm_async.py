"""Randomized interleaving fuzz for the async LSM machinery (r11).

The lazy view + async minor/major design has three moving parts that
only misbehave under interleavings: the dirty-flag rebuild, the
identity-guarded splice install (monotonic seqs), and wholesale resets
racing in-flight workers. Each fuzz round drives a seeded random op
sequence (put single/multi, rm, update, ::compact, import, read) while
background checkpoint calls sleep a random 0-80 ms — jittering the
install points against the writer — and checks every read against a
Python latest-wins model. Op sequences are seeded; thread timing is the
fuzzed dimension, so failures print the seed for replay."""

from __future__ import annotations

import random
import threading
import time

import pytest


# seed 13 caught a real stale-plan-cache race in an extended sweep (the
# dirty-flag snapshot matched a later state whose pending log had gained
# a newer delta) — keep it in the committed set
SEEDS = [7, 13, 23, 101]
OPS_PER_ROUND = 60


@pytest.mark.parametrize("seed", SEEDS)
def test_async_lsm_interleaving_fuzz(spark, monkeypatch, seed):
    import cozo_spark.datalog.engine as EG
    from cozo_spark.datalog.engine import CozoDb

    rng = random.Random(seed)
    orig = EG._checkpoint
    jitter = random.Random(seed * 31 + 1)

    def jittery_ck(df):
        if threading.current_thread().name.startswith("cozo-lsm-"):
            time.sleep(jitter.random() * 0.08)
        return orig(df)

    monkeypatch.setattr(EG, "_checkpoint", jittery_ck)
    # small threshold: collapses and majors fire constantly
    monkeypatch.setattr(CozoDb, "_COMPACT_EVERY", 3)
    monkeypatch.setattr(CozoDb, "_LSM_MAJOR_EVERY", 2)

    db = CozoDb(spark)
    db.run_script(":create fz {k: Int => v: Int}")
    rel = db.relations["fz"]
    model: dict[int, int] = {}

    def check():
        got = {r[0]: r[1] for r in
               db.run_script_df("?[k,v] := *fz{k,v}").collect()}
        assert got == model, (
            f"seed {seed}: diverged "
            f"(+{ {k: v for k, v in got.items() if model.get(k) != v} } "
            f"-{ {k: v for k, v in model.items() if got.get(k) != v} })")

    for i in range(OPS_PER_ROUND):
        r = rng.random()
        if r < 0.45:  # single put
            k, v = rng.randrange(30), rng.randrange(1000)
            db.run_script(f"?[k, v] <- [[{k}, {v}]] :put fz {{k => v}}")
            model[k] = v
        elif r < 0.60:  # multi-row put (within-batch dup: largest wins)
            rows = [(rng.randrange(30), rng.randrange(1000))
                    for _ in range(3)]
            lit = ", ".join(f"[{k}, {v}]" for k, v in rows)
            db.run_script(f"?[k, v] <- [{lit}] :put fz {{k => v}}")
            byk: dict[int, int] = {}
            for k, v in rows:
                byk[k] = max(byk.get(k, v), v)
            model.update(byk)
        elif r < 0.72:  # rm
            k = rng.randrange(30)
            db.run_script(f"?[k] <- [[{k}]] :rm fz {{k}}")
            model.pop(k, None)
        elif r < 0.80 and model:  # update an existing key
            k = rng.choice(sorted(model))
            v = rng.randrange(1000)
            db.run_script(f"?[k, v] <- [[{k}, {v}]] :update fz {{k => v}}")
            model[k] = v
        elif r < 0.86:  # wholesale reset racing in-flight workers
            db.run_script("::compact")
        elif r < 0.90:  # import merge (another wholesale swap)
            k, v = rng.randrange(30, 40), rng.randrange(1000)
            db.import_relations({"fz": {"headers": ["k", "v"],
                                        "rows": [[k, v]]}})
            model[k] = v
        else:  # read mid-stream
            check()
    check()
    # drain every worker, then the final state must still agree
    deadline = time.time() + 120
    while time.time() < deadline:
        if not (rel.lsm_thread or rel.lsm_minor_thread
                or rel.lsm_compacting or rel.lsm_minor_inflight):
            break
        time.sleep(0.05)
    check()


def test_mid_evaluation_mutation_never_caches_stale_plan(spark, monkeypatch):
    """Deterministic regression for the seed-13 fuzz catch: a mutation
    landing between a read's plan construction and its plan-cache record
    (in the fuzz: the async splice marking the view dirty mid-collect,
    then a put on the same still-unrebuilt flat_df) must not produce a
    cache entry that a LATER state can hit. The snapshot now carries the
    logical version (not the dirty flag — (id, dirty) does not identify a
    state), and the put is guarded by a version-vector equality check
    around the evaluation."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script("?[k, v] <- [[1, 10]] :create mt {k => v}")
    script = "?[k, v] := *mt{k, v}"

    orig = CozoDb._run_program
    state = {"armed": True}

    def hijack(self, prog, **kw):
        res = orig(self, prog, **kw)
        if state["armed"] and getattr(prog.opts, "store_op", None) is None:
            state["armed"] = False  # the nested put must run unhijacked
            self.run_script("?[k, v] <- [[1, 99]] :put mt {k => v}")
        return res

    monkeypatch.setattr(CozoDb, "_run_program", hijack)
    first = {r[0]: r[1] for r in db.run_script_df(script).collect()}
    monkeypatch.setattr(CozoDb, "_run_program", orig)
    # the hijacked read's plan predates the put — either answer set is a
    # consistent point-in-time view; what matters is the NEXT read
    assert first in ({1: 10}, {1: 99})
    got = {r[0]: r[1] for r in db.run_script_df(script).collect()}
    assert got == {1: 99}, \
        f"stale cached plan served after the mutation: {got}"
