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


SEEDS = [7, 23, 101]
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
