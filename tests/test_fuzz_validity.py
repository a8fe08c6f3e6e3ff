"""Time-travel differential fuzz: random assert/retract histories read at
random `@ ts` points, against a Python model of the reference's validity
semantics (StoredWithValidityRA, query/ra.rs:1125-1243: per key, the latest
entry with ts <= T wins and the row is visible iff that entry is an
assert).

Covers the corners the single example test can't: retract-then-reassert,
multiple retracts, reads exactly AT an event timestamp, keys whose whole
history is after the read point, and interleaved multi-key histories.
"""

from __future__ import annotations

import random

import pytest


def _model_read(history: list[tuple], at: int) -> dict:
    """history: [(key, ts, is_assert, value)] → {key: value} visible at ts."""
    best: dict = {}
    for k, ts, is_assert, v in history:
        if ts <= at:
            cur = best.get(k)
            # latest ts wins; the reference's sort puts asserts BEFORE
            # retracts at the same (key, ts) and the skip-scan takes the
            # first (= assert) — generator avoids same-(key, ts) pairs so
            # either convention matches
            if cur is None or ts > cur[0]:
                best[k] = (ts, is_assert, v)
    return {k: v for k, (ts, a, v) in best.items() if a}


@pytest.mark.parametrize("seed", [5, 55, 555])
def test_fuzz_validity_asof_vs_model(spark, seed):
    from cozo_spark.datalog.engine import CozoDb

    rnd = random.Random(seed)
    db = CozoDb(spark)
    rel = f"vh_{seed}"
    db.run_script(f":create {rel} {{k: Int, vld: Validity => v: Int}}")

    # random history: per key, events at distinct timestamps
    history = []
    used = set()
    for _ in range(40):
        k = rnd.randint(0, 6)
        ts = rnd.randint(1, 500)
        if (k, ts) in used:
            continue
        used.add((k, ts))
        history.append((k, ts, rnd.random() < 0.6, rnd.randint(0, 99)))

    vals = ", ".join(
        f"[{k}, [{ts}, {'true' if a else 'false'}], {v}]"
        for k, ts, a, v in history)
    db.run_script(f"?[k, vld, v] <- [{vals}] :put {rel} {{k, vld => v}}")

    for _ in range(12):
        at = rnd.randint(0, 520)
        got = {r[0]: r[1] for r in
               db.run_script(f"?[k, v] := *{rel}{{k, v @ {at}}}").rows}
        want = _model_read(history, at)
        assert got == want, (at, got, want)

    # reads exactly AT event timestamps (boundary: ts <= T includes T)
    for k, ts, a, v in rnd.sample(history, 6):
        got = {r[0]: r[1] for r in
               db.run_script(f"?[k, v] := *{rel}{{k, v @ {ts}}}").rows}
        want = _model_read(history, ts)
        assert got == want, (ts, got, want)
