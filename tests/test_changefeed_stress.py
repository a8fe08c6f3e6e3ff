"""Concurrent-mutator changefeed stress (VERDICT r10 #7).

The r10 async dispatch design (one ordered worker, seq assigned under
_emit_lock, per-subscriber isolation, the two-lock deadlock-proof shape)
was audited-correct but only single-writer measured. This drives N
threads mutating M relations with subscribers registering/unregistering
mid-stream and a deliberately tiny dispatch queue (forced backpressure),
asserting:

- completion without deadlock (the enqueue-under-_emit_lock path can
  always drain because the worker never takes _emit_lock);
- zero lost events for subscribers live from the start;
- per-producer monotonic delivery order per relation (each thread writes
  ascending values to its own key; the ordered worker must preserve the
  commit order the _emit_lock seq defined);
- the spool is contiguous: files changes-1..N, one per mutation, each
  parseable with the right relation.
"""

from __future__ import annotations

import json
import os
import queue as _queue
import threading


N_THREADS = 4           # two per relation
MUTS_PER_THREAD = 15


def test_concurrent_mutators_ordered_no_loss(spark, tmp_path):
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.streaming.changefeed import attach_changefeed

    db = CozoDb(spark)
    db.run_script(":create cfa {k: Int => v: Int}")
    db.run_script(":create cfb {k: Int => v: Int}")
    feed = attach_changefeed(db, str(tmp_path / "spool"))
    feed._q = _queue.Queue(maxsize=2)  # forced backpressure on enqueue

    delivered = {"cfa": [], "cfb": []}
    dl_lock = threading.Lock()

    def stable_cb(rel):
        def cb(op, rows):
            with dl_lock:
                delivered[rel].append((op, [(r["k"], r["v"]) for r in rows]))
        return cb

    feed.register_callback("cfa", stable_cb("cfa"))
    feed.register_callback("cfb", stable_cb("cfb"))

    churn_stop = threading.Event()
    churn_seen = []

    def churner():
        # register/unregister a transient subscriber in a tight loop —
        # takes feed._lock concurrently with deliveries and enqueues
        def tcb(op, rows):
            churn_seen.append(op)
        while not churn_stop.is_set():
            feed.register_callback("cfa", tcb)
            feed.unregister_callback("cfa", tcb)

    errors = []

    def mutator(tid):
        rel = "cfa" if tid % 2 == 0 else "cfb"
        try:
            for i in range(MUTS_PER_THREAD):
                db.run_script(
                    f"?[k, v] <- [[{tid}, {i}]] :put {rel} {{k => v}}")
        except Exception as e:  # pragma: no cover
            errors.append((tid, repr(e)))

    threads = [threading.Thread(target=mutator, args=(t,))
               for t in range(N_THREADS)]
    ct = threading.Thread(target=churner, daemon=True)
    ct.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
        assert not t.is_alive(), "mutator deadlocked"
    churn_stop.set()
    ct.join(timeout=10)
    feed.flush()
    assert not errors, errors

    total = N_THREADS * MUTS_PER_THREAD
    # zero loss for the from-the-start subscribers
    n_events = sum(len(v) for v in delivered.values())
    assert n_events == total, (n_events, total)
    # per-producer monotonic order within each relation's delivery stream
    for rel, evs in delivered.items():
        per_key: dict[int, list[int]] = {}
        for op, rows in evs:
            assert op == "put"
            for k, v in rows:
                per_key.setdefault(k, []).append(v)
        for k, vals in per_key.items():
            assert vals == sorted(vals), \
                f"{rel} key {k} delivered out of order: {vals}"
            assert vals == list(range(MUTS_PER_THREAD)), \
                f"{rel} key {k} lost events: {vals}"
    # contiguous spool: one file per mutation, seq 1..total, parseable
    spool = str(tmp_path / "spool")
    files = sorted(os.listdir(spool))
    assert len(files) == total
    assert files[0] == "changes-00000001.json"
    assert files[-1] == f"changes-{total:08d}.json"
    for fn in files[:5] + files[-5:]:
        with open(os.path.join(spool, fn)) as f:
            rec = json.loads(f.readline())
        assert rec["relation"] in ("cfa", "cfb")
    # final stored state agrees with the model
    for rel, keys in (("cfa", (0, 2)), ("cfb", (1, 3))):
        got = {r[0]: r[1] for r in
               db.run_script_df(f"?[k,v] := *{rel}{{k,v}}").collect()}
        assert got == {k: MUTS_PER_THREAD - 1 for k in keys}
