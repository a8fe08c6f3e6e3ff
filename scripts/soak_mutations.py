"""Steady-state soak of the async write path (VERDICT r10 #3).

One session, N mixed operations (default 1000) against two relations:
weighted put / rm / read / full-scan, with a changefeed subscriber
attached to one relation. Asserts, continuously:

- read correctness against a Python-side model (latest-wins dict),
  sampled every SAMPLE_EVERY ops and fully at the end;
- bounded pending width (<= 4x _COMPACT_EVERY + in-flight slack);
- no worker-thread leak: live cozo-lsm-* threads <= 2 per relation
  (one major + one minor), total python thread count bounded;
- bounded driver memory proxies: JVM spark cache/persistent RDD count
  and the engine's plan/skeleton cache sizes do not grow linearly
  with op count;
- zero lost changefeed events for the live subscriber.

Prints ONE JSON line with throughput + the peak gauges.

Usage: python scripts/soak_mutations.py [n_ops]
"""

from __future__ import annotations

import json
import os
import random
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SAMPLE_EVERY = 50


def main() -> None:
    n_ops = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    from cozo_spark.session import get_spark
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.streaming.changefeed import attach_changefeed
    import tempfile

    spark = get_spark("soak_mutations")
    spark.sparkContext.setLogLevel("ERROR")
    db = CozoDb(spark)
    db.run_script(":create a {k: Int => v: Int}")
    db.run_script(":create b {k: Int => v: Int}")
    spool = tempfile.mkdtemp(prefix="soak_spool_")
    feed = attach_changefeed(db, spool)
    feed_events = []
    feed.register_callback("a", lambda op, rows: feed_events.append((op, len(rows))))

    model = {"a": {}, "b": {}}
    rng = random.Random(11)
    t_threads0 = threading.active_count()
    peak = {"threads": 0, "lsm_threads": 0, "pending_a": 0, "pending_b": 0,
            "persistent_rdds": 0, "max_op_s": 0.0}
    n_feed_muts = 0
    errors = []

    def lsm_thread_count():
        return sum(1 for t in threading.enumerate()
                   if t.name.startswith("cozo-lsm-"))

    def check_sample(i):
        rel = rng.choice(["a", "b"])
        got = {r[0]: r[1] for r in
               db.run_script_df(f"?[k,v] := *{rel}{{k,v}}").collect()}
        if got != model[rel]:
            extra = {k: v for k, v in got.items() if model[rel].get(k) != v}
            missing = {k: v for k, v in model[rel].items() if got.get(k) != v}
            errors.append(f"op {i}: {rel} diverged "
                          f"(+{len(extra)} wrong, -{len(missing)} missing)")

    t0 = time.time()
    for i in range(n_ops):
        rel = "a" if rng.random() < 0.6 else "b"
        r = rng.random()
        s = time.time()
        if r < 0.55:  # put (sometimes multi-row)
            rows = [[rng.randrange(400), rng.randrange(10_000)]
                    for _ in range(rng.choice([1, 1, 1, 3]))]
            lit = ", ".join(f"[{k}, {v}]" for k, v in rows)
            db.run_script(f"?[k, v] <- [{lit}] :put {rel} {{k => v}}")
            byk = {}
            for k, v in rows:  # largest tuple per key wins within a batch
                byk[k] = max(byk.get(k, v), v)
            model[rel].update(byk)
            if rel == "a":
                n_feed_muts += 1
        elif r < 0.70:  # rm (lenient)
            k = rng.randrange(400)
            db.run_script(f"?[k] <- [[{k}]] :rm {rel} {{k}}")
            model[rel].pop(k, None)
            if rel == "a":
                n_feed_muts += 1
        elif r < 0.84:  # point-ish read
            k = rng.randrange(400)
            got = db.run_script_df(
                f"?[v] := *{rel}{{k: {k}, v}}").collect()
            want = model[rel].get(k)
            have = got[0][0] if got else None
            if want != have:
                errors.append(f"op {i}: point read {rel}[{k}] = {have}, "
                              f"want {want}")
        elif r < 0.92:  # PREPARED read with a fresh param (template +
            # skeleton machinery under mutation pressure: the write-path
            # sweep must keep binds correct, never stale)
            lo = rng.randrange(10_000)
            got = {row[0]: row[1] for row in db.run_script_df(
                f"sup[k, v] := *{rel}{{k, v}}, v >= $lo\n"
                f"?[k, v] := sup[k, v]", {"lo": lo}).collect()}
            want = {k: v for k, v in model[rel].items() if v >= lo}
            if got != want:
                errors.append(f"op {i}: prepared read {rel} lo={lo} "
                              f"diverged ({len(got)} vs {len(want)})")
        else:  # aggregate full scan
            got = db.run_script_df(f"?[count(k)] := *{rel}{{k}}").collect()
            if int(got[0][0] or 0) != len(model[rel]):
                errors.append(f"op {i}: count({rel}) = {got[0][0]}, "
                              f"want {len(model[rel])}")
        peak["max_op_s"] = max(peak["max_op_s"], time.time() - s)
        if i % 10 == 0:
            peak["threads"] = max(peak["threads"], threading.active_count())
            peak["lsm_threads"] = max(peak["lsm_threads"], lsm_thread_count())
            for nm in ("a", "b"):
                peak[f"pending_{nm}"] = max(
                    peak[f"pending_{nm}"],
                    len(db.relations[nm].lsm_pending))
            jsc = spark.sparkContext._jsc.sc()
            peak["persistent_rdds"] = max(peak["persistent_rdds"],
                                          jsc.getPersistentRDDs().size())
        if i % SAMPLE_EVERY == 0:
            check_sample(i)
    wall = time.time() - t0

    # drain and final full check
    for nm in ("a", "b"):
        rel = db.relations[nm]
        deadline = time.time() + 120
        while time.time() < deadline:
            t = rel.lsm_thread or rel.lsm_minor_thread
            if t is None and not rel.lsm_compacting and not rel.lsm_minor_inflight:
                break
            time.sleep(0.1)
        got = {r[0]: r[1] for r in
               db.run_script_df(f"?[k,v] := *{nm}{{k,v}}").collect()}
        if got != model[nm]:
            errors.append(f"final: {nm} diverged ({len(got)} rows vs "
                          f"{len(model[nm])})")
    feed.flush()
    n_feed_events = len(feed_events)

    # distinguish PINNED checkpoint blocks from awaiting-GC ones: anything
    # still persisted after a full py+JVM GC cycle is genuinely referenced
    # (caches, lsm state); growth here across n_ops would be a real leak
    import gc
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)
    jsc = spark.sparkContext._jsc.sc()
    rdds_after_gc = jsc.getPersistentRDDs().size()

    threads_after = threading.active_count()
    # leak gauge on NAMED worker threads, not the global count: Spark/py4j
    # spin transient daemons and a chained major can respawn right after
    # the drain loop's last observation — neither is a leak (r11 review)
    lsm_after = lsm_thread_count()
    ok = (not errors
          and n_feed_events == n_feed_muts
          and peak["pending_a"] <= 4 * db._COMPACT_EVERY + 1
          and peak["pending_b"] <= 4 * db._COMPACT_EVERY + 1
          and peak["lsm_threads"] <= 4  # 2 relations x (major + minor)
          and lsm_after <= 2  # at most one freshly-respawned chain
          # pinned (post-GC) checkpoint blocks must be O(caches + live LSM
          # state), flat in op count — growth here is a true lineage leak
          and rdds_after_gc <= 40)
    print(json.dumps({
        "ok": ok, "n_ops": n_ops, "wall_s": round(wall, 1),
        "ops_per_s": round(n_ops / wall, 2),
        "max_op_s": round(peak["max_op_s"], 2),
        "peak_threads": peak["threads"],
        "peak_lsm_threads": peak["lsm_threads"],
        "lsm_threads_end": lsm_after,
        "threads_start": t_threads0, "threads_end": threads_after,
        "peak_pending": [peak["pending_a"], peak["pending_b"]],
        "peak_persistent_rdds": peak["persistent_rdds"],
        "persistent_rdds_after_gc": rdds_after_gc,
        "feed_events": n_feed_events, "feed_muts": n_feed_muts,
        "rows_final": [len(model["a"]), len(model["b"])],
        "errors": errors[:10],
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
