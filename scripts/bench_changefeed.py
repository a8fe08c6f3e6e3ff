"""SSE changefeed under sustained mutation load (r9, VERDICT r8 #8).

The reference's callback loop (runtime/callback.rs) is its weakest scaling
story — a bounded crossbeam channel that blocks the committing thread when
a subscriber stalls. Our /changes SSE route now bounds each subscriber
queue and DISCONNECTS slow consumers instead (server.py _sse_changes).
This harness measures the steady state:

- N subscribers attached to /changes/{rel} over real HTTP connections;
- a driver loop issuing M `:put` mutations (small rows — the callback/
  fan-out cost, not Spark job cost, is what's under test here; the Spark
  collect per mutation dominates and is reported separately);
- reports mutations/s, per-subscriber delivered events, fan-out
  events/s, and whether any subscriber queue overflowed;
- one deliberately STALLED subscriber confirms mutations keep flowing and
  the stalled connection is cut with an `event: overflow` notice instead
  of growing without bound.

Usage: python scripts/bench_changefeed.py [n_subscribers] [n_mutations]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sse_reader(port: int, relation: str, events: list, stop: threading.Event,
                stall: bool = False, auth: str | None = None):
    """Raw-socket SSE client (urllib buffers too aggressively for SSE)."""
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    if stall:
        # a tiny receive window makes the server's writes block after a few
        # KB instead of after megabytes of TCP buffering — the overflow
        # path triggers at realistic event counts
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
    s.settimeout(120)
    s.connect(("127.0.0.1", port))
    req = (f"GET /changes/{relation} HTTP/1.1\r\n"
           f"Host: 127.0.0.1\r\n"
           + (f"x-cozo-auth: {auth}\r\n" if auth else "")
           + "\r\n")
    s.sendall(req.encode())
    if stall:
        # never read: the server-side queue must hit its bound and the
        # server must cut us loose without blocking mutations
        stop.wait()
        s.close()
        return
    buf = b""
    s.settimeout(1.0)
    while not stop.is_set():
        try:
            chunk = s.recv(65536)
        except socket.timeout:
            continue
        except OSError:
            break
        if not chunk:
            break
        buf += chunk
        while b"\n\n" in buf:
            frame, buf = buf.split(b"\n\n", 1)
            if b"data:" in frame:
                events.append(frame)
    s.close()


def main() -> None:
    n_subs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_muts = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from cozo_spark.session import get_spark
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.server import CozoServer
    from cozo_spark.streaming.changefeed import attach_changefeed
    import tempfile

    spark = get_spark("bench_changefeed")
    spark.sparkContext.setLogLevel("ERROR")
    db = CozoDb(spark)
    tmp = tempfile.mkdtemp(prefix="cfeed_")
    attach_changefeed(db, os.path.join(tmp, "spool"))
    db.run_script("?[k, v] <- [[0, 0]] :create feed {k => v}")

    srv = CozoServer(db, port=0)
    srv.start()
    port = srv.port

    stop = threading.Event()
    subs = []
    for i in range(n_subs):
        ev: list = []
        t = threading.Thread(target=_sse_reader,
                             args=(port, "feed", ev, stop), daemon=True)
        t.start()
        subs.append((t, ev))
    stalled_ev: list = []
    t_stall = threading.Thread(target=_sse_reader,
                               args=(port, "feed", stalled_ev, stop, True),
                               daemon=True)
    t_stall.start()
    time.sleep(1.0)  # let subscriptions register

    t0 = time.perf_counter()
    for i in range(1, n_muts + 1):
        db.run_script(f"?[k, v] <- [[{i}, {i * 7}]] :put feed {{k => v}}")
    mut_wall = time.perf_counter() - t0
    # drain: every live subscriber should receive all n_muts events
    deadline = time.time() + 60
    while time.time() < deadline:
        if all(len(ev) >= n_muts for _, ev in subs):
            break
        time.sleep(0.2)
    drain_wall = time.perf_counter() - t0
    stop.set()

    delivered = [len(ev) for _, ev in subs]
    feed = db.changefeed
    out = {
        "metric": "changefeed_sse_load",
        "n_subscribers": n_subs,
        "n_mutations": n_muts,
        "mutations_per_s": round(n_muts / mut_wall, 2),
        "mutation_wall_s": round(mut_wall, 2),
        "drain_wall_s": round(drain_wall, 2),
        "delivered_min": min(delivered),
        "delivered_max": max(delivered),
        "fanout_events_per_s": round(sum(delivered) / drain_wall, 1),
        "all_live_subs_complete": all(d >= n_muts for d in delivered),
    }
    stop.set()
    time.sleep(1.5)  # live readers drop; their callbacks get cut on next put

    # --- phase 2: stalled-subscriber overflow (bounded-queue proof) -------
    # A never-reading client: the OS socket buffer fills first, then the
    # handler blocks on write, then the queue fills to capacity, then the
    # subscriber is CUT — mutations must keep flowing throughout. Large
    # multi-row puts (one callback event each, ~300KB JSON) overwhelm the
    # stalled client's shrunken receive window + the server send buffer in
    # ~15 events; capacity is lowered to 4 to keep the run short.
    import cozo_spark.server as srv_mod
    saved_cap = srv_mod.SSE_QUEUE_CAPACITY
    srv_mod.SSE_QUEUE_CAPACITY = 4
    db.run_script("?[k, v] <- [[0, 'seed']] :create feed_big {k => v}")
    stop2 = threading.Event()
    t_stall = threading.Thread(
        target=_sse_reader, args=(port, "feed_big", [], stop2, True),
        daemon=True)
    t_stall.start()
    time.sleep(1.0)
    big = "x" * 1024
    rows = ", ".join(f"[{1000 + j}, '{big}']" for j in range(300))
    t0 = time.perf_counter()
    n_big = 24
    cut_at = None
    for i in range(n_big):
        db.run_script(f"?[k, v] <- [{rows}] :put feed_big {{k => v}}")
        if cut_at is None and not any(
                feed.callbacks.get("feed_big", ())):
            cut_at = i + 1
    stall_wall = time.perf_counter() - t0
    out.update({
        "stall_mutations": n_big,
        "stall_wall_s": round(stall_wall, 2),
        "stall_mutations_per_s": round(n_big / stall_wall, 2),
        # the stalled subscriber must have been unregistered mid-run; no
        # callback (and no unbounded queue) survives it
        "stalled_cut": not any(feed.callbacks.get("feed_big", ())),
        "stalled_cut_after_mutations": cut_at,
    })
    stop2.set()
    srv_mod.SSE_QUEUE_CAPACITY = saved_cap
    srv.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
