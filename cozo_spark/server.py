"""HTTP API shim over the engine — the cozo-bin server surface.

Mirrors cozo-bin/src/server.rs:243-260 (routes) on the Python stdlib
ThreadingHTTPServer — no extra dependencies, one thread per request, the
SparkSession is shared (Spark is thread-safe for job submission; heavy work
runs on executors, the HTTP layer only drives plans and collects results).

| route | reference | here |
|---|---|---|
| POST /text-query            | server.rs:245 | run_script(script, params) → NamedRows JSON |
| GET  /export/{rels}         | server.rs:246 | export_relations (comma-separated names) |
| PUT  /import                | server.rs:247 | import_relations(payload) |
| POST /backup                | server.rs:248 | JSON snapshot of every stored relation to a file |
| POST /import-from-backup    | server.rs:249 | restore selected relations from a snapshot |
| GET  /changes/{relation}    | server.rs:249 (SSE) | SSE stream fed by the mutation callback bus |
| POST /transact, /transact/{id} | server.rs:255-256 | interactive MultiTransaction sessions |

| GET  /rules/{name}?arity=N  | server.rs:250 (SSE) | remote custom rule: registers the rule; each invocation streams a `request` event (id, inputs, options) to the client |
| POST /rule-result/{id}      | server.rs:251-254 | client posts the rule's NamedRows result (DELETE = cancel) |

Auth parity: like the reference (which requires an auth token off loopback),
pass ``auth_token=...`` to require an ``x-cozo-auth`` header on every request.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


# Per-SSE-subscriber queue bound (r9): mirrors the reference's optional
# bounded callback channel capacity (db.rs register_callback), but a full
# queue disconnects the slow subscriber instead of blocking the committing
# thread — see _sse_changes. 1024 mutation batches of lag is far beyond any
# live consumer; a reader that far behind must re-sync anyway.
SSE_QUEUE_CAPACITY = 1024
_SSE_OVERFLOW = object()  # sentinel: wake the drain loop to emit the notice


class CozoServer:
    """Serve a CozoDb over HTTP. ``port=0`` picks a free port (tests)."""

    def __init__(self, db, host: str = "127.0.0.1", port: int = 0,
                 auth_token: Optional[str] = None):
        self.db = db
        self.auth_token = auth_token
        self._txn_lock = threading.Lock()
        self._txns: dict[int, object] = {}
        self._txn_seq = 0
        # remote custom rules (server.rs:250-254): pending invocation slots
        # keyed by request id, resolved by POST/DELETE /rule-result/{id}
        self._rule_lock = threading.Lock()
        self._rule_seq = 0
        self._pending_rules: dict[int, dict] = {}
        self.rule_timeout = 60.0
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.daemon_threads = True
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "CozoServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()

    # -- transaction registry ------------------------------------------------

    def open_txn(self, write: bool) -> int:
        with self._txn_lock:
            self._txn_seq += 1
            tid = self._txn_seq
            self._txns[tid] = self.db.multi_transaction(write=write)
        return tid

    def get_txn(self, tid: int):
        txn = self._txns.get(tid)
        if txn is None:
            raise KeyError(f"no such transaction {tid}")
        return txn

    def close_txn(self, tid: int) -> None:
        self._txns.pop(tid, None)


def _make_handler(server: CozoServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # -- plumbing ---------------------------------------------------------

        def log_message(self, fmt, *args):  # quiet
            pass

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            if n == 0:
                return {}
            return json.loads(self.rfile.read(n).decode("utf-8"))

        def _json(self, payload: dict, status: int = 200) -> None:
            data = json.dumps(payload, default=str).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _err(self, exc: Exception, status: int = 400) -> None:
            self._json({"ok": False, "message": str(exc)}, status)

        def _authed(self) -> bool:
            if server.auth_token is None:
                return True
            if self.headers.get("x-cozo-auth") == server.auth_token:
                return True
            self._json({"ok": False, "message": "unauthorized"}, 401)
            return False

        # -- routes -----------------------------------------------------------

        def do_POST(self):
            if not self._authed():
                return
            try:
                if self.path == "/text-query":
                    body = self._body()
                    res = server.db.run_script(body["script"], body.get("params") or {})
                    if isinstance(res, list):  # multi-result %return
                        self._json({"ok": True,
                                    "results": [r.as_dict() for r in res]})
                    else:
                        self._json({"ok": True, **res.as_dict()})
                elif self.path == "/backup":
                    body = self._body()
                    names = list(server.db.relations)
                    snap = server.db.export_relations(names)
                    with open(body["path"], "w") as f:
                        json.dump({"relations": snap}, f, default=str)
                    self._json({"ok": True, "relations": names})
                elif self.path == "/import-from-backup":
                    body = self._body()
                    with open(body["path"]) as f:
                        snap = json.load(f)["relations"]
                    want = body.get("relations") or list(snap)
                    server.db.import_relations({k: v for k, v in snap.items() if k in want})
                    self._json({"ok": True, "relations": want})
                elif self.path.startswith("/rule-result/"):
                    rid = int(self.path.rsplit("/", 1)[1])
                    body = self._body()
                    with server._rule_lock:
                        slot = server._pending_rules.pop(rid, None)
                    if slot is None:
                        self._json({"ok": False}, 404)
                    else:
                        slot["rows"] = body
                        slot["event"].set()
                        self._json({"ok": True})
                elif self.path == "/transact":
                    body = self._body()
                    tid = server.open_txn(write=bool(body.get("write", True)))
                    self._json({"ok": True, "id": tid})
                elif self.path.startswith("/transact/"):
                    tid = int(self.path.rsplit("/", 1)[1])
                    body = self._body()
                    res = server.get_txn(tid).run_script(
                        body["script"], body.get("params") or {})
                    if isinstance(res, list):
                        self._json({"ok": True,
                                    "results": [r.as_dict() for r in res]})
                    else:
                        self._json({"ok": True, **res.as_dict()})
                else:
                    self._json({"ok": False, "message": "not found"}, 404)
            except Exception as e:  # surface engine errors as 400s
                self._err(e)

        def do_PUT(self):
            if not self._authed():
                return
            try:
                if self.path == "/import":
                    server.db.import_relations(self._body())
                    self._json({"ok": True})
                elif self.path.startswith("/transact/"):
                    tid = int(self.path.rsplit("/", 1)[1])
                    body = self._body()
                    txn = server.get_txn(tid)
                    if body.get("abort"):
                        txn.abort()
                    else:
                        txn.commit()
                    server.close_txn(tid)
                    self._json({"ok": True})
                else:
                    self._json({"ok": False, "message": "not found"}, 404)
            except Exception as e:
                self._err(e)

        def do_DELETE(self):
            if not self._authed():
                return
            try:
                if self.path.startswith("/rule-result/"):
                    rid = int(self.path.rsplit("/", 1)[1])
                    with server._rule_lock:
                        slot = server._pending_rules.pop(rid, None)
                    if slot is None:
                        self._json({"ok": False}, 404)
                    else:
                        slot["err"] = "downstream cancelled computation"
                        slot["event"].set()
                        self._json({"ok": True})
                else:
                    self._json({"ok": False, "message": "not found"}, 404)
            except Exception as e:
                self._err(e)

        def do_GET(self):
            if not self._authed():
                return
            try:
                if self.path.startswith("/export/"):
                    names = [n for n in self.path[len("/export/"):].split(",") if n]
                    self._json({"ok": True, "data": server.db.export_relations(names)})
                elif self.path.startswith("/changes/"):
                    self._sse_changes(self.path[len("/changes/"):])
                elif self.path.startswith("/rules/"):
                    raw = self.path[len("/rules/"):]
                    name, _, qs = raw.partition("?")
                    arity = None
                    for kv in qs.split("&"):
                        if kv.startswith("arity="):
                            arity = int(kv[len("arity="):])
                    self._sse_rules(name, arity)
                else:
                    self._json({"ok": False, "message": "not found"}, 404)
            except Exception as e:
                self._err(e)

        def _sse_rules(self, name: str, arity=None) -> None:
            """Remote custom rule channel (server.rs:250 register_rule):
            registering the SSE stream registers a fixed rule of that name;
            each engine invocation becomes a `request` event with collected
            inputs + options, and the rule call BLOCKS until the client
            POSTs /rule-result/{id} (or DELETEs it / times out) — exactly
            the reference's SimpleFixedRule::rule_with_channel protocol."""
            req_q: queue.Queue = queue.Queue()

            def remote_rule(inputs, options=None):
                with server._rule_lock:
                    server._rule_seq += 1
                    rid = server._rule_seq
                    slot = {"event": threading.Event(), "rows": None, "err": None}
                    server._pending_rules[rid] = slot
                req_q.put({
                    "type": "request", "id": rid,
                    "inputs": [{"headers": list(df.columns),
                                "rows": [list(r) for r in df.collect()]}
                               for df in inputs],
                    "options": dict(options or {}),
                })
                if not slot["event"].wait(timeout=server.rule_timeout):
                    with server._rule_lock:
                        server._pending_rules.pop(rid, None)
                    raise RuntimeError(f"remote rule {name!r} timed out")
                if slot["err"] is not None:
                    raise RuntimeError(slot["err"])
                nr = slot["rows"] or {}
                rows = [tuple(r) for r in nr.get("rows", [])]
                if arity is not None and rows and len(rows[0]) != arity:
                    # the reference's SimpleFixedRule validates declared arity
                    raise RuntimeError(
                        f"remote rule {name!r} posted arity {len(rows[0])}, "
                        f"declared {arity}")
                headers = list(nr.get("headers") or [])
                if not headers and rows:
                    headers = [f"_{i}" for i in range(len(rows[0]))]
                if not headers and arity is not None:
                    headers = [f"_{i}" for i in range(arity)]
                if not rows:
                    from pyspark.sql import types as T
                    return server.db.spark.createDataFrame([], T.StructType(
                        [T.StructField(h, T.StringType(), True) for h in headers]))
                from cozo_spark.plans.local import local_frame
                return local_frame(server.db.spark, rows, headers)

            remote_rule._cozo_remote_rule = True
            try:
                server.db.register_fixed_rule(name, remote_rule)
            except ValueError as e:
                # name conflict. A conflicting REMOTE rule is a stale
                # registration from a dropped stream (the old handler only
                # notices the broken pipe at its next 10s keep-alive) — a
                # reconnecting client must be able to displace it
                # immediately. Builtins and user rules stay protected
                # (reference db.rs:760-777 bails the same way).
                from cozo_spark.fixed_rules import _REGISTRY
                prev = _REGISTRY.get(name)
                if prev is not None and getattr(prev, "_cozo_remote_rule", False):
                    server.db.unregister_fixed_rule(name)
                    server.db.register_fixed_rule(name, remote_rule)
                else:
                    self._json({"ok": False, "message": str(e)}, 409)
                    return
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            try:
                while True:
                    try:
                        payload = req_q.get(timeout=10.0)
                    except queue.Empty:
                        # keep-alive probe doubles as disconnect detection
                        self.wfile.write(b": keep-alive\n\n")
                        self.wfile.flush()
                        continue
                    msg = json.dumps(payload, default=str)
                    self.wfile.write(f"data: {msg}\n\n".encode("utf-8"))
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                return
            finally:
                # dropping the stream unregisters the rule (reference Guard)
                # — but only OUR registration: a reconnected client may have
                # re-registered the name before this stale thread noticed
                from cozo_spark.fixed_rules import _REGISTRY
                if _REGISTRY.get(name) is remote_rule:
                    try:
                        server.db.unregister_fixed_rule(name)
                    except ValueError:
                        pass  # builtin names can never be ours; be tolerant

        def _sse_changes(self, relation: str) -> None:
            """SSE mutation feed (server.rs:249): one `data:` event per
            mutation batch, fed by the in-process callback bus.

            The per-subscriber queue is BOUNDED (r9, VERDICT r8 #8). The
            reference's register_callback takes an optional capacity and a
            full bounded crossbeam channel BLOCKS the committing thread
            (db.rs:785-797 + callback.rs send) — backpressure into the
            writer. A shared HTTP server must not let one stalled browser
            stall every mutation, so on overflow we instead DISCONNECT the
            slow subscriber: a final `event: overflow` frame is sent and
            the stream closes (the client reconnects and re-syncs via
            /export or the spool). Mutations never block, queues never
            grow beyond SSE_QUEUE_CAPACITY."""
            feed = getattr(server.db, "changefeed", None)
            if feed is None:
                self._json({"ok": False, "message": "no changefeed attached"}, 400)
                return
            q: queue.Queue = queue.Queue(maxsize=SSE_QUEUE_CAPACITY)
            overflowed = threading.Event()

            def cb(op, rows):
                if overflowed.is_set():
                    return
                try:
                    q.put_nowait((op, rows))
                except queue.Full:
                    overflowed.set()
                    feed.unregister_callback(relation, cb)
                    try:  # wake the drain loop so it can emit the notice
                        q.put_nowait(_SSE_OVERFLOW)
                    except queue.Full:
                        pass  # drain loop will see the event flag

            feed.register_callback(relation, cb)
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            try:
                while True:
                    item = q.get()
                    if item is _SSE_OVERFLOW or (
                            overflowed.is_set() and q.empty()):
                        if item is not _SSE_OVERFLOW:
                            op, rows = item
                            msg = json.dumps(
                                {"op": op, "relation": relation,
                                 "rows": rows}, default=str)
                            self.wfile.write(
                                f"data: {msg}\n\n".encode("utf-8"))
                        self.wfile.write(
                            b"event: overflow\ndata: "
                            b"{\"message\": \"subscriber too slow; "
                            b"stream closed\"}\n\n")
                        self.wfile.flush()
                        return
                    op, rows = item
                    msg = json.dumps({"op": op, "relation": relation, "rows": rows},
                                     default=str)
                    self.wfile.write(f"data: {msg}\n\n".encode("utf-8"))
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                return  # client hung up
            finally:
                # drop this subscriber so its queue/closure don't leak and
                # every later mutation stops feeding a dead connection
                feed.unregister_callback(relation, cb)

    return Handler
