"""HTTP API shim tests — the cozo-bin server surface (server.rs:243-260)
served over stdlib ThreadingHTTPServer, exercised with urllib in-process."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest


def _req(port, path, method="GET", body=None, headers=None, timeout=30):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method,
        headers={"Content-Type": "application/json", **(headers or {})})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read().decode())


@pytest.fixture()
def server(spark, tmp_path):
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.server import CozoServer
    from cozo_spark.streaming.changefeed import attach_changefeed

    db = CozoDb(spark)
    attach_changefeed(db, str(tmp_path / "spool"))
    srv = CozoServer(db).start()
    yield srv
    srv.stop()


def test_text_query_roundtrip(server):
    _req(server.port, "/text-query", "POST",
         {"script": ":create kv {k: Int => v: String}"})
    _req(server.port, "/text-query", "POST",
         {"script": "?[k, v] <- [[1, 'a'], [2, 'b']] :put kv {k => v}"})
    res = _req(server.port, "/text-query", "POST",
               {"script": "?[k, v] := *kv[k, v], k >= $lo", "params": {"lo": 2}})
    assert res["ok"] and res["headers"] == ["k", "v"]
    assert res["rows"] == [[2, "b"]]


def test_text_query_pagination(server):
    """With row_page_size set on the served db, /text-query returns the
    reference's `next` continuation chain (db.rs:150-194) instead of one
    unbounded rows array."""
    server.db.row_page_size = 2
    try:
        res = _req(server.port, "/text-query", "POST",
                   {"script": "?[x] <- [[1],[2],[3],[4],[5]] :sort x"})
        assert res["ok"]
        assert [r[0] for r in res["rows"]] == [1, 2]
        assert [r[0] for r in res["next"]["rows"]] == [3, 4]
        assert res["next"]["next"]["rows"] == [[5]]
        assert res["next"]["next"]["next"] is None
    finally:
        server.db.row_page_size = None


def test_export_import_and_backup(server, tmp_path):
    _req(server.port, "/text-query", "POST",
         {"script": ":create t {k: Int => v: Int}"})
    _req(server.port, "/text-query", "POST",
         {"script": "?[k, v] <- [[1, 10]] :put t {k => v}"})
    exported = _req(server.port, "/export/t")["data"]
    assert exported["t"]["rows"] == [[1, 10]]

    # backup → wipe → restore
    bpath = str(tmp_path / "snap.json")
    assert _req(server.port, "/backup", "POST", {"path": bpath})["ok"]
    _req(server.port, "/text-query", "POST", {"script": "?[k] <- [[1]] :rm t {k}"})
    assert _req(server.port, "/export/t")["data"]["t"]["rows"] == []
    _req(server.port, "/import-from-backup", "POST",
         {"path": bpath, "relations": ["t"]})
    assert _req(server.port, "/export/t")["data"]["t"]["rows"] == [[1, 10]]

    # PUT /import merges rows directly
    _req(server.port, "/import", "PUT",
         {"t": {"headers": ["k", "v"], "rows": [[2, 20]]}})
    rows = _req(server.port, "/export/t")["data"]["t"]["rows"]
    assert sorted(rows) == [[1, 10], [2, 20]]


def test_transact_commit_and_conflict_isolation(server):
    _req(server.port, "/text-query", "POST",
         {"script": ":create acct {k: Int => v: Int}"})
    tid = _req(server.port, "/transact", "POST", {"write": True})["id"]
    _req(server.port, f"/transact/{tid}", "POST",
         {"script": "?[k, v] <- [[1, 100]] :put acct {k => v}"})
    # not visible outside the txn until commit
    out = _req(server.port, "/text-query", "POST",
               {"script": "?[k, v] := *acct[k, v]"})
    assert out["rows"] == []
    _req(server.port, f"/transact/{tid}", "PUT", {"commit": True})
    out = _req(server.port, "/text-query", "POST",
               {"script": "?[k, v] := *acct[k, v]"})
    assert out["rows"] == [[1, 100]]


def test_changes_sse_stream(server):
    _req(server.port, "/text-query", "POST",
         {"script": ":create ev {k: Int => v: Int}"})
    got = []

    def _listen():
        req = urllib.request.Request(f"http://127.0.0.1:{server.port}/changes/ev")
        with urllib.request.urlopen(req, timeout=60) as r:
            line = r.readline().decode()
            got.append(json.loads(line[len("data: "):]))

    t = threading.Thread(target=_listen, daemon=True)
    t.start()
    import time
    time.sleep(0.5)  # let the listener register its callback
    _req(server.port, "/text-query", "POST",
         {"script": "?[k, v] <- [[7, 70]] :put ev {k => v}"})
    t.join(timeout=30)
    assert got and got[0]["op"] == "put" and got[0]["relation"] == "ev"
    assert got[0]["rows"][0]["k"] == 7


def test_auth_token_enforced(spark, tmp_path):
    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.server import CozoServer

    srv = CozoServer(CozoDb(spark), auth_token="s3cret").start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(srv.port, "/text-query", "POST", {"script": "?[x] <- [[1]]"})
        assert ei.value.code == 401
        ok = _req(srv.port, "/text-query", "POST", {"script": "?[x] <- [[1]]"},
                  headers={"x-cozo-auth": "s3cret"})
        assert ok["rows"] == [[1]]
    finally:
        srv.stop()


def test_sse_unregisters_on_disconnect(server):
    """Regression (ADVICE r1): a disconnected SSE client's callback must be
    removed from the changefeed bus, not accumulate for the db's lifetime."""
    import time

    _req(server.port, "/text-query", "POST",
         {"script": ":create ev2 {k: Int => v: Int}"})
    feed = server.db.changefeed
    before = len(feed.callbacks.get("ev2", []))

    def _listen_one():
        req = urllib.request.Request(f"http://127.0.0.1:{server.port}/changes/ev2")
        with urllib.request.urlopen(req, timeout=60) as r:
            r.readline()  # read one event, then close the connection

    t = threading.Thread(target=_listen_one, daemon=True)
    t.start()
    time.sleep(0.5)
    assert len(feed.callbacks.get("ev2", [])) == before + 1
    _req(server.port, "/text-query", "POST",
         {"script": "?[k, v] <- [[1, 1]] :put ev2 {k => v}"})
    t.join(timeout=30)
    # handler's finally block runs after the write to the closed socket fails
    # on the NEXT mutation; poke once and poll for the unregister
    for _ in range(50):
        _req(server.port, "/text-query", "POST",
             {"script": "?[k, v] <- [[2, 2]] :put ev2 {k => v}"})
        if len(feed.callbacks.get("ev2", [])) == before:
            break
        time.sleep(0.2)
    assert len(feed.callbacks.get("ev2", [])) == before


def test_remote_custom_rule_roundtrip(server):
    """/rules/{name} SSE + /rule-result/{id} (server.rs:250-254): an HTTP
    client SERVES a fixed rule — the engine's invocation streams the inputs
    out and blocks until the client posts rows back."""
    import time

    ready = threading.Event()

    def _serve_rule():
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/rules/RemoteDouble")
        with urllib.request.urlopen(req, timeout=60) as r:
            ready.set()
            while True:
                line = r.readline().decode()
                if not line.startswith("data: "):
                    continue  # keep-alive / blank
                evt = json.loads(line[len("data: "):])
                assert evt["type"] == "request"
                rows = [[x[0] * 2] for x in evt["inputs"][0]["rows"]]
                _req(server.port, f"/rule-result/{evt['id']}", "POST",
                     {"headers": ["x"], "rows": rows})
                return

    t = threading.Thread(target=_serve_rule, daemon=True)
    t.start()
    assert ready.wait(timeout=30)
    time.sleep(0.3)  # rule registration happens at stream open
    res = _req(server.port, "/text-query", "POST", {
        "script": "nums[x] <- [[1], [2], [3]]\n?[x] <~ RemoteDouble(nums[x])"},
        timeout=60)
    assert sorted(r[0] for r in res["rows"]) == [2, 4, 6]
    t.join(timeout=10)
