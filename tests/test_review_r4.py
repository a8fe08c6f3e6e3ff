"""Regression tests for the round-4 code-review findings."""

from __future__ import annotations

import sys

import pytest


def test_lsh_xxhash_index_probe_and_update(spark):
    """The ::lsh 'hash' option must thread to the PROBE and incremental
    UPDATE paths — an md5 probe against an xxhash64 index never collides,
    silently returning empty results."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create xd {id: Int => t: String}")
    db.run_script(
        "?[id, t] <- [[1, 'the quick brown fox jumps over the lazy dog'], "
        "[2, 'entirely unrelated content about spark plans']] "
        ":put xd {id => t}")
    db.run_script("::lsh create xd:l {extractor: 't', n_perm: 32, "
                  "n_bands: 16, n_rows_in_band: 2, hash: 'xxhash64', "
                  "target_threshold: 0.3}")
    got = [r[0] for r in db.run_script(
        "?[id] := ~xd:l{id | query: 'the quick brown fox jumps over a "
        "lazy dog', k: 3}").rows]
    assert got == [1]
    # incremental :put must extend the index with the SAME hash
    db.run_script("?[id, t] <- [[3, 'the quick brown fox jumps over the "
                  "lazy cat']] :put xd {id => t}")
    got2 = set(r[0] for r in db.run_script(
        "?[id] := ~xd:l{id | query: 'the quick brown fox jumps over the "
        "lazy dog', k: 5}").rows)
    assert 1 in got2 and 3 in got2


def test_imperative_as_binding_consumes_page_chain(spark):
    """'{...} as _t' inside an imperative script must store ALL pages of a
    paginated result, not just page 1."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.row_page_size = 3
    rows = [[i] for i in range(10)]
    res = db.run_script(f"""
    {{ ?[x] <- {rows} }} as _t
    %return {{ ?[count(x)] := *_t[x] }}
    """)
    assert [list(r) for r in res.rows] == [[10]]


def test_as_dict_deep_chain_no_recursion_error(spark):
    """as_dict over thousands of pages must not hit the recursion limit."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.row_page_size = 1
    n = min(sys.getrecursionlimit() + 200, 1500)
    rows = [[i] for i in range(n)]
    d = db.run_script(f"?[x] <- {rows} :sort x").as_dict()
    count, cur = 0, d
    while cur is not None:
        count += len(cur["rows"])
        cur = cur["next"]
    assert count == n


def test_remote_rule_reconnect_displaces_stale_registration(spark):
    """A reconnecting remote-rule client must displace its own stale
    registration immediately (the old stream only notices the dropped pipe
    at its next keep-alive); builtins stay protected with 409."""
    import json
    import urllib.request
    import urllib.error
    import threading

    from cozo_spark.datalog.engine import CozoDb
    from cozo_spark.server import CozoServer

    db = CozoDb(spark)
    srv = CozoServer(db).start()
    try:
        def open_stream(name):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/rules/{name}")
            return urllib.request.urlopen(req, timeout=10)

        s1 = open_stream("ReconnRule")
        # reconnect under the same name WITHOUT closing s1 cleanly —
        # must succeed (displaces the stale remote registration)
        s2 = open_stream("ReconnRule")
        s1.close()
        s2.close()
        # builtins still 409
        with pytest.raises(urllib.error.HTTPError) as e:
            open_stream("PageRank")
        assert e.value.code == 409
    finally:
        srv.stop()


def test_txn_index_redefinition_is_a_write(spark):
    """Same-name index redefinition inside a txn must count as touching the
    relation — the commit publishes the txn's version, not the base's."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create ir {id: Int => t: String}")
    db.run_script("?[id, t] <- [[1, 'alpha beta']] :put ir {id => t}")
    db.run_script("::fts create ir:ft {extractor: 't'}")
    tx = db.multi_transaction()
    tx.run_script("::fts drop ir:ft")
    tx.run_script("::fts create ir:ft {extractor: 't', "
                  "filters: ['Lowercase', 'Stemmer(\\'english\\')']}")
    tx.commit()
    idx = db.relations["ir"].indices["ft"]
    assert "filters" in idx.options


def test_session_tz_instant_accepts_offset_zones(spark):
    """validity_asof's timestamp resolver must handle both region IDs and
    the offset formats Spark accepts for spark.sql.session.timeZone."""
    from cozo_spark.queries import _session_tz_instant

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = _session_tz_instant(spark, 2024, 3, 1)
        for tz, shift in [("+08:00", -8 * 3600), ("GMT+8", -8 * 3600),
                          ("-05:00", 5 * 3600), ("UTC+05:30", -19800)]:
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert _session_tz_instant(spark, 2024, 3, 1) == utc + shift, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
