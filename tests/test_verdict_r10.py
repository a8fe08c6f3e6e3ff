"""Round-11 directives from VERDICT r10 that aren't covered elsewhere.

#6: sampled-mode centrality surfaces its accuracy boundary
PROGRAMMATICALLY — the truncation cap in the ::explain planned_mode row
(before the run) and the hit/not + depth facts in
last_fixed_rule_info() (after the run) — a log line is not an API. The
reference's explain table is the plan-visibility surface
(db.rs:968-1191).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _db(spark):
    from cozo_spark.datalog.engine import CozoDb

    return CozoDb(spark)


def _explain_rows(db, script):
    res = db.run_script(f"::explain {{ {script} }}")
    return [dict(zip(res.headers, r)) for r in res.rows]


def _chain_edges(spark, n):
    # a path graph: diameter n-1, so a small max_depth genuinely truncates
    return spark.range(n - 1).select(
        F.col("id").alias("fr"), (F.col("id") + 1).alias("to"))


def test_explain_sampled_mode_names_accuracy_cap(spark, monkeypatch):
    from cozo_spark.fixed_rules import graphs as G

    monkeypatch.setattr(G, "AUTO_EXACT_MAX_NODES", 40)
    db = _db(spark)
    db.register_dataframe("cap_e", _chain_edges(spark, 300),
                          keys=["fr", "to"])
    d = [r for r in _explain_rows(
        db, "?[n, c] <~ BetweennessCentralityDist(*cap_e[], max_depth: 7)")
        if r["op"] == "planned_mode"][0]["detail"]
    assert "mode=sampled" in d and "accuracy_cap=max_depth:7" in d, d
    d2 = [r for r in _explain_rows(
        db, "?[n, c] <~ ClosenessCentralityDist(*cap_e[])")
        if r["op"] == "planned_mode"][0]["detail"]
    assert "accuracy_cap=max_iterations:64" in d2, d2


def test_explain_exact_mode_has_no_accuracy_cap(spark):
    db = _db(spark)
    db.register_dataframe("cap_e2", _chain_edges(spark, 30),
                          keys=["fr", "to"])
    d = [r for r in _explain_rows(
        db, "?[n, c] <~ BetweennessCentralityDist(*cap_e2[])")
        if r["op"] == "planned_mode"][0]["detail"]
    assert "mode=exact" in d and "accuracy_cap" not in d, d


def test_betweenness_truncation_hit_lands_in_run_info(spark, monkeypatch):
    from cozo_spark.fixed_rules import graphs as G

    monkeypatch.setattr(G, "AUTO_EXACT_MAX_NODES", 40)
    db = _db(spark)
    db.register_dataframe("cap_e3", _chain_edges(spark, 300),
                          keys=["fr", "to"])
    db.run_script(
        "?[n, c] <~ BetweennessCentralityDist(*cap_e3[], max_depth: 5)")
    info = db.last_fixed_rule_info()["BetweennessCentralityDist"]
    assert info["mode"] == "sampled"
    assert info["truncated"] is True, info
    assert info["depth_reached"] == 5 and info["max_depth"] == 5
    assert info["auto_extended"] is False


def test_betweenness_no_truncation_reports_false(spark, monkeypatch):
    from cozo_spark.fixed_rules import graphs as G

    monkeypatch.setattr(G, "AUTO_EXACT_MAX_NODES", 40)
    db = _db(spark)
    # star graph: diameter 2, far under the cap
    e = spark.range(300).select(F.lit(0).alias("fr"),
                               (F.col("id") + 1).alias("to"))
    db.register_dataframe("cap_e4", e, keys=["fr", "to"])
    db.run_script(
        "?[n, c] <~ BetweennessCentralityDist(*cap_e4[], undirected: true)")
    info = db.last_fixed_rule_info()["BetweennessCentralityDist"]
    assert info["mode"] == "sampled"
    assert info["truncated"] is False, info
    assert info["depth_reached"] <= 2


def test_closeness_sampled_cap_lands_in_run_info(spark, monkeypatch):
    from cozo_spark.fixed_rules import graphs as G

    monkeypatch.setattr(G, "AUTO_EXACT_MAX_NODES", 40)
    db = _db(spark)
    db.register_dataframe("cap_e5", _chain_edges(spark, 300),
                          keys=["fr", "to"])
    db.run_script(
        "?[n, c] <~ ClosenessCentralityDist(*cap_e5[], max_iterations: 4)")
    info = db.last_fixed_rule_info()["ClosenessCentralityDist"]
    assert info["mode"] == "sampled"
    assert info["truncated"] is True, info
    assert info["iterations"] == 4 and info["iteration_cap"] == 4


def test_closeness_exact_auto_extend_reported(spark):
    db = _db(spark)
    # exact mode on a chain longer than the iteration cap: the cap
    # auto-extends (never silently truncates) and says so in run info
    db.register_dataframe("cap_e6", _chain_edges(spark, 12),
                          keys=["fr", "to"])
    db.run_script(
        "?[n, c] <~ ClosenessCentralityDist(*cap_e6[], max_iterations: 4)")
    info = db.last_fixed_rule_info()["ClosenessCentralityDist"]
    assert info["mode"] == "exact"
    assert info["truncated"] is False, info
    assert info["auto_extended"] is True and info["iterations"] > 4
