"""Round-10 directives from VERDICT r9 that aren't covered elsewhere.

#5: ::explain surfaces the PLANNED mode of mode-switching fixed rules
(centrality exact-vs-sampled + pivot count, Louvain gate side) so a user
inspecting a plan sees sampling before paying for the run — the
reference's explain emits a per-atom plan table (db.rs:968-1191).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _db(spark):
    from cozo_spark.datalog.engine import CozoDb

    return CozoDb(spark)


def _explain_rows(db, script):
    res = db.run_script(f"::explain {{ {script} }}")
    return [dict(zip(res.headers, r)) for r in res.rows]


def test_explain_names_centrality_mode_small_graph_exact(spark):
    db = _db(spark)
    edges = spark.range(200).select(
        (F.col("id") % 50).alias("fr"), ((F.col("id") * 3 + 1) % 50).alias("to"))
    db.register_dataframe("eexp", edges, keys=["fr", "to"])
    rows = _explain_rows(
        db, "?[n, c] <~ BetweennessCentralityDist(*eexp[])")
    modes = [r for r in rows if r["op"] == "planned_mode"]
    assert len(modes) == 1
    d = modes[0]["detail"]
    assert "mode=exact" in d and "pivots=" in d and "nodes=" in d, d
    # exact on a 50-node graph: pivots == nodes
    n = int(d.split("nodes=")[1].split()[0])
    p = int(d.split("pivots=")[1].split()[0])
    assert p == n


def test_explain_names_sampled_mode_above_auto_gate(spark, monkeypatch):
    from cozo_spark.fixed_rules import graphs as G

    monkeypatch.setattr(G, "AUTO_EXACT_MAX_NODES", 40)  # force the sample
    db = _db(spark)
    # need n where c*ln(n) < n (auto-pivots below the node count): 300
    edges = spark.range(900).select(
        (F.col("id") % 300).alias("fr"),
        ((F.col("id") * 7 + 1) % 300).alias("to"))
    db.register_dataframe("eexp2", edges, keys=["fr", "to"])
    rows = _explain_rows(
        db, "?[n, c] <~ ClosenessCentralityDist(*eexp2[])")
    d = [r for r in rows if r["op"] == "planned_mode"][0]["detail"]
    assert "mode=sampled" in d, d
    pivots = int(d.split("pivots=")[1].split()[0])
    nodes = int(d.split("nodes=")[1].split()[0])
    assert 0 < pivots < nodes
    # the explain-planned decision matches what the run actually records
    db.run_script("?[n, c] <~ ClosenessCentralityDist(*eexp2[])")
    info = db.last_fixed_rule_info()["ClosenessCentralityDist"]
    assert info["mode"] == "sampled" and info["pivots"] == pivots


def test_explain_names_louvain_gate_side(spark):
    db = _db(spark)
    edges = spark.range(60).select(
        (F.col("id") % 20).alias("fr"), ((F.col("id") + 1) % 20).alias("to"))
    db.register_dataframe("eexp3", edges, keys=["fr", "to"])
    rows = _explain_rows(
        db, "?[c, n] <~ CommunityDetectionLouvainDist(*eexp3[])")
    d = [r for r in rows if r["op"] == "planned_mode"][0]["detail"]
    assert "mode=driver_sequential" in d and "gate=" in d, d
    # forcing the distributed path flips the planned side
    rows2 = _explain_rows(
        db, "?[c, n] <~ CommunityDetectionLouvainDist(*eexp3[], "
            "local_threshold: 0)")
    d2 = [r for r in rows2 if r["op"] == "planned_mode"][0]["detail"]
    assert "mode=distributed" in d2, d2


def test_streaming_state_conf_changelog_sets_and_restores(spark):
    """#6: changelog=True selects the RocksDB provider + changelog
    checkpointing inside the window and restores the session confs after."""
    from cozo_spark.streaming.stateful import streaming_state_conf

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    cl_key = ("spark.sql.streaming.stateStore.rocksdb."
              "changelogCheckpointing.enabled")

    def _get(k):
        try:
            return spark.conf.get(k)
        except Exception:
            return None

    before = (_get(prov_key), _get(cl_key), _get("spark.sql.shuffle.partitions"))
    with streaming_state_conf(spark, state_partitions=8, changelog=True):
        assert "RocksDBStateStoreProvider" in spark.conf.get(prov_key)
        assert spark.conf.get(cl_key) == "true"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    assert (_get(prov_key), _get(cl_key),
            _get("spark.sql.shuffle.partitions")) == before


def test_explain_derived_input_reports_data_dependent(spark):
    db = _db(spark)
    edges = spark.range(20).select(
        (F.col("id") % 10).alias("fr"), ((F.col("id") + 1) % 10).alias("to"))
    db.register_dataframe("eexp4", edges, keys=["fr", "to"])
    rows = _explain_rows(db, """
    e[a, b] := *eexp4{fr: a, to: b}, a < 5
    ?[n, c] <~ BetweennessCentralityDist(e[])
    """)
    d = [r for r in rows if r["op"] == "planned_mode"][0]["detail"]
    assert "data-dependent" in d, d
