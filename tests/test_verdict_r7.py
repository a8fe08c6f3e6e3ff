"""Round-7 VERDICT directive 8: observable-metric delivery in
reliable-checkpoint mode.

Spark delivers Observation metrics on ANY action since 3.3 — including
``Dataset.checkpoint(eager=True)``. These tests pin that behavior on the
shipped Spark (the precondition for unifying _checkpoint_count /
_checkpoint_count_bytes to one action in BOTH checkpoint modes) and that
the fixpoint machinery and Louvain produce identical results with a
reliable checkpoint dir configured."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def reliable_ck(spark, tmp_path):
    spark.conf.set("spark.cozo.checkpointDir", str(tmp_path / "ck"))
    try:
        yield str(tmp_path / "ck")
    finally:
        spark.conf.unset("spark.cozo.checkpointDir")


def test_observation_delivers_on_reliable_checkpoint(spark, tmp_path):
    """The Spark-level precondition, pinned directly."""
    from pyspark.sql import Observation

    spark.sparkContext.setCheckpointDir(str(tmp_path / "raw_ck"))
    obs = Observation("r7_ck_obs")
    out = (spark.range(500).withColumn("v", F.col("id") % 7)
           .observe(obs, F.count(F.lit(1)).alias("n"),
                    F.sum("v").alias("s"))
           .checkpoint(eager=True))
    got = obs.get
    assert got["n"] == 500
    assert got["s"] == sum(i % 7 for i in range(500))
    assert out.count() == 500


def test_checkpoint_count_single_action_reliable(spark, reliable_ck):
    from cozo_spark.datalog.fixpoint import (_checkpoint_count,
                                             _checkpoint_count_bytes)

    df = spark.range(321).withColumn("s", F.lit("xy"))
    out, n = _checkpoint_count(df)
    assert n == 321 and out.count() == 321
    out2, n2, b2 = _checkpoint_count_bytes(df)
    # 8 (long) + 8 + len("xy") per row
    assert n2 == 321 and b2 == 321 * (8 + 8 + 2)
    # the checkpoint actually went through the RELIABLE path
    assert out2.rdd.getNumPartitions() >= 1
    assert spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()


def test_fixpoint_equal_under_reliable_checkpoint(spark, reliable_ck):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.register_dataframe(
        "edge", spark.createDataFrame(
            [(i, i + 1) for i in range(30)] + [(7, 2), (20, 5)],
            "src long, dst long"))
    script = """
    reach[x, y] := *edge[x, y]
    reach[x, y] := reach[x, z], *edge[z, y]
    ?[x, y] := reach[x, y]
    """
    got = sorted(tuple(r) for r in db.run_script_df(script).collect())
    spark.conf.unset("spark.cozo.checkpointDir")
    want = sorted(tuple(r) for r in db.run_script_df(script).collect())
    assert got == want and len(got) > 30


def test_louvain_equal_under_reliable_checkpoint(spark, reliable_ck):
    from cozo_spark.fixed_rules.graphs import louvain_communities

    rows = ([(a, b, 1.0) for a in range(4) for b in range(4) if a != b]
            + [(a, b, 1.0) for a in range(10, 14) for b in range(10, 14)
               if a != b] + [(3, 10, 0.1)])
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = sorted(tuple(r) for r in louvain_communities(edges, local_threshold=0).collect())
    spark.conf.unset("spark.cozo.checkpointDir")
    want = sorted(tuple(r) for r in louvain_communities(edges, local_threshold=0).collect())
    assert got == want
    comm = {}
    for c, n in got:
        comm.setdefault(c, set()).add(n)
    assert set(frozenset(v) for v in comm.values()) == {
        frozenset(range(4)), frozenset(range(10, 14))}
