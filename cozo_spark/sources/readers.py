"""CsvReader / JsonReader / Constant fixed rules → native Spark readers.

Option contracts match the reference:
- CsvReader(types: [col-type strings], url, has_headers=true, delimiter=',',
  prepend_index=false)  — csv.rs:36-99
- JsonReader(url, fields: [names], json_lines=true, null_if_absent=false,
  prepend_index=false)  — jlines.rs:21-84
- Constant(data: [[...]])  — constant.rs

URLs: file:// and plain paths (http(s):// would route through a download to
a staging dir on a cluster; Spark reads distributed paths natively, which is
strictly more general than the reference's driver-side fetch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CSV_TYPE = {
    "Int": T.LongType(), "Int?": T.LongType(),
    "Float": T.DoubleType(), "Float?": T.DoubleType(),
    "String": T.StringType(), "String?": T.StringType(),
    "Bool": T.BooleanType(), "Bool?": T.BooleanType(),
    "Any": T.StringType(), "Any?": T.StringType(),
}


def _strip_url(url: str) -> str:
    """file:// → local path; http(s):// → fetched to a temp file (the
    reference's CsvReader/JsonReader accept both, csv.rs:56-99 — Hadoop's
    FS has no http scheme, so we stage the payload locally; on a cluster
    this runs on the driver and the temp file is parallelized like any
    local read)."""
    if url.startswith("file://"):
        return url[7:]
    if url.startswith(("http://", "https://")):
        import tempfile
        import urllib.request

        suffix = ".csv" if ".csv" in url else (".json" if ".json" in url else ".dat")
        with urllib.request.urlopen(url, timeout=60) as resp:
            data = resp.read()
        f = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
        f.write(data)
        f.close()
        return f.name
    return url


def _spark() -> SparkSession:
    return SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()


def csv_reader(inputs: list, options: dict | None = None) -> DataFrame:
    options = dict(options or {})
    types = options.get("types", [])
    url = _strip_url(options["url"])
    has_headers = options.get("has_headers", True)
    delimiter = options.get("delimiter", ",")
    prepend_index = options.get("prepend_index", False)
    fields = [T.StructField(f"column_{i}", _CSV_TYPE.get(str(t), T.StringType()),
                            str(t).endswith("?") or True)
              for i, t in enumerate(types)]
    reader = _spark().read.option("header", str(bool(has_headers)).lower()) \
        .option("delimiter", delimiter).option("mode", "PERMISSIVE")
    if fields:
        df = reader.schema(T.StructType(fields)).csv(url)
    else:
        df = reader.csv(url)
    if prepend_index:
        from pyspark.sql import Window as W

        df = df.withColumn("index", F.row_number().over(W.orderBy(F.monotonically_increasing_id())) - 1) \
               .select("index", *[c for c in df.columns])
    return df


def json_reader(inputs: list, options: dict | None = None) -> DataFrame:
    options = dict(options or {})
    url = _strip_url(options["url"])
    fields = options.get("fields", [])
    null_if_absent = options.get("null_if_absent", False)
    prepend_index = options.get("prepend_index", False)
    json_lines = options.get("json_lines", True)
    if json_lines:
        df = _spark().read.json(url)  # JSON-lines natively
    else:
        # jlines.rs:42: non-lines mode — whole-file JSON value (array of
        # objects / single object) via Spark's multiLine reader
        df = _spark().read.option("multiLine", "true").json(url)
    cols = []
    for f in fields:
        if f in df.columns:
            cols.append(F.col(f))
        elif null_if_absent:
            cols.append(F.lit(None).alias(f))
        else:
            raise KeyError(f"JsonReader: field {f!r} absent and null_if_absent is false")
    out = df.select(*cols) if cols else df
    if prepend_index:
        from pyspark.sql import Window as W

        out = out.withColumn("index", F.row_number().over(W.orderBy(F.monotonically_increasing_id())) - 1) \
                 .select("index", *[c for c in out.columns if c != "index"])
    return out


def constant(inputs: list, options: dict | None = None) -> DataFrame:
    data = (options or {}).get("data", [])
    spark = _spark()
    if not data:
        return spark.createDataFrame([], T.StructType([]))
    from cozo_spark.datalog.engine import CozoDb

    rows = [tuple(r) for r in data]
    names = [f"_{i}" for i in range(len(rows[0]))]
    from cozo_spark.plans.local import local_frame
    return local_frame(spark, rows, CozoDb._infer_schema(rows, names))


def export_relations(db, names: list) -> dict:
    """::export analogue (db.rs:448-530): {relation: {headers, rows}} JSON-able."""
    out = {}
    for n in names:
        rel = db.relations[n]
        out[n] = {"headers": rel.df.columns,
                  "rows": [list(r) for r in rel.df.collect()]}
    return out


def import_relations(db, payload: dict) -> None:
    """::import analogue (db.rs:531-620): rows are *put* (upserted by key)
    into pre-existing relations — existing rows with non-colliding keys
    survive, matching the reference's per-row tx.put loop."""
    from cozo_spark.datalog.fixpoint import _checkpoint

    for name, data in payload.items():
        if name not in db.relations:
            raise KeyError(f"relation {name!r} does not exist (::import requires pre-created schema)")
        rel = db.relations[name]
        rows = [tuple(r) for r in data["rows"]]
        headers = data.get("headers", rel.col_names)
        if rows:
            from cozo_spark.plans.local import local_frame
            df = local_frame(db.spark, rows,
                             rel.df.schema if headers == rel.col_names
                             else list(headers))
        else:
            df = db.spark.createDataFrame([], rel.df.schema)
        key_cols = [c.name for c in rel.keys]
        if key_cols:
            # the reference's per-row tx.put loop is last-write-wins per key:
            # dedup the payload by key first, else duplicate/colliding payload
            # keys would each survive the anti-join and break key uniqueness
            from pyspark.sql import Window, functions as F
            df = df.withColumn("__ord", F.monotonically_increasing_id())
            w = Window.partitionBy(*key_cols).orderBy(F.col("__ord").desc())
            df = (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn", "__ord"))
            kept = rel.df.join(df.select(*key_cols), key_cols, "left_anti")
            df = kept.unionByName(df)
        new_df = _checkpoint(df)
        # the swap invalidates any pending LSM bookkeeping (r9); under the
        # LSM lock so an in-flight background compaction can't install a
        # stale base over the imported state (r10)
        with rel.lsm_lock:
            rel.df = new_df
            rel.version += 1  # ::import is a logical write
            rel.pending_merges = 0
            rel.lsm_base, rel.lsm_pending, rel.lsm_rows = None, [], 0
            rel.lsm_base_layers = 0


def backup_parquet(db, directory: str) -> None:
    """Parquet snapshot backup — the scale path the reference serves with its
    sqlite-format backup (db.rs:621-758): one parquet dataset per stored
    relation + a JSON manifest carrying schema/keys/access/triggers. Unlike
    the JSON snapshot (/backup), this streams executor-side and never
    collects a relation to the driver."""
    import json
    import os

    os.makedirs(directory, exist_ok=True)
    manifest = {}
    for name, rel in db.relations.items():
        path = os.path.join(directory, f"{name}.parquet")
        rel.df.write.mode("overwrite").parquet(path)
        manifest[name] = {
            "keys": [(c.name, c.typing) for c in rel.keys],
            "non_keys": [(c.name, c.typing) for c in rel.non_keys],
            "access_level": rel.access_level,
            "put_triggers": list(rel.put_triggers),
            "rm_triggers": list(rel.rm_triggers),
            "replace_triggers": list(rel.replace_triggers),
        }
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def restore_parquet(db, directory: str) -> None:
    """Restore every relation from a backup_parquet directory. The restored
    registry replaces same-named relations wholesale (the reference's
    restore-from-backup requires an empty db; replacing is the DataFrame
    analogue)."""
    import json
    import os

    from cozo_spark.datalog.ast import ColDef
    from cozo_spark.datalog.engine import StoredRelation

    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    for name, meta in manifest.items():
        df = db.spark.read.parquet(os.path.join(directory, f"{name}.parquet"))
        rel = StoredRelation(
            name,
            [ColDef(n, t) for n, t in meta["keys"]],
            [ColDef(n, t) for n, t in meta["non_keys"]],
            df,
            access_level=meta.get("access_level", "normal"),
            put_triggers=list(meta.get("put_triggers", [])),
            rm_triggers=list(meta.get("rm_triggers", [])),
            replace_triggers=list(meta.get("replace_triggers", [])),
        )
        db.relations[name] = rel
