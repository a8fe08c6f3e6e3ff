"""cozo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CozoDB (reference: cozodb/cozo v0.7).

Architecture (Spark-first, NOT a port):

- ``cozo_spark.session``      — tuned SparkSession factory.
- ``cozo_spark.registry``     — stored-relation registry (schema, PK upsert,
                                triggers, indices) backed by DataFrames/parquet.
- ``cozo_spark.functions``    — Cozo's scalar-function and aggregation
                                inventory re-expressed as pyspark Column trees
                                (JVM-side, codegen'd; UDFs only where needed).
- ``cozo_spark.datalog``      — CozoScript parser → logical rewrites (NNF/DNF,
                                safety ordering, stratification) → DataFrame
                                translation → semi-naive fixpoint driver.
- ``cozo_spark.fixed_rules``  — graph algorithms & utilities (PageRank, BFS,
                                Dijkstra, CC, ...) as iterative DataFrame
                                programs; user-registrable UDTF surface.
- ``cozo_spark.operators``    — scale-oriented operators beyond the reference:
                                dedup (exact / MinHash-LSH / SimHash), ANN
                                similarity search, text analysis, validity
                                (time-travel) reads, multimodal plumbing.
- ``cozo_spark.sources``      — CsvReader / JsonReader / Constant / parquet.
- ``cozo_spark.streaming``    — change-feed as Structured Streaming.
"""

__version__ = "0.1.0"

from cozo_spark.session import get_spark  # noqa: F401
