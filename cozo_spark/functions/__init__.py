"""Cozo's scalar-function and aggregation inventories re-expressed as
pyspark Column builders (reference: cozo-core/src/data/functions.rs and
data/aggr.rs)."""

from cozo_spark.functions.scalar import SCALAR_FUNCTIONS, build_call  # noqa: F401
from cozo_spark.functions.aggregates import AGGREGATIONS, AggSpec  # noqa: F401
