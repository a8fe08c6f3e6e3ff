"""Fixed rules: graph algorithms & utilities, the engine's UDTF surface.

Mirrors the reference registry (cozo-core/src/fixed_rule/mod.rs:706-835):
a fixed rule is a function ``(inputs: list[DataFrame], options: dict) ->
DataFrame``. User-registrable at runtime (Db.register_fixed_rule analogue,
db.rs:760-788).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

FixedRule = Callable[..., DataFrame]

_REGISTRY: dict[str, FixedRule] = {}


def register_fixed_rule(name: str, fn: FixedRule) -> None:
    _REGISTRY[name] = fn


def get_fixed_rule(name: str) -> FixedRule:
    if name not in _REGISTRY:
        raise KeyError(f"fixed rule not found: {name!r} (known: {sorted(_REGISTRY)})")
    return _REGISTRY[name]


def fixed_rule_names() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins() -> None:
    from cozo_spark.fixed_rules import graphs
    from cozo_spark.sources import readers

    for name, fn in graphs.BUILTIN_RULES.items():
        register_fixed_rule(name, fn)
    register_fixed_rule("CsvReader", readers.csv_reader)
    register_fixed_rule("JsonReader", readers.json_reader)
    register_fixed_rule("Constant", readers.constant)

    def reorder_sort(inputs: list, options: dict | None = None) -> DataFrame:
        """ReorderSort (fixed_rule/utilities/reorder_sort.rs:1-153): sort by
        expressions, optionally emit rank, with skip/take — Window-based."""
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        options = dict(options or {})
        df = inputs[0]
        sort_cols = options.get("sort_by", df.columns)
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        desc = options.get("descending", False)
        cols = [F.col(c).desc() if desc else F.col(c).asc() for c in sort_cols]
        # break_ties=false (default) keeps row ordering deterministic by all cols
        if not options.get("break_ties", False):
            cols += [F.col(c).asc() for c in df.columns if c not in sort_cols]
        out = df.withColumn("_rank", F.row_number().over(W.orderBy(*cols)).cast("long"))
        skip = int(options.get("skip", 0))
        take = options.get("take")
        if skip:
            out = out.filter(F.col("_rank") > skip)
        if take is not None:
            out = out.filter(F.col("_rank") <= skip + int(take))
        if options.get("out", True):
            return out.select("_rank", *df.columns)
        return out.select(*df.columns)

    register_fixed_rule("ReorderSort", reorder_sort)


_register_builtins()
