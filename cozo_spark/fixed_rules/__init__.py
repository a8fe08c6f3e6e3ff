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

    for name, fn in graphs.BUILTIN_RULES.items():
        register_fixed_rule(name, fn)


_register_builtins()
