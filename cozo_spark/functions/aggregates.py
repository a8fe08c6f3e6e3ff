"""Aggregation registry: Cozo aggregation name → Spark agg Column builder.

Reference: cozo-core/src/data/aggr.rs (registry at 1158-1185). Two families:
- meet aggregations (semilattice: commutative/associative/idempotent) may run
  inside recursive fixpoints — flagged ``is_meet`` so the fixpoint driver can
  use changed-value deltas (MeetAggrStore semantics, temp_store.rs:99-215);
- normal aggregations run once after the stratum is complete.

Each builder takes the value Column (plus optional extra literal args from the
head, e.g. ``collect(v, 10)``) and returns an aggregate Column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AggSpec:
    name: str
    is_meet: bool
    build: Callable[..., Column]


AGGREGATIONS: dict[str, AggSpec] = {}


def _reg(name: str, is_meet: bool, build: Callable[..., Column]) -> None:
    AGGREGATIONS[name] = AggSpec(name, is_meet, build)


# normal family (aggr.rs:420-547, 195, 153, 171, 355, 388, 719, 759, 1123)
_reg("count", False, lambda v: F.count(v))
_reg("count_unique", False, lambda v: F.countDistinct(v))
_reg("sum", False, lambda v: F.sum(v))
_reg("product", False, lambda v: _product(v))
_reg("mean", False, lambda v: F.avg(v))
_reg("variance", False, lambda v: F.var_samp(v))
_reg("std_dev", False, lambda v: F.stddev_samp(v))
_reg("unique", False, lambda v: F.array_sort(F.collect_set(v)))
_reg("group_count", False, lambda v: _group_count(v))
_reg("collect", False, lambda v, cap=None: F.collect_list(v) if cap is None else F.slice(F.collect_list(v), 1, cap))
_reg("choice_rand", False, lambda v: F.any_value(v))
_reg("latest_by", False, lambda v, dtype=None: _pair_by(v, F.max_by, dtype))
_reg("smallest_by", False, lambda v, dtype=None: _pair_by(v, F.min_by, dtype))
_reg("bit_xor", False, lambda v: F.bit_xor(v))

# meet family (aggr.rs:68, 113, 575, 647, 799, 882, 941, 985, 1054)
_reg("min", True, lambda v: F.min(v))
_reg("max", True, lambda v: F.max(v))
_reg("and", True, lambda v: F.bool_and(v))
_reg("or", True, lambda v: F.bool_or(v))
_reg("union", True, lambda v: F.array_sort(F.array_distinct(F.flatten(F.collect_list(v)))))
_reg("intersection", True, lambda v: _intersection(v))
_reg("choice", True, lambda v: F.min(v))
_reg("min_cost", True, lambda v, dtype=None: _min_cost(v, dtype))
_reg("shortest", True, lambda v: F.min_by(v, F.struct(F.size(v), v)))
_reg("bit_and", True, lambda v: F.bit_and(v))
_reg("bit_or", True, lambda v: F.bit_or(v))

# beyond-reference extensions (SURVEY §2.3 note): sketch aggregations Spark
# provides natively — essential at 100 TB where exact count_unique shuffles
# every distinct value
_reg("approx_count_unique", False, lambda v, rsd=0.05: F.approx_count_distinct(v, rsd))
_reg("percentile", False, lambda v, p=0.5: F.percentile_approx(v, p))
_reg("median", False, lambda v: F.median(v))


def _group_count(v: Column) -> Column:
    # histogram of values, sorted: list of (value, count) pairs
    # (aggr.rs:171-193 returns [[k, n], ...] from a BTreeMap)
    lst = F.collect_list(v)
    return F.transform(
        F.array_sort(F.array_distinct(lst)),
        lambda x: F.struct(x.alias("value"),
                           F.size(F.filter(lst, lambda y: y == x)).alias("count")))


def _intersection(v: Column) -> Column:
    # fold array_intersect over the collected lists, seeded with the first
    # list so the accumulator keeps the value column's element type
    lsts = F.collect_list(v)
    return F.aggregate(
        F.slice(lsts, F.lit(2), F.greatest(F.size(lsts) - 1, F.lit(0))),
        F.element_at(lsts, 1),
        lambda acc, x: F.array_intersect(acc, x))


def _product(v: Column) -> Column:
    # sign-aware distributed product: exp(Σ ln|v|) with sign = parity of
    # negatives, zero if any zero. Stays in codegen (no UDAF).
    ln_sum = F.sum(F.log(F.abs(v.cast("double"))))
    n_neg = F.sum(F.when(v < 0, 1).otherwise(0))
    any_zero = F.max(F.when(v == 0, 1).otherwise(0))
    sign = F.when(F.pmod(n_neg, F.lit(2)) == 0, 1.0).otherwise(-1.0)
    return F.when(any_zero == 1, F.lit(0.0)).otherwise(sign * F.exp(ln_sum))


def _pair_parts(v: Column, dtype):
    """(data, key) columns of a Cozo [data, key] pair — a homogeneous pair is
    an array, a mixed-type pair is a struct<_0, _1> (translate.py ListEx)."""
    if dtype is not None and str(dtype).startswith("struct"):
        return v.getField("_0"), v.getField("_1")
    return F.element_at(v, 1), F.element_at(v, 2)


def _pair_by(v: Column, by_fn, dtype=None) -> Column:
    # latest_by/smallest_by return the DATA of the extreme pair
    # (aggr.rs:719-798: get() -> found)
    data, key = _pair_parts(v, dtype)
    return by_fn(data, key)


def _min_cost(v: Column, dtype=None) -> Column:
    # min_cost returns the whole [data, cost] PAIR of the minimum cost
    # (aggr.rs:800-880: get() -> List[found, cost]) — the pair must survive
    # so recursive meet epochs can keep improving on the cost
    _, key = _pair_parts(v, dtype)
    return F.min_by(v, key)
