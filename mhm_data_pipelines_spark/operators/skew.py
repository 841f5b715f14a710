"""Skew mitigation: salted two-stage aggregation and salted joins.

The expected skew shape in this domain is participants/users with wildly
different data volumes (one participant's sensor stream can be orders of
magnitude larger than the median — SURVEY §4.2). AQE's skew-join
splitting covers joins at runtime; these utilities cover the cases AQE
does not: a single hot *grouping* key that funnels into one reducer, and
deliberate pre-planned salting when the hot keys are known.

Scale contract: ``salted_agg`` turns ``groupBy(keys)`` into
``groupBy(keys + salt)`` → merge — the hot key's rows spread over
``buckets`` reducers in stage 1, and stage 2 only touches
``|distinct keys| × buckets`` pre-aggregated rows. Only algebraic
aggregates decompose this way (count/sum/min/max/avg); distinct-style
aggregates need a different decomposition (salt BY the distinct column)
and are rejected explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: alias -> (partial aggregate over rows, final merge over partials)
_ALGEBRA = {
    "count": (
        lambda c: F.count("*" if c == "*" else c),
        lambda p: F.sum(p).cast("long"),
    ),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-stage (salted) aggregation equivalent to
    ``df.groupBy(keys).agg(...)`` but immune to hot grouping keys.

    ``aggs`` maps output column name -> (fn, col) where fn is one of
    ``count | sum | min | max | avg`` (``avg`` decomposes into sum+count
    and re-divides at merge). The salt is a seeded ``rand`` — uniform,
    and deterministic per partition for task retries.
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            partials.append(F.sum(col).alias(f"__s_{name}"))
            partials.append(F.count(col).alias(f"__c_{name}"))
            finals.append(
                (F.sum(f"__s_{name}") / F.sum(f"__c_{name}")).alias(name)
            )
            continue
        if fn not in _ALGEBRA:
            raise ValueError(
                f"{fn!r} is not salt-decomposable (supported: "
                f"{sorted(_ALGEBRA)} + 'avg'; distinct-style aggregates "
                "need salting by the distinct column instead)"
            )
        partial, final = _ALGEBRA[fn]
        partials.append(partial(col).alias(f"__p_{name}"))
        finals.append(final(f"__p_{name}").alias(name))

    salt = (F.rand(seed) * buckets).cast("int")
    stage1 = df.groupBy(*keys, salt.alias("__salt")).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join where ``skewed`` has hot join keys and ``small``
    is modest but above the broadcast threshold: salt the skewed side
    (random bucket per row), replicate the small side once per bucket,
    and join on ``on + [salt]`` — each hot key spreads over ``buckets``
    co-partitions. Prefer ``F.broadcast`` when the small side fits, and
    AQE skew-join when it can split; this is the manual fallback.
    """
    salt = (F.rand(seed) * buckets).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return left.join(right, [*on, "__salt"]).drop("__salt")
