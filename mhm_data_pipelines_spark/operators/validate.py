"""Declarative data-quality constraint validation — the
expectations-suite pattern (non-null, unique, range, set membership,
regex, referential integrity) compiled into the FEWEST possible Spark
jobs.

No reference counterpart (north-star extension): every ingest the
reference runs (`mhm-data-pipelines/mdp/collect_data_metadata.py`'s
schema checks are the embryonic form) wants the same gate — "did this
batch satisfy the table's contract?" — before anything downstream
consumes it. This module makes the contract declarative data, not
scattered filter code.

Scale shape (the part that matters at 100 TB):

* ALL row-local rules (not_null / range / in_set / regex / custom)
  compile into ONE aggregate over ONE scan — a rule is just a
  ``sum(CASE ...)`` column, so 20 rules cost the same single pass as
  one, and Catalyst prunes the scan to exactly the referenced columns.
* ``unique`` rules each add one hash aggregate on their key columns
  (count minus distinct-count needs the shuffle; nothing else does).
* ``ref_integrity`` rules add one join against the DISTINCT reference
  keys — dimension-sized, so AQE broadcasts it; the fact side never
  shuffles.
* Every rule's result is one row; the report is a union of
  metadata-sized frames. Nothing but counts ever reaches the driver.

NULL semantics follow the expectations convention: ``range`` /
``in_set`` / ``regex`` / ``ref_integrity`` pass NULLs (pair with an
explicit ``not_null`` rule to forbid them) so each rule tests exactly
one thing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["validate_constraints"]

_REPORT_COLS = ["rule", "kind", "violations", "total", "passed"]


def _row_violation(rule: dict) -> Column:
    """Boolean violation indicator for a row-local rule."""
    kind = rule["kind"]
    if kind == "not_null":
        return F.col(rule["col"]).isNull()
    c = F.col(rule["col"]) if "col" in rule else None
    if kind == "range":
        ok = F.lit(True)
        if "min" in rule:
            ok = ok & (c >= F.lit(rule["min"]))
        if "max" in rule:
            ok = ok & (c <= F.lit(rule["max"]))
        return c.isNotNull() & ~ok
    if kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if kind == "regex":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    if kind == "custom":
        # rule["expr"]: a Column that is TRUE where the row violates
        return rule["expr"]
    raise ValueError(f"unknown row-local rule kind: {kind!r}")


def validate_constraints(
    df: DataFrame,
    rules: list[dict],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Run a declarative constraint suite over ``df``; returns one row
    per rule: ``(rule, kind, violations, total, passed)``.

    Rule shapes::

        {"name": ..., "kind": "not_null", "col": c}
        {"name": ..., "kind": "range", "col": c, "min": x, "max": y}
        {"name": ..., "kind": "in_set", "col": c, "values": [...]}
        {"name": ..., "kind": "regex", "col": c, "pattern": "..."}
        {"name": ..., "kind": "custom", "expr": <violation Column>}
        {"name": ..., "kind": "unique", "cols": [c1, ...]}
        {"name": ..., "kind": "ref_integrity", "col": c,
         "ref": <refs key>, "ref_col": rc}

    ``unique`` counts the surplus rows beyond one per distinct key
    (NULL keys group like values). ``ref_integrity`` counts non-NULL
    fact keys absent from the reference's distinct key set; reference
    frames are passed via ``refs`` so a suite stays serializable data
    plus a named-frame environment.
    """
    names = [r.get("name") for r in rules]
    if len(set(names)) != len(names) or None in names:
        raise ValueError("every rule needs a unique 'name'")
    refs = refs or {}
    row_local = [
        r
        for r in rules
        if r["kind"] in ("not_null", "range", "in_set", "regex", "custom")
    ]
    reports: list[DataFrame] = []
    if row_local:
        agg = df.agg(
            F.count(F.lit(1)).alias("_total"),
            *[
                F.sum(_row_violation(r).cast("long")).alias(f"_v{i}")
                for i, r in enumerate(row_local)
            ],
        )
        # one scan, one row out; unpivot to (rule, violations) rows
        stack = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r["name"]).alias("rule"),
                        F.lit(r["kind"]).alias("kind"),
                        F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias(
                            "violations"
                        ),
                    )
                    for i, r in enumerate(row_local)
                ]
            )
        ).alias("_r")
        reports.append(
            agg.select("_total", stack).select(
                F.col("_r.rule").alias("rule"),
                F.col("_r.kind").alias("kind"),
                F.col("_r.violations").alias("violations"),
                F.col("_total").alias("total"),
            )
        )
    for r in rules:
        if r["kind"] == "unique":
            cols = [F.col(c) for c in r["cols"]]
            # struct(cols) is never NULL, so count_distinct sees every
            # row and NULL key fields group like values
            reports.append(
                df.agg(
                    F.count(F.lit(1)).alias("total"),
                    (
                        F.count(F.lit(1))
                        - F.count_distinct(F.struct(*cols))
                    ).alias("violations"),
                ).select(
                    F.lit(r["name"]).alias("rule"),
                    F.lit("unique").alias("kind"),
                    F.col("violations"),
                    "total",
                )
            )
        elif r["kind"] == "ref_integrity":
            if r["ref"] not in refs:
                raise ValueError(
                    f"rule {r['name']!r} references unknown frame "
                    f"{r['ref']!r}"
                )
            keys = (
                refs[r["ref"]]
                .select(F.col(r["ref_col"]).alias("_rk"))
                .distinct()
            )
            joined = df.select(F.col(r["col"]).alias("_fk")).join(
                keys, F.col("_fk") == F.col("_rk"), "left"
            )
            reports.append(
                joined.agg(
                    F.count(F.lit(1)).alias("total"),
                    F.sum(
                        (
                            F.col("_fk").isNotNull()
                            & F.col("_rk").isNull()
                        ).cast("long")
                    ).alias("violations"),
                ).select(
                    F.lit(r["name"]).alias("rule"),
                    F.lit("ref_integrity").alias("kind"),
                    F.coalesce("violations", F.lit(0)).alias("violations"),
                    "total",
                )
            )
        elif r["kind"] not in (
            "not_null",
            "range",
            "in_set",
            "regex",
            "custom",
        ):
            raise ValueError(f"unknown rule kind: {r['kind']!r}")
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "rule",
        "kind",
        "violations",
        "total",
        (F.col("violations") == 0).alias("passed"),
    )
