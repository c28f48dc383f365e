"""Data-quality expectations: declare rules against a table, get a
one-row-per-rule violation report from a SINGLE aggregation pass — the
dbt-test / Great-Expectations shape, engine-native.

Scale design: every rule compiles to a conditional-count expression
inside ONE global aggregate (map-side combined, no per-rule scans);
``unique`` rules add ``count_distinct`` terms to the same aggregate —
the only shuffling terms, and Spark plans them as expand+two-phase
aggregation in the same job. A 100-rule report over 100 TB is still one
scan.

Rule forms (dicts):
  {"name": ..., "type": "not_null",        "column": c}
  {"name": ..., "type": "unique",          "column": c}
  {"name": ..., "type": "in_range",        "column": c, "min": x, "max": y}
  {"name": ..., "type": "matches",         "column": c, "pattern": regex}
  {"name": ..., "type": "accepted_values", "column": c, "values": [...]}
  {"name": ..., "type": "expression",      "predicate": sql_bool}
``unique`` counts every row beyond the first occurrence of a non-null
value as a violation (nulls are not duplicates of each other, matching
SQL DISTINCT semantics would — they are simply excluded).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expectations_report", "functional_dependency_report"]


def _violation_expr(rule: Mapping) -> Column:
    t = rule["type"]
    c = F.col(rule["column"]) if "column" in rule else None
    if t == "not_null":
        return c.isNull()
    if t == "in_range":
        lo, hi = rule["min"], rule["max"]
        return c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    if t == "matches":
        return c.isNull() | ~c.rlike(rule["pattern"])
    if t == "accepted_values":
        return c.isNull() | ~c.isin(list(rule["values"]))
    if t == "expression":
        # three-valued logic: a row where the predicate is NULL did NOT
        # satisfy it — that's a violation, not a silent pass
        return ~F.coalesce(F.expr(rule["predicate"]), F.lit(False))
    raise ValueError(f"unknown rule type {t!r}")


def expectations_report(
    df: DataFrame,
    rules: Sequence[Mapping],
    round_to: int = 6,
) -> DataFrame:
    """One row per rule: (``rule_name``, ``rule_type``, ``column``,
    ``n_rows``, ``n_violations``, ``violation_ppm``, ``violation_frac``,
    ``passed``). Deterministic; a single aggregation job regardless of
    rule count.

    ``violation_ppm`` is the violation rate in exact parts-per-million:
    ``(n_violations * 1_000_000) div n_rows`` — true integer division,
    reproduced digit-for-digit by any engine. ``violation_frac`` is the
    human-friendly double (rounded at ``round_to``); cross-engine
    comparisons should key on the ppm column, since a rounded double's
    last digit is a rounding-boundary coin-flip between engines.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        if r["type"] == "unique":
            c = F.col(r["column"])
            aggs.append(
                (F.count(c) - F.count_distinct(c)).alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.sum(_violation_expr(r).cast("bigint")).alias(f"__v{i}")
            )
    one = df.agg(*aggs)
    # normalise the count columns once (coalesce nulls, fix types) so the
    # struct stage below can use true integer division via F.expr on
    # plain column names — `/` is double division in Spark and floor(
    # double) misrounds at integer boundaries, so `div` it must be
    one = one.select(
        F.col("__n").cast("bigint").alias("__n"),
        *[
            F.coalesce(F.col(f"__v{i}"), F.lit(0))
            .cast("bigint")
            .alias(f"__v{i}")
            for i in range(len(rules))
        ],
    )
    # one row -> one row per rule via inline(array(struct...)): the
    # aggregate is evaluated ONCE (a per-rule union of selects would plan
    # one aggregation per rule)
    structs = []
    for i, r in enumerate(rules):
        v = F.col(f"__v{i}")
        structs.append(
            F.struct(
                F.lit(r["name"]).alias("rule_name"),
                F.lit(r["type"]).alias("rule_type"),
                F.lit(r.get("column", "")).alias("column"),
                F.col("__n").alias("n_rows"),
                v.alias("n_violations"),
                F.expr(
                    f"(__v{i} * 1000000) div greatest(__n, 1)"
                ).alias("violation_ppm"),
                F.round(
                    v.cast("double")
                    / F.greatest(F.col("__n"), F.lit(1)).cast("double"),
                    round_to,
                ).alias("violation_frac"),
                (v == 0).alias("passed"),
            )
        )
    return one.select(F.inline(F.array(*structs)))


def functional_dependency_report(
    df: DataFrame,
    dependencies: "Sequence[tuple]",
) -> DataFrame:
    """Check candidate functional dependencies LHS → RHS (does every
    LHS value determine exactly one RHS value?) — the schema-discovery
    / data-quality probe behind "is order_id a key for customer_id",
    "does zip determine city".

    Each dependency is ``(lhs_cols, rhs_col)`` with ``lhs_cols`` a
    string or sequence. Output one row per dependency:
    ``lhs`` / ``rhs`` (display strings), ``n_lhs_values`` (distinct LHS
    combinations, NULLs grouping as values), ``n_violating`` (LHS
    values mapping to >1 distinct RHS — NULL RHS counts as a value),
    ``violation_ppm`` (exact integer ppm of violating LHS values), and
    ``holds``.

    Plan: one groupBy per dependency on its LHS (count distinct RHS),
    then a one-row reduction each, unioned — k dependencies = k
    map-side-combined aggregates, no row blow-up.
    """
    if not dependencies:
        raise ValueError("need at least one (lhs, rhs) dependency")
    parts = []
    for lhs, rhs in dependencies:
        lhs_cols = [lhs] if isinstance(lhs, str) else list(lhs)
        # distinct RHS values with NULL counting as a value, on the
        # NATIVE column: count_distinct skips NULLs, so add 1 when any
        # NULL exists. (String-casting with a sentinel would conflate
        # distinct values that render identically — e.g. 1 vs '1'
        # after cast, or a genuine sentinel-valued string.)
        per_lhs = df.groupBy(*lhs_cols).agg(
            (
                F.count_distinct(F.col(rhs))
                + F.max(
                    F.when(F.col(rhs).isNull(), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                )
            ).alias("__k")
        )
        parts.append(
            per_lhs.agg(
                F.lit(",".join(lhs_cols)).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count(F.lit(1)).alias("n_lhs_values"),
                F.sum(
                    F.when(F.col("__k") > 1, F.lit(1)).otherwise(F.lit(0))
                ).alias("n_violating"),
            ).select(
                "lhs",
                "rhs",
                F.col("n_lhs_values").cast("bigint").alias("n_lhs_values"),
                F.col("n_violating").cast("bigint").alias("n_violating"),
                F.expr(
                    "(n_violating * 1000000) div greatest(n_lhs_values, 1)"
                ).cast("bigint").alias("violation_ppm"),
                (F.col("n_violating") == 0).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
