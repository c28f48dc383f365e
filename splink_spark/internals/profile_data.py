"""Data profiling: column frequency distributions, percentiles, completeness.

Reference: splink/internals/profile_data.py:98-210 (profile_columns: value
frequency distributions, top/bottom-n, percentile curves) and
completeness.py:20-110 (share of non-null per column per dataset).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def column_value_frequencies(df: DataFrame, column: str) -> DataFrame:
    """(value, value_count, percentile) — the distribution-of-counts table
    behind the reference's profile charts. ``column`` may be a plain name,
    a reference-quoted identifier, or a SQL expression."""
    e = _profile_expr(column)
    counts = (
        df.where(e.isNotNull())
        .groupBy(e.alias("__value"))
        .agg(F.count(F.lit(1)).alias("value_count"))
    )
    total = Window.partitionBy()
    w = Window.orderBy(F.desc("value_count"), F.asc("__value")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return counts.select(
        F.col("__value").cast("string").alias("value"),
        "value_count",
        (
            F.sum("value_count").over(w).cast("double")
            / F.sum("value_count").over(total).cast("double")
        ).alias("cum_frequency"),
    )


def top_n_values(df: DataFrame, column: str, n: int = 10) -> DataFrame:
    return (
        column_value_frequencies(df, column)
        .orderBy(F.desc("value_count"), F.asc("value"))
        .limit(n)
    )


def bottom_n_values(df: DataFrame, column: str, n: int = 10) -> DataFrame:
    return (
        column_value_frequencies(df, column)
        .orderBy(F.asc("value_count"), F.asc("value"))
        .limit(n)
    )


def _profile_expr(spec: str):
    """A profile target may be a plain column, a reference-style
    double-quoted identifier (possibly with spaces, ``"SUR name"``), or an
    arbitrary SQL expression (``concat(city, first_name)``,
    ``first_name || "SUR name"``) — reference profile_data.py accepts all
    three. Double-quoted identifiers become backticks for Spark's parser."""
    import re

    s = spec.strip()
    if re.fullmatch(r"[A-Za-z_]\w*", s):
        return F.col(s)
    s = re.sub(r'"([A-Za-z_][A-Za-z0-9_ ]*)"', r"`\1`", s)
    if re.fullmatch(r"`[^`]+`", s):
        return F.col(s[1:-1])
    return F.expr(s)


def profile_columns(df: DataFrame, columns: Optional[Sequence[str]] = None) -> DataFrame:
    """Summary stats per column: non-null count, distinct count, top value.

    Targets may be plain columns, quoted identifiers, or SQL expressions
    (reference profile_data.py). distinct counts use approx_count_distinct —
    exact distinct over every column would be one full shuffle per column at
    100 TB.
    """
    columns = list(columns or df.columns)
    aggs = []
    for c in columns:
        e = _profile_expr(c)
        aggs += [
            F.count(e).alias(f"{c}__nonnull"),
            F.approx_count_distinct(e).alias(f"{c}__distinct"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    total = df.count()
    out_rows = [
        (
            c,
            total,
            row[f"{c}__nonnull"],
            float(row[f"{c}__nonnull"]) / total if total else 0.0,
            row[f"{c}__distinct"],
        )
        for c in columns
    ]
    return df.sparkSession.createDataFrame(
        out_rows,
        "column string, n_rows bigint, n_nonnull bigint, completeness double, approx_distinct bigint",
    )


def completeness_chart_data(
    df: DataFrame, source_dataset_column_name: Optional[str] = None,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Share of non-null per column [per source dataset]
    (reference completeness.py:20-110)."""
    columns = [
        c for c in (columns or df.columns) if c != source_dataset_column_name
    ]
    group = [source_dataset_column_name] if source_dataset_column_name else []
    aggs = [
        F.avg(F.col(c).isNotNull().cast("double")).alias(c) for c in columns
    ]
    wide = df.groupBy(*group).agg(*aggs)
    # unpivot to (source_dataset?, column, completeness)
    id_cols = group
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in columns)
    return wide.selectExpr(
        *id_cols,
        f"stack({len(columns)}, {stack_expr}) as (column, completeness)",
    )
