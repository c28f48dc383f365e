"""Exploratory analysis — mirrors ``splink.exploratory`` (reference
splink/exploratory.py: ``completeness_chart`` + ``profile_columns``), taking
plain Spark DataFrames instead of a db_api. The chart layer is out of engine
scope (SURVEY §0), so these return the DATA the reference's charts render.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame

from .internals.profile_data import (
    bottom_n_values,
    completeness_chart_data,
    profile_columns as _profile_summary,
    top_n_values,
)
from .internals.vertically_concatenate import concat_input_frames as _concat
from .internals import similarity_analysis  # noqa: F401  (reference:
# `import splink.exploratory...; similarity_analysis` companion module)

__all__ = ["completeness_chart", "profile_columns", "similarity_analysis"]


def completeness_chart(
    df_or_dfs: Union[DataFrame, Sequence[DataFrame]],
    cols: Optional[List[str]] = None,
    table_names_for_chart: Optional[List[str]] = None,
):
    """Proportion of non-null values per column [per input table]
    (reference internals/completeness.py:20-133 + its chart). Returns a
    ready-to-render Vega-Lite spec (internals/chart_specs.py); the
    underlying data is available via
    :func:`internals.profile_data.completeness_chart_data`. The collect is
    bounded: one row per (table, column)."""
    from .internals.chart_specs import completeness_chart_spec

    concat, sd = _concat(df_or_dfs, table_names_for_chart)
    data = completeness_chart_data(
        concat, source_dataset_column_name=sd, columns=cols
    )
    return completeness_chart_spec([r.asDict() for r in data.collect()])


def profile_columns(
    df_or_dfs: Union[DataFrame, Sequence[DataFrame]],
    column_expressions: Optional[List[str]] = None,
    top_n: int = 10,
    bottom_n: int = 10,
) -> dict:
    """Per-column profile (reference internals/profile_data.py:244-330):
    a summary DataFrame (non-null/approx-distinct/completeness) plus the
    top-n / bottom-n value-frequency DataFrames the reference's distribution
    charts render. Returns ``{"summary": DataFrame, "top_n": {col: DataFrame},
    "bottom_n": {col: DataFrame}}``."""
    concat, _sd = _concat(df_or_dfs)
    cols = list(column_expressions or concat.columns)
    return {
        "summary": _profile_summary(concat, cols),
        "top_n": {c: top_n_values(concat, c, top_n) for c in cols},
        "bottom_n": {c: bottom_n_values(concat, c, bottom_n) for c in cols},
    }
