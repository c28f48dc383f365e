"""Unit-test helpers for comparison levels (reference
``splink/internals/testing.py``: ``is_in_level`` / ``comparison_vector_value``).

The reference registers the literal records as a temp table and templates
the level's SQL condition / the comparison's CASE statement over it.  Here
the literals become one tiny Spark DataFrame and the level's actual
``Column`` predicate — the same expression predict compiles — is evaluated
directly, so these helpers test the real execution path.

Literal records use suffixed keys exactly like the reference's
(``{"first_name_l": "a", "first_name_r": "b"}``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .comparison import Comparison
from .comparison_level import ComparisonLevel
from .functions import register_udfs

__all__ = ["is_in_level", "comparison_vector_value"]

_Literals = Union[Dict[str, Any], List[Dict[str, Any]]]


def _records_df(literal_values: _Literals, spark: Optional[SparkSession]):
    try:
        import pyarrow as pa

        if isinstance(literal_values, pa.Table):
            literal_values = literal_values.to_pylist()
    except ImportError:
        pass
    single = isinstance(literal_values, dict)
    records = [literal_values] if single else list(literal_values)
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("testing helpers need an active SparkSession")
    register_udfs(s)
    return s.createDataFrame(records), single


def is_in_level(
    comparison_level: ComparisonLevel,
    literal_values: _Literals,
    spark: Optional[SparkSession] = None,
) -> Union[bool, List[bool]]:
    """Whether each literal record satisfies the level's condition
    (reference testing.py:16-45; an ELSE level is always True)."""
    df, single = _records_df(literal_values, spark)
    cond = (
        F.lit(True)
        if comparison_level.is_else_level
        else comparison_level.condition()
    )
    rows = df.select(cond.alias("result")).collect()
    out = [bool(r["result"]) for r in rows]
    return out[0] if single else out


def comparison_vector_value(
    comparison: Comparison,
    literal_values: _Literals,
    spark: Optional[SparkSession] = None,
) -> Union[Dict[str, Any], List[Dict[str, Any]]]:
    """The gamma value (and its level label) the comparison's CASE ladder
    assigns each literal record (reference testing.py:48-104)."""
    df, single = _records_df(literal_values, spark)
    rows = df.select(comparison.gamma_column().alias("cvv")).collect()
    labels = {
        lv.comparison_vector_value: lv.label_for_charts
        for lv in comparison.comparison_levels
    }
    out = [
        {
            "comparison_vector_value": r["cvv"],
            "label_for_charts": labels.get(r["cvv"], ""),
        }
        for r in rows
    ]
    return out[0] if single else out
