"""Comparison vectors: re-join blocked id pairs to their columns and compute
per-comparison gamma values.

Reference: splink/internals/comparison_vector_values.py:41-132 — the junction
re-join (``blocked_id_pairs b JOIN concat_tf l ON uid_l = b.join_key_l JOIN
concat_tf r ...``, :98-115) followed by the gamma CASE ladders. The ids-only
blocking output + this junction join is a deliberate shuffle-width
optimisation at scale: the wide columns move through exactly two hash joins
instead of through the blocking join's output.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .settings import Settings


def _needed_columns(settings: Settings, concat_with_tf: DataFrame) -> list[str]:
    """Columns the comparisons actually touch (narrow shuffle width)."""
    cols: list[str] = [settings.unique_id_column_name]
    if settings.source_dataset_column_name and (
        settings.source_dataset_column_name in concat_with_tf.columns
    ):
        cols.append(settings.source_dataset_column_name)
    for comp in settings.comparisons:
        for c in getattr(comp, "input_columns", None) or []:
            if c in concat_with_tf.columns and c not in cols:
                cols.append(c)
    for c in getattr(settings, "additional_columns_to_retain", []) or []:
        if c in concat_with_tf.columns and c not in cols:
            cols.append(c)
    for c in settings.tf_columns:
        tf = f"tf_{c}"
        if tf in concat_with_tf.columns and tf not in cols:
            cols.append(tf)
    known = {c for comp in settings.comparisons for c in (getattr(comp, "input_columns", None) or [])}
    if not known:  # no declared inputs (custom SQL levels) → carry everything
        return list(concat_with_tf.columns)
    return cols


def blocked_pairs_with_columns(
    blocked_pairs: DataFrame,
    concat_with_tf: DataFrame,
    settings: Settings,
    concat_with_tf_right: Optional[DataFrame] = None,
    broadcast_nodes_max_rows: Optional[int] = 5_000_000,
) -> DataFrame:
    """The junction re-join (comparison_vector_values.py:98-115).

    Join-strategy note: |pairs| >> |nodes| in any blocked workload, so when
    the narrow node table is small enough to broadcast we hint it explicitly
    — otherwise Catalyst sort-merge-joins and shuffles the (much larger) pair
    table twice. At billions of nodes the hint is skipped and SMJ is correct.
    The row count is known for free: the concat was already counted when the
    blocked pairs materialized.
    """
    uid = settings.unique_id_column_name
    cols = _needed_columns(settings, concat_with_tf)
    narrow_l = concat_with_tf.select([F.col(c).alias(f"{c}_l") for c in cols])
    right_src = concat_with_tf_right if concat_with_tf_right is not None else concat_with_tf
    narrow_r = right_src.select([F.col(c).alias(f"{c}_r") for c in cols])
    if broadcast_nodes_max_rows:
        n_nodes = getattr(concat_with_tf, "_splink_row_count", None)
        if n_nodes is None:
            n_nodes = concat_with_tf.count()
            try:
                concat_with_tf._splink_row_count = n_nodes  # type: ignore[attr-defined]
            except Exception:
                pass
        if n_nodes <= broadcast_nodes_max_rows:
            narrow_l = F.broadcast(narrow_l)
            narrow_r = F.broadcast(narrow_r)

    join_l = [blocked_pairs["join_key_l"] == narrow_l[f"{uid}_l"]]
    join_r = [blocked_pairs["join_key_r"] == narrow_r[f"{uid}_r"]]
    sd = settings.source_dataset_column_name
    if sd and "source_dataset_l" in blocked_pairs.columns:
        join_l.append(blocked_pairs["source_dataset_l"] == narrow_l[f"{sd}_l"])
        join_r.append(blocked_pairs["source_dataset_r"] == narrow_r[f"{sd}_r"])

    out = blocked_pairs.join(narrow_l, on=_and(join_l), how="inner").join(
        narrow_r, on=_and(join_r), how="inner"
    )
    # drop the pair table's copies by REFERENCE — the node table contributes
    # identically-named source_dataset_l/_r columns that must survive
    out = out.drop(blocked_pairs["join_key_l"]).drop(blocked_pairs["join_key_r"])
    if "source_dataset_l" in blocked_pairs.columns:
        out = out.drop(blocked_pairs["source_dataset_l"]).drop(
            blocked_pairs["source_dataset_r"]
        )
    return out


def compute_comparison_vectors(
    pairs_with_cols: DataFrame, settings: Settings
) -> DataFrame:
    """Append ``gamma_<comparison>`` columns (the F.when CASE ladders)."""
    gammas = [comp.gamma_column() for comp in settings.comparisons]
    return pairs_with_cols.select("*", *gammas)


def _and(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
