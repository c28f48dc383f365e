"""Blocking analysis — mirrors ``splink.blocking_analysis`` (reference
splink/blocking_analysis.py → internals/blocking_analysis.py): vet blocking
rules BEFORE running them at scale. ``count_comparisons_from_blocking_rules``
executes the (optionally record-sampled) join for exact/estimated marginal +
cumulative counts; ``n_largest_blocks`` finds the skewed key values from
per-key counts alone — no join executed.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

from pyspark.sql import DataFrame

from .internals.blocking import (
    BlockingRule,
    CustomRule,
    count_comparisons_per_rule,
    estimate_comparisons_pre_filter,
)
from .internals.blocking import n_largest_blocks as _n_largest_blocks
from .internals.vertically_concatenate import concat_input_frames

__all__ = [
    "count_comparisons_from_blocking_rules",
    "estimate_comparisons_from_blocking_rule_pre_filter",
    "n_largest_blocks",
]

RuleLike = Union[BlockingRule, str, Dict[str, Any]]


def _as_rule(rule: RuleLike) -> BlockingRule:
    if isinstance(rule, BlockingRule):
        return rule
    if isinstance(rule, str):
        from .internals.settings import _normalise_rule_sql

        # accept the reference's `l.col = r.col` alias convention
        return CustomRule(_normalise_rule_sql(rule))
    if isinstance(rule, dict):
        from .internals.blocking import rule_from_spec

        return rule_from_spec(rule)
    raise TypeError(f"cannot interpret {rule!r} as a blocking rule")


def _concat_inputs(
    df_or_dfs: Union[DataFrame, Sequence[DataFrame]],
    source_dataset_column_name: Optional[str],
) -> tuple[DataFrame, Optional[str]]:
    if isinstance(df_or_dfs, DataFrame):
        return df_or_dfs, source_dataset_column_name
    frame, sd = concat_input_frames(
        df_or_dfs,
        source_dataset_column_name=source_dataset_column_name or "source_dataset",
    )
    return frame, sd or source_dataset_column_name


def count_comparisons_from_blocking_rules(
    df_or_dfs: Union[DataFrame, Sequence[DataFrame]],
    *,
    blocking_rules: Union[RuleLike, Sequence[RuleLike]],
    link_type: str = "dedupe_only",
    unique_id_column_name: str = "unique_id",
    source_dataset_column_name: Optional[str] = None,
    record_sample_proportion: float = 0.05,
) -> List[dict]:
    """Marginal + cumulative comparison counts per rule, one record per rule
    (reference blocking_analysis.py:349-677). By default counts a
    deterministic 5% record sample on each side and scales up; pass
    ``record_sample_proportion=1.0`` for exact counts. One Spark job for
    every rule together."""
    if isinstance(blocking_rules, (BlockingRule, str, dict)):
        blocking_rules = [blocking_rules]
    rules = [_as_rule(r) for r in blocking_rules]
    nodes, sd = _concat_inputs(df_or_dfs, source_dataset_column_name)
    return count_comparisons_per_rule(
        nodes,
        rules,
        link_type=link_type,
        unique_id_column_name=unique_id_column_name,
        source_dataset_column_name=sd,
        record_sample_proportion=record_sample_proportion,
    )


def chart_comparisons_from_blocking_rules(
    df_or_dfs: Union[DataFrame, Sequence[DataFrame]],
    *,
    blocking_rules: Union[RuleLike, Sequence[RuleLike]],
    link_type: str = "dedupe_only",
    unique_id_column_name: str = "unique_id",
    source_dataset_column_name: Optional[str] = None,
    record_sample_proportion: float = 0.05,
):
    """Cumulative-comparisons-per-rule chart (reference
    blocking_analysis.py:679-722): a ready-to-render Vega-Lite spec over
    the cumulative comparison records from
    :func:`count_comparisons_from_blocking_rules` (which stays available
    for the raw data), in rule order."""
    from .internals.chart_specs import cumulative_comparisons_chart_spec

    records = count_comparisons_from_blocking_rules(
        df_or_dfs,
        blocking_rules=blocking_rules,
        link_type=link_type,
        unique_id_column_name=unique_id_column_name,
        source_dataset_column_name=source_dataset_column_name,
        record_sample_proportion=record_sample_proportion,
    )
    return cumulative_comparisons_chart_spec(records)


def estimate_comparisons_from_blocking_rule_pre_filter(
    df_or_dfs: Union[DataFrame, Sequence[DataFrame]],
    *,
    blocking_rule: RuleLike,
    link_type: str = "dedupe_only",
    unique_id_column_name: str = "unique_id",
) -> DataFrame:
    """Per-key ``count_l * count_r`` pair-count estimate WITHOUT executing
    the blocking join (reference blocking_analysis.py:76-190) — the scale
    guard-rail against a runaway rule."""
    nodes, _sd = _concat_inputs(df_or_dfs, None)
    return estimate_comparisons_pre_filter(
        nodes,
        _as_rule(blocking_rule),
        link_type=link_type,
        unique_id_column_name=unique_id_column_name,
    )


def n_largest_blocks(
    df_or_dfs: Union[DataFrame, Sequence[DataFrame]],
    *,
    blocking_rule: RuleLike,
    link_type: str = "dedupe_only",
    unique_id_column_name: str = "unique_id",
    n_largest: int = 5,
) -> DataFrame:
    """The blocking-key values responsible for the largest blocks (reference
    blocking_analysis.py:725-784) — the skew diagnostic: these keys are the
    reducers that straggle in the blocking shuffle."""
    nodes, _sd = _concat_inputs(df_or_dfs, None)
    return _n_largest_blocks(
        nodes,
        _as_rule(blocking_rule),
        link_type=link_type,
        unique_id_column_name=unique_id_column_name,
        n_largest=n_largest,
    )
