"""Blocking: candidate-pair generation by self-join / cross-dataset join.

Reference semantics: splink/internals/blocking.py —
- per-rule join ``l JOIN r ON <rule> WHERE uid_l < uid_r [AND src_l != src_r]``
  emitting only ``(match_key, join_key_l, join_key_r)`` (:193-226) to keep the
  shuffle narrow (an algorithmic width optimisation we keep deliberately);
- multi-rule dedup: rule k adds ``AND NOT (coalesce(rule_1,false) OR ...)``
  (:158-191, 747-830), results unioned with match_key = rule index;
- exploding rules unnest array columns on both sides first, dedup the distinct
  id pairs, then take min(match_key) across rules (:333-600, 814-827);
- two-dataset link_only splits the concat and does a plain inner join
  (:637-659).

Native rewrite: the join inputs are the concat DataFrame with all columns
suffixed ``_l`` / ``_r``; an equality rule therefore becomes a Catalyst-visible
equi-join key (sort-merge / shuffled-hash / broadcast chosen by AQE). Pure
inequality rules degrade to BroadcastNestedLoopJoin exactly as the reference
warns — surfaced via blocking_analysis counts before execution.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .column_expression import ColumnExpression

ColSpec = Union[str, ColumnExpression]


class BlockingRule:
    """A join condition between the ``_l`` and ``_r`` suffixed sides.

    ``condition`` is a lazy zero-arg factory returning the boolean Column.
    ``exploded_columns`` lists array columns to ``F.explode`` on both sides
    before joining (ExplodingBlockingRule, blocking.py:333-484).
    ``salting_partitions`` > 1 splits the rule into that many sub-joins on a
    deterministic salt key to spread a skewed blocking key across tasks
    (Spark-only feature in the reference; SaltedBlockingRule).
    """

    def __init__(
        self,
        condition: Callable[[], Column],
        description: str,
        exploded_columns: Sequence[str] = (),
        salting_partitions: int = 1,
        columns: Sequence[str] = (),
    ):
        self._condition = condition
        self.description = description
        self.exploded_columns = list(exploded_columns)
        self.salting_partitions = salting_partitions
        # raw input columns the rule's predicate consumes, when known —
        # used by EM training to deactivate comparisons the training rule
        # conditions on (em_training_session.py:136-160)
        self.columns = list(columns)
        # builder spec for JSON round-trip (set by the DSL constructors)
        self.spec: Optional[dict] = None

    def condition(self) -> Column:
        return self._condition()

    def __repr__(self) -> str:  # pragma: no cover
        return f"BlockingRule({self.description!r})"


# -- user-facing DSL (reference blocking_rule_library.py:22-204) --------------


def block_on(*col_specs: ColSpec, salting_partitions: int = 1) -> BlockingRule:
    """Equality blocking on one or more (possibly transformed) columns."""
    ces = [ColumnExpression.instantiate(c) for c in col_specs]

    def cond() -> Column:
        parts = [ce.l().eqNullSafe(ce.r()) & ce.l().isNotNull() for ce in ces]
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out

    desc = " AND ".join(f"l.{ce.name} = r.{ce.name}" for ce in ces)
    rule = BlockingRule(
        cond,
        desc,
        salting_partitions=salting_partitions,
        columns=[ce.name for ce in ces if ce.is_pure_column_reference],
    )
    rule.spec = {
        "builder": "block_on",
        "args": [ce.name if ce.is_pure_column_reference else {"__ce__": ce.as_dict()} for ce in ces],
        "kwargs": {"salting_partitions": salting_partitions},
    }
    return rule


def CustomRule(sql_condition: str) -> BlockingRule:
    """Arbitrary SQL fragment over ``*_l`` / ``*_r`` columns (blocking_rule_library CustomRule)."""
    rule = BlockingRule(lambda: F.expr(sql_condition), sql_condition)
    rule.spec = {"builder": "CustomRule", "args": [sql_condition], "kwargs": {}}
    return rule


def rule_from_spec(spec: dict) -> BlockingRule:
    from .column_expression import ColumnExpression

    if spec["builder"] == "block_on":
        args = [
            ColumnExpression.from_dict(a["__ce__"]) if isinstance(a, dict) else a
            for a in spec["args"]
        ]
        return block_on(*args, **spec.get("kwargs", {}))
    if spec["builder"] == "CustomRule":
        return CustomRule(spec["args"][0])
    raise ValueError(f"unknown rule builder {spec['builder']!r}")


def cross_rule() -> BlockingRule:
    """No blocking — full cartesian (reference blocking.py:793-798 '1=1')."""
    return BlockingRule(lambda: F.lit(True), "1=1")


def And(*rules: BlockingRule) -> BlockingRule:
    return BlockingRule(
        lambda: _fold([r.condition() for r in rules], lambda a, b: a & b),
        " AND ".join(r.description for r in rules),
        exploded_columns=[c for r in rules for c in r.exploded_columns],
    )


def Or(*rules: BlockingRule) -> BlockingRule:
    return BlockingRule(
        lambda: _fold([r.condition() for r in rules], lambda a, b: a | b),
        " OR ".join(r.description for r in rules),
        exploded_columns=[c for r in rules for c in r.exploded_columns],
    )


def Not(rule: BlockingRule) -> BlockingRule:
    return BlockingRule(lambda: ~rule.condition(), f"NOT ({rule.description})")


def exploding_rule(rule: BlockingRule, array_columns: Sequence[str]) -> BlockingRule:
    return BlockingRule(
        rule._condition, rule.description, exploded_columns=list(array_columns)
    )


def _fold(cols, op):
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


# -- the blocking join --------------------------------------------------------


def suffix_all(df: DataFrame, suffix: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{c}{suffix}") for c in df.columns])


def _pair_filter(link_type: str, uid: str, source_dataset: Optional[str]) -> Column:
    """WHERE-clause generation (reference blocking.py:698-744): dedupe keeps
    the lower-id pair once; link_only additionally requires different source
    datasets (ordered by (source_dataset, uid) so each cross-dataset pair
    appears once)."""
    uid_l, uid_r = F.col(f"{uid}_l"), F.col(f"{uid}_r")
    if link_type == "dedupe_only" or source_dataset is None:
        return uid_l < uid_r
    sd_l, sd_r = F.col(f"{source_dataset}_l"), F.col(f"{source_dataset}_r")
    ordered = (sd_l < sd_r) | ((sd_l == sd_r) & (uid_l < uid_r))
    if link_type == "link_only":
        return ordered & (sd_l != sd_r)
    return ordered  # link_and_dedupe


def block_using_rules(
    nodes: DataFrame,
    rules: Sequence[BlockingRule],
    link_type: str = "dedupe_only",
    unique_id_column_name: str = "unique_id",
    source_dataset_column_name: Optional[str] = None,
    nodes_right: Optional[DataFrame] = None,
) -> DataFrame:
    """Candidate pairs ``(match_key, join_key_l, join_key_r)``.

    ``nodes_right`` enables the two-dataset link_only split (blocking.py:
    637-659): join left table to right table directly instead of self-joining
    the union and filtering src_l != src_r.
    """
    uid = unique_id_column_name
    left_raw = nodes
    right_raw = nodes_right if nodes_right is not None else nodes

    out_cols = [
        F.col("match_key"),
        F.col(f"{uid}_l").alias("join_key_l"),
        F.col(f"{uid}_r").alias("join_key_r"),
    ]
    # carry source datasets whenever they exist — uids are only unique per
    # dataset, so the downstream junction join needs (source, uid) keys
    if source_dataset_column_name and source_dataset_column_name in left_raw.columns:
        out_cols = [
            F.col("match_key"),
            F.col(f"{source_dataset_column_name}_l").alias("source_dataset_l"),
            F.col(f"{source_dataset_column_name}_r").alias("source_dataset_r"),
        ] + out_cols[1:]

    results: list[DataFrame] = []
    for k, rule in enumerate(rules):
        df_l, df_r = left_raw, right_raw
        for arr_col in rule.exploded_columns:
            df_l = df_l.withColumn(arr_col, F.explode(arr_col))
            df_r = df_r.withColumn(arr_col, F.explode(arr_col))
        lhs = suffix_all(df_l, "_l")
        rhs = suffix_all(df_r, "_r")

        # multi-rule dedup: AND NOT (coalesce(prev_rule_j, false) OR ...)
        cond = rule.condition()
        for prev in rules[:k]:
            if prev.exploded_columns:
                continue  # exploded rules dedup via min(match_key) below
            cond = cond & ~F.coalesce(prev.condition(), F.lit(False))

        # salting (reference SaltedBlockingRule, Spark-only): widen the join
        # key with a deterministic salt so one giant block spreads across
        # `s` reducers — lhs rows get hash(uid) % s, rhs rows are replicated
        # for every salt value; salt equality joins into the shuffle key.
        if rule.salting_partitions > 1:
            s_parts = rule.salting_partitions
            lhs = lhs.withColumn(
                "__salt_l", F.pmod(F.xxhash64(F.col(f"{uid}_l")), F.lit(s_parts))
            )
            rhs = rhs.withColumn(
                "__salt_r", F.explode(F.sequence(F.lit(0), F.lit(s_parts - 1)))
            ).withColumn("__salt_r", F.col("__salt_r").cast("bigint"))
            cond = cond & (F.col("__salt_l") == F.col("__salt_r"))
        if nodes_right is not None:
            where = F.lit(True)  # distinct tables: every pair valid once
        else:
            where = _pair_filter(link_type, uid, source_dataset_column_name)

        joined = lhs.join(rhs, on=cond & where, how="inner")
        pairs = joined.select(F.lit(str(k)).alias("match_key"), *[c for c in out_cols[1:]])
        if rule.exploded_columns:
            pairs = pairs.distinct()
        results.append(pairs)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    if any(rule.exploded_columns for rule in rules) and len(rules) > 1:
        # dedup across rules: keep lowest match_key per id pair
        # (reference blocking.py:814-827)
        keys = [c for c in out.columns if c != "match_key"]
        out = out.groupBy(*keys).agg(F.min("match_key").alias("match_key")).select(
            "match_key", *keys
        )
    return out


def count_comparisons_per_rule(
    nodes: DataFrame,
    rules: Sequence[BlockingRule],
    link_type: str = "dedupe_only",
    unique_id_column_name: str = "unique_id",
    source_dataset_column_name: Optional[str] = None,
) -> list[dict]:
    """Post-filter exact pair count per rule (blocking_analysis.py:76-190).

    Cheap relative to scoring (ids-only join, count aggregate); used as the
    pre-flight diagnostic before expensive predict runs.
    """
    out = []
    for k, rule in enumerate(rules):
        pairs = block_using_rules(
            nodes,
            [rule],
            link_type=link_type,
            unique_id_column_name=unique_id_column_name,
            source_dataset_column_name=source_dataset_column_name,
        )
        out.append({"rule": rule.description, "match_key": str(k), "count": pairs.count()})
    return out
