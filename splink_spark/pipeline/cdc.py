"""Change-data-capture (CDC) compaction and snapshot utilities.

Why this matters at 100 TB: large ingest pipelines land *change logs*
(append-only streams of keyed upserts/deletes) and periodic *snapshots*.
Before anything downstream can run, the log must be compacted to
latest-record-per-key, history tables need validity intervals (SCD type
2), and consecutive snapshots need diffing to recover a change feed.
These are the standing first three jobs of every warehouse-scale
pipeline; this module expresses each as a single key-partitioned shuffle
with no driver-side state.

Scale shape:
- ``latest_by_key`` / ``scd2_history``: ONE shuffle keyed by the record
  key (window functions over ``partitionBy(key)``); a power-law hot key
  sorts only its own partition slice. When the same key columns are
  reused across runs, materialize the input bucketed on the key
  (``internals/materialize.py``) and the exchange disappears.
- ``snapshot_diff``: one co-partitioned full-outer join on the key.
  Both sides shuffle once; with bucketed snapshots it is exchange-free
  sort-merge. Nothing is broadcast (snapshots are the big tables).

No UDFs anywhere — pure Column expressions, whole-stage codegen.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["latest_by_key", "scd2_history", "snapshot_diff"]


def _keys(key_cols: Sequence[str] | str) -> list[str]:
    return [key_cols] if isinstance(key_cols, str) else list(key_cols)


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    order_col: str,
    *,
    tiebreak_col: Optional[str] = None,
    op_col: Optional[str] = None,
    delete_values: Sequence[str] = ("D", "delete"),
) -> DataFrame:
    """Compact a keyed change log to its latest record per key (the
    upsert-merge every CDC consumer runs first; Delta/Hudi/Iceberg call
    this log compaction).

    Ordering is ``order_col`` descending with ``tiebreak_col`` descending
    as the deterministic tie-break (pass the monotone log offset /
    event id; without one, ties on ``order_col`` would make the winner
    partition-order dependent). If ``op_col`` is given, keys whose
    LATEST operation is in ``delete_values`` are tombstoned — dropped
    from the output entirely (the filter applies after the per-key
    argmax, so a delete followed by a re-insert keeps the re-insert).

    One shuffle keyed by ``key_cols``; ``row_number`` keeps 1 row per
    key so the post-window filter collapses map-side.
    """
    keys = _keys(key_cols)
    order = [F.col(order_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        # three-valued logic: NOT IN evaluates to NULL for a NULL op,
        # and WHERE drops NULL — but a NULL op marker is not a delete
        # (the common CDC shape marks only deletes), so keep it
        out = out.where(
            F.col(op_col).isNull()
            | ~F.col(op_col).isin(list(delete_values))
        )
    return out


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    change_ts_col: str,
    *,
    attr_cols: Optional[Sequence[str]] = None,
    collapse_unchanged: bool = True,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a keyed
    change log: each surviving row gains ``[valid_from, valid_to)``
    validity bounds (``valid_to`` NULL on the open current version) and
    an ``is_current`` flag.

    With ``collapse_unchanged=True`` (the default) a change row whose
    ``attr_cols`` all equal the previous version's (null-safely) is a
    no-op and is dropped BEFORE intervals are cut, so consecutive
    identical versions merge into one interval — the standard SCD2
    contract. ``attr_cols`` defaults to every non-key, non-timestamp
    column.

    Two window passes over the SAME ``partitionBy(key) orderBy(ts)``
    spec — Catalyst plans them in one shuffle (a single Window node
    chain, no second exchange).
    """
    keys = _keys(key_cols)
    if attr_cols is None:
        attr_cols = [
            c for c in df.columns if c not in keys and c != change_ts_col
        ]
    w = Window.partitionBy(*keys).orderBy(F.col(change_ts_col).asc())
    out = df
    if collapse_unchanged and attr_cols:
        # the opening version per key must survive unconditionally —
        # lag() of nothing is NULL, which a NULL first-row attribute
        # would null-safely "equal"
        changed = F.row_number().over(w) == 1
        for c in attr_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        out = out.withColumn("__chg", changed).where(F.col("__chg")).drop(
            "__chg"
        )
    w2 = Window.partitionBy(*keys).orderBy(F.col(change_ts_col).asc())
    return (
        out.withColumn(valid_from, F.col(change_ts_col))
        .withColumn(valid_to, F.lead(change_ts_col).over(w2))
        .withColumn(current_flag, F.col(valid_to).isNull())
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str] | str,
    compare_cols: Sequence[str],
    *,
    include_unchanged: bool = False,
    status_col: str = "change_status",
) -> DataFrame:
    """Diff two snapshots of a keyed table into a change feed: one row
    per key present in either side, labelled ``added`` / ``removed`` /
    ``changed`` (any ``compare_cols`` value differs, null-safely) /
    ``unchanged``. Output carries the keys, the status, and
    ``old_<c>`` / ``new_<c>`` for each compared column.

    ``unchanged`` rows — the overwhelming majority between adjacent
    snapshots — are excluded unless ``include_unchanged=True``, so the
    post-join filter prunes before anything else consumes the feed.

    One full-outer join co-partitioned on the key; bucket both
    snapshots on the key at write time and the exchange disappears.
    """
    keys = _keys(key_cols)
    # explicit presence markers, NOT key-null checks: the join is
    # null-safe, so a NULL-keyed row is a legitimate key value — testing
    # the key column for NULL would misclassify its removal as a change
    lhs = old.select(
        *[F.col(k).alias(f"__kl_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    rhs = new.select(
        *[F.col(k).alias(f"__kr_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        piece = F.col(f"__kl_{k}").eqNullSafe(F.col(f"__kr_{k}"))
        cond = piece if cond is None else (cond & piece)
    joined = lhs.join(rhs, cond, "full_outer")

    in_old = F.coalesce(F.col("__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    differs: Column = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"__kl_{k}"), F.col(f"__kr_{k}")).alias(k)
            for k in keys
        ],
        status.alias(status_col),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.where(F.col(status_col) != "unchanged")
    return out
