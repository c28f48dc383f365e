"""Scalable fuzzy equi-joins: deletion-neighborhood blocking (the FastSS
family — Bocek et al. 2007, also the spelling-correction trick behind
SymSpell). Levenshtein-distance-1 candidate pairs WITHOUT a quadratic
comparison: two strings within edit distance 1 share at least one
member of their single-deletion neighborhoods, so generating the ≤ L+1
deletion variants per string turns the fuzzy join into a plain
equi-join on the variant key + an exact verify on the candidates.

Scale shape: variants per string = length+1 (bounded by ``max_len``),
generated JVM-side with higher-order functions; the join is a hash
equi-join on the variant; the exact ``levenshtein`` verify runs only on
candidates. Contrast with the linkage engine's blocking rules: this is
the right tool when there is NO other blocking key and the value set is
large (a raw θ-join on levenshtein <= 1 is quadratic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "fuzzy_join_ed1"]


def deletion_variants(col: Column, max_len: int = 64) -> Column:
    """Array of the string itself plus every single-character-deletion
    variant (distinct). Strings longer than ``max_len`` contribute only
    themselves — a guard against pathological long values blowing up the
    variant table; such strings still match EXACT duplicates."""
    s = col
    full = F.array(s)
    # deletion of position i: prefix [1, i-1] + suffix [i+1, end]
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
        ),
    )
    return F.when(
        (F.length(s) > int(max_len)) | s.isNull(), full
    ).otherwise(F.array_distinct(F.concat(full, dels)))


def fuzzy_join_ed1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    max_len: int = 64,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(left_col, right_col)``
    <= 1, as (``left_id``, ``right_id``, left value, right value,
    distance) — exact (the deletion-neighborhood property guarantees no
    candidate is missed at distance 1), deduplicated, deterministic.
    """
    lv = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_col).alias("__lval"),
        F.explode(deletion_variants(F.col(left_col), max_len)).alias("__var"),
    )
    rv = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_col).alias("__rval"),
        F.explode(deletion_variants(F.col(right_col), max_len)).alias("__var"),
    )
    cand = lv.join(rv, "__var").select(
        "__lid", "__lval", "__rid", "__rval"
    ).distinct()
    dist = F.levenshtein(F.col("__lval"), F.col("__rval"))
    return (
        cand.withColumn("distance", dist)
        .where(F.col("distance") <= 1)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__lval").alias(left_col),
            F.col("__rval").alias(right_col),
            "distance",
        )
    )
