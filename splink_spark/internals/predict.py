"""Scoring: gamma vector → bayes factors → match weight → match probability.

Reference: splink/internals/predict.py:42-132 —
``match_weight = log2(lambda/(1-lambda)) + sum(log2(bf_c)) [+ sum(log2(bf_tf_c))]``
with the numerically-stable sigmoid (:216-227):
``p = 1/(1+2^-mw)`` when mw >= 0 else ``2^mw/(1+2^mw)``.

All arithmetic is Column math inside whole-stage codegen; the per-gamma
bayes-factor constants are computed once on the driver.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .settings import Settings


def prior_log2_bayes_factor(prior: float) -> float:
    lam = min(max(prior, 1e-300), 1.0 - 1e-15)
    return math.log2(lam / (1.0 - lam))


def stable_sigmoid(match_weight: Column) -> Column:
    """2^mw / (1 + 2^mw), computed stably (predict.py:216-227)."""
    two_pow = F.pow(F.lit(2.0), match_weight)
    two_pow_neg = F.pow(F.lit(2.0), -match_weight)
    return F.when(match_weight >= 0, F.lit(1.0) / (F.lit(1.0) + two_pow_neg)).otherwise(
        two_pow / (F.lit(1.0) + two_pow)
    )


def predict_from_comparison_vectors(
    cv: DataFrame,
    settings: Settings,
    threshold_match_probability: Optional[float] = None,
    threshold_match_weight: Optional[float] = None,
) -> DataFrame:
    """Append bf_*, match_weight, match_probability; optionally filter.

    The threshold is pushed into a WHERE on the same plan (predict.py:100-107)
    so Catalyst can pipeline filter+project in one codegen stage.
    """
    if not settings.all_probabilities_set:
        raise ValueError(
            "m/u probabilities not set on every comparison level — train the "
            "model or supply probabilities before predict()"
        )
    bf_cols: list[Column] = []
    for comp in settings.comparisons:
        bf_cols.append(comp.bayes_factor_column())
        tf_col = comp.tf_adjustment_column_expr()
        if tf_col is not None:
            bf_cols.append(tf_col)

    scored = cv.select("*", *bf_cols)

    # match weight: a sum of driver-precomputed log2 constants selected by
    # CASE-on-gamma ladders (plus the runtime log2(tf) terms) — identical
    # result to log2(prod bf) but deterministic in summation order
    mw: Column = F.lit(prior_log2_bayes_factor(settings.probability_two_random_records_match))
    for comp in settings.comparisons:
        mw = mw + comp.log2_bayes_factor_column()
        tf_mw = comp.log2_tf_adjustment_column()
        if tf_mw is not None:
            mw = mw + tf_mw

    scored = scored.withColumn("match_weight", mw)
    scored = scored.withColumn("match_probability", stable_sigmoid(F.col("match_weight")))

    if threshold_match_weight is not None:
        scored = scored.where(F.col("match_weight") >= threshold_match_weight)
    if threshold_match_probability is not None:
        scored = scored.where(F.col("match_probability") >= threshold_match_probability)

    if not settings.retain_intermediate_calculation_columns:
        # drop ONLY the internal audit aliases — a prefix match would also
        # delete user input columns that happen to start with "bf_"
        internal = set()
        for comp in settings.comparisons:
            internal.add(f"{comp.bf_prefix}{comp.gamma_column_name}")
            internal.add(f"{comp.bf_prefix}tf_adj_{comp.gamma_column_name}")
        scored = scored.drop(*[c for c in scored.columns if c in internal])

    front = ["match_weight", "match_probability"]
    rest = [c for c in scored.columns if c not in front]
    return scored.select(*front, *rest)
