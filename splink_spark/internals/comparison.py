"""A Comparison = ordered ladder of ComparisonLevels for one attribute.

Reference semantics: splink/internals/comparison.py (CASE ladder compile at
:161-168; gamma-column naming :133-154). Gamma ("comparison vector value")
assignment: the null level is -1, the ELSE arm is 0, and the remaining levels
count down from n_nonnull-1 in declaration order — so the first (most
specific) level gets the highest gamma, matching reference CASE semantics.

Native rewrite: the CASE ladder is an ``F.when`` chain (identical first-match
semantics); bayes-factor ladders are ``F.when`` chains over the gamma column.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from .comparison_level import _UNSUPPLIED, ComparisonLevel


class Comparison:
    def __init__(
        self,
        output_column_name: str,
        comparison_levels: list[ComparisonLevel],
        comparison_description: Optional[str] = None,
        input_columns: Optional[list[str]] = None,
    ):
        self.output_column_name = output_column_name
        self.comparison_description = comparison_description or output_column_name
        self.comparison_levels = comparison_levels
        # raw input columns this comparison reads (used to narrow the junction
        # re-join's shuffle width; None → unknown, carry all columns)
        self.input_columns = input_columns
        # output-column prefixes; overridden by Settings.__post_init__ from
        # the *_column_prefix settings keys (reference settings.py:215-233)
        self.gamma_prefix = "gamma_"
        self.bf_prefix = "bf_"
        self.mw_prefix = "mw_"
        self.tf_prefix = "tf_"
        self._assign_gamma_values()

    # -- gamma assignment ------------------------------------------------------
    def _assign_gamma_values(self) -> None:
        non_null = [lv for lv in self.comparison_levels if not lv.is_null_level]
        # gamma_column() compiles the else arm as the CASE's otherwise(0), so
        # an else level anywhere but last would be keyed to a non-zero gamma
        # its pairs can never receive — probabilities silently land on the
        # wrong level. Reject the misordering instead.
        for lv in self.comparison_levels[:-1]:
            if lv.is_else_level:
                raise ValueError(
                    f"comparison {self.output_column_name!r}: the else level "
                    "must be the last level (it compiles to the CASE "
                    "ladder's ELSE arm)"
                )
        n = len(non_null)
        next_gamma = n - 1
        for lv in self.comparison_levels:
            if lv.is_null_level:
                lv.comparison_vector_value = -1
            else:
                lv.comparison_vector_value = next_gamma
                next_gamma -= 1

    @property
    def gamma_column_name(self) -> str:
        # spaces sanitised like the reference (comparison.py:189-190) so the
        # output column is always a plain identifier
        return f"{self.gamma_prefix}{self.output_column_name}".replace(" ", "_")

    @property
    def num_levels(self) -> int:
        return len([lv for lv in self.comparison_levels if not lv.is_null_level])

    @property
    def has_null_level(self) -> bool:
        return any(lv.is_null_level for lv in self.comparison_levels)

    @property
    def has_tf_adjustments(self) -> bool:
        return any(lv.has_tf_adjustment for lv in self.comparison_levels)

    @property
    def tf_adjustment_input_columns(self) -> list[str]:
        return sorted(
            {lv.tf_adjustment_column for lv in self.comparison_levels if lv.has_tf_adjustment}
        )

    # -- CASE ladders ----------------------------------------------------------
    def gamma_column(self) -> Column:
        """``CASE WHEN <null> THEN -1 WHEN <level k> THEN k ... ELSE 0 END``.

        First-match-wins order is the declaration order, exactly as the
        reference compiles its CASE (comparison.py:161-168).
        """
        expr: Optional[Column] = None
        for lv in self.comparison_levels:
            if lv.is_else_level:
                continue
            arm = F.lit(lv.comparison_vector_value)
            if expr is None:
                expr = F.when(lv.condition(), arm)
            else:
                expr = expr.when(lv.condition(), arm)
        if expr is None:  # single ELSE-only comparison (degenerate)
            return F.lit(0)
        return expr.otherwise(F.lit(0)).alias(self.gamma_column_name)

    def bayes_factor_column(self) -> Column:
        """Per-pair bayes factor keyed off the materialised gamma column.

        Reference: comparison_level.py:664-669 emits log2(m/u) per gamma; we
        emit the bayes factor itself (``bf_gamma_<col>`` in predict output)
        and take log2 at combine time — numerically identical because the
        constants are computed once on the driver.
        """
        gamma = F.col(self.gamma_column_name)
        expr: Optional[Column] = None
        for lv in self.comparison_levels:
            if lv.is_null_level:
                continue
            bf = F.lit(float(lv.bayes_factor))
            cond = gamma == F.lit(lv.comparison_vector_value)
            expr = F.when(cond, bf) if expr is None else expr.when(cond, bf)
        assert expr is not None
        # null level → bayes factor 1 (no evidence)
        return expr.otherwise(F.lit(1.0)).alias(f"{self.bf_prefix}{self.gamma_column_name}")

    def log2_bayes_factor_column(self) -> Column:
        """``mw_<col>``: per-pair log2 bayes factor as a CASE ladder over
        driver-precomputed constants (comparison_level.py:664-669). Using
        log2 constants (not runtime log2(bf)) keeps the combine step a pure
        sum of literals — deterministic across engines for oracle parity."""
        gamma = F.col(self.gamma_column_name)
        expr: Optional[Column] = None
        for lv in self.comparison_levels:
            if lv.is_null_level:
                continue
            c = F.lit(float(lv.log2_bayes_factor))
            cond = gamma == F.lit(lv.comparison_vector_value)
            expr = F.when(cond, c) if expr is None else expr.when(cond, c)
        assert expr is not None
        return expr.otherwise(F.lit(0.0)).alias(f"{self.mw_prefix}{self.output_column_name}".replace(" ", "_"))

    def log2_tf_adjustment_column(self) -> Optional[Column]:
        """log2 of the TF-adjusted multiplier: w * (log2(u_exact) - log2(tf))
        (comparison_level.py:671-731, log-space form per SURVEY §2.8)."""
        if not self.has_tf_adjustments:
            return None
        import math as _math

        gamma = F.col(self.gamma_column_name)
        expr: Optional[Column] = None
        for lv in self.comparison_levels:
            if not lv.has_tf_adjustment:
                continue
            c = lv.tf_adjustment_column
            tf_l, tf_r = F.col(f"{self.tf_prefix}{c}_l"), F.col(f"{self.tf_prefix}{c}_r")
            tf_term = F.greatest(
                F.coalesce(tf_l, tf_r),
                F.coalesce(tf_r, tf_l),
                F.lit(float(lv.tf_minimum_u_value)),
            )
            u_exact = self._u_probability_for_exact_match(lv)
            log2_u_exact = F.lit(_math.log2(max(u_exact, 1e-300)))
            adj = F.lit(float(lv.tf_adjustment_weight)) * (log2_u_exact - F.log2(tf_term))
            cond = gamma == F.lit(lv.comparison_vector_value)
            arm = F.when(tf_term.isNotNull() & (tf_term > 0), adj).otherwise(F.lit(0.0))
            expr = F.when(cond, arm) if expr is None else expr.when(cond, arm)
        assert expr is not None
        return expr.otherwise(F.lit(0.0)).alias(f"{self.mw_prefix}tf_{self.output_column_name}".replace(" ", "_"))

    def tf_adjustment_column_expr(self) -> Optional[Column]:
        """Term-frequency adjusted bayes-factor multiplier (``bf_tf_adj_*``).

        Reference comparison_level.py:671-731: for a TF-adjusted level k on
        column c, multiplier = (u_for_exact_match / tf_term)^tf_weight where
        tf_term = greatest(coalesce(tf_l, tf_r), coalesce(tf_r, tf_l),
        tf_minimum_u_value). Levels without TF config contribute 1.
        """
        if not self.has_tf_adjustments:
            return None
        gamma = F.col(self.gamma_column_name)
        expr: Optional[Column] = None
        for lv in self.comparison_levels:
            if not lv.has_tf_adjustment:
                continue
            c = lv.tf_adjustment_column
            tf_l, tf_r = F.col(f"{self.tf_prefix}{c}_l"), F.col(f"{self.tf_prefix}{c}_r")
            tf_term = F.greatest(
                F.coalesce(tf_l, tf_r),
                F.coalesce(tf_r, tf_l),
                F.lit(float(lv.tf_minimum_u_value)),
            )
            # same 1e-300 clamp as log2_tf_adjustment_column — without it a
            # trained u of exactly 0 makes this audit column 0 (log2 = -inf)
            # while the match weight uses log2(1e-300), and the bf_* columns
            # stop reconciling with match_weight
            u_exact = F.lit(max(float(self._u_probability_for_exact_match(lv)), 1e-300))
            mult = F.pow(u_exact / tf_term, F.lit(float(lv.tf_adjustment_weight)))
            cond = gamma == F.lit(lv.comparison_vector_value)
            arm = F.when(tf_term.isNotNull() & (tf_term > 0), mult).otherwise(F.lit(1.0))
            expr = F.when(cond, arm) if expr is None else expr.when(cond, arm)
        assert expr is not None
        return expr.otherwise(F.lit(1.0)).alias(f"{self.bf_prefix}tf_adj_{self.gamma_column_name}")

    def _u_probability_for_exact_match(self, level: ComparisonLevel) -> float:
        """u of the exact-match level for the SAME TF column as ``level``;
        fallback: any exact level, then the level's own u.

        Replaces the reference's sqlglot-signature autodetection
        (comparison_level.py:587-662) with the structural
        ``is_exact_match_level`` flag set by the level builders. Matching on
        ``tf_adjustment_column`` matters for multi-column comparisons with
        two TF-adjusted exact levels — the first exact level's u would
        otherwise scale the wrong column's adjustment.

        ``disable_tf_exact_match_detection`` (reference
        comparison_level.py:623-634) anchors on the level's OWN u instead.
        """
        if level.disable_tf_exact_match_detection:
            if level.u_probability is None:
                raise ValueError(
                    "Cannot compute term frequency adjustment when "
                    "disable_tf_exact_match_detection is True but "
                    "u_probability is not set on this level."
                )
            return level.u_probability
        for lv in self.comparison_levels:
            if (
                lv.is_exact_match_level
                and lv.u_probability is not None
                and lv.tf_adjustment_column == level.tf_adjustment_column
            ):
                return lv.u_probability
        for lv in self.comparison_levels:
            if lv.is_exact_match_level and lv.u_probability is not None:
                return lv.u_probability
        return level.u_probability if level.u_probability is not None else 1.0

    # -- parameter access ------------------------------------------------------
    def level_for_gamma(self, gamma: int) -> ComparisonLevel:
        for lv in self.comparison_levels:
            if lv.comparison_vector_value == gamma:
                return lv
        raise KeyError(gamma)

    @property
    def all_probabilities_set(self) -> bool:
        return all(
            lv.has_probabilities for lv in self.comparison_levels if not lv.is_null_level
        )

    def configure(
        self,
        *,
        term_frequency_adjustments=_UNSUPPLIED,
        m_probabilities=_UNSUPPLIED,
        u_probabilities=_UNSUPPLIED,
    ) -> "Comparison":
        """Options common to all comparisons (reference
        comparison_creator.py:152-200): ``m_probabilities`` /
        ``u_probabilities`` map onto the non-null levels in order (exact
        first, ELSE last); ``term_frequency_adjustments`` switches TF on for
        the exact-match levels. Only supplied options change; returns self
        for chaining."""
        if term_frequency_adjustments is not _UNSUPPLIED:
            for lv in self.comparison_levels:
                if not lv.is_exact_match_level:
                    continue
                if term_frequency_adjustments:
                    col = None
                    if lv.spec and lv.spec.get("builder") == "ExactMatchLevel":
                        a = lv.spec.get("args") or []
                        if a and isinstance(a[0], str):
                            col = a[0]
                    lv.tf_adjustment_column = col or (
                        self.input_columns[0]
                        if self.input_columns
                        else self.output_column_name
                    )
                else:
                    lv.tf_adjustment_column = None
        for kind, probs in (("m_probability", m_probabilities),
                            ("u_probability", u_probabilities)):
            if probs is _UNSUPPLIED:
                continue
            scorable = [lv for lv in self.comparison_levels if not lv.is_null_level]
            if len(probs) != len(scorable):
                raise ValueError(
                    f"{kind[0]}_probabilities has {len(probs)} values but "
                    f"comparison {self.output_column_name!r} has "
                    f"{len(scorable)} non-null levels"
                )
            for lv, p in zip(scorable, probs):
                setattr(lv, kind, p)
        return self

    def as_dict(self) -> dict:
        from .comparison_level_library import level_spec_dict

        return {
            "output_column_name": self.output_column_name,
            "comparison_description": self.comparison_description,
            "input_columns": self.input_columns,
            "comparison_levels": [level_spec_dict(lv) for lv in self.comparison_levels],
        }

    @staticmethod
    def from_dict(d: dict) -> "Comparison":
        from .comparison_level_library import level_from_spec_dict

        input_columns = d.get("input_columns")
        if input_columns is None:
            input_columns = _infer_input_columns_from_level_dicts(
                d.get("comparison_levels", [])
            )
        return Comparison(
            d["output_column_name"],
            [level_from_spec_dict(ld) for ld in d["comparison_levels"]],
            d.get("comparison_description"),
            input_columns,
        )

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Comparison({self.output_column_name!r}, "
            f"{len(self.comparison_levels)} levels)"
        )


def _infer_input_columns_from_level_dicts(level_dicts: list) -> Optional[list[str]]:
    """Reference-format settings dicts carry raw ``sql_condition`` strings and
    no explicit column list; EM's comparison-deactivation and session-lambda
    blocking adjustment (em_training_session.py:136-163) need to know which
    base columns a comparison reads. Mirror the reference's
    ``_input_columns_used_by_sql_condition`` (comparison_level.py) by
    collecting every ``<col>_l`` / ``<col>_r`` identifier in the conditions.
    Without this, training rules like ``l.surname = r.surname`` silently fail
    to deactivate the surname comparison — the error cancels at EM iteration 1
    (unadjusted prior x exact-match BF == adjusted prior) and corrupts every
    later iteration."""
    import re as _re

    cols: list[str] = []
    for ld in level_dicts:
        if not isinstance(ld, dict):
            continue
        sql = ld.get("sql_condition") or ""
        # blank single-quoted literal spans first: a literal containing
        # '_l' / '_r' (e.g. a regex pattern 'foo_l') is not a column
        # reference, and a phantom column here triggers spurious
        # missing-column warnings and wrongful EM comparison deactivation
        sql = _re.sub(r"'(?:[^'\\]|\\.|'')*'", " ", sql)
        for m in _re.finditer(r"\b([A-Za-z_]\w*?)_[lr]\b", sql):
            c = m.group(1)
            if c not in cols:
                cols.append(c)
    return cols or None


def match_weight_columns(prior_lambda: float) -> tuple[float, str]:
    """log2 prior bayes factor (reference predict.py:203-212)."""
    lam = min(max(prior_lambda, 1e-300), 1 - 1e-15)
    return math.log2(lam / (1 - lam)), "match_weight"
