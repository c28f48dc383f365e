"""Comparison templates: pure composition over comparison levels.

Reference: splink/internals/comparison_library.py (class:line cited per
template). Each template builds the standard ladder
``Null → [specific ... general] → Else`` for one attribute.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import functions as F

from .column_expression import ColumnExpression
from .comparison import Comparison
from . import comparison_level_library as cll
from .comparison_level import ComparisonLevel

ColSpec = Union[str, ColumnExpression]


def _name(col: ColSpec) -> str:
    return ColumnExpression.instantiate(col).name


def _ladder(
    col: ColSpec,
    mid_levels: list[ComparisonLevel],
    description: str,
    *,
    exact_tf: bool = False,
    include_exact: bool = True,
    null_col: ColSpec = None,
) -> Comparison:
    name = _name(col)
    levels: list[ComparisonLevel] = [cll.NullLevel(null_col if null_col is not None else col)]
    if include_exact:
        levels.append(cll.ExactMatchLevel(col, term_frequency_adjustments=exact_tf))
    levels.extend(mid_levels)
    levels.append(cll.ElseLevel())
    return Comparison(name, levels, description, input_columns=[name])


# -- simple templates (comparison_library.py) --------------------------------


def ExactMatch(col: ColSpec, term_frequency_adjustments: bool = False) -> Comparison:
    """comparison_library.py:14."""
    return _ladder(col, [], f"ExactMatch({_name(col)})", exact_tf=term_frequency_adjustments)


def LevenshteinAtThresholds(col: ColSpec, distance_threshold_or_thresholds=(1, 2)) -> Comparison:
    """comparison_library.py:42."""
    ts = _as_list(distance_threshold_or_thresholds)
    return _ladder(
        col,
        [cll.LevenshteinLevel(col, t) for t in ts],
        f"LevenshteinAtThresholds({_name(col)}, {ts})",
    )


def DamerauLevenshteinAtThresholds(col: ColSpec, distance_threshold_or_thresholds=(1, 2)) -> Comparison:
    """comparison_library.py:92."""
    ts = _as_list(distance_threshold_or_thresholds)
    return _ladder(
        col,
        [cll.DamerauLevenshteinLevel(col, t) for t in ts],
        f"DamerauLevenshteinAtThresholds({_name(col)}, {ts})",
    )


def JaccardAtThresholds(col: ColSpec, score_threshold_or_thresholds=(0.9, 0.7)) -> Comparison:
    """comparison_library.py:148."""
    ts = _as_list(score_threshold_or_thresholds)
    return _ladder(
        col,
        [cll.JaccardLevel(col, t) for t in ts],
        f"JaccardAtThresholds({_name(col)}, {ts})",
    )


def JaroAtThresholds(col: ColSpec, score_threshold_or_thresholds=(0.9, 0.7)) -> Comparison:
    """comparison_library.py:195."""
    ts = _as_list(score_threshold_or_thresholds)
    return _ladder(
        col,
        [cll.JaroLevel(col, t) for t in ts],
        f"JaroAtThresholds({_name(col)}, {ts})",
    )


def JaroWinklerAtThresholds(col: ColSpec, score_threshold_or_thresholds=(0.9, 0.7)) -> Comparison:
    """comparison_library.py:242."""
    ts = _as_list(score_threshold_or_thresholds)
    return _ladder(
        col,
        [cll.JaroWinklerLevel(col, t) for t in ts],
        f"JaroWinklerAtThresholds({_name(col)}, {ts})",
    )


def DistanceFunctionAtThresholds(
    col: ColSpec,
    distance_function_name: str,
    distance_threshold_or_thresholds,
    higher_is_more_similar: bool = True,
) -> Comparison:
    """comparison_library.py:289."""
    ts = _as_list(distance_threshold_or_thresholds)
    return _ladder(
        col,
        [
            cll.DistanceFunctionLevel(col, distance_function_name, t, higher_is_more_similar)
            for t in ts
        ],
        f"DistanceFunctionAtThresholds({_name(col)}, {distance_function_name})",
    )


def AbsoluteTimeDifferenceAtThresholds(
    col: ColSpec,
    metrics: Sequence[str] = ("day",),
    thresholds: Sequence[float] = (1,),
    input_is_string: bool = False,
    datetime_format: str = None,
) -> Comparison:
    """comparison_library.py:420 — exact match, then one time-difference
    level per (metric, threshold) pair. Argument validation mirrors the
    reference (:468-486): both lists non-empty and the same length; each
    level additionally rejects negative thresholds and unknown metrics.
    ``input_is_string`` / ``datetime_format`` parse string dates first
    (invalid dates → null)."""
    metrics = list(_as_list(metrics))
    thresholds = list(_as_list(thresholds))
    if len(thresholds) == 0:
        raise ValueError("thresholds must have at least one entry")
    if len(metrics) == 0:
        raise ValueError("metrics must have at least one entry")
    if len(metrics) != len(thresholds):
        raise ValueError(
            "thresholds and metrics must have the same number of entries"
        )
    mids = [
        cll.AbsoluteTimeDifferenceLevel(
            col, t, m, input_is_string=input_is_string,
            datetime_format=datetime_format,
        )
        for m, t in zip(metrics, thresholds)
    ]
    # invalid_dates_as_null (reference default): with string inputs the null
    # level tests the PARSED expression, so unparseable dates route to null
    null_col = None
    if input_is_string or datetime_format is not None:
        null_col = cll._date_parsed_ce(col, input_is_string, datetime_format)
    return _ladder(
        col, mids, f"AbsoluteTimeDifferenceAtThresholds({_name(col)})",
        null_col=null_col,
    )


def AbsoluteDateDifferenceAtThresholds(
    col: ColSpec,
    metrics: Sequence[str] = ("day",),
    thresholds: Sequence[float] = (1,),
    input_is_string: bool = False,
    datetime_format: str = None,
) -> Comparison:
    """comparison_library.py:541."""
    return AbsoluteTimeDifferenceAtThresholds(
        col, metrics, thresholds,
        input_is_string=input_is_string, datetime_format=datetime_format,
    )


def ArrayIntersectAtSizes(col: ColSpec, size_threshold_or_thresholds=(1,)) -> Comparison:
    """comparison_library.py:551 — descending sizes, no exact level.
    Non-positive sizes are rejected (reference raises ValueError: a
    ``size >= 0`` level is always true and swallows every later level)."""
    ts = sorted(_as_list(size_threshold_or_thresholds), reverse=True)
    if any(t <= 0 for t in ts):
        raise ValueError(
            f"size thresholds must be positive integers, got {ts}"
        )
    return _ladder(
        col,
        [cll.ArrayIntersectLevel(col, t) for t in ts],
        f"ArrayIntersectAtSizes({_name(col)}, {ts})",
        include_exact=False,
    )


def DistanceInKMAtThresholds(
    lat_col: ColSpec, long_col: ColSpec, km_thresholds: Sequence[float]
) -> Comparison:
    """comparison_library.py:596."""
    lat_name, lon_name = _name(lat_col), _name(long_col)
    levels: list[ComparisonLevel] = [
        cll.Or(cll.NullLevel(lat_col), cll.NullLevel(long_col)),
    ]
    for t in km_thresholds:
        levels.append(cll.DistanceInKMLevel(lat_col, long_col, t))
    levels.append(cll.ElseLevel())
    return Comparison(
        f"{lat_name}_{lon_name}",
        levels,
        f"DistanceInKMAtThresholds({lat_name},{lon_name})",
        input_columns=[lat_name, lon_name],
    )


def CosineSimilarityAtThresholds(col: ColSpec, score_threshold_or_thresholds=(0.9, 0.7)) -> Comparison:
    """comparison_library.py:1196."""
    ts = _as_list(score_threshold_or_thresholds)
    return _ladder(
        col,
        [cll.CosineSimilarityLevel(col, t) for t in ts],
        f"CosineSimilarityAtThresholds({_name(col)}, {ts})",
        include_exact=False,
    )


def AbsoluteDifferenceAtThresholds(col: ColSpec, thresholds=(1.0,)) -> Comparison:
    """Numeric ladder via AbsoluteDifferenceLevel (comparison_level_library.py:1088)."""
    ts = _as_list(thresholds)
    return _ladder(
        col,
        [cll.AbsoluteDifferenceLevel(col, t) for t in ts],
        f"AbsoluteDifferenceAtThresholds({_name(col)}, {ts})",
    )


def PercentageDifferenceAtThresholds(col: ColSpec, thresholds=(0.01,)) -> Comparison:
    ts = _as_list(thresholds)
    return _ladder(
        col,
        [cll.PercentageDifferenceLevel(col, t) for t in ts],
        f"PercentageDifferenceAtThresholds({_name(col)}, {ts})",
    )


def CustomComparison(
    output_column_name: str,
    comparison_levels: list[ComparisonLevel],
    comparison_description: Optional[str] = None,
    input_columns: Optional[list[str]] = None,
) -> Comparison:
    """comparison_library.py:647."""
    return Comparison(
        output_column_name, comparison_levels, comparison_description, input_columns
    )


# -- composite real-world templates ------------------------------------------


def DateOfBirthComparison(
    col: ColSpec,
    input_is_string: bool = False,
    datetime_format: str = "yyyy-MM-dd",
    datetime_thresholds: Sequence[float] = (1, 1, 10),
    datetime_metrics: Sequence[str] = ("month", "year", "year"),
) -> Comparison:
    """comparison_library.py:712 — null-if-unparseable → exact → DL<=1 on the
    string form → abs date-diff ladder (:786-830)."""
    name = _name(col)
    ce = ColumnExpression.instantiate(col)
    date_ce = ce.try_parse_date(datetime_format) if input_is_string else ce
    str_ce = ce if input_is_string else ce.cast_to_string()
    levels: list[ComparisonLevel] = [
        cll.NullLevel(date_ce),
        cll.ExactMatchLevel(col),
        cll.DamerauLevenshteinLevel(str_ce, 1),
    ]
    for m, t in zip(datetime_metrics, datetime_thresholds):
        levels.append(cll.AbsoluteDateDifferenceLevel(date_ce, t, m))
    levels.append(cll.ElseLevel())
    return Comparison(name, levels, f"DateOfBirthComparison({name})", input_columns=[name])


def EmailComparison(col: ColSpec) -> Comparison:
    """comparison_library.py:954 — exact → username exact → JW full → JW username."""
    name = _name(col)
    ce = ColumnExpression.instantiate(col)
    username = ce.regex_extract(r"^[^@]+")
    levels = [
        cll.NullLevel(col),
        cll.ExactMatchLevel(col),
        cll.ExactMatchLevel(username),
        cll.JaroWinklerLevel(col, 0.88),
        cll.JaroWinklerLevel(username, 0.88),
        cll.ElseLevel(),
    ]
    return Comparison(name, levels, f"EmailComparison({name})", input_columns=[name])


def NameComparison(
    col: ColSpec,
    jaro_winkler_thresholds: Sequence[float] = (0.92, 0.88, 0.7),
    phonetic_match: bool = False,
) -> Comparison:
    """comparison_library.py:1005 — exact(TF) → JW ladder [→ dmetaphone]."""
    name = _name(col)
    levels: list[ComparisonLevel] = [
        cll.NullLevel(col),
        cll.ExactMatchLevel(col, term_frequency_adjustments=True),
    ]
    for t in jaro_winkler_thresholds:
        levels.append(cll.JaroWinklerLevel(col, t))
    if phonetic_match:
        levels.append(cll.PhoneticMatchLevel(col))
    levels.append(cll.ElseLevel())
    return Comparison(name, levels, f"NameComparison({name})", input_columns=[name])


def ForenameSurnameComparison(
    forename_col: ColSpec,
    surname_col: ColSpec,
    *,
    jaro_winkler_thresholds: Union[float, Sequence[float]] = (0.92, 0.88),
    forename_surname_concat_col_name: Optional[str] = None,
) -> Comparison:
    """comparison_library.py:1090-1193 — null only when BOTH null; exact both
    (or exact on the concatenated column with TF, when provided); reversed;
    one AND-JW level per threshold (default 0.92, 0.88); exact surname (TF);
    exact forename (TF)."""
    if isinstance(jaro_winkler_thresholds, (int, float)):
        jaro_winkler_thresholds = [jaro_winkler_thresholds]
    f_name, s_name = _name(forename_col), _name(surname_col)
    levels: list[ComparisonLevel] = [
        cll.And(cll.NullLevel(forename_col), cll.NullLevel(surname_col)),
    ]
    if forename_surname_concat_col_name is not None:
        levels.append(
            cll.ExactMatchLevel(
                forename_surname_concat_col_name, term_frequency_adjustments=True
            )
        )
    else:
        levels.append(
            cll.And(
                cll.ExactMatchLevel(forename_col), cll.ExactMatchLevel(surname_col)
            )
        )
    levels.append(
        cll.ColumnsReversedLevel(forename_col, surname_col, symmetrical=True)
    )
    for threshold in jaro_winkler_thresholds:
        levels.append(
            cll.And(
                cll.JaroWinklerLevel(forename_col, threshold),
                cll.JaroWinklerLevel(surname_col, threshold),
            )
        )
    levels.append(
        cll.ExactMatchLevel(surname_col, term_frequency_adjustments=True)
    )
    levels.append(
        cll.ExactMatchLevel(forename_col, term_frequency_adjustments=True)
    )
    levels.append(cll.ElseLevel())
    input_cols = [f_name, s_name] + (
        [forename_surname_concat_col_name] if forename_surname_concat_col_name else []
    )
    return Comparison(
        f"{f_name}_{s_name}",
        levels,
        f"ForenameSurnameComparison({f_name},{s_name})",
        input_columns=input_cols,
    )


def PostcodeComparison(col: ColSpec) -> Comparison:
    """comparison_library.py:836 — full → sector → district → area regex ladder
    (:901-948)."""
    name = _name(col)
    ce = ColumnExpression.instantiate(col)
    sector = ce.regex_extract(r"^[A-Za-z]{1,2}\d[A-Za-z\d]? ?\d")
    district = ce.regex_extract(r"^[A-Za-z]{1,2}\d[A-Za-z\d]?")
    area = ce.regex_extract(r"^[A-Za-z]{1,2}")
    levels = [
        cll.NullLevel(col, valid_string_pattern=r"^[A-Za-z]{1,2}\d[A-Za-z\d]? ?\d[A-Za-z]{2}$"),
        cll.ExactMatchLevel(col),
        cll.ExactMatchLevel(sector),
        cll.ExactMatchLevel(district),
        cll.ExactMatchLevel(area),
        cll.ElseLevel(),
    ]
    return Comparison(name, levels, f"PostcodeComparison({name})", input_columns=[name])


def PairwiseStringDistanceFunctionAtThresholds(
    col: ColSpec,
    distance_function_name: str = "levenshtein",
    distance_threshold_or_thresholds=(1, 2),
) -> Comparison:
    """comparison_library.py:350 — best score over the cross product of two
    string arrays. levenshtein runs as native higher-order functions
    (JVM-side); jaro_winkler / jaro / jaccard / damerau_levenshtein run the
    whole cross product inside one Arrow-batched pandas UDF (reference
    comparison_level_library.py:613-687 builds the same cross product in SQL
    feeding the jar UDF). Lower-is-better metrics order thresholds ascending
    (tightest first); similarity metrics descending."""
    name = _name(col)
    ts = _as_list(distance_threshold_or_thresholds)
    levels = [
        cll.NullLevel(col),
        # identical values are the most similar pair (reference
        # comparison_library.py:391-396 puts ArrayIntersectLevel on top)
        cll.ArrayIntersectLevel(col, min_intersection=1),
        *[
            cll.PairwiseStringDistanceFunctionLevel(col, distance_function_name, t)
            for t in ts
        ],
        cll.ElseLevel(),
    ]
    return Comparison(
        name, levels, f"PairwiseStringDistance({name})", input_columns=[name]
    )


def _as_list(x) -> list:
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]
