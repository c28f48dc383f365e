"""similarity_analysis exploratory helpers + testing helpers + EM
iteration-history charts (reference internals/similarity_analysis.py,
internals/testing.py, em_training_session.py:432-468)."""

from __future__ import annotations

import json

import pytest

import splink_spark.comparison_level_library as cll
import splink_spark.comparison_library as cl
from splink_spark import Linker, SettingsCreator, block_on
from splink_spark.exploratory import similarity_analysis as sa
from splink_spark.internals.testing import comparison_vector_value, is_in_level

PAIRS = {
    "string1": ["Stephen", "Stephen", "Stephen"],
    "string2": ["Stephen", "Steven", "Stephan"],
}


def test_comparator_score_identical_strings(spark):
    df = sa.comparator_score("Richard", "Richard", spark=spark)
    row = df.iloc[0]
    assert row["levenshtein_distance"] == 0
    assert row["damerau_levenshtein_distance"] == 0
    assert row["jaro_similarity"] == 1.0
    assert row["jaro_winkler_similarity"] == 1.0
    assert row["jaccard_similarity"] == 1.0


def test_comparator_score_transposition(spark):
    # the reference docstring's own example: one adjacent transposition
    df = sa.comparator_score("Richard", "iRchard", spark=spark)
    row = df.iloc[0]
    assert row["levenshtein_distance"] == 2
    assert row["damerau_levenshtein_distance"] == 1
    assert 0.9 < row["jaro_similarity"] <= 1.0
    # identical character sets -> jaccard 1
    assert row["jaccard_similarity"] == 1.0


def test_comparator_score_df_columns_and_rows(spark):
    df = sa.comparator_score_df(PAIRS, "string1", "string2", spark=spark)
    assert list(df.columns) == [
        "string1",
        "string2",
        "levenshtein_distance",
        "damerau_levenshtein_distance",
        "jaro_similarity",
        "jaro_winkler_similarity",
        "jaccard_similarity",
    ]
    assert len(df) == 3
    exact = df[df["string2"] == "Stephen"].iloc[0]
    assert exact["levenshtein_distance"] == 0 and exact["jaro_similarity"] == 1.0


def test_comparator_score_charts(spark):
    chart = sa.comparator_score_chart(PAIRS, "string1", "string2", spark=spark)
    assert chart["$schema"].startswith("https://vega.github.io/schema/vega-lite")
    sim_values = chart["hconcat"][0]["data"]["values"]
    dist_values = chart["hconcat"][1]["data"]["values"]
    assert {v["comparator"] for v in sim_values} == {
        "jaro", "jaro_winkler", "jaccard",
    }
    assert {v["comparator"] for v in dist_values} == {
        "levenshtein", "damerau_levenshtein",
    }
    assert all("strings_to_compare" in v and "score" in v for v in sim_values)
    json.dumps(chart)  # must be JSON-serializable

    tchart = sa.comparator_score_threshold_chart(
        PAIRS, "string1", "string2",
        similarity_threshold=0.8, distance_threshold=2, spark=spark,
    )
    assert tchart["params"][0]["value"] == 0.8
    assert tchart["params"][1]["value"] == 2
    json.dumps(tchart)


def test_phonetic_transform_scalar():
    t = sa.phonetic_transform("Stephen")
    assert set(t) == {"soundex", "metaphone", "dmetaphone"}
    assert t["soundex"] == "S315"
    assert isinstance(t["dmetaphone"], list) and t["dmetaphone"]


def test_phonetic_transform_df_and_chart(spark):
    df = sa.phonetic_transform_df(PAIRS, "string1", "string2", spark=spark)
    assert list(df.columns) == ["string1", "string2", "soundex", "metaphone", "dmetaphone"]
    # Stephen vs Stephen agrees under every transform
    exact = df[df["string2"] == "Stephen"].iloc[0]
    assert exact["soundex"][0] == exact["soundex"][1]
    assert exact["metaphone"][0] == exact["metaphone"][1]

    chart = sa.phonetic_match_chart(PAIRS, "string1", "string2", spark=spark)
    values = chart["data"]["values"]
    assert {v["phonetic"] for v in values} == {"soundex", "metaphone", "dmetaphone"}
    exact_rows = [v for v in values if v["strings_to_compare"] == "Stephen, Stephen"]
    assert all(v["match"] for v in exact_rows)
    json.dumps(chart)


def test_python_soundex_matches_spark(spark):
    words = ["Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister", "Honeyman"]
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(w,) for w in words], ["w"])
    native = [r[0] for r in sdf.select(F.soundex("w")).collect()]
    assert [sa._py_soundex(w) for w in words] == native


# -- testing helpers (reference internals/testing.py) ------------------------


def test_is_in_level(spark):
    lev = cll.LevenshteinLevel("name", 2)
    res = is_in_level(
        lev,
        [
            {"name_l": "john", "name_r": "john"},
            {"name_l": "john", "name_r": "jon"},
            {"name_l": "john", "name_r": "mary"},
        ],
        spark,
    )
    assert res == [True, True, False]
    # single dict returns a single bool
    assert is_in_level(lev, {"name_l": "a", "name_r": "a"}, spark) is True
    # ELSE level is always in-level (reference testing.py:23-25)
    assert is_in_level(cll.ElseLevel(), {"name_l": "x", "name_r": "y"}, spark) is True


def test_comparison_vector_value(spark):
    comp = cl.LevenshteinAtThresholds("name", [1, 2])
    res = comparison_vector_value(
        comp,
        [
            {"name_l": "john", "name_r": "john"},   # exact -> top gamma
            {"name_l": "john", "name_r": "johm"},   # lev 1
            {"name_l": "john", "name_r": "jahm"},   # lev 2
            {"name_l": "john", "name_r": "xxxx"},   # else -> 0
            {"name_l": None, "name_r": "john"},     # null -> -1
        ],
        spark,
    )
    cvvs = [r["comparison_vector_value"] for r in res]
    assert cvvs == [3, 2, 1, 0, -1]
    assert all("label_for_charts" in r for r in res)


# -- EM iteration-history charts ---------------------------------------------


@pytest.fixture(scope="module")
def em_session(spark, persons):
    settings = SettingsCreator(
        link_type="dedupe_only",
        comparisons=[
            cl.ExactMatch("first_name"),
            cl.ExactMatch("city"),
            cl.ExactMatch("email"),
        ],
        blocking_rules_to_generate_predictions=[block_on("surname")],
    )
    linker = Linker(persons, settings)
    return linker.training.estimate_parameters_using_expectation_maximisation(
        block_on("dob"), fix_u_probabilities=False, max_iterations=4
    )


def test_em_session_is_still_a_dict(em_session):
    assert isinstance(em_session, dict)
    assert "history" in em_session and "lambda" in em_session


def test_lambda_iteration_chart(em_session):
    chart = em_session.probability_two_random_records_match_iteration_chart()
    values = chart["data"]["values"]
    # iteration 0 = pre-loop initial params (reference settings-history[0])
    assert values[0]["iteration"] == 0
    assert len(values) == len(em_session["history"]) + 1
    assert all(
        0 < v["probability_two_random_records_match"] < 1 for v in values
    )
    json.dumps(chart)


def test_match_weights_interactive_history_chart(em_session):
    chart = em_session.match_weights_interactive_history_chart()
    assert chart["params"][0]["name"] == "iteration_number"
    assert chart["params"][0]["bind"]["max"] == len(em_session["history"])
    assert chart["transform"] == [{"filter": "datum.iteration == iteration_number"}]
    values = chart["data"]["values"]
    iters = {v["iteration"] for v in values}
    assert iters == set(range(len(em_session["history"]) + 1))
    # every record carries the fields the reference chart encodes
    for field in (
        "comparison_name", "label_for_charts", "m_probability", "u_probability",
        "bayes_factor", "log2_bayes_factor", "comparison_vector_value",
        "probability_two_random_records_match",
    ):
        assert field in values[0]
    json.dumps(chart)


def test_m_u_interactive_history_chart(em_session):
    chart = em_session.m_u_values_interactive_history_chart()
    assert chart["params"][0]["name"] == "iteration_number"
    json.dumps(chart)


# -- exceptions facade ---------------------------------------------------------


def test_exception_hierarchy(spark, persons):
    from splink_spark.exceptions import EMTrainingException, SplinkException
    from splink_spark.internals.exceptions import (
        EMTrainingException as InternalAlias,
    )

    assert InternalAlias is EMTrainingException
    settings = SettingsCreator(
        link_type="dedupe_only",
        comparisons=[cl.ExactMatch("first_name")],
        blocking_rules_to_generate_predictions=[block_on("surname")],
    )
    linker = Linker(persons, settings)
    # training on the only comparison's column deactivates everything
    with pytest.raises(EMTrainingException) as exc_info:
        linker.training.estimate_parameters_using_expectation_maximisation(
            block_on("first_name")
        )
    # backward compat: the same error still catches as ValueError
    assert isinstance(exc_info.value, ValueError)
    assert isinstance(exc_info.value, SplinkException)


def test_is_in_level_reference_matrix(spark):
    """The reference's test_testing_fns.py::test_is_in_level matrix."""
    from datetime import datetime

    cases = [
        (cll.ExactMatchLevel("name"),
         [({"name_l": "John", "name_r": "John"}, True),
          ({"name_l": "John", "name_r": "Jane"}, False)]),
        (cll.NullLevel("name"),
         [({"name_l": None, "name_r": "John"}, True),
          ({"name_l": "John", "name_r": None}, True),
          ({"name_l": "John", "name_r": "Jane"}, False)]),
        (cll.AbsoluteDateDifferenceLevel(
            "date", input_is_string=False, threshold=3, metric="day"),
         [({"date_l": datetime(2023, 1, 1), "date_r": datetime(2023, 1, 3)}, True),
          ({"date_l": datetime(2023, 1, 1), "date_r": datetime(2023, 1, 5)}, False)]),
        (cll.ArrayIntersectLevel("tags", 2),
         [({"tags_l": [1, 2, 3], "tags_r": [2, 3, 4]}, True),
          ({"tags_l": [1, 2, 3], "tags_r": [4, 5, 6]}, False)]),
        (cll.ElseLevel(),
         [({"name_l": "John", "name_r": "Jane"}, True)]),
    ]
    for level, inputs in cases:
        records = [rec for rec, _ in inputs]
        expected = [exp for _, exp in inputs]
        assert is_in_level(level, records, spark) == expected, level


def test_comparison_vector_value_reference_matrix(spark):
    """The reference's test_testing_fns.py::test_comparison_vector_value."""
    cases = [
        (cl.ExactMatch("name"),
         [({"name_l": "John", "name_r": "John"}, 1, "Exact match on name"),
          ({"name_l": "John", "name_r": "Jane"}, 0, "All other comparisons"),
          ({"name_l": None, "name_r": "John"}, -1, "name is NULL")]),
        (cl.ArrayIntersectAtSizes("tags", [3, 2, 1]),
         [({"tags_l": [1, 2, 3, 4], "tags_r": [2, 3, 4, 5]}, 3,
           "Array intersection size >= 3"),
          ({"tags_l": [1, 2, 3], "tags_r": [2, 3]}, 2,
           "Array intersection size >= 2"),
          ({"tags_l": [1], "tags_r": [1]}, 1,
           "Array intersection size >= 1")]),
    ]
    for comp, inputs in cases:
        res = comparison_vector_value(comp, [rec for rec, *_ in inputs], spark)
        for r, (_, exp_val, exp_label) in zip(res, inputs):
            assert r["comparison_vector_value"] == exp_val
            assert r["label_for_charts"] == exp_label
