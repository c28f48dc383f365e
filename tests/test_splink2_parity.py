"""splink2 frozen-number parity on the reference's own 1000-row demo dataset.

The reference pins its v5 engine to numbers originally produced by splink2
(reference tests/test_compare_splink2.py + tests/datasets/splink2_*.csv and
tests/test_train_vs_predict.py, model config from tests/basic_settings.py).
We pin the same frozen numbers: if this engine reproduces the exact
match weight of pair (479, 481) and the exact EM lambda / m / u iteration
trajectories, then gamma construction, TF adjustment, blocking-adjusted
session priors, and the E/M updates all agree with two independent
implementations (splink2 and splink v5) simultaneously.

The input CSV lives in the reference checkout; tests skip when it is not
present so the repo stays standalone. Expected values below are transcribed
from the reference's fixture CSVs (data, not code):
  - splink2_479_vs_481.csv
  - splink2_proportion_of_matches_history_{fixed_u,no_fix}.csv
  - splink2_m_u_history_{fixed_u,no_fix}.csv  (gamma_first_name, level 1)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from splink_spark import Linker

FAKE_1000 = "/root/reference/tests/datasets/fake_1000_from_splink_demos.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FAKE_1000), reason="reference demo CSV not available"
)


def _prob_to_bf(p: float) -> float:
    return p / (1 - p)


def _bf_to_prob(bf: float) -> float:
    return bf / (1 + bf)


def _basic_settings() -> dict:
    """The reference test-suite's canonical model (tests/basic_settings.py):
    five comparisons over fake_1000, TF-adjusted first_name exact level,
    global prior = 0.3 reversed out through the surname exact-match BF."""

    def simple_cc(col: str) -> dict:
        return {
            "output_column_name": col,
            "comparison_levels": [
                {
                    "sql_condition": f"{col}_l IS NULL OR {col}_r IS NULL",
                    "label_for_charts": "Comparison includes null",
                    "is_null_level": True,
                },
                {
                    "sql_condition": f"{col}_l = {col}_r",
                    "label_for_charts": "Exact match",
                    "m_probability": 0.9,
                    "u_probability": 0.1,
                },
                {
                    "sql_condition": "ELSE",
                    "label_for_charts": "All other comparisons",
                    "m_probability": 0.1,
                    "u_probability": 0.9,
                },
            ],
        }

    first_name_cc = {
        "output_column_name": "first_name",
        "comparison_levels": [
            {
                "sql_condition": "first_name_l IS NULL OR first_name_r IS NULL",
                "label_for_charts": "Comparison includes null",
                "is_null_level": True,
            },
            {
                "sql_condition": "first_name_l = first_name_r",
                "label_for_charts": "Exact match",
                "m_probability": 0.7,
                "u_probability": 0.1,
                "tf_adjustment_column": "first_name",
                "tf_adjustment_weight": 0.6,
            },
            {
                "sql_condition": "levenshtein(first_name_l, first_name_r) <= 2",
                "m_probability": 0.2,
                "u_probability": 0.1,
                "label_for_charts": "levenshtein <= 2",
            },
            {
                "sql_condition": "ELSE",
                "label_for_charts": "All other comparisons",
                "m_probability": 0.1,
                "u_probability": 0.8,
            },
        ],
    }

    bf_for_surname_exact = 0.9 / 0.1
    glo = _bf_to_prob(_prob_to_bf(0.3) / bf_for_surname_exact)
    return {
        "probability_two_random_records_match": glo,
        "link_type": "dedupe_only",
        "blocking_rules_to_generate_predictions": ["l.surname = r.surname"],
        "comparisons": [
            first_name_cc,
            simple_cc("surname"),
            simple_cc("dob"),
            simple_cc("email"),
            simple_cc("city"),
        ],
        "retain_matching_columns": True,
        "retain_intermediate_calculation_columns": True,
        "additional_columns_to_retain": ["cluster"],
        "em_convergence": 0.001,
        "max_iterations": 20,
    }


@pytest.fixture(scope="module")
def fake_1000(spark):
    # keep trailing spaces ("Jack " is a distinct TF term in the frozen
    # numbers) and read empty strings as NULLs, like the reference loaders
    return (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(FAKE_1000)
    )


def test_splink2_predict_pair_479_481(fake_1000):
    """Reference test_compare_splink2.py::test_splink_2_predict — the frozen
    splink2 match weight for pair (479, 481), which exercises: exact +
    trailing-space TF adjustment on first_name (weight 0.6), exact dob,
    disagreeing city/email, and the prior reversed out through surname."""
    linker = Linker(fake_1000, _basic_settings())
    row = (
        linker.inference.predict()
        .where((F.col("unique_id_l") == 479) & (F.col("unique_id_r") == 481))
        .collect()
    )
    assert len(row) == 1
    r = row[0].asDict()
    # splink2_479_vs_481.csv frozen values
    assert r["match_weight"] == pytest.approx(0.5101493570766487)
    assert r["match_probability"] == pytest.approx(0.5874923778509089)
    assert r["gamma_first_name"] == 2
    assert r["gamma_dob"] == 1
    assert r["gamma_city"] == 0
    assert r["gamma_email"] == 0
    assert r["bf_gamma_first_name"] == pytest.approx(6.999999999999999)
    assert r["bf_tf_adj_gamma_first_name"] == pytest.approx(4.272592890212634)
    assert r["bf_gamma_dob"] == pytest.approx(9.0)
    assert r["bf_gamma_city"] == pytest.approx(0.11111111111111112)
    assert r["bf_gamma_email"] == pytest.approx(0.11111111111111112)
    # retain flags: matching + additional columns present
    assert r["first_name_l"] == "Jack " and r["first_name_r"] == "Jack "
    assert r["cluster_l"] == 83 and r["cluster_r"] == 83


# splink2_proportion_of_matches_history_*.csv: iteration 0 is the session's
# initial (blocking-adjusted) lambda; iterations 1.. are post-update values.
SPLINK2_LAMBDA_FIXED_U = [0.2588110991484573, 0.2823831219907462]
SPLINK2_LAMBDA_NO_FIX = [0.2588110991484573, 0.2954053465070158]
# splink2_m_u_history_*.csv, gamma_first_name comparison_vector_value=1
# (the levenshtein<=2 level), iterations 1..2
SPLINK2_M_FN1_FIXED_U = [0.1422119783401823, 0.13468402611428465]
SPLINK2_M_FN1_NO_FIX = [0.1422119783401823, 0.1568402413576787]
SPLINK2_U_FN1_NO_FIX = [0.02567783498811634, 0.012029631191928345]


def test_splink2_em_trajectory_fixed_u(fake_1000):
    """Reference test_compare_splink2.py::test_splink_2_em_fixed_u — EM
    blocked on surname, u fixed, with-TF E-step (the reference default
    ``estimate_without_term_frequencies=False``): per-iteration lambda and
    first_name level-1 m must equal splink2's frozen trajectory."""
    linker = Linker(fake_1000, _basic_settings())
    result = linker.training.estimate_parameters_using_expectation_maximisation(
        "l.surname = r.surname",
        estimate_without_term_frequencies=False,
    )
    hist = result["history"]
    assert len(hist) >= 2
    for i, expected_lam in enumerate(SPLINK2_LAMBDA_FIXED_U):
        assert hist[i]["lambda"] == pytest.approx(expected_lam), f"iter {i + 1}"
    for i, expected_m in enumerate(SPLINK2_M_FN1_FIXED_U):
        assert hist[i]["m"]["first_name[1]"] == pytest.approx(expected_m), (
            f"iter {i + 1}"
        )
        # fixed u: stays at the settings value
        assert hist[i]["u"]["first_name[1]"] == pytest.approx(0.1)


def test_splink2_em_trajectory_no_fix(fake_1000):
    """Reference test_compare_splink2.py::test_splink_2_em_no_fix — same
    session with u also free: lambda, m AND u trajectories must match."""
    linker = Linker(fake_1000, _basic_settings())
    result = linker.training.estimate_parameters_using_expectation_maximisation(
        "l.surname = r.surname",
        fix_u_probabilities=False,
        estimate_without_term_frequencies=False,
    )
    hist = result["history"]
    assert len(hist) >= 2
    for i, expected_lam in enumerate(SPLINK2_LAMBDA_NO_FIX):
        assert hist[i]["lambda"] == pytest.approx(expected_lam), f"iter {i + 1}"
    for i, expected_m in enumerate(SPLINK2_M_FN1_NO_FIX):
        assert hist[i]["m"]["first_name[1]"] == pytest.approx(expected_m)
    for i, expected_u in enumerate(SPLINK2_U_FN1_NO_FIX):
        assert hist[i]["u"]["first_name[1]"] == pytest.approx(expected_u)


def test_train_vs_predict_lambda_consistency(fake_1000):
    """Reference test_train_vs_predict.py: training blocked on surname and
    predicting with the same blocking rule must agree — the session's final
    (local) lambda equals the mean predicted match probability, because the
    global prior's surname component is reversed out."""
    settings = _basic_settings()
    linker = Linker(fake_1000, settings)
    result = linker.training.estimate_parameters_using_expectation_maximisation(
        "l.surname = r.surname",
        fix_u_probabilities=False,
        estimate_without_term_frequencies=False,
    )
    expected = result["lambda"]
    actual = (
        linker.inference.predict()
        .agg(F.avg("match_probability").alias("p"))
        .collect()[0]["p"]
    )
    assert expected == pytest.approx(actual, abs=0.01)
