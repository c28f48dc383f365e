"""EM convergence on the reference's own generated fixture
(tests/datasets/known_params_comparison_vectors.csv — 4000 comparison vectors
drawn from a KNOWN Fellegi-Sunter model; reference
tests/test_correctness_of_convergence.py).

The generating model: lambda=0.5 and per-column (m, u) for gamma=1 of
col_1 (0.7, 0.1), col_2 (0.9, 0.025), col_3 (0.95, 0.2). The reference
injects the vectors straight into an EM session and asserts the trained
model (a) recovers those parameters, and (b) reproduces each pair's
analytically-known true match probability. We rebuild the same vectors as a
node table (pairs blocked on a synthetic pair key, columns equal iff
gamma=1) so the full engine pipeline — blocking, gammas, EM, predict — is
exercised, not just the E/M arithmetic."""

from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F

import splink_spark.internals.comparison_library as cl
from splink_spark import Linker, SettingsCreator, block_on

FIXTURE = "/root/reference/tests/datasets/known_params_comparison_vectors.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture unavailable"
)


@pytest.fixture(scope="module")
def convergence_linker(spark):
    with open(FIXTURE) as f:
        rows = list(csv.DictReader(f))
    node_rows = []
    for pid, r in enumerate(rows):
        # two records per vector; col_k agrees iff gamma_col_k == 1
        left = [2 * pid, pid, f"a1_{pid}", f"a2_{pid}", f"a3_{pid}",
                float(r["true_match_probability_l"])]
        right = [2 * pid + 1, pid]
        for k in (1, 2, 3):
            agree = r[f"gamma_col_{k}"] == "1"
            right.append(left[1 + k] if agree else f"b{k}_{pid}")
        right.append(float(r["true_match_probability_l"]))
        node_rows.append(tuple(left))
        node_rows.append(tuple(right))
    df = spark.createDataFrame(
        node_rows,
        "unique_id bigint, pair_id bigint, col_1 string, col_2 string, "
        "col_3 string, true_match_probability double",
    )
    settings = SettingsCreator(
        link_type="dedupe_only",
        comparisons=[cl.ExactMatch("col_1"), cl.ExactMatch("col_2"), cl.ExactMatch("col_3")],
        blocking_rules_to_generate_predictions=[block_on("pair_id")],
        additional_columns_to_retain=["true_match_probability"],
        probability_two_random_records_match=0.2,
        max_iterations=200,
        em_convergence=0.00001,
    )
    linker = Linker(df, settings)
    linker.training.estimate_parameters_using_expectation_maximisation(
        block_on("pair_id"),
        fix_u_probabilities=False,
        fix_probability_two_random_records_match=False,
        populate_probability_two_random_records_match_from_trained_values=True,
    )
    return linker


def test_em_converges_to_known_params(convergence_linker):
    """reference asserts: lambda -> 0.5 (rel 1%), col_1 m -> 0.7 / u -> 0.1
    (abs 0.01); the fixture's generating values for the other columns hold
    too (FIXTURES.md F4)."""
    s = convergence_linker.settings
    assert s.probability_two_random_records_match == pytest.approx(0.5, rel=0.01)
    expected = {
        "col_1": (0.7, 0.1),
        "col_2": (0.9, 0.025),
        "col_3": (0.95, 0.2),
    }
    for comp in s.comparisons:
        m_true, u_true = expected[comp.output_column_name]
        by_value = {
            lv.comparison_vector_value: lv
            for lv in comp.comparison_levels
            if not lv.is_null_level
        }
        assert by_value[1].m_probability == pytest.approx(m_true, abs=0.01)
        assert by_value[1].u_probability == pytest.approx(u_true, abs=0.01)
        assert by_value[0].m_probability == pytest.approx(1 - m_true, abs=0.01)
        assert by_value[0].u_probability == pytest.approx(1 - u_true, abs=0.01)


def test_trained_model_reproduces_true_match_probabilities(convergence_linker):
    """Each pair's predicted match probability equals the analytically-known
    posterior from the generating model (reference: rel 1%, every pair)."""
    pred = convergence_linker.inference.predict().select(
        "match_probability", "true_match_probability_l"
    )
    bad = pred.where(
        F.abs(F.col("match_probability") - F.col("true_match_probability_l"))
        > F.lit(0.01) * F.col("true_match_probability_l")
    ).count()
    assert bad == 0
    assert pred.count() == 4000
