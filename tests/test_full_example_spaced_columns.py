"""End-to-end flow with a space-bearing, reference-quoted column name
(mirrors reference tests/test_full_example_duckdb.py, which renames surname
to "SUR name" and drives every subsystem through it): registration,
blocking analysis, profiling, TF tables, u-sampling, prior estimation, two
EM sessions, predict, chart data, labels accuracy, clustering, unlinkables,
and realtime compare."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import splink_spark.internals.comparison_library as cl
from splink_spark import Linker, SettingsCreator
from splink_spark.blocking_analysis import count_comparisons_from_blocking_rules
from splink_spark.exploratory import completeness_chart, profile_columns

FAKE_1000 = "/root/reference/tests/datasets/fake_1000_from_splink_demos.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FAKE_1000), reason="reference demo CSV not available"
)


@pytest.fixture(scope="module")
def spaced(spark):
    return (
        spark.read.option("header", True).option("inferSchema", True)
        .csv(FAKE_1000)
        .withColumnRenamed("surname", "SUR name")
    )


def test_full_example_with_spaced_column(spark, spaced):
    settings = SettingsCreator(
        link_type="dedupe_only",
        probability_two_random_records_match=0.01,
        comparisons=[
            cl.ExactMatch("first_name").configure(term_frequency_adjustments=True),
            cl.LevenshteinAtThresholds("SUR name", 2),
            cl.ExactMatch("dob"),
            cl.ExactMatch("city"),
        ],
        blocking_rules_to_generate_predictions=['l."SUR name" = r."SUR name"'],
        retain_matching_columns=True,
        retain_intermediate_calculation_columns=True,
        additional_columns_to_retain=["cluster"],
        em_convergence=0.01,
        max_iterations=4,
    )

    # blocking analysis accepts the quoted spaced identifier
    counts = count_comparisons_from_blocking_rules(
        spaced,
        blocking_rules=['l.first_name = r.first_name and l."SUR name" = r."SUR name"'],
        link_type="dedupe_only",
        unique_id_column_name="unique_id",
    )
    assert counts[0]["marginal_comparison_count"] > 0

    # profiling over the spaced column
    prof = profile_columns(
        spaced, ["first_name", '"SUR name"', 'first_name || "SUR name"']
    )
    assert prof["summary"].count() == 3
    assert prof["top_n"]['"SUR name"'].count() > 0
    compl = completeness_chart(spaced)
    assert len(compl["data"]["values"]) > 0  # vega-lite spec with data

    linker = Linker(spaced, settings)
    linker.training.estimate_u_using_random_sampling(max_pairs=1e6, seed=1)
    linker.training.estimate_probability_two_random_records_match(
        ["l.email = r.email"], recall=0.3
    )
    linker.training.estimate_parameters_using_expectation_maximisation(
        'l.first_name = r.first_name and l."SUR name" = r."SUR name"'
    )
    linker.training.estimate_parameters_using_expectation_maximisation("l.dob = r.dob")

    pred = linker.inference.predict()
    n = pred.count()
    assert n > 0
    assert "SUR name_l" in pred.columns and "gamma_SUR_name" in pred.columns

    # chart data over the predictions
    records = pred.limit(5).collect()
    wf = linker.visualisations.waterfall_chart([r.asDict() for r in records])
    assert wf["data"]["values"] and wf["mark"]["type"] == "bar"

    # labels accuracy from a self-built table over the first 10 records
    first10 = spaced.limit(10).select("unique_id", "cluster")
    labels = (
        first10.alias("l")
        .crossJoin(first10.alias("r"))
        .where(F.col("l.unique_id") < F.col("r.unique_id"))
        .select(
            F.col("l.unique_id").alias("unique_id_l"),
            F.col("r.unique_id").alias("unique_id_r"),
            (F.col("l.cluster") == F.col("r.cluster")).cast("double").alias(
                "clerical_match_score"
            ),
        )
    )
    acc = linker.evaluation.accuracy_analysis_from_labels_table(
        labels, output_type="table"
    )
    assert acc.count() > 0
    # reference default output_type: a renderable chart spec
    acc_chart = linker.evaluation.accuracy_analysis_from_labels_table(labels)
    assert acc_chart["data"]["values"]

    clusters = linker.clustering.cluster_pairwise_predictions_at_threshold(pred, 0.1)
    assert clusters.select("cluster_id").distinct().count() > 0

    unlink = linker.evaluation.unlinkables_chart()
    assert unlink["data"]["values"]

    # realtime: score one new record pair through the trained model
    rec = {
        "unique_id": 999999,
        "first_name": "John",
        "SUR name": "Smith",
        "dob": "1971-05-24",
        "city": "London",
        "email": "john@smith.net",
        "cluster": -1,
    }
    two = linker.inference.compare_two_records(rec, dict(rec, unique_id=999998))
    assert two.count() == 1
