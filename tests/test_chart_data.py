"""Visualisation DATA layer (internals/chart_data.py): comparison-vector
distribution, match-weight histogram, TF adjustment chart data, waterfall
bars, model-parameter chart records, cluster studio sampling.

Reference semantics: comparison_vector_distribution.py:10-30,
match_weights_histogram.py, term_frequencies.py:130-260, charts.py
waterfall/match_weights chart inputs, cluster_studio.py:157-290.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import splink_spark.internals.comparison_library as cl
from splink_spark import Linker, SettingsCreator, block_on


def _set(comp, mus):
    for lv in comp.comparison_levels:
        if lv.is_null_level:
            continue
        lv.m_probability, lv.u_probability = mus[lv.comparison_vector_value]
    return comp


@pytest.fixture(scope="module")
def trained(spark, persons):
    settings = SettingsCreator(
        comparisons=[
            _set(
                cl.ExactMatch("surname", term_frequency_adjustments=True),
                {1: (0.9, 0.02), 0: (0.1, 0.98)},
            ),
            _set(cl.ExactMatch("dob"), {1: (0.85, 0.01), 0: (0.15, 0.99)}),
        ],
        blocking_rules_to_generate_predictions=[block_on("dob"), block_on("surname")],
        probability_two_random_records_match=0.05,
    )
    return Linker(persons, settings)


@pytest.fixture(scope="module")
def predicted(trained):
    return trained.inference.predict()


def test_comparison_vector_distribution(trained, predicted):
    dist = trained.visualisations.comparison_vector_distribution(predicted)
    rows = dist.collect()
    # totals over groups == total predictions
    assert sum(r["count_rows_in_comparison_vector_group"] for r in rows) == (
        predicted.count()
    )
    assert abs(sum(r["proportion_of_comparisons"] for r in rows) - 1.0) < 1e-9
    # sum_gam semantics: -1 -> 0, 0 -> -1, k -> k
    for r in rows:
        expected = 0
        for g in (r["gamma_surname"], r["gamma_dob"]):
            expected += 0 if g == -1 else (-1 if g == 0 else g)
        assert r["sum_gam"] == expected
        assert r["gam_concat"] == f"{r['gamma_surname']},{r['gamma_dob']}"


def test_match_weights_histogram(trained, predicted):
    hist = trained.visualisations.match_weights_histogram_data(predicted, num_bins=10)
    rows = hist.collect()
    assert sum(r["count_rows"] for r in rows) == predicted.count()
    # bins are half-open [low, low+width): every weight falls in its bin
    weights = [r["match_weight"] for r in predicted.select("match_weight").collect()]
    for r in rows:
        assert abs(r["splink_score_bin_high"] - r["splink_score_bin_low"] - r["binwidth"]) < 1e-9
        n_in = sum(
            1
            for w in weights
            if r["splink_score_bin_low"] <= w < r["splink_score_bin_low"] + r["binwidth"]
        )
        assert n_in == r["count_rows"]


def test_tf_adjustment_chart_data(trained):
    data = trained.visualisations.tf_adjustment_chart_data("surname", 3, 3)
    rows = {r["value"]: r for r in data.collect()}
    assert rows, "tf chart data empty"
    # tf values match the tf table; log2_bf_tf = log2(u/tf)
    tf_table = {
        r["surname"]: r["tf_surname"]
        for r in trained.tf_tables()["surname"].collect()
    }
    for val, r in rows.items():
        assert abs(r["tf"] - tf_table[val]) < 1e-12
        assert abs(r["log2_bf_tf"] - math.log2(r["u_probability"] / r["tf"])) < 1e-9
        assert abs(r["log2_bf_final"] - (r["log2_bf"] + r["log2_bf_tf"])) < 1e-9
    # rarest surname gets the biggest positive adjustment
    rarest = min(tf_table, key=tf_table.get)
    assert rows[rarest]["least_freq_rank"] == 1

    with pytest.raises(ValueError):
        trained.visualisations.tf_adjustment_chart_data("dob")


def test_match_weights_chart_data(trained):
    recs = trained.visualisations.match_weights_chart_data()
    assert recs[0]["comparison_name"] == "probability_two_random_records_match"
    lam = 0.05
    assert abs(recs[0]["log2_bayes_factor"] - math.log2(lam / (1 - lam))) < 1e-9
    surname_match = [
        r
        for r in recs
        if r["comparison_name"] == "surname" and r["comparison_vector_value"] == 1
    ][0]
    assert abs(surname_match["log2_bayes_factor"] - math.log2(0.9 / 0.02)) < 1e-9

    mu = trained.visualisations.m_u_parameters_chart_data()
    assert {r["probability_type"] for r in mu} == {"m_probability", "u_probability"}


def test_waterfall_data_sums_to_match_weight(trained, predicted):
    rows = predicted.limit(5).collect()
    bars = trained.visualisations.waterfall_data([r.asDict() for r in rows])
    for ri, row in enumerate(rows):
        rec_bars = [b for b in bars if b["record_number"] == ri]
        final = [b for b in rec_bars if b["column_name"] == "Final score"][0]
        # sum of the component bars equals the final bar equals the
        # predict() match weight
        component_sum = sum(
            b["log2_bayes_factor"]
            for b in rec_bars
            if b["column_name"] != "Final score"
        )
        assert abs(component_sum - final["log2_bayes_factor"]) < 1e-9
        assert abs(final["log2_bayes_factor"] - row["match_weight"]) < 1e-6


def test_cluster_studio_sample(trained, predicted):
    clustered = trained.clustering.cluster_pairwise_predictions_at_threshold(
        predicted, 0.5
    )
    nodes, edges = trained.visualisations.cluster_studio_sample(
        clustered, predicted, sampling_method="random", sample_size=2,
        threshold_match_probability=0.5,
    )
    picked = {r["cluster_id"] for r in nodes.select("cluster_id").distinct().collect()}
    assert 0 < len(picked) <= 2
    # sampled clusters are non-singletons and edges stay within them
    sizes = {r["cluster_id"]: r["n"] for r in clustered.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(sizes[c] > 1 for c in picked)
    for r in edges.collect():
        assert r["cluster_id"] in picked
        assert r["match_probability"] >= 0.5

    # by_cluster_size returns at most one cluster per distinct size
    nodes2, _ = trained.visualisations.cluster_studio_sample(
        clustered, predicted, sampling_method="by_cluster_size", sample_size=3,
        threshold_match_probability=0.5,
    )
    sizes2 = [
        r["n"]
        for r in nodes2.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(sizes2) == len(set(sizes2))

    # explicit ids
    some = list(picked)[:1]
    nodes3, _ = trained.visualisations.cluster_studio_sample(
        clustered, predicted, cluster_ids=some
    )
    assert {r["cluster_id"] for r in nodes3.select("cluster_id").collect()} == set(some)
