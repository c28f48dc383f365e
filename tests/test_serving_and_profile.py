"""Serving ops (predict_within / find_matches_to_new_records), one-to-one
clustering, multi-threshold clustering, profiling/completeness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import splink_spark.internals.comparison_library as cl
from splink_spark import Linker, SettingsCreator, block_on
from splink_spark.internals.one_to_one import cluster_using_single_best_links
from splink_spark.internals.profile_data import (
    column_value_frequencies,
    completeness_chart_data,
    profile_columns,
    top_n_values,
)


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
            _set(cl.ExactMatch("surname"), {1: (0.9, 0.02), 0: (0.1, 0.98)}),
            _set(cl.ExactMatch("dob"), {1: (0.85, 0.01), 0: (0.15, 0.99)}),
        ],
        blocking_rules_to_generate_predictions=[block_on("dob"), block_on("surname")],
        probability_two_random_records_match=0.05,
    )
    return Linker(persons, settings)


def test_find_matches_to_new_records(spark, trained):
    new = spark.createDataFrame(
        [(100, "julia", "taylor", "2015-10-29", "london", None, -1)],
        trained.df_concat().schema,
    )
    out = trained.inference.find_matches_to_new_records(new).collect()
    assert len(out) > 0
    matched = {r["unique_id_l"] for r in out if r["match_probability"] > 0.9}
    assert {0, 1, 2} & matched, "new julia taylor record should match entity 0"
    # every pair pairs a base record with the new record
    assert all(r["unique_id_r"] == 100 for r in out)


def test_predict_within_new_batch(spark, trained):
    new = spark.createDataFrame(
        [
            (200, "amy", "wong", "1999-05-05", "x", None, -1),
            (201, "amy", "wong", "1999-05-05", "x", None, -1),
            (202, "bob", "kerr", "1980-01-01", "y", None, -1),
        ],
        trained.df_concat().schema,
    )
    out = trained.inference.predict_within(new).collect()
    pairs = {(r["unique_id_l"], r["unique_id_r"]): r["match_probability"] for r in out}
    assert pairs[(200, 201)] > 0.9
    assert (200, 202) not in pairs  # different dob+surname → never blocked


def test_one_to_one_mutual_best(spark):
    edges = spark.createDataFrame(
        [
            (1, 10, "a", "b", 0.99),   # mutual best → accepted
            (1, 11, "a", "b", 0.80),
            (2, 11, "a", "b", 0.95),   # mutual best → accepted
            (3, 12, "a", "b", 0.70),
            (4, 12, "a", "b", 0.70),   # tie on 12's side → both dropped
        ],
        "node_id_l bigint, node_id_r bigint, source_dataset_l string, "
        "source_dataset_r string, match_probability double",
    )
    nodes = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "a"), (10, "b"), (11, "b"), (12, "b")],
        "node_id bigint, source_dataset string",
    )
    out = {r["node_id"]: r["cluster_id"] for r in cluster_using_single_best_links(
        edges, nodes, threshold_match_probability=0.5, ties="drop").collect()}
    assert out[1] == 1 and out[10] == 1
    assert out[2] == 2 and out[11] == 2
    assert out[3] == 3 and out[4] == 4 and out[12] == 12  # tie dropped

    out2 = {r["node_id"]: r["cluster_id"] for r in cluster_using_single_best_links(
        edges, nodes, threshold_match_probability=0.5, ties="lowest_id").collect()}
    assert out2[3] == 3 and out2[12] == 3, "lowest_id tie-break links 3-12"
    assert out2[4] == 4


def test_cluster_multiple_thresholds(spark, trained):
    df_predict = trained.inference.predict()
    out = trained.clustering.cluster_pairwise_predictions_at_multiple_thresholds(
        df_predict, [0.5, 0.99999]
    )
    counts = {
        r["threshold"]: r["n"]
        for r in out.groupBy("threshold").agg(
            F.countDistinct("cluster_id").alias("n")).collect()
    }
    assert counts[0.5] <= counts[0.99999], "higher threshold → more clusters"


def test_profile_and_completeness(spark, persons):
    freqs = {r["value"]: r for r in column_value_frequencies(persons, "city").collect()}
    assert freqs["london"]["value_count"] == 6
    top = top_n_values(persons, "city", 1).collect()
    assert top[0]["value"] == "london"

    prof = {r["column"]: r for r in profile_columns(persons).collect()}
    assert prof["unique_id"]["completeness"] == 1.0
    assert prof["first_name"]["n_nonnull"] == 11

    comp = {r["column"]: r["completeness"] for r in completeness_chart_data(persons).collect()}
    assert comp["unique_id"] == 1.0
    assert comp["first_name"] == pytest.approx(11 / 12)


def test_graph_metrics_via_linker(spark, trained):
    df_predict = trained.inference.predict()
    clusters = trained.clustering.cluster_pairwise_predictions_at_threshold(df_predict, 0.5)
    metrics = trained.clustering.compute_graph_metrics(df_predict, clusters, 0.5)
    rows = metrics.collect()
    assert len(rows) > 0
    assert {"cluster_id", "n_nodes", "n_edges", "density", "centralisation"} <= set(
        metrics.columns
    )


def test_predict_between_and_score_pair(spark, persons, trained):
    """predict_between scores cross-collection pairs only; score_pair is the
    single-pair entry accepting dicts or one-row frames."""
    left = persons.where("unique_id in (0, 1)")
    right = persons.where("unique_id in (2, 6)")
    scored = trained.inference.predict_between(left, right).collect()
    pairs = {(r["unique_id_l"], r["unique_id_r"]) for r in scored}
    # all pairs cross left x right; none within a side
    for l_id, r_id in pairs:
        assert l_id in (0, 1) and r_id in (2, 6)

    one = trained.inference.score_pair(
        {"unique_id": 900, "first_name": "julia", "surname": "taylor",
         "dob": "2015-10-29", "city": "london", "email": None, "cluster": -1},
        persons.where("unique_id = 0"),
    ).collect()
    assert len(one) == 1 and one[0]["match_probability"] > 0

    blocked = trained.inference.compute_blocked_pairs_for_predict()
    assert {"join_key_l", "join_key_r"}.issubset(set(blocked.columns))
