"""Standalone realtime facade + asymmetric predict chunking.

Reference: splink/internals/realtime.py:17-159 (compare_records without a
Linker, per-settings cache) and inference.py:294-444 (num_chunks_l/_r).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from splink_spark import Linker, SettingsCreator, block_on, realtime
import splink_spark.internals.comparison_library as cl


@pytest.fixture(scope="module")
def rt_settings():
    mu = {
        "first_name": {3: (0.7, 0.001), 2: (0.2, 0.01), 1: (0.06, 0.05), 0: (0.04, 0.939)},
        "city": {1: (0.9, 0.2), 0: (0.1, 0.8)},
    }
    comps = [
        cl.LevenshteinAtThresholds("first_name", [1, 2]),
        cl.ExactMatch("city", term_frequency_adjustments=True),
    ]
    for comp in comps:
        for lv in comp.comparison_levels:
            if lv.is_null_level:
                continue
            m, u = mu[comp.output_column_name][lv.comparison_vector_value]
            lv.m_probability, lv.u_probability = m, u
    return SettingsCreator(
        link_type="dedupe_only",
        comparisons=comps,
        blocking_rules_to_generate_predictions=[block_on("city")],
        probability_two_random_records_match=0.01,
    )


@pytest.fixture(scope="module")
def rt_records(spark):
    rows = [
        (i, name, city)
        for i, (name, city) in enumerate(
            [
                ("julia", "london"), ("julia ", "london"), ("oliver", "leeds"),
                ("olivre", "leeds"), ("amara", "leeds"), ("amara", "hull"),
                ("tomas", "york"), ("tamas", "york"),
            ]
        )
    ]
    return spark.createDataFrame(rows, ["unique_id", "first_name", "city"])


def test_compare_records_matches_linker(spark, rt_settings, rt_records):
    """Facade scores == linker.inference.compare_two_records when the records
    carry the tf values the linker would have joined on."""
    linker = Linker(rt_records, rt_settings)
    tf_city = {
        r["city"]: r["tf_city"] for r in linker.tf_tables()["city"].collect()
    }
    r1 = {"unique_id": 0, "first_name": "julia", "city": "london",
          "tf_city": tf_city["london"]}
    r2 = {"unique_id": 1, "first_name": "julia ", "city": "london",
          "tf_city": tf_city["london"]}

    via_linker = linker.inference.compare_two_records(
        {k: v for k, v in r1.items() if not k.startswith("tf_")},
        {k: v for k, v in r2.items() if not k.startswith("tf_")},
    ).select("match_weight", "match_probability").collect()[0]

    via_facade = realtime.compare_records(
        r1, r2, rt_settings, spark=spark, sql_cache_key="rt-test"
    ).select("match_weight", "match_probability").collect()[0]

    assert via_facade["match_weight"] == pytest.approx(
        via_linker["match_weight"], abs=1e-12
    )
    assert via_facade["match_probability"] == pytest.approx(
        via_linker["match_probability"], abs=1e-12
    )
    # the parsed settings are cached under the key (reference SQLCache)
    assert "rt-test" in realtime._settings_cache
    again = realtime.compare_records(
        r1, r2, rt_settings, spark=spark, sql_cache_key="rt-test"
    ).select("match_weight").collect()[0]
    assert again["match_weight"] == via_facade["match_weight"]


def test_compare_records_tables_and_join_condition(spark, rt_settings, rt_records):
    """Multi-record inputs cross-join under join_condition (tables l and r)."""
    left = rt_records.where(F.col("unique_id") < 4)
    right = rt_records.where(F.col("unique_id") >= 4)
    out = realtime.compare_records(
        left, right, rt_settings, spark=spark,
        join_condition="l.city = r.city",
        include_found_by_blocking_rules=True,
    )
    rows = out.collect()
    # only leeds crosses the split (2,3 on the left; 4 on the right)
    assert {(r["unique_id_l"], r["unique_id_r"]) for r in rows} == {(2, 4), (3, 4)}
    # blocked on city and the join matched city → always found
    assert all(r["found_by_blocking_rules"] for r in rows)


def test_compare_records_missing_column_scores_null_level(spark, rt_settings):
    out = realtime.compare_records(
        {"unique_id": 0, "first_name": "ada", "city": "hull"},
        {"unique_id": 1, "first_name": "ada"},  # no city key
        rt_settings,
        spark=spark,
    ).collect()[0]
    assert out["gamma_city"] == -1  # null level
    assert out["gamma_first_name"] == 3  # exact


def test_predict_asymmetric_chunking_equals_unchunked(spark, rt_records, rt_settings):
    linker = Linker(rt_records, rt_settings)
    base = {
        (r["unique_id_l"], r["unique_id_r"], round(r["match_weight"], 9))
        for r in linker.inference.predict()
        .select("unique_id_l", "unique_id_r", "match_weight")
        .collect()
    }
    linker2 = Linker(rt_records, rt_settings)
    chunked = {
        (r["unique_id_l"], r["unique_id_r"], round(r["match_weight"], 9))
        for r in linker2.inference.predict(num_chunks_l=2, num_chunks_r=3)
        .select("unique_id_l", "unique_id_r", "match_weight")
        .collect()
    }
    assert chunked == base
    with pytest.raises(ValueError):
        linker2.inference.predict(num_chunks_l=0)


def test_compare_records_all_none_and_missing_model_columns(spark, rt_settings):
    """A key that is None in every record (schema inference would fail) and a
    model column absent from both records must both score as null levels."""
    out = realtime.compare_records(
        {"unique_id": 0, "first_name": "ada", "city": None},
        {"unique_id": 1, "first_name": "ada", "city": None},
        rt_settings,
        spark=spark,
    ).collect()[0]
    assert out["gamma_city"] == -1 and out["gamma_first_name"] == 3

    out2 = realtime.compare_records(
        {"unique_id": 0, "first_name": "ada"},
        {"unique_id": 1, "first_name": "ada"},
        rt_settings,
        spark=spark,
    ).collect()[0]
    assert out2["gamma_city"] == -1
