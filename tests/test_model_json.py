"""Model save/load round-trip (reference misc.py save_model_to_json +
Linker(settings=path) load path): a model trained in one session must predict
identically after a JSON round trip."""

from __future__ import annotations

import pytest

import splink_spark.internals.comparison_library as cl
from splink_spark import ColumnExpression, Linker, Settings, SettingsCreator, block_on


def _set(comp, mus):
    for lv in comp.comparison_levels:
        if lv.is_null_level:
            continue
        lv.m_probability, lv.u_probability = mus[lv.comparison_vector_value]
    return comp


def test_json_round_trip_predict_identical(spark, persons, tmp_path):
    settings = SettingsCreator(
        comparisons=[
            _set(cl.LevenshteinAtThresholds("first_name", [2]),
                 {2: (0.7, 0.01), 1: (0.2, 0.05), 0: (0.1, 0.94)}),
            _set(cl.ExactMatch("city", term_frequency_adjustments=True),
                 {1: (0.8, 0.2), 0: (0.2, 0.8)}),
            _set(cl.ExactMatch(ColumnExpression("email").regex_extract("@(.+)$", 1)),
                 {1: (0.9, 0.1), 0: (0.1, 0.9)}),
        ],
        blocking_rules_to_generate_predictions=[block_on("dob"), block_on("surname")],
        probability_two_random_records_match=0.05,
    )
    path = str(tmp_path / "model.json")
    settings.to_json(path)

    loaded = Settings.from_json(path)
    assert loaded.probability_two_random_records_match == 0.05
    assert len(loaded.comparisons) == 3
    assert len(loaded.blocking_rules_to_generate_predictions) == 2

    def snapshot(s):
        df = Linker(persons, s).inference.predict()
        return sorted(
            (r["unique_id_l"], r["unique_id_r"], round(r["match_weight"], 9))
            for r in df.collect()
        )

    assert snapshot(settings) == snapshot(loaded)


def test_additional_columns_to_retain_round_trip(spark, persons):
    """reference settings key ``additional_columns_to_retain`` must survive
    dict round-trip and surface _l/_r copies in the predict output."""
    settings = SettingsCreator(
        comparisons=[_set(cl.ExactMatch("surname"), {1: (0.9, 0.02), 0: (0.1, 0.98)})],
        blocking_rules_to_generate_predictions=[block_on("dob")],
        probability_two_random_records_match=0.05,
        additional_columns_to_retain=["cluster"],
    )
    loaded = Settings.from_dict(settings.as_dict())
    assert loaded.additional_columns_to_retain == ["cluster"]
    pred = Linker(persons, loaded).inference.predict()
    assert "cluster_l" in pred.columns and "cluster_r" in pred.columns


def test_trained_model_round_trips(spark, persons, tmp_path):
    settings = SettingsCreator(
        comparisons=[cl.ExactMatch("surname"), cl.ExactMatch("dob"),
                     cl.ExactMatch("city")],
        blocking_rules_to_generate_predictions=[block_on("dob")],
    )
    linker = Linker(persons, settings)
    linker.training.estimate_u_using_random_sampling(max_pairs=1e4, seed=5)
    linker.training.estimate_parameters_using_expectation_maximisation(
        block_on("dob"), fix_u_probabilities=True
    )
    linker.training.estimate_parameters_using_expectation_maximisation(
        block_on("surname"), fix_u_probabilities=True
    )
    assert settings.all_probabilities_set
    j = settings.to_json()
    loaded = Settings.from_json(j)
    for c_orig, c_new in zip(settings.comparisons, loaded.comparisons):
        for lv_o, lv_n in zip(c_orig.comparison_levels, c_new.comparison_levels):
            assert lv_o.m_probability == lv_n.m_probability
            assert lv_o.u_probability == lv_n.u_probability


def test_custom_level_round_trip(spark, persons):
    import splink_spark.internals.comparison_level_library as cll

    comp = cl.CustomComparison(
        "name_sub", [
            cll.NullLevel("first_name"),
            cll.CustomLevel("substring(first_name_l, 1, 3) = substring(first_name_r, 1, 3)"),
            cll.ElseLevel(),
        ], input_columns=["first_name"],
    )
    for lv in comp.comparison_levels:
        if not lv.is_null_level:
            lv.m_probability, lv.u_probability = 0.5, 0.1
    s = SettingsCreator(
        comparisons=[comp],
        blocking_rules_to_generate_predictions=[block_on("surname")],
        probability_two_random_records_match=0.01,
    )
    loaded = Settings.from_json(s.to_json())

    def snapshot(st):
        df = Linker(persons, st).inference.predict()
        return sorted(
            (r["unique_id_l"], r["unique_id_r"], round(r["match_weight"], 9))
            for r in df.collect()
        )

    assert snapshot(s) == snapshot(loaded)


def test_load_reference_format_settings_json(spark, persons):
    """A genuine reference-splink settings dict (sql_condition strings,
    blocking rules as l./r. strings and {'blocking_rule': ...} dicts) must
    load and predict (ADVICE r1: interop was export-only)."""
    ref_settings = {
        "link_type": "dedupe_only",
        "probability_two_random_records_match": 0.02,
        "unique_id_column_name": "unique_id",
        "comparisons": [
            {
                "output_column_name": "surname",
                "comparison_levels": [
                    {
                        "sql_condition": "surname_l IS NULL OR surname_r IS NULL",
                        "label_for_charts": "Null",
                        "is_null_level": True,
                    },
                    {
                        "sql_condition": '"surname_l" = "surname_r"',
                        "label_for_charts": "Exact match",
                        "m_probability": 0.9,
                        "u_probability": 0.1,
                    },
                    {
                        "sql_condition": "levenshtein(surname_l, surname_r) <= 2",
                        "label_for_charts": "lev <= 2",
                        "m_probability": 0.07,
                        "u_probability": 0.1,
                    },
                    {
                        "sql_condition": "ELSE",
                        "label_for_charts": "All other comparisons",
                        "m_probability": 0.03,
                        "u_probability": 0.8,
                    },
                ],
            }
        ],
        "blocking_rules_to_generate_predictions": [
            "l.dob = r.dob",
            {"blocking_rule": "l.city = r.city", "salting_partitions": 2},
        ],
    }
    s = Settings.from_dict(ref_settings)
    comp = s.comparisons[0]
    assert comp.comparison_levels[0].is_null_level
    assert comp.comparison_levels[1].is_exact_match_level
    assert comp.comparison_levels[-1].is_else_level
    assert s.blocking_rules_to_generate_predictions[1].salting_partitions == 2

    linker = Linker(persons, s)
    pred = linker.inference.predict()
    rows = pred.collect()
    assert len(rows) > 0
    # exact-surname pair (0,1 taylor/taylor) outranks the near-miss (0,2
    # taylor/tailor, levenshtein 2) which outranks unrelated pairs
    by_pair = {(r["unique_id_l"], r["unique_id_r"]): r["match_probability"] for r in rows}
    assert by_pair[(0, 1)] > by_pair[(0, 2)] > by_pair[(0, 6)]


def test_linker_accepts_dict_and_json_path(spark, persons, tmp_path):
    """Reference parity: Linker(settings=...) takes a Settings object, a
    settings dict, or a path to a settings JSON."""
    settings = SettingsCreator(
        comparisons=[
            _set(cl.ExactMatch("surname"), {1: (0.9, 0.02), 0: (0.1, 0.98)}),
            _set(cl.ExactMatch("dob"), {1: (0.85, 0.01), 0: (0.15, 0.99)}),
        ],
        blocking_rules_to_generate_predictions=[block_on("dob")],
        probability_two_random_records_match=0.05,
    )
    path = str(tmp_path / "model.json")
    settings.to_json(path)

    base = Linker(persons, settings).inference.predict().count()
    from_path = Linker(persons, path).inference.predict().count()
    import json
    with open(path) as f:
        from_dict = Linker(persons, json.load(f)).inference.predict().count()
    assert base == from_path == from_dict


def test_heavily_customised_settings(spark, persons, tmp_path):
    """reference tests/test_settings_options.py: custom unique-id /
    source-dataset column names PLUS custom gamma/bf/mw/tf column prefixes,
    run through train -> predict -> cluster -> chart data."""
    from splink_spark.clustering import cluster_pairwise_predictions_at_threshold  # noqa: F401

    left = persons.withColumnRenamed("unique_id", "uid_col")
    right = left
    settings = Settings.from_dict({
        "link_type": "link_and_dedupe",
        "probability_two_random_records_match": 0.05,
        "unique_id_column_name": "uid_col",
        "source_dataset_column_name": "dataset_name",
        "comparisons": [
            {
                "output_column_name": "surname",
                "comparison_levels": [
                    {"sql_condition": "surname_l IS NULL OR surname_r IS NULL",
                     "label_for_charts": "null", "is_null_level": True},
                    {"sql_condition": "surname_l = surname_r",
                     "label_for_charts": "exact",
                     "tf_adjustment_column": "surname",
                     "m_probability": 0.9, "u_probability": 0.02},
                    {"sql_condition": "ELSE", "label_for_charts": "else",
                     "m_probability": 0.1, "u_probability": 0.98},
                ],
            }
        ],
        "blocking_rules_to_generate_predictions": ["l.dob = r.dob"],
        "retain_intermediate_calculation_columns": True,
        "match_weight_column_prefix": "match_w__",
        "term_frequency_adjustment_column_prefix": "term_freq__",
        "comparison_vector_value_column_prefix": "cvv__",
        "bayes_factor_column_prefix": "bfact__",
    })
    linker = Linker({"left_set": left, "right_set": right}, settings)
    pred = linker.inference.predict()
    cols = set(pred.columns)
    assert "cvv__surname" in cols
    assert "bfact__cvv__surname" in cols
    assert "term_freq__surname_l" in cols and "term_freq__surname_r" in cols
    assert "bfact__tf_adj_cvv__surname" in cols
    assert not any(c.startswith("gamma_") or c == "tf_surname_l" for c in cols)
    rows = pred.limit(5).collect()
    assert rows
    clustered = linker.clustering.cluster_pairwise_predictions_at_threshold(
        pred, 0.5
    )
    assert clustered.count() == left.count() + right.count()
    # chart data layers read the custom prefixes too
    assert linker.visualisations.comparison_vector_distribution(pred).count() > 0
    assert linker.visualisations.tf_adjustment_chart_data("surname").count() > 0
    # round-trips
    s2 = Settings.from_dict(settings.as_dict())
    assert s2.comparison_vector_value_column_prefix == "cvv__"
    assert s2.comparisons[0].gamma_prefix == "cvv__"
