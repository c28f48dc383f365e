"""End-to-end slice: concat → block → gamma → score → predict with preset
m/u, mirroring the reference's full-example tests (SURVEY.md §5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import splink_spark.internals.comparison_library as cl
from splink_spark import Linker, SettingsCreator, block_on


def _set_probs(comparison, mus):
    """mus: {gamma: (m, u)} for non-null levels."""
    for lv in comparison.comparison_levels:
        if lv.is_null_level:
            continue
        m, u = mus[lv.comparison_vector_value]
        lv.m_probability = m
        lv.u_probability = u
    return comparison


@pytest.fixture(scope="module")
def trained_settings():
    name = _set_probs(
        cl.LevenshteinAtThresholds("first_name", [2]),
        {2: (0.7, 0.01), 1: (0.2, 0.05), 0: (0.1, 0.94)},
    )
    surname = _set_probs(
        cl.ExactMatch("surname"),
        {1: (0.9, 0.02), 0: (0.1, 0.98)},
    )
    dob = _set_probs(
        cl.ExactMatch("dob"),
        {1: (0.85, 0.01), 0: (0.15, 0.99)},
    )
    city = _set_probs(
        cl.ExactMatch("city", term_frequency_adjustments=True),
        {1: (0.8, 0.2), 0: (0.2, 0.8)},
    )
    return SettingsCreator(
        link_type="dedupe_only",
        comparisons=[name, surname, dob, city],
        blocking_rules_to_generate_predictions=[block_on("dob"), block_on("surname")],
        probability_two_random_records_match=0.05,
        retain_intermediate_calculation_columns=True,
    )


def test_predict_end_to_end(spark, persons, trained_settings):
    linker = Linker(persons, trained_settings)
    df = linker.inference.predict()
    rows = df.collect()
    assert len(rows) > 0
    cols = df.columns
    for c in ["match_weight", "match_probability", "gamma_first_name", "gamma_surname",
              "gamma_dob", "gamma_city", "bf_gamma_dob", "bf_tf_adj_gamma_city"]:
        assert c in cols, c

    by_pair = {(r["unique_id_l"], r["unique_id_r"]): r for r in rows}
    # (0,1): same dob/surname/city, name lev=1 ("julia" vs "julia ")
    r = by_pair[(0, 1)]
    assert r["gamma_first_name"] == 1
    assert r["gamma_surname"] == 1
    assert r["gamma_dob"] == 1
    assert r["gamma_city"] == 1

    # manual match-weight check for pair (0,1)
    s = trained_settings
    expected = math.log2(0.05 / 0.95)
    expected += math.log2(0.2 / 0.05)  # first_name gamma 1
    expected += math.log2(0.9 / 0.02)  # surname exact
    expected += math.log2(0.85 / 0.01)  # dob exact
    expected += math.log2(0.8 / 0.2)  # city exact
    # tf adjustment for london: tf = 5/11 non-null cities
    tf_london = 6 / 11
    expected += math.log2(0.2 / tf_london)
    assert r["match_weight"] == pytest.approx(expected, abs=1e-9)
    assert r["match_probability"] == pytest.approx(
        2**expected / (1 + 2**expected), abs=1e-12
    )

    # null handling: pair (9,10) has first_name null on one side → gamma -1
    r = by_pair[(9, 10)]
    assert r["gamma_first_name"] == -1

    # multi-rule dedup: every pair appears exactly once
    assert len(by_pair) == len(rows)


def test_predict_narrow_core_identical_to_direct_scoring(spark, persons, trained_settings):
    """predict() routes through a persisted narrow core + node re-join; the
    result must be row-for-row identical (schema AND values) to scoring the
    comparison-vector table directly."""
    from splink_spark.internals.predict import predict_from_comparison_vectors

    linker = Linker(persons, trained_settings)
    out = linker.inference.predict()
    direct = predict_from_comparison_vectors(
        linker.comparison_vectors(), linker.settings
    )
    assert out.columns == direct.columns
    key = lambda r: (r["unique_id_l"], r["unique_id_r"])
    got = {key(r): r.asDict() for r in out.collect()}
    want = {key(r): r.asDict() for r in direct.collect()}
    assert got.keys() == want.keys()
    for k in want:
        for c, v in want[k].items():
            g = got[k][c]
            if isinstance(v, float):
                assert g == pytest.approx(v, rel=1e-12), (k, c)
            else:
                assert g == v, (k, c)
    # the narrow core is attached and holds no wide compare columns
    narrow = getattr(out, "_splink_narrow", None)
    assert narrow is not None
    assert "first_name_l" not in narrow.columns
    assert {"unique_id_l", "unique_id_r", "match_probability"} <= set(narrow.columns)


def test_threshold_pushdown(spark, persons, trained_settings):
    linker = Linker(persons, trained_settings)
    df_all = linker.inference.predict()
    df_thresh = linker.inference.predict(threshold_match_probability=0.9)
    n_manual = df_all.where(F.col("match_probability") >= 0.9).count()
    assert df_thresh.count() == n_manual
    assert n_manual > 0


def test_match_key_assignment(spark, persons, trained_settings):
    linker = Linker(persons, trained_settings)
    pairs = linker.blocked_pairs(materialize=False)
    rows = pairs.collect()
    # pair (0,1) matches rule 0 (dob) first → match_key 0; pairs matching only
    # surname rule get match_key 1
    mk = {(r["join_key_l"], r["join_key_r"]): r["match_key"] for r in rows}
    assert mk[(0, 1)] == "0"
    assert len(mk) == len(rows), "no duplicate pairs across rules"


def test_compare_two_records(spark, persons, trained_settings):
    linker = Linker(persons, trained_settings)
    out = linker.inference.compare_two_records(
        {"unique_id": 0, "first_name": "julia", "surname": "taylor", "dob": "2015-10-29",
         "city": "london", "email": None, "cluster": 0},
        {"unique_id": 1, "first_name": "julia", "surname": "taylor", "dob": "2015-10-29",
         "city": "london", "email": None, "cluster": 0},
    ).collect()
    assert len(out) == 1
    assert out[0]["match_probability"] > 0.99
