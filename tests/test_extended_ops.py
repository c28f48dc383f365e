"""Tests: phonetic levels, simhash, salted blocking, chunked predict,
exploding blocking rules, estimate_m_from_label_column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import splink_spark.internals.comparison_library as cl
import splink_spark.internals.comparison_level_library as cll
from splink_spark import Linker, SettingsCreator, block_on, exploding_rule
from splink_spark.internals.blocking import block_using_rules
from splink_spark.internals.phonetic import double_metaphone
from splink_spark.pipeline import dedup


def test_double_metaphone_common_names():
    # phonetically-equal name pairs must share a primary code
    for a, b in [("smith", "smyth"), ("catherine", "katherine"),
                 ("stephen", "steven"), ("jonson", "johnson")]:
        pa, _ = double_metaphone(a)
        pb, _ = double_metaphone(b)
        assert pa == pb, f"{a}({pa}) vs {b}({pb})"
    # different names must differ
    for a, b in [("smith", "jones"), ("adam", "zachary")]:
        assert double_metaphone(a)[0] != double_metaphone(b)[0]


def test_phonetic_level(spark):
    from tests.test_comparison_levels import run_gamma_tests
    from splink_spark.internals.comparison import Comparison

    comp = Comparison("c", [
        cll.NullLevel("c"), cll.ExactMatchLevel("c"),
        cll.PhoneticMatchLevel("c"), cll.ElseLevel(),
    ])
    run_gamma_tests(spark, comp, {"c": "string"}, [
        ("smith", "smith", 2),
        ("smith", "smyth", 1),
        ("smith", "jones", 0),
    ])


def test_simhash_near_dups(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy cat today"),   # 1 token diff
        (2, "entirely unrelated content about database systems and joins"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.simhash_pairs(docs, max_hamming=16, num_bands=8).collect()
    found = {(r["doc_id_l"], r["doc_id_r"]): r["hamming"] for r in pairs}
    assert (0, 1) in found
    assert found[(0, 1)] <= 16
    assert (0, 2) not in found


def test_salted_blocking_same_pairs(spark, persons):
    plain = block_using_rules(persons, [block_on("city")])
    salted = block_using_rules(persons, [block_on("city", salting_partitions=4)])
    p = {(r["join_key_l"], r["join_key_r"]) for r in plain.collect()}
    s = {(r["join_key_l"], r["join_key_r"]) for r in salted.collect()}
    assert p == s and len(p) > 0


def test_exploding_blocking_rule(spark):
    rows = [
        (0, ["a", "b"]),
        (1, ["b", "c"]),
        (2, ["x"]),
        (3, ["c", "a"]),
    ]
    df = spark.createDataFrame(rows, ["unique_id", "codes"])
    rule = exploding_rule(block_on("codes"), ["codes"])
    pairs = block_using_rules(df, [rule])
    got = {(r["join_key_l"], r["join_key_r"]) for r in pairs.collect()}
    assert got == {(0, 1), (1, 3), (0, 3)}
    # exploded pairs must be distinct even when multiple elements overlap
    assert pairs.count() == 3


def test_chunked_predict_equals_unchunked(spark, persons):
    def _set(comp, mus):
        for lv in comp.comparison_levels:
            if not lv.is_null_level:
                lv.m_probability, lv.u_probability = mus[lv.comparison_vector_value]
        return comp

    settings = SettingsCreator(
        comparisons=[_set(cl.ExactMatch("surname"), {1: (0.9, 0.02), 0: (0.1, 0.98)})],
        blocking_rules_to_generate_predictions=[block_on("dob")],
        probability_two_random_records_match=0.05,
    )
    linker = Linker(persons, settings)

    def snap(df):
        return sorted(
            (r["unique_id_l"], r["unique_id_r"], round(r["match_weight"], 9))
            for r in df.collect()
        )

    assert snap(linker.inference.predict()) == snap(
        linker.inference.predict(num_chunks=3)
    )


def test_predict_chunk_slices_union_to_full(spark, persons):
    """reference inference.py:446-530 — the (i, nl) x (j, nr) predict_chunk
    slices must union to exactly the unchunked predict output."""
    def _set(comp, mus):
        for lv in comp.comparison_levels:
            if not lv.is_null_level:
                lv.m_probability, lv.u_probability = mus[lv.comparison_vector_value]
        return comp

    settings = SettingsCreator(
        comparisons=[_set(cl.ExactMatch("surname"), {1: (0.9, 0.02), 0: (0.1, 0.98)})],
        blocking_rules_to_generate_predictions=[block_on("dob")],
        probability_two_random_records_match=0.05,
    )
    linker = Linker(persons, settings)

    def snap(df):
        return sorted(
            (r["unique_id_l"], r["unique_id_r"], round(r["match_weight"], 9))
            for r in df.collect()
        )

    full = snap(linker.inference.predict())
    parts = []
    for i in range(2):
        for j in range(3):
            parts.extend(
                snap(linker.inference.predict_chunk((i, 2), (j, 3)))
            )
    assert sorted(parts) == full


def test_labelling_tool_and_chart_aliases(spark, persons):
    """Reference-named data-layer aliases: labelling tool candidates (full
    block vs one record), unlinkables_chart, and the visualisations aliases."""
    def _set(comp, mus):
        for lv in comp.comparison_levels:
            if not lv.is_null_level:
                lv.m_probability, lv.u_probability = mus[lv.comparison_vector_value]
        return comp

    settings = SettingsCreator(
        comparisons=[_set(cl.ExactMatch("surname"), {1: (0.9, 0.02), 0: (0.1, 0.98)})],
        blocking_rules_to_generate_predictions=[block_on("dob")],
        probability_two_random_records_match=0.05,
    )
    linker = Linker(persons, settings)
    target = persons.limit(1).collect()[0]["unique_id"]
    cands = linker.evaluation.labelling_tool_for_specific_record(
        target, match_weight_threshold=-1e9
    )
    rows = cands.collect()
    # full block: every record (including self) scored against the target
    assert len(rows) == persons.count()
    assert all(r["unique_id_r"] == target for r in rows)
    # threshold filters
    some = linker.evaluation.labelling_tool_for_specific_record(target)
    assert some.count() <= len(rows)

    mw = linker.visualisations.match_weights_chart()
    assert (
        mw["data"]["values"] == linker.visualisations.match_weights_chart_data()
    )
    mu = linker.visualisations.m_u_parameters_chart()
    assert (
        mu["data"]["values"] == linker.visualisations.m_u_parameters_chart_data()
    )
    ul = linker.evaluation.unlinkables_chart()
    assert {"match_weight", "count", "cum_proportion"} <= set(
        ul["data"]["values"][0]
    )


def test_estimate_m_from_label_column(spark, persons):
    settings = SettingsCreator(
        comparisons=[cl.ExactMatch("surname"), cl.ExactMatch("dob")],
        blocking_rules_to_generate_predictions=[block_on("dob")],
    )
    linker = Linker(persons, settings)
    result = linker.training.estimate_m_from_label_column("cluster")
    # within true entities, surnames mostly agree (entity 2 has one swap)
    assert result["surname[1]"] > 0.5
    assert result["surname[1]"] + result["surname[0]"] == pytest.approx(1.0)
    for comp in settings.comparisons:
        for lv in comp.comparison_levels:
            if not lv.is_null_level:
                assert lv.m_probability is not None


def test_estimate_m_from_pairwise_labels(spark, persons):
    settings = SettingsCreator(
        comparisons=[cl.ExactMatch("surname"), cl.ExactMatch("city")],
        blocking_rules_to_generate_predictions=[block_on("dob")],
    )
    linker = Linker(persons, settings)
    labels = spark.createDataFrame(
        [(1, 0, 1.0), (2, 0, 1.0), (4, 3, 1.0), (9, 11, 0.0)],  # last is non-match
        "unique_id_l bigint, unique_id_r bigint, clerical_match_score double",
    )
    result = linker.training.estimate_m_from_pairwise_labels(labels)
    # labelled matches: (0,1) same surname, (0,2) different, (3,4) same
    assert result["surname[1]"] == pytest.approx(2 / 3)
    assert result["surname[0]"] == pytest.approx(1 / 3)


def test_block_on_sql_snippet_key(spark, persons):
    """Reference parity: block_on("substr(surname,1,2)") — a SQL snippet as
    the blocking key, equal to the ColumnExpression transform chain."""
    from splink_spark import ColumnExpression
    from splink_spark.internals.blocking import rule_from_spec

    snippet = block_on("substr(surname, 1, 2)")
    chained = block_on(ColumnExpression("surname").substr(1, 2))
    p1 = {(r["join_key_l"], r["join_key_r"])
          for r in block_using_rules(persons, [snippet]).collect()}
    p2 = {(r["join_key_l"], r["join_key_r"])
          for r in block_using_rules(persons, [chained]).collect()}
    assert p1 == p2 and len(p1) > 0

    # snippet keys power the pre-filter estimator too
    from splink_spark.internals.blocking import estimate_comparisons_pre_filter
    est = estimate_comparisons_pre_filter(persons, snippet).collect()
    assert sum(r["block_count"] - r["count_l"] for r in est) >= 0

    # spec round-trip preserves the snippet
    again = rule_from_spec(snippet.spec)
    p3 = {(r["join_key_l"], r["join_key_r"])
          for r in block_using_rules(persons, [again]).collect()}
    assert p3 == p1

    # literals and keywords survive the suffix rewrite
    mixed = block_on("case when surname = 'taylor' then 'T' else surname end")
    pm = block_using_rules(persons, [mixed]).collect()
    assert len(pm) > 0


def test_block_on_arrays_to_explode(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b", "c"]), (3, ["c", "d"])],
        "unique_id long, tags array<string>",
    )
    pairs = block_using_rules(
        df, [block_on("tags", arrays_to_explode=["tags"])]
    ).collect()
    got = {(r["join_key_l"], r["join_key_r"]) for r in pairs}
    assert got == {(1, 2), (2, 3)}


def test_pre_filter_estimate_for_exploding_rule(spark):
    """Exploding rules estimate per exploded ELEMENT (an over-estimate),
    not per raw array value (which would report near-zero)."""
    from splink_spark.internals.blocking import (
        estimate_comparisons_pre_filter,
        n_largest_blocks,
    )

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b", "c"]), (3, ["c", "d"])],
        "unique_id long, tags array<string>",
    )
    rule = block_on("tags", arrays_to_explode=["tags"])
    est = {r["key_0"]: r["block_count"]
           for r in estimate_comparisons_pre_filter(df, rule).collect()}
    assert est == {"a": 1, "b": 4, "c": 4, "d": 1}
    top = n_largest_blocks(df, rule, n_largest=2).collect()
    assert {r["key_0"] for r in top} == {"b", "c"}
