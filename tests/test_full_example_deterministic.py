"""Deterministic-link full example (reference
tests/test_full_example_deterministic_link.py): settings with only
blocking rules (no comparisons needed for scoring), deterministic_link →
clustering → cluster studio dashboard, plus the cumulative-comparisons
chart over the same rules."""

from __future__ import annotations

import os

from splink_spark import Linker, SettingsCreator
from splink_spark.blocking_analysis import chart_comparisons_from_blocking_rules


BR_FOR_PREDICT = [
    "l.first_name = r.first_name and l.surname = r.surname and l.dob = r.dob",
    "l.surname = r.surname and l.dob = r.dob and l.email = r.email",
    "l.first_name = r.first_name and l.surname = r.surname and l.email = r.email",
]


def test_deterministic_link_full_example(spark, persons, tmp_path):
    spec = chart_comparisons_from_blocking_rules(
        persons,
        blocking_rules=BR_FOR_PREDICT,
        link_type="dedupe_only",
        unique_id_column_name="unique_id",
    )
    assert spec["data"]["values"]

    settings = SettingsCreator(
        link_type="dedupe_only",
        blocking_rules_to_generate_predictions=BR_FOR_PREDICT,
        retain_matching_columns=True,
        retain_intermediate_calculation_columns=True,
    )
    linker = Linker(persons, settings)

    df_predict = linker.inference.deterministic_link()
    rows = df_predict.collect()
    assert rows
    # every pair was produced by at least one rule, recorded in match_key
    assert {r["match_key"] for r in rows} <= {"0", "1", "2", 0, 1, 2}
    # entities 0/1/2 in the fixture share surname+dob within the entity:
    # pair (6,7) (grace jones duplicates incl. email) must be found
    ids = {(r["unique_id_l"], r["unique_id_r"]) for r in rows}
    assert (6, 7) in ids

    clusters = linker.clustering.cluster_pairwise_predictions_at_threshold(
        df_predict
    )
    n_rows = clusters.count()
    assert n_rows == persons.count()

    out = os.path.join(tmp_path, "test_cluster_studio.html")
    linker.visualisations.cluster_studio_dashboard(
        df_predict,
        clusters,
        out_path=out,
        sampling_method="by_cluster_size",
        overwrite=True,
    )
    html = open(out).read()
    assert "<html" in html.lower() and len(html) > 1000
