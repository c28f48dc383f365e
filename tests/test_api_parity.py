"""Frozen public-API parity audit vs the reference (splink v5).

The expected symbol lists below were extracted from the reference's
``__all__`` exports and Linker component classes (splink/__init__.py,
splink/*.py facades, splink/internals/linker_components/*.py). This test
freezes the parity claim: every public name a reference user can import or
call must exist here. No reference code is imported at runtime.
"""

from __future__ import annotations

import importlib

import pytest

TOP_LEVEL = [
    "block_on", "ColumnExpression", "Linker", "SettingsCreator",
    "splink_datasets", "SparkAPI",
    # reference __all__ also lists DuckDBAPI — intentionally absent: this
    # engine has exactly one backend (Spark), and the reference itself raises
    # ImportError for backends whose dependencies are missing
]

FACADES = {
    "blocking_analysis": [
        "count_comparisons_from_blocking_rules",
        "chart_comparisons_from_blocking_rules",
        "n_largest_blocks",
    ],
    "blocking_rule_library": ["CustomRule", "And", "Not", "block_on"],
    "clustering": ["cluster_pairwise_predictions_at_threshold"],
    "comparison_level_library": [
        "NullLevel", "ElseLevel", "CustomLevel", "ExactMatchLevel",
        "LiteralMatchLevel", "ColumnsReversedLevel", "LevenshteinLevel",
        "DamerauLevenshteinLevel", "JaroWinklerLevel", "JaroLevel",
        "JaccardLevel", "DistanceFunctionLevel",
        "PairwiseStringDistanceFunctionLevel", "AbsoluteTimeDifferenceLevel",
        "AbsoluteDateDifferenceLevel", "DistanceInKMLevel",
        "ArrayIntersectLevel", "ArraySubsetLevel", "PercentageDifferenceLevel",
        "AbsoluteDifferenceLevel", "And", "Not", "Or", "CosineSimilarityLevel",
    ],
    "comparison_library": [
        "CustomComparison", "ExactMatch", "LevenshteinAtThresholds",
        "DamerauLevenshteinAtThresholds", "JaccardAtThresholds",
        "JaroAtThresholds", "JaroWinklerAtThresholds",
        "DistanceFunctionAtThresholds",
        "PairwiseStringDistanceFunctionAtThresholds",
        "AbsoluteTimeDifferenceAtThresholds",
        "AbsoluteDateDifferenceAtThresholds", "ArrayIntersectAtSizes",
        "DistanceInKMAtThresholds", "DateOfBirthComparison", "EmailComparison",
        "ForenameSurnameComparison", "NameComparison", "PostcodeComparison",
        "CosineSimilarityAtThresholds",
    ],
    "datasets": ["splink_datasets", "splink_dataset_labels"],
    "exploratory": ["completeness_chart", "profile_columns"],
    "logging": ["disable", "enable", "PIPELINE", "SQL", "VERBOSE"],
    "internals.realtime": ["compare_records"],
    "realtime": ["compare_records"],
}

LINKER_NAMESPACES = {
    "LinkerInference": [
        "compute_blocked_pairs_for_predict",
        "compute_blocked_pairs_for_predict_chunk", "deterministic_link",
        "predict", "predict_chunk", "score_pair", "score_pairs",
        "predict_within", "predict_between",
    ],
    "LinkerTraining": [
        "estimate_probability_two_random_records_match",
        "estimate_u_using_random_sampling",
        "estimate_parameters_using_expectation_maximisation",
        "estimate_m_from_pairwise_labels", "estimate_m_from_label_column",
    ],
    "LinkerClustering": [
        "cluster_pairwise_predictions_at_threshold",
        "cluster_using_single_best_links", "compute_graph_metrics",
    ],
    "LinkerEvaluation": [
        "prediction_errors_from_labels_table",
        "accuracy_analysis_from_labels_column",
        "accuracy_analysis_from_labels_table",
        "prediction_errors_from_labels_column", "unlinkables_chart",
        "labelling_tool_for_specific_record",
    ],
    "LinkerVisualisations": [
        "match_weights_chart", "m_u_parameters_chart",
        "match_weights_histogram", "parameter_estimate_comparisons_chart",
        "tf_adjustment_chart", "waterfall_chart",
        "comparison_viewer_dashboard", "cluster_studio_dashboard",
    ],
    "LinkerMisc": ["save_model_to_json", "query_sql"],
    "LinkerTableManagement": [
        "compute_tf_table", "register_blocked_pairs_for_predict",
        "invalidate_cache", "register_table_predict",
        "register_term_frequency_lookup", "register_labels_table",
        "delete_tables_created_by_splink_from_db", "register_table",
    ],
}


def test_top_level_exports():
    import splink_spark

    missing = [n for n in TOP_LEVEL if not hasattr(splink_spark, n)]
    assert not missing, missing


@pytest.mark.parametrize("mod_name", sorted(FACADES))
def test_facade_exports(mod_name):
    mod = importlib.import_module(f"splink_spark.{mod_name}")
    missing = [n for n in FACADES[mod_name] if not hasattr(mod, n)]
    assert not missing, f"splink_spark.{mod_name} missing {missing}"


@pytest.mark.parametrize("cls_name", sorted(LINKER_NAMESPACES))
def test_linker_namespace_methods(cls_name):
    import splink_spark.linker as L

    cls = getattr(L, cls_name)
    missing = [m for m in LINKER_NAMESPACES[cls_name] if not hasattr(cls, m)]
    assert not missing, f"{cls_name} missing {missing}"
