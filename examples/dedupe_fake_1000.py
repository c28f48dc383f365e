#!/usr/bin/env python
"""End-to-end dedupe walkthrough — the reference's canonical demo workflow
(profile → train → predict → cluster → evaluate) on the ``fake_1000``
catalog dataset, PySpark-native. Runs fully offline: without network the
catalog serves a deterministic synthetic stand-in with the same schema.

    python examples/dedupe_fake_1000.py
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

import splink_spark.comparison_library as cl  # noqa: E402
from splink_spark import Linker, SettingsCreator, block_on  # noqa: E402
from splink_spark.datasets import splink_datasets  # noqa: E402
from splink_spark.exploratory import completeness_chart, profile_columns  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("splink_spark_demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = splink_datasets(spark).fake_1000

    # -- explore -------------------------------------------------------------
    print("\n== completeness ==")
    completeness_chart(df).show(truncate=False)
    print("== first_name profile ==")
    profile_columns(df, ["first_name"])["top_n"]["first_name"].show(5)

    # -- model ---------------------------------------------------------------
    settings = SettingsCreator(
        link_type="dedupe_only",
        comparisons=[
            cl.NameComparison("first_name"),
            cl.NameComparison("surname"),
            cl.DateOfBirthComparison("dob", input_is_string=True),
            cl.ExactMatch("city", term_frequency_adjustments=True),
            cl.EmailComparison("email"),
        ],
        blocking_rules_to_generate_predictions=[
            block_on("first_name", "dob"),
            block_on("surname"),
        ],
    )
    linker = Linker(df, settings)

    # -- train ---------------------------------------------------------------
    linker.training.estimate_probability_two_random_records_match(
        [block_on("first_name", "surname")], recall=0.7
    )
    linker.training.estimate_u_using_random_sampling(max_pairs=1e6, seed=1)
    linker.training.estimate_parameters_using_expectation_maximisation(
        block_on("first_name", "dob")
    )
    linker.training.estimate_parameters_using_expectation_maximisation(
        block_on("surname")
    )

    # -- predict + cluster ---------------------------------------------------
    scored = linker.inference.predict(threshold_match_probability=0.01)
    print(f"\n== scored pairs: {scored.count()} ==")
    scored.orderBy("match_weight", ascending=False).select(
        "match_weight", "match_probability", "unique_id_l", "unique_id_r",
        "first_name_l", "first_name_r", "surname_l", "surname_r",
    ).show(5)

    clusters = linker.clustering.cluster_pairwise_predictions_at_threshold(
        scored, 0.9
    )
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"== {n_clusters} clusters at threshold 0.9 ==")

    # -- sweep several thresholds in one call (stable-cluster reuse) ----------
    multi = linker.clustering.cluster_pairwise_predictions_at_multiple_thresholds(
        scored, [0.5, 0.9, 0.99]
    )
    multi.groupBy("threshold").agg(
        F.countDistinct("cluster_id").alias("n_clusters")
    ).orderBy("threshold").show()

    # -- standalone realtime scoring: no Linker needed -------------------------
    from splink_spark import realtime

    saved_json = linker.settings.to_json()  # a trained model travels as JSON
    pair = realtime.compare_records(
        {"unique_id": 0, "first_name": "julia", "surname": "taylor",
         "dob": "2015-10-29", "city": "london", "email": None},
        {"unique_id": 1, "first_name": "julia ", "surname": "taylor",
         "dob": "2015-10-29", "city": "london", "email": None},
        saved_json,
        spark=spark,
        sql_cache_key="example-model",
    )
    print("== realtime compare_records ==")
    pair.select("match_weight", "match_probability").show()

    # -- evaluate against the ground-truth cluster column --------------------
    if "cluster" in df.columns:
        ts = linker.evaluation.accuracy_analysis_from_labels_column("cluster")
        print("== truth space (head) ==")
        ts.show(5)

    spark.stop()


if __name__ == "__main__":
    main()
