#!/usr/bin/env python
"""Incremental linkage walkthrough: an indexed base corpus probed by small
arriving batches — the serving shape where new records are matched against a
large, slowly-changing reference population.

Two scale levers are demonstrated:

1. ``find_matches_to_new_records`` (reference inference.py find-matches
   workflow): the arriving batch is blocked + scored against the base using
   the trained model, with the batch's TF values taken from the BASE's term
   frequency tables (register_term_frequency_lookup semantics) so scores are
   consistent with the base population.

2. ``MaterializationPolicy.materialize_bucketed``: the base is written ONCE
   as a table bucketed on the blocking key. Every later probe join reads the
   bucketed scan with NO Exchange on the base side — only the (tiny) batch
   shuffles. At 100 TB this is the difference between re-shuffling the corpus
   per batch and never shuffling it again.

    python examples/incremental_linkage.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

import splink_spark.internals.comparison_library as cl  # noqa: E402
from splink_spark import Linker, SettingsCreator, block_on  # noqa: E402
from splink_spark.internals.materialize import MaterializationPolicy  # noqa: E402


def _preset(comp, mus):
    for lv in comp.comparison_levels:
        if not lv.is_null_level:
            lv.m_probability, lv.u_probability = mus[lv.comparison_vector_value]
    return comp


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("incremental_linkage_demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .withColumnRenamed("c_custkey", "unique_id")
    )
    # base = the indexed population; arrivals = two later batches
    base = cust.where(F.col("unique_id") % 10 < 8)
    batches = [
        cust.where(F.col("unique_id") % 10 == 8),
        cust.where(F.col("unique_id") % 10 == 9),
    ]

    settings = SettingsCreator(
        comparisons=[
            _preset(cl.LevenshteinAtThresholds("c_name", [2]),
                    {2: (0.85, 0.002), 1: (0.1, 0.01), 0: (0.05, 0.988)}),
            _preset(cl.ExactMatch("c_mktsegment", term_frequency_adjustments=True),
                    {1: (0.95, 0.2), 0: (0.05, 0.8)}),
        ],
        blocking_rules_to_generate_predictions=[block_on("c_nationkey")],
        probability_two_random_records_match=0.001,
    )
    linker = Linker(base, settings)

    # 1. dedupe the base once (builds the TF tables used for every batch)
    base_pairs = linker.inference.predict()
    print(f"base self-dedupe scored pairs: {base_pairs.count()}")

    # 2. probe each arriving batch against the base — no base re-scoring;
    # report each batch's best candidate match in the base
    for i, batch in enumerate(batches):
        matches = linker.inference.find_matches_to_new_records(batch)
        best = (
            matches.orderBy(F.desc("match_probability"))
            .select("unique_id_l", "unique_id_r", "match_probability")
            .limit(1)
            .collect()
        )
        top = best[0] if best else None
        print(
            f"batch {i}: {batch.count()} records, "
            f"{matches.count()} scored candidates, best="
            + (f"{top['unique_id_l']}~{top['unique_id_r']} "
               f"p={top['match_probability']:.3f}" if top else "none")
        )

    # 3. the bucketed-base pattern for the repeated probe join: bucket the
    # base on the blocking key once; each batch join shuffles ONLY the batch
    policy = MaterializationPolicy(parquet_dir=tempfile.mkdtemp())
    bucketed_base = policy.materialize_bucketed(
        base, ["c_nationkey"], num_buckets=8, stage="base"
    )
    # at real scale NEITHER side broadcasts; model that regime here so the
    # printed plan shows the bucketed sort-merge join, not a tiny-demo
    # broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    probe = bucketed_base.alias("l").join(
        batches[0].select("unique_id", "c_nationkey").alias("r"), on="c_nationkey"
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    base_side_shuffles = plan.count("Exchange hashpartitioning(c_nationkey")
    print(
        f"bucketed probe join: base scan bucketed={'Bucketed: true' in plan}, "
        f"hash exchanges in plan={base_side_shuffles} (only the batch side)"
    )
    policy.unpersist_all()
    spark.stop()


if __name__ == "__main__":
    main()
