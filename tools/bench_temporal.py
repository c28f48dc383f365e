#!/usr/bin/env python
"""Scale proof for the temporal operators (pipeline/temporal.py) on a
10M-event synthetic stream (JVM-generated, no driver data), with a 10%
hot-key skew — the shape that matters for the as-of design:

- asof_join plain vs bucket-salted under the hot key (the salt is the
  difference between one straggler task owning 1M rows and even tasks)
- time_rollup: 3 granularities in ONE grouping-sets pass vs 3 separate
  groupBys (the Expand-sharing claim, measured)
- sessionize and a 3-step funnel

Writes BENCH_TEMPORAL.json. Single-run wall clock on a noisy host; the
comparisons within one run share the noise window, so the RATIOS are the
signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from splink_spark.pipeline.temporal import (
        asof_join,
        funnel,
        sessionize,
        time_rollup,
    )

    n = int(os.environ.get("TEMPORAL_BENCH_ROWS", "10000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("temporal_bench")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    hour = 3600 * 1_000_000_000
    # 10% of events belong to user 0 (the hot key); timestamps spread over
    # ~30 days with deterministic arithmetic
    ev = (
        spark.range(n)
        .repartition(4 * int(cpus))
        .select(
            F.col("id").alias("event_id"),
            F.when(F.pmod("id", F.lit(10)) == 0, F.lit(0))
            .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(100_000)))
            .alias("user_id"),
            (F.pmod(F.col("id") * 48271, F.lit(720)) * hour
             + F.pmod(F.col("id") * 16807, F.lit(3_600_000)) * 1_000_000
             ).alias("ts"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("error")),
                (F.pmod("id", F.lit(3)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod("id", F.lit(97)).cast("double") / 7.0).alias("value"),
        )
        .persist()
    )
    ev.count()
    results = {"rows": n, "cpus": int(cpus), "hot_key_fraction": 0.1, "ops": {}}

    def run(name, make):
        # the op CALL sits inside the stopwatch (thunk), so eager
        # construction-time driver actions are measured too — the r09 dsir
        # timing-boundary bug class; tools/pre_snapshot_check.py lints this
        t0 = time.time()
        make().write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        results["ops"][name] = sec
        print(f"# {name}: {sec}s", file=sys.stderr)
        return sec

    left = ev.where("event_type = 'error'").select("event_id", "user_id", "ts")
    right = (
        ev.where("event_type = 'click'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    run("asof_plain", lambda: asof_join(left, right, on="ts", by="user_id"))
    run(
        "asof_bucketed",
        lambda: asof_join(left, right, on="ts", by="user_id",
                          bucket_size=24 * hour),
    )

    grans = (hour, 24 * hour, 168 * hour)
    run("rollup_grouping_sets_3_levels",
        lambda: time_rollup(ev, "ts", "value", granularities=grans,
                            by="user_id"))
    t0 = time.time()
    for g in grans:
        (
            ev.withColumn("b", (F.col("ts") / g).cast("long") * g)
            .groupBy("user_id", "b")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value"), F.min("value"),
                 F.max("value"), F.avg("value"))
            .write.format("noop").mode("overwrite").save()
        )
    results["ops"]["rollup_separate_3_groupbys"] = round(time.time() - t0, 2)
    print(f"# rollup_separate_3_groupbys: "
          f"{results['ops']['rollup_separate_3_groupbys']}s", file=sys.stderr)

    run("sessionize", lambda: sessionize(ev, gap=1800 * 1_000_000_000,
                                         order_cols="event_id"))
    run("funnel_3_steps", lambda: funnel(ev, ["view", "click", "error"],
                                         within=24 * hour))

    results["ratios"] = {
        "asof_bucketed_over_plain": round(
            results["ops"]["asof_bucketed"] / max(results["ops"]["asof_plain"], 0.01), 3
        ),
        "rollup_one_pass_over_separate": round(
            results["ops"]["rollup_grouping_sets_3_levels"]
            / max(results["ops"]["rollup_separate_3_groupbys"], 0.01),
            3,
        ),
    }
    results["total_sec"] = round(sum(results["ops"].values()), 2)
    results.update(__import__('_stamp').measurement_stamp())
    with open(os.path.join(REPO, "BENCH_TEMPORAL.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
