#!/usr/bin/env python
"""Event-table analytics walkthrough: as-of join, range join,
multi-granularity rollup, sessionization — every operator oracle-gated.

    python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from splink_spark.pipeline.temporal import asof_join, funnel, range_join, time_rollup  # noqa: E402
from splink_spark.streaming.operators import stream_session_aggregate  # noqa: E402,F401


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("event_analytics_demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") != "bigint":
        ev = ev.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    hour = 3600 * 1_000_000_000
    print(f"events: {ev.count()} rows from {sf_dir}")

    # 1. point-in-time lookup: for every error event, the most recent prior
    # click by the same user (backward inclusive as-of; one shuffle, no join)
    errors = ev.where("event_type = 'error'").select("event_id", "user_id", "ts")
    clicks = (
        ev.where("event_type = 'click'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    ctx = asof_join(errors, clicks, on="ts", by="user_id")
    n_with_ctx = ctx.where("r_click_id is not null").count()
    print(f"errors with a preceding click: {n_with_ctx}/{errors.count()}")
    ctx.withColumn(
        "mins_since_click", F.round((F.col("ts") - F.col("r_ts")) / 6e10, 1)
    ).orderBy("event_id").show(3)

    # 2. which events fall inside each view's 2h attribution window
    # (bin-accelerated range join — equi-join, never a nested loop)
    views = ev.where("event_type = 'view'").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").alias("lo"), (F.col("ts") + 2 * hour).alias("hi"),
    )
    later = ev.select(F.col("event_id").alias("eid"), "user_id", F.col("ts").alias("t"))
    attributed = range_join(later, views, "t", "lo", "hi", by="user_id", bin_size=hour)
    print("events inside a view's 2h window:", attributed.count())

    # 2b. conversion funnel: view -> click -> error within 6h
    funnel(ev, ["view", "click", "error"], within=6 * hour).show()

    # 3. hourly + daily value rollups in ONE pass (grouping sets)
    roll = time_rollup(ev, "ts", "value", granularities=(hour, 24 * hour), by="user_id")
    roll.groupBy("granularity").agg(
        F.count("*").alias("buckets"), F.round(F.sum("sum_value"), 2).alias("total")
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
