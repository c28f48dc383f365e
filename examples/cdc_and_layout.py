#!/usr/bin/env python
"""Change-data + layout walkthrough: the standing first jobs of a
warehouse-scale ingest pipeline, end-to-end on the events/orders
testdata.

1. Compact a keyed change log to latest-per-key (``latest_by_key``),
   build the SCD2 history (``scd2_history``), and diff two snapshots
   into a change feed (``snapshot_diff``).
2. Maintain the same compaction INCREMENTALLY over a stream
   (``cdc_upsert_stream`` + ``read_cdc_state``) and show the merge law:
   streamed state == batch compaction.
3. Lay the compacted table out for data skipping: Z-order vs Hilbert
   clustering keys, and the min-max pruning quality each buys.

    python examples/cdc_and_layout.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("cdc_and_layout_example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from splink_spark.pipeline import (
        hilbert_sort,
        latest_by_key,
        scd2_history,
        snapshot_diff,
        zorder_sort,
    )
    from splink_spark.streaming import cdc_upsert_stream, read_cdc_state

    # --- 1. batch CDC over the events "change log" -------------------
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    compact = latest_by_key(
        ev, "user_id", "ts", tiebreak_col="event_id",
        op_col="event_type", delete_values=("error",),
    )
    print(f"log rows: {ev.count()}  compacted: {compact.count()} "
          f"(users whose latest event errored are tombstoned)")

    hist = scd2_history(
        ev.select("user_id", "ts", "event_type"), "user_id", "ts",
        attr_cols=["event_type"],
    )
    print("SCD2 versions:", hist.count(),
          "current:", hist.where("is_current").count())

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.where(F.col("o_orderkey") % 17 != 0)
    feed = snapshot_diff(orders, new, "o_orderkey",
                         ["o_orderstatus", "o_totalprice"])
    feed.groupBy("change_status").count().show()

    # --- 2. streaming twin: merge law in action ----------------------
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "src")
    ev.repartition(4).write.parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = os.path.join(tmp, "state")
    cdc_upsert_stream(
        stream, state, "user_id", "ts", tiebreak_col="event_id"
    ).awaitTermination()
    streamed = read_cdc_state(
        spark, state, "user_id", "ts", tiebreak_col="event_id",
        op_col="event_type", delete_values=("error",),
    )
    same = sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, compact.collect())
    )
    print("streamed compaction == batch compaction:", same)

    # --- 3. layout for data skipping ---------------------------------
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for name, fn in (("zorder", zorder_sort), ("hilbert", hilbert_sort)):
        laid = fn(li, ["l_orderkey", "l_partkey"], bits=12, keep_key=True)
        key = laid.columns[-1]
        # 16 "files": per-range min/max of l_partkey — what parquet
        # footer stats would prune on
        stats = (
            laid.repartitionByRange(16, F.col(key))
            .groupBy(F.spark_partition_id().alias("f"))
            .agg(F.min("l_partkey").alias("mn"), F.max("l_partkey").alias("mx"))
            .collect()
        )
        lo, hi = 0, int(li.agg(F.max("l_partkey")).collect()[0][0] * 0.05)
        hit = sum(1 for r in stats if r["mn"] <= hi and r["mx"] >= lo)
        print(f"{name}: files hit for a 5% l_partkey band: {hit}/16")

    spark.stop()


if __name__ == "__main__":
    main()
