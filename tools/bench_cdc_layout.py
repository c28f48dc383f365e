#!/usr/bin/env python
"""Scale proof for the CDC operators (pipeline/cdc.py) and the layout
keys (pipeline/layout.py) on 10M synthetic rows (JVM-generated, no
driver data):

- latest_by_key over a 10M-row changelog with 1M keys (the standing
  first job of every CDC consumer) + scd2_history on the same log
- snapshot_diff of two 10M-row snapshots (1% changed, ~6% removed,
  ~8% added)
- zorder_sort vs hilbert_sort wall clock at bits=16 (Hilbert now
  defaults to the numpy mapInPandas walk — bit-equal to the staged
  Column form; the bench shows what the curve costs vs Morton's single
  expression)
- file-skipping quality: the sorted orders are split into 512
  range-partition "files"; for 16 narrow x-band and y-band queries we
  count files whose min-max stats intersect the band. Lower = better
  pruning. Hilbert's locality should hit no more files than Z-order.

Writes BENCH_CDC_LAYOUT.json. Single-run wall clock on a noisy host;
within-run RATIOS are the signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
# Spark's forked Python workers must be able to import splink_spark too
# (mapInPandas/pandas_udf ops pickle module functions BY REFERENCE): export
# the repo root on PYTHONPATH before the session starts, whatever the cwd.
os.environ["PYTHONPATH"] = (
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from splink_spark.pipeline.cdc import (
        latest_by_key,
        scd2_history,
        snapshot_diff,
    )
    from splink_spark.pipeline.layout import hilbert_sort, zorder_sort

    n = int(os.environ.get("CDC_BENCH_ROWS", "10000000"))
    keys = max(1, n // 10)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cdc_layout_bench")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {"rows": n, "keys": keys, "cpus": int(cpus), "ops": {}}

    def run(name, make):
        # the op CALL sits inside the stopwatch (thunk), so eager
        # construction-time driver actions are measured too — the r09 dsir
        # timing-boundary bug class; tools/pre_snapshot_check.py lints this
        t0 = time.time()
        make().write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        results["ops"][name] = sec
        print(f"{name}: {sec}s", flush=True)

    # --- CDC ---------------------------------------------------------
    log = (
        spark.range(n)
        .repartition(4 * int(cpus))
        .select(
            F.col("id").alias("offset"),
            F.pmod(F.col("id") * 2654435761, F.lit(keys)).alias("k"),
            (F.pmod(F.col("id") * 48271, F.lit(2_592_000))).alias("ts"),
            F.when(F.pmod("id", F.lit(19)) == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.pmod("id", F.lit(1_000_003)).alias("val"),
        )
        .persist()
    )
    log.count()
    run(
        "latest_by_key",
        lambda: latest_by_key(log, "k", "ts", tiebreak_col="offset",
                              op_col="op", delete_values=("D",)),
    )
    run("scd2_history", lambda: scd2_history(log, "k", "ts", attr_cols=["val"]))

    old = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.col("id") * 16807, F.lit(1_000_003)).alias("v"),
        )
        .persist()
    )
    old.count()
    new = (
        old.where(F.pmod("k", F.lit(17)) != 0)
        .select(
            "k",
            F.when(F.pmod("k", F.lit(97)) == 0, F.col("v") + 1).otherwise(
                F.col("v")
            ).alias("v"),
        )
        .unionByName(
            old.where(F.pmod("k", F.lit(13)) == 0).select(
                (F.col("k") + n * 2).alias("k"), "v"
            )
        )
    )
    run("snapshot_diff", lambda: snapshot_diff(old, new, "k", ["v"]))
    log.unpersist()

    # --- layout ------------------------------------------------------
    pts = (
        spark.range(n)
        .repartition(4 * int(cpus))
        .select(
            F.col("id"),
            F.pmod(F.col("id") * 2654435761, F.lit(1 << 20)).alias("x"),
            F.pmod(F.col("id") * 48271, F.lit(1 << 20)).alias("y"),
        )
        .persist()
    )
    pts.count()
    run("zorder_sort_b16", lambda: zorder_sort(pts, ["x", "y"], bits=16))
    run("hilbert_sort_b16", lambda: hilbert_sort(pts, ["x", "y"], bits=16))

    # pruning quality: 512 range "files", min-max stats per file, count
    # files intersected by 16 narrow x-bands and 16 y-bands
    n_files = 512
    band = (1 << 20) // 64  # each band covers ~1.6% of the axis

    def file_stats(sorted_df):
        return (
            sorted_df.repartitionByRange(n_files, F.col("__key"))
            .select(
                F.spark_partition_id().alias("fid"), "x", "y"
            )
            .groupBy("fid")
            .agg(
                F.min("x").alias("mnx"), F.max("x").alias("mxx"),
                F.min("y").alias("mny"), F.max("y").alias("mxy"),
            )
            .collect()
        )

    from splink_spark.pipeline.layout import (
        hilbert_index,
        quantize_uniform,
        zorder_key,
    )

    q = [
        quantize_uniform(F.col(c), 0, (1 << 20) - 1, 16) for c in ("x", "y")
    ]
    z_stats = file_stats(pts.withColumn("__key", zorder_key(q, 16)))
    h_staged = hilbert_index(
        pts.withColumn("__qx", q[0]).withColumn("__qy", q[1]),
        "__qx",
        "__qy",
        16,
        "__key",
    )
    h_stats = file_stats(h_staged)

    def files_hit(stats):
        hits = 0
        queries = 0
        for i in range(16):
            lo = i * 4 * band
            hi = lo + band
            queries += 2
            hits += sum(1 for r in stats if r["mnx"] <= hi and r["mxx"] >= lo)
            hits += sum(1 for r in stats if r["mny"] <= hi and r["mxy"] >= lo)
        return round(hits / queries, 1)

    results["pruning_files_per_query"] = {
        "n_files": n_files,
        "zorder": files_hit(z_stats),
        "hilbert": files_hit(h_stats),
    }
    print("pruning:", results["pruning_files_per_query"], flush=True)

    from tools._stamp import measurement_stamp

    results.update(measurement_stamp())
    out = os.path.join(
        REPO, os.environ.get("CDC_BENCH_OUT", "BENCH_CDC_LAYOUT.json")
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
