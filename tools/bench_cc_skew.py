#!/usr/bin/env python
"""Skewed-graph proof point for the distributed connected-components loop.

The chain-graph bench (bench.py cc_distributed_1m) proves DIAMETER behavior
(rounds ~ log2 diameter); this one proves the frontier loop under DEGREE
SKEW: ~11.5M deterministic edges over 10M nodes with one 100k-degree hub,
1000 ~1.4k-degree medium hubs, and a uniform-attachment tree (single
component, shallow diameter), with the driver union-find shortcut DISABLED
(driver_solve_max_edges=0). Records wall-clock, delta rounds, component
count, and the max per-partition row count of the symmetrized neighbour
table (the skew the shuffle actually sees). Writes BENCH_CC_SKEW.json.

Run standalone, or import run_cc_skew(spark, n) from bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_skew_graph(spark, n: int):
    """Deterministic skewed graph over ``spark.range(n)``: uniform-attachment
    tree (node i attaches to xxhash64(i) mod i — connects everything, ~log
    diameter) + a hub (node 0 — every 100th node, degree n/100) + 1000
    medium hubs (i % 7 == 3 → node i % 1000)."""
    from pyspark.sql import functions as F

    ids = spark.range(1, n).select(F.col("id"))
    tree = ids.select(
        F.pmod(F.xxhash64(F.col("id")), F.col("id")).alias("node_id_l"),
        F.col("id").alias("node_id_r"),
    )
    hub = (
        spark.range(0, n, 100)
        .where(F.col("id") > 0)
        .select(F.lit(0).cast("long").alias("node_id_l"), F.col("id").alias("node_id_r"))
    )
    medium = (
        ids.where((F.col("id") % 7 == 3) & (F.col("id") % 1000 != F.col("id")))
        .select((F.col("id") % 1000).alias("node_id_l"), F.col("id").alias("node_id_r"))
    )
    return tree.unionByName(hub).unionByName(medium)


def run_cc_skew(spark, n: int = 10_000_000, probes: bool = True) -> dict:
    """``probes=False`` (bench.py per-round mode) skips the degree/partition
    diagnostics and times only generate + solve + component count."""
    from pyspark.sql import functions as F

    from splink_spark.internals.connected_components import (
        solve_connected_components,
    )

    edges = build_skew_graph(spark, n).persist()
    n_edges = edges.count()
    result = {"nodes": n, "edges": n_edges}
    if probes:
        # degree skew the shuffle sees: max rows landing in one hash
        # partition of the symmetrized neighbour table, keyed like the loop
        # keys it
        sym = edges.selectExpr(
            "node_id_l AS node", "node_id_r AS nbr"
        ).unionByName(edges.selectExpr("node_id_r AS node", "node_id_l AS nbr"))
        part_rows = (
            sym.repartition("nbr")
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
            .collect()[0]
        )
        result["max_degree"] = (
            sym.groupBy("node").count().agg(F.max("count")).collect()[0][0]
        )
        result["neighbour_shuffle_partition_rows"] = {
            "max": part_rows["mx"],
            "avg": round(part_rows["avg"], 1),
        }
    nodes = spark.range(n).select(F.col("id").alias("node_id"))
    t0 = time.time()
    cc = solve_connected_components(edges, nodes, driver_solve_max_edges=0)
    n_components = cc.select("cluster_id").distinct().count()
    result["sec"] = round(time.time() - t0, 3)
    result["delta_rounds"] = getattr(cc, "_splink_cc_rounds", None)
    result["n_components"] = n_components
    result["note"] = (
        "driver_solve_max_edges=0: distributed delta-frontier loop on a "
        "degree-skewed graph (one n/100-degree hub + 1000 medium hubs + "
        "uniform-attachment tree, single component). Rounds stay "
        "~log(diameter); per-key skew is bounded by max_degree rows on "
        "one reducer in the frontier join."
    )
    edges.unpersist()
    return result


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("CC_SKEW_NODES", "10000000"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cc_skew_bench")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    result = run_cc_skew(spark, n)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    result.update(__import__('_stamp').measurement_stamp())
    with open(os.path.join(here, "BENCH_CC_SKEW.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
