#!/usr/bin/env python
"""A/B the semantic_dedup within-cluster pair stage: interpreted-join plan
vs the per-cluster exact-int64 matmul kernel, on a deterministic synthetic
clustered corpus where pair work dominates (the declared gate's sf0.1
embeddings table is 2k rows — gate-scale tells you nothing about the
quadratic stage).

Usage: SEMDEDUP_BENCH_ROWS=60000 python tools/bench_semantic_dedup.py
Writes/updates BENCH_SEMANTIC_DEDUP.json (runs recorded, best reported).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ["PYTHONPATH"] = (
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from splink_spark.pipeline import dedup as dd

    n = int(os.environ.get("SEMDEDUP_BENCH_ROWS", "40000"))
    dim = int(os.environ.get("SEMDEDUP_BENCH_DIM", "32"))
    n_centers = int(os.environ.get("SEMDEDUP_BENCH_CENTERS", "30"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("semantic_dedup_bench")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic clustered vectors: center c = unit-ish pattern from
    # xxhash64, member = center + LARGE deterministic jitter — k-means
    # still recovers ~n/n_centers-sized clusters (the quadratic regime the
    # measurement targets: every within-cluster ORDERED pair pays a dot),
    # but almost no pair clears threshold=0.95, so the timed cost is the
    # pair-dot stage itself, not a pair-explosion CC solve downstream
    # (jitter 0.02 made every within-center pair a near-dup: 60M edges,
    # executor heap OOM in the CC checkpoint — a data-design failure, not
    # a plan difference; both plans died identically).
    center = F.pmod(F.col("id"), F.lit(n_centers))
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(F.xxhash64(center * 1000 + j), F.lit(2000)).cast("double")
            / 1000.0
            - 1.0
            + (
                F.pmod(F.xxhash64(F.col("id") * 31 + j), F.lit(100)).cast(
                    "double"
                )
                / 100.0
                - 0.5
            )
            * 0.9
        ),
    )
    vecs = (
        spark.range(n)
        .repartition(4 * int(cpus))
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .persist()
    )
    vecs.count()

    results = {"n": n, "dim": dim, "centers": n_centers, "runs": {}}
    for label, env in (("kernel", None), ("join", "0")):
        if env is None:
            os.environ.pop("SPLINK_SPARK_SEMDEDUP_KERNEL_MAX_CLUSTER", None)
        else:
            os.environ["SPLINK_SPARK_SEMDEDUP_KERNEL_MAX_CLUSTER"] = env
        runs = []
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"semantic_dedup {label}")
            t0 = time.time()
            dd.semantic_dedup(
                vecs, k=n_centers, iterations=1, threshold=0.95
            ).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 2))
            print(f"# {label}: {runs[-1]}s", file=sys.stderr, flush=True)
        results["runs"][label] = runs
        results[label + "_best"] = min(runs)
    os.environ.pop("SPLINK_SPARK_SEMDEDUP_KERNEL_MAX_CLUSTER", None)

    from tools._stamp import measurement_stamp

    results.update(measurement_stamp())
    path = os.path.join(REPO, "BENCH_SEMANTIC_DEDUP.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
