#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag      e.g. r10 — output goes to plans/<tag>/<query>_<suffix>.txt
  --suffix before|after   (default: before)

Only plans are captured (no jobs run except where a query's construction
itself runs driver-side actions, e.g. EM training or kmeans fits).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DEFAULT_QUERIES = [
    "predict_customer",
    "comparison_vectors",
    "cluster_components",
    "truth_space",
    "minhash_lsh",
    "ann_topk",
    "embedding_neardup",
    "events_sessions",
    "events_window",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    argv = sys.argv[1:]
    suffix = "before"
    if "--suffix" in argv:
        i = argv.index("--suffix")
        suffix = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    tag = argv[0] if argv else "r10"
    names = argv[1:] or DEFAULT_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture_plans")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    queries = entrymod.queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"FAILED to build plan: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInArrow") + plan.count(
            "MapInPandas"
        )
        print(f"{name}: {len(plan)}B, Exchange={n_exch}, PythonNodes={n_py} -> {path}")


if __name__ == "__main__":
    main()
