#!/usr/bin/env python
"""Scratch profiler for the 1M bench — fine-grained stage timings. Untracked."""
import os, sys, time, logging
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
logging.getLogger("py4j").setLevel(logging.WARNING)

from bench_1m import build_model, CACHE
from pyspark.sql import SparkSession, functions as F
from splink_spark import Linker, block_on

path = os.path.join(CACHE, "persons_1000000.parquet")
cpus = "32"
b = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("prof_1m")
    .config("spark.sql.shuffle.partitions", str(int(cpus)))
    .config("spark.default.parallelism", str(int(cpus)))
    .config("spark.sql.adaptive.enabled", os.environ.get("PROF_AQE", "true"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("PROF_BCAST", str(256 * 1024 * 1024)))
    .config("spark.sql.join.preferSortMergeJoin",
            os.environ.get("PROF_PREFER_SMJ", "true"))
)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(path)

def tick(label, t0):
    t1 = time.time()
    print(f"  [{label}] {t1 - t0:.2f}s", flush=True)
    return t1

linker = Linker(df, build_model())

t = time.time()
linker.df_concat().count()
t = tick("concat warm", t)
linker.df_concat_with_tf().count()
t = tick("concat_with_tf warm", t)

t = time.time()
linker.training.estimate_probability_two_random_records_match(
    [block_on("email"), block_on("first_name", "surname", "dob")], recall=0.8
)
t = tick("train_lambda", t)

t = time.time()
linker.training.estimate_u_using_random_sampling(max_pairs=2e6, seed=1)
t = tick("train_u", t)

t = time.time()
linker.training.estimate_parameters_using_expectation_maximisation(block_on("email"))
t = tick("train_em email", t)
linker.training.estimate_parameters_using_expectation_maximisation(block_on("surname", "dob"))
t = tick("train_em surname+dob", t)

t = time.time()
pred = linker.inference.predict(threshold_match_probability=0.01)
t = tick("predict build (lazy)", t)
narrow = getattr(pred, "_splink_narrow", None)
n_narrow = narrow.count()
t = tick(f"narrow core count ({n_narrow})", t)
n_pairs = pred.count()
t = tick(f"predict wide count ({n_pairs})", t)

t = time.time()
clustered = linker.clustering.cluster_pairwise_predictions_at_threshold(pred, 0.9)
t = tick("cluster build (incl CC solve)", t)
n_clusters = clustered.select("cluster_id").distinct().count()
t = tick(f"cluster distinct count ({n_clusters})", t)
spark.stop()
