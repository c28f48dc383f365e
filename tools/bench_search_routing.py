#!/usr/bin/env python
"""Bucket-pruning auto-routing proof (round-8 follow-up to the 100M
search bench): the r7 artifact measured a PRUNED read costing MORE than
the full read (609s vs 591s at 100M) when a 20-query batch's vocabulary
hashed into all 64 buckets — the partition filter scanned the same
directories and then filtered nothing out. `bm25_index_read` now
measures bucket coverage and skips the filter above
``prune_coverage_max`` (0.5), so pruned <= unpruned holds for EVERY
batch shape:

- narrow batch (few distinct terms, low coverage): pruning bites —
  only the matching term_bucket= directories are scanned.
- wide batch (coverage ~1.0): the read auto-routes to the full scan —
  no pass-everything filter overhead.

Runs at 10M synthetic docs (same doc generator as the curation bench);
32 buckets by default so the wide batch's 40-word vocabulary actually
exceeds the 0.5 coverage threshold (at 64 buckets it covers only ~0.42
and pruning still engages). Writes BENCH_SEARCH_ROUTING.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

VOCAB = [
    "the", "data", "of", "a", "run", "that", "we", "have", "built", "with",
    "care", "spark", "table", "row", "scan", "fast", "slow", "merge", "batch",
    "value", "part", "hash", "window", "query", "join", "filter", "group",
    "order", "column", "stream", "vector", "line", "sort", "key", "small",
    "big", "agg", "customer", "and", "wordy",
]


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    from splink_spark.pipeline.search import (
        bm25_corpus_stats,
        bm25_index,
        bm25_index_read,
        bm25_index_write,
        bm25_search,
        bucket_coverage,
        tokenize_terms,
    )

    NBUCKETS = int(os.environ.get("SEARCH_ROUTING_BUCKETS", "32"))
    n = int(os.environ.get("SEARCH_ROUTING_DOCS", "10000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("search_routing_bench")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    nwords = (F.lit(50) + F.pmod(F.col("id"), F.lit(151))).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), nwords),
        lambda j: F.element_at(
            vocab, (F.pmod(F.col("id") * 31 + j * 7, F.lit(40)) + 1).cast("int")
        ),
    )
    docs = spark.range(n).repartition(4 * int(cpus)).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )

    idx_dir = tempfile.mkdtemp(prefix="bm25_routing_")
    idx_path = os.path.join(idx_dir, "idx")
    results = {"rows": n, "cpus": int(cpus), "num_buckets": NBUCKETS, "ops": {}}

    t0 = time.time()
    bm25_index_write(bm25_index(docs), idx_path, num_buckets=NBUCKETS)
    results["ops"]["index_build_write"] = round(time.time() - t0, 2)
    print(f"index_build_write: {results['ops']['index_build_write']}s", flush=True)

    t0 = time.time()
    full_idx = bm25_index_read(spark, idx_path)
    stats = bm25_corpus_stats(full_idx)
    results["ops"]["corpus_stats_full_scan"] = round(time.time() - t0, 2)

    # two batch shapes: narrow (2 queries, ~4 distinct terms) and wide
    # (20 queries whose vocabulary covers every bucket)
    narrow = spark.createDataFrame(
        [(1, "spark table"), (2, "vector merge")], "query_id long, query string"
    )
    wide = spark.createDataFrame(
        [(i, " ".join(VOCAB[i * 2:(i + 1) * 2])) for i in range(20)],
        "query_id long, query string",
    )

    def search(idx_df, qs):
        return bm25_search(
            idx_df, qs, k=10, stats=stats, cache_slice=False
        ).write.format("noop").mode("overwrite").save()

    for label, qs in (("narrow", narrow), ("wide", wide)):
        qterms = qs.select(
            F.explode(tokenize_terms(F.col("query"))).alias("term")
        )
        buckets, cov = bucket_coverage(qterms, NBUCKETS)
        results["ops"][f"{label}_coverage"] = round(cov, 3)
        t0 = time.time()
        search(bm25_index_read(spark, idx_path), qs)
        unpruned = round(time.time() - t0, 2)
        t0 = time.time()
        search(bm25_index_read(spark, idx_path, query_terms=qterms, num_buckets=NBUCKETS), qs)
        routed = round(time.time() - t0, 2)
        results["ops"][f"{label}_unpruned_sec"] = unpruned
        results["ops"][f"{label}_routed_sec"] = routed
        print(
            f"{label}: coverage={cov:.3f} unpruned={unpruned}s routed={routed}s",
            flush=True,
        )

    results["notes"] = (
        "routed = bm25_index_read with query_terms (auto-routing: prunes "
        "below 0.5 coverage, full-reads above); single runs on a noisy "
        "host — within-shape ratios are the signal. The wide batch's "
        "routed read is BY CONSTRUCTION the same plan as unpruned (the "
        "pass-everything partition filter is skipped), so any wide-batch "
        "delta is host noise."
    )
    from tools._stamp import measurement_stamp

    results.update(measurement_stamp())
    with open(os.path.join(REPO, "BENCH_SEARCH_ROUTING.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
