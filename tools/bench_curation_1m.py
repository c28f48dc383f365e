#!/usr/bin/env python
"""1M-document scale proof for the curation operator family.

Generates a 1M-row synthetic corpus (deterministic arithmetic text, 50-200
words/doc, ~125 avg -> ~125M tokens) entirely JVM-side via spark.range —
no driver data — then times each curation operator end-to-end (noop sink,
full materialization). Writes BENCH_CURATION_1M.json at the repo root.

The point: every operator here is a per-document map or a natural-key
shuffle, so wall-clock should scale linearly with corpus size; this run
pins the constant at 1M docs on local[32].
"""

from __future__ import annotations

import json
import math
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

VOCAB = [
    "the", "data", "of", "a", "run", "that", "we", "have", "built", "with",
    "care", "spark", "table", "row", "scan", "fast", "slow", "merge", "batch",
    "value", "part", "hash", "window", "query", "join", "filter", "group",
    "order", "column", "stream", "vector", "line", "sort", "key", "small",
    "big", "agg", "customer", "and", "wordy",
]


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from splink_spark.pipeline import curation as cu

    n = int(os.environ.get("CURATION_BENCH_ROWS", "1000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("curation_1m_bench")
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
        lambda j: F.element_at(vocab, (F.pmod(F.col("id") * 31 + j * 7, F.lit(40)) + 1).cast("int")),
    )
    docs = (
        spark.range(n)
        .repartition(4 * int(cpus))
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
            F.concat(F.lit("lang"), F.pmod(F.col("id"), F.lit(8)).cast("string")).alias("lang"),
        )
        .persist()
    )
    n_docs = docs.count()  # materialize the corpus before timing
    eval_docs = docs.where(F.pmod(F.col("doc_id"), F.lit(101)) == 0)

    heap_after = {}

    def run(name, make):
        # the op CALL sits inside the stopwatch (thunk), so eager
        # construction-time driver actions are measured too — the r09 dsir
        # timing-boundary bug class; tools/pre_snapshot_check.py lints this
        t0 = time.time()
        make().write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        heap_after[name] = round(
            (rt.totalMemory() - rt.freeMemory()) / (1 << 30), 2
        )
        print(f"# {name}: {sec}s (heap {heap_after[name]}GiB)", file=sys.stderr)
        return sec

    results = {
        "rows": n_docs,
        "cpus": int(cpus),
        "ops": {
            "gopher_rules": run("gopher_rules", lambda: cu.gopher_quality_flags(docs)),
            # explode method: the long-document/linear-work scale path
            "repetition_metrics_explode": run(
                "repetition_metrics_explode",
                lambda: cu.repetition_metrics(docs, method="explode"),
            ),
            "repetition_metrics_hof": run(
                "repetition_metrics_hof",
                lambda: cu.repetition_metrics(docs, method="hof"),
            ),
            "decontaminate_vs_1pct_eval": run(
                "decontaminate", lambda: cu.decontaminate(docs, eval_docs, n=8)
            ),
            "pack_sequences": run(
                "pack_sequences", lambda: cu.pack_sequences(docs, 8192, "lang")
            ),
            "pii_redact": run("pii_redact", lambda: cu.pii_redact(docs)),
            "stratified_sample": run(
                "stratified_sample",
                lambda: cu.stratified_sample(
                    docs, "lang", {f"lang{i}": 0.5 for i in range(8)}
                ),
            ),
        },
    }

    # round-5 additions: model-based quality + data selection + incremental
    # screening, each on its scale path
    from splink_spark.pipeline import classifier as clf
    from splink_spark.pipeline import dedup as dd
    from splink_spark.pipeline import lm

    labelled = docs.withColumn(
        "label", (F.pmod(F.col("doc_id"), F.lit(8)) < 4).cast("int")
    )
    t0 = time.time()
    scored = clf.quality_classifier(labelled, "label", iterations=8)
    scored.write.format("noop").mode("overwrite").save()
    results["ops"]["quality_classifier_8iter"] = round(time.time() - t0, 2)
    print(f"# quality_classifier_8iter: {results['ops']['quality_classifier_8iter']}s",
          file=sys.stderr)

    t0 = time.time()
    picked = cu.dsir_resample(
        docs, docs.where(F.col("lang") == "lang0").limit(10_000),
        max(1000, n // 100), n=2, hash_buckets=1 << 16,
    )
    picked.write.format("noop").mode("overwrite").save()
    results["ops"]["dsir_resample_hashed"] = round(time.time() - t0, 2)
    print(f"# dsir_resample_hashed: {results['ops']['dsir_resample_hashed']}s",
          file=sys.stderr)

    t0 = time.time()
    ppl = lm.perplexity_filter(docs, max_perplexity=40.0, order=3)
    ppl.write.format("noop").mode("overwrite").save()
    results["ops"]["perplexity_filter_char3"] = round(time.time() - t0, 2)
    print(f"# perplexity_filter_char3: {results['ops']['perplexity_filter_char3']}s",
          file=sys.stderr)

    # adversarial vocabulary (this corpus: 40 words -> degenerate LSH band
    # buckets) — the capped scale path is mandatory here; uncapped this
    # stage never finished at 10M (round-8 abort)
    t0 = time.time()
    batch = docs.where(F.pmod(F.col("doc_id"), F.lit(101)) == 0)
    settled = docs.where(F.pmod(F.col("doc_id"), F.lit(101)) != 0)
    flags = dd.incremental_dedup(
        batch, settled, jaccard_threshold=0.6, max_band_bucket=100_000
    )
    flags.write.format("noop").mode("overwrite").save()
    results["ops"]["incremental_dedup_1pct_batch_capped"] = round(time.time() - t0, 2)
    print(f"# incremental_dedup_1pct_batch_capped: "
          f"{results['ops']['incremental_dedup_1pct_batch_capped']}s",
          file=sys.stderr)

    # realistic vocabulary: Zipf s~1 50k-word corpus (rank = floor(V^u)
    # for uniform u in (0,1) => P(rank=k) ~ 1/k; top-word mass ~6%, like
    # real text), same doc-length profile; run the UNCAPPED default to
    # pin the normal path's throughput. NOT floor(V/u): that is s~2 (the
    # top word becomes HALF of all tokens) — measured as another
    # degenerate-banding corpus that never finished, not a realistic one.
    V = 50_000
    zwords = F.transform(
        F.sequence(F.lit(1), nwords),
        lambda j: F.concat(
            F.lit("w"),
            F.least(
                F.lit(V),
                F.greatest(
                    F.lit(1),
                    F.floor(
                        F.exp(
                            (
                                (
                                    F.pmod(
                                        F.xxhash64(F.col("id") * 131 + j * 17),
                                        F.lit(1_000_000),
                                    ).cast("double")
                                    + 0.5
                                )
                                / 1_000_000.0
                            )
                            * float(math.log(V))
                        )
                    ).cast("int"),
                ),
            ).cast("string"),
        ),
    )
    zdocs = (
        spark.range(n)
        .repartition(4 * int(cpus))
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", zwords).alias("text"))
        .persist()
    )
    zdocs.count()
    t0 = time.time()
    zbatch = zdocs.where(F.pmod(F.col("doc_id"), F.lit(101)) == 0)
    zsettled = zdocs.where(F.pmod(F.col("doc_id"), F.lit(101)) != 0)
    zflags = dd.incremental_dedup(zbatch, zsettled, jaccard_threshold=0.6)
    zflags.write.format("noop").mode("overwrite").save()
    results["ops"]["incremental_dedup_zipf_vocab"] = round(time.time() - t0, 2)
    print(f"# incremental_dedup_zipf_vocab: "
          f"{results['ops']['incremental_dedup_zipf_vocab']}s", file=sys.stderr)
    zdocs.unpersist()

    t0 = time.time()
    capped = cu.cap_per_group(
        docs, "lang", max(1000, n // 100), method="sampled"
    )
    capped.write.format("noop").mode("overwrite").save()
    results["ops"]["cap_per_group_sampled"] = round(time.time() - t0, 2)
    print(f"# cap_per_group_sampled: {results['ops']['cap_per_group_sampled']}s",
          file=sys.stderr)

    t0 = time.time()
    sharded = cu.shard_corpus(docs, num_shards=256, seed=1)
    sharded.write.format("noop").mode("overwrite").save()
    results["ops"]["shard_corpus_256"] = round(time.time() - t0, 2)
    print(f"# shard_corpus_256: {results['ops']['shard_corpus_256']}s",
          file=sys.stderr)

    # SQ8 quantization over synthetic 64-dim vectors (deterministic,
    # generated JVM-side): calibration scan + quantize scan
    from splink_spark.pipeline import embeddings as emb

    vecs = docs.select(
        F.col("doc_id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: (
                F.pmod(F.col("doc_id") * 37 + j * 101, F.lit(997)).cast("double")
                / 498.5 - 1.0
            ),
        ).alias("embedding"),
    )
    t0 = time.time()
    q = emb.quantize_embeddings(vecs, "embedding", "vec_id")
    q.write.format("noop").mode("overwrite").save()
    results["ops"]["sq8_quantize_64d"] = round(time.time() - t0, 2)
    print(f"# sq8_quantize_64d: {results['ops']['sq8_quantize_64d']}s",
          file=sys.stderr)

    results = {
        **results,
        "jvm_heap_used_gb_after_op": heap_after,
        "note": (
            "%d synthetic docs (~125 tokens/doc avg, ~%dM tokens) generated "
            "JVM-side; per-op end-to-end wall clock, noop sink, single run "
            "on local[%s]. Every op is a per-doc map or a natural-key "
            "shuffle (algorithmically linear in corpus size); measured "
            "wall-clock ratios vs the sibling artifact are recorded in "
            "'scaling_vs_sibling' - ratios above the row ratio on this "
            "fixed-memory single host indicate GC/shuffle-spill pressure "
            "or noisy-neighbor interference, not operator complexity."
            % (n_docs, round(n_docs * 125 / 1e6), cpus)
        ),
    }
    results["total_sec"] = round(sum(results["ops"].values()), 2)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    label = "10M" if n >= 10_000_000 else "1M"
    sibling = "1M" if label == "10M" else "10M"
    sib_path = os.path.join(here, f"BENCH_CURATION_{sibling}.json")
    if os.path.exists(sib_path):
        with open(sib_path) as f:
            sib = json.load(f)
        row_ratio = n_docs / max(1, sib.get("rows", 1))
        results["scaling_vs_sibling"] = {
            "sibling_rows": sib.get("rows"),
            "row_ratio": round(row_ratio, 2),
            "wall_clock_ratio_per_op": {
                k: round(results["ops"][k] / sib["ops"][k], 2)
                for k in results["ops"]
                if sib.get("ops", {}).get(k)
            },
        }
    results.update(__import__('_stamp').measurement_stamp())
    with open(os.path.join(here, f"BENCH_CURATION_{label}.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
