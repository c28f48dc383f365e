#!/usr/bin/env python
"""Split the stored-tables incremental_dedup 10M wall into its stages:
(A) exact stage only (near_dup=False: batch fingerprint + stored-corpus
fingerprint probe + flags) vs (B) the full run (adds banding of the
STORED signatures + candidate generation + exact-Jaccard verification).
B - A bounds the near-dup stage — the floor stored signatures cannot
remove (verification must touch candidate corpus text by the op's
exactness contract).

Requires the tables written by bench_curation_op's
incremental_dedup_zipf_build_tables run (.bench_cache/incdedup_zipf_<n>).
Prints one JSON line; does not modify artifacts.
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

    n = int(os.environ.get("CURATION_BENCH_ROWS", "10000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    tables = os.path.join(REPO, ".bench_cache", f"incdedup_zipf_{n}")
    for d in ("fingerprints", "signatures"):
        if not os.path.exists(os.path.join(tables, d, "_SUCCESS")):
            raise SystemExit(f"missing stored table {d}; run the build row first")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("incdedup_stored_split")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "80g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same zipf corpus recipe as bench_curation_op._zipf_setup (the
    # generator lives in a closure there; regenerate with the identical
    # expressions instead)
    import math

    V = 50_000
    nwords = (F.lit(50) + F.pmod(F.col("id"), F.lit(151))).cast("int")

    def _rank(j):
        return F.least(
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
        )

    letters = F.split(F.lit(",".join("abcdefghijklmnopqrstuvwxyz")), ",")

    def _word(j):
        r = _rank(j).cast("string")
        h = F.xxhash64(r)
        ln = (F.pmod(h, F.lit(5)) + 4).cast("int")
        return F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), ln),
                lambda p: F.element_at(
                    letters, (F.pmod(F.xxhash64(r, p), F.lit(26)) + 1).cast("int")
                ),
            ),
        )

    zwords = F.transform(F.sequence(F.lit(1), nwords), _word)
    zdocs = (
        spark.range(n)
        .repartition(4 * int(cpus))
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", zwords).alias("text"))
        .persist()
    )
    zdocs.count()
    zbatch = zdocs.where(F.pmod(F.col("doc_id"), F.lit(101)) == 0)
    zsettled = zdocs.where(F.pmod(F.col("doc_id"), F.lit(101)) != 0)
    pred = F.pmod(F.col("doc_id"), F.lit(101)) != 0
    corpus_fp = spark.read.parquet(os.path.join(tables, "fingerprints")).where(pred)
    corpus_sigs = spark.read.parquet(os.path.join(tables, "signatures")).where(pred)

    out = {}
    spark.sparkContext.setJobDescription("stored split: exact stage only")
    t0 = time.time()
    dd.incremental_dedup(
        zbatch, zsettled, jaccard_threshold=0.6, near_dup=False,
        corpus_fingerprints=corpus_fp,
    ).write.format("noop").mode("overwrite").save()
    out["exact_stage_only_sec"] = round(time.time() - t0, 2)
    print(f"# exact-only: {out['exact_stage_only_sec']}s", file=sys.stderr, flush=True)

    spark.sparkContext.setJobDescription("stored split: full run")
    t0 = time.time()
    dd.incremental_dedup(
        zbatch, zsettled, jaccard_threshold=0.6,
        corpus_fingerprints=corpus_fp, corpus_signatures=corpus_sigs,
    ).write.format("noop").mode("overwrite").save()
    out["full_stored_sec"] = round(time.time() - t0, 2)
    out["near_dup_stage_sec"] = round(out["full_stored_sec"] - out["exact_stage_only_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
