#!/usr/bin/env python
"""100M-document scale point for the search/curation families
(VERDICT r6 stretch item): bm25_index -> term-bucketed on-disk index ->
pruned search batch, plus corpus-wide boilerplate-line removal, each with
per-stage wall clock.

Corpus: 100M synthetic docs generated with pure Column expressions (no
Python row loop), written once to parquet so every stage reads the same
files. Each doc is three newline-separated lines:
  - a header line drawn from 24 boilerplate templates on ~30%% of docs,
  - a content line of 10 Zipf-ish tokens (vocab ~50k, quadratic rank
    bias — common words dominate, like bench_search.py's 1M corpus),
  - a footer template line on ~10%% of docs.
Docs are deliberately SHORT (~13 tokens avg): the scale axis here is the
DOCUMENT COUNT (100M ids through index build, doc-length join, boilerplate
reassembly) and the ~1.2B-row postings shuffle, not raw text bytes — the
honest note is that a real 100M-doc web corpus has ~100x the tokens, and
the per-stage costs below scale with postings (index) and lines
(boilerplate), both reported.

Stages (single run each — one 100M pass is the budget; ratios between
stages share the noise window):
  docs_write            generate + write the corpus parquet
  bm25_index_build      explode -> (term,doc) tf + doc lengths -> postings
  bm25_index_write      term-bucketed (64) partitioned parquet
  corpus_stats          one full-index reduce (once per index, stored)
  search_pruned         20 queries, partition-pruned read + bm25_search
  search_unpruned       same batch against the full index read (contrast)
  boilerplate_removal   corpus-wide repeated-line blocklist + anti-join

Usage: python tools/bench_search_100m.py  [env SEARCH100M_DOCS=100000000]
Writes BENCH_SEARCH_100M.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
CACHE = os.path.join(REPO, ".bench_cache")

HEADERS = [
    "cookie consent required to continue",
    "subscribe to our newsletter today",
    "accept all cookies or manage preferences",
    "sign in to view this content",
    "advertisement continue reading below",
    "home news sport weather shop",
] * 4  # 24 templates (repeats fine: picked by index)
FOOTERS = [
    "all rights reserved terms privacy",
    "follow us on social media",
    "copyright notice and legal information",
    "back to top contact us sitemap",
]


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from splink_spark.pipeline.search import (
        bm25_corpus_stats,
        bm25_index,
        bm25_index_read,
        bm25_index_write,
        bm25_search,
        tokenize_terms,
    )
    from splink_spark.pipeline.text import remove_boilerplate_lines

    n_docs = int(os.environ.get("SEARCH100M_DOCS", "100000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("search_bench_100m")
        # ~1.2B-row postings shuffle: more, smaller reduce partitions so a
        # partition's sort fits in memory; AQE coalesces the small stages
        .config("spark.sql.shuffle.partitions", str(16 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.local.dir", os.path.join(CACHE, "tmp_spark_100m"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {"cpus": int(cpus), "n_docs": n_docs, "ops": {}, "counts": {}}

    def run(name, fn):
        t0 = time.time()
        out = fn()
        sec = round(time.time() - t0, 2)
        results["ops"][name] = sec
        print(f"{name}: {sec}s", flush=True)
        return out

    docs_path = os.path.join(CACHE, f"docs100m_{n_docs}.parquet")
    idx_path = os.path.join(CACHE, f"bm25_index_{n_docs}")

    header_arr = F.array(*[F.lit(h) for h in HEADERS])
    footer_arr = F.array(*[F.lit(x) for x in FOOTERS])
    sqrt_v = 224  # vocab ~ 50k words, quadratic rank bias (Zipf-ish)

    def gen_write():
        # Zipf-ish body tokens PLUS one near-unique tail token per doc
        # (full-range hash): without it the mod-224 arithmetic yields only
        # ~224 distinct content lines across 100M docs, and the boilerplate
        # blocklist — correctly — eats the entire corpus (the v1 run's
        # cleaned_chars=0). The unique token keeps content lines out of the
        # heavy-hitter set while leaving the postings-scale term
        # distribution Zipf-ish.
        content = F.concat(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(10)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (
                            F.pmod(F.col("id") * 48271 + i * 2654435761, F.lit(sqrt_v))
                            * F.pmod(F.col("id") * 48271 + i * 2654435761, F.lit(sqrt_v))
                            + F.pmod(F.col("id") * 7 + i, F.lit(sqrt_v))
                        ).cast("string"),
                    ),
                ),
                " ",
            ),
            F.lit(" u"),
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000_000)).cast("string"),
        )
        h = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100))
        f2 = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100))
        header = F.when(
            h < 30, F.element_at(header_arr, (h % len(HEADERS) + 1).cast("int"))
        )
        footer = F.when(
            f2 < 10, F.element_at(footer_arr, (f2 % len(FOOTERS) + 1).cast("int"))
        )
        text = F.concat_ws(
            "\n", *[c for c in (header, content, footer)]
        )  # concat_ws skips NULL lines
        (
            spark.range(n_docs)
            .repartition(8 * int(cpus))
            .select(F.col("id").alias("doc_id"), text.alias("text"))
            .write.mode("overwrite")
            .parquet(docs_path)
        )

    if not os.path.exists(docs_path):
        run("docs_write", gen_write)
    docs = spark.read.parquet(docs_path)

    # ---- index build + bucketed write (one pipeline: the postings shuffle
    # is the cost; the write adds the bucket column + partitioned layout)
    run(
        "bm25_index_build_and_bucketed_write",
        lambda: bm25_index_write(bm25_index(docs), idx_path, num_buckets=64),
    )
    idx_full = bm25_index_read(spark, idx_path)
    results["counts"]["postings_rows"] = run(
        "postings_count_full_scan", idx_full.count
    )
    results["counts"]["index_bytes_on_disk"] = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(idx_path)
        for f in fs
    )

    stats = run("corpus_stats_once_per_index", lambda: bm25_corpus_stats(idx_full))
    results["counts"]["n_docs_indexed"] = int(stats[0])

    qs = spark.createDataFrame(
        [
            (i, f"w{(i * 37) % 5000} w{(i * 101) % 5000} w{(i * 13) % 500}")
            for i in range(20)
        ],
        "query_id long, query string",
    )
    qterms = qs.select(F.explode(tokenize_terms(F.col("query"))).alias("term"))

    def search(index_df):
        out = bm25_search(index_df, qs, k=10, stats=stats, cache_slice=False)
        out.write.format("noop").mode("overwrite").save()

    run(
        "search_20q_top10_pruned",
        lambda: search(bm25_index_read(spark, idx_path, query_terms=qterms)),
    )
    run("search_20q_top10_unpruned_full_read", lambda: search(idx_full))

    # ---- corpus-wide boilerplate-line removal over the same 100M docs.
    # The agg forces the full reassembly (sum of cleaned-text lengths) and
    # reports how much was stripped.
    def boiler():
        cleaned = remove_boilerplate_lines(docs, min_count=1000)
        row = cleaned.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_removed_lines").alias("removed_lines"),
            F.sum(F.length("cleaned_text")).alias("cleaned_chars"),
        ).collect()[0]
        return dict(row.asDict())

    results["counts"]["boilerplate"] = run("boilerplate_removal_100m_docs", boiler)

    results["notes"] = (
        "single run per stage (one 100M pass is the budget on this host; "
        "documented 2-4x run-to-run variance applies). Docs are SHORT "
        "(~13 tokens avg, 3 lines) — the scale axis is document count and "
        "the ~{p}-row postings shuffle, not text bytes; a real web corpus "
        "has ~100x the tokens per doc and the index stages scale with "
        "postings (reported above). search_pruned reads only the "
        "term_bucket= directories the 20 queries hash to (<=60 of 64); "
        "unpruned re-reads the full index per batch — the gap is the "
        "partition-pruning win that dominates at 100 TB. Boilerplate "
        "blocklist is the heavy-hitter set only (min_count=1000 over 100M "
        "docs), broadcast into an anti-join; blank keys excluded."
    ).format(p=results["counts"].get("postings_rows"))
    results.update(__import__("_stamp").measurement_stamp())
    with open(os.path.join(REPO, "BENCH_SEARCH_100M.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(os.path.join(CACHE, "tmp_spark_100m"), ignore_errors=True)


if __name__ == "__main__":
    main()
