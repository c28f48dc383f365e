#!/usr/bin/env python
"""End-to-end training-data curation walkthrough on the testdata corpus:
quality rules → PII scrub → near-dup canonicalization → benchmark
decontamination → sequence packing, plus TF-IDF keywords, MinHash near-dup
pairs, and embedding k-means — every stage is an oracle-gated operator.

    python examples/curate_training_corpus.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from splink_spark.pipeline import ann, curation, dedup  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("corpus_curation_demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    n = docs.count()
    print(f"corpus: {n} documents from {sf_dir}")

    # 1. per-document quality diagnostics
    flags = curation.gopher_quality_flags(docs, min_words=20, min_stopword_hits=1)
    flags.groupBy("keep").count().show()
    curation.repetition_metrics(docs).orderBy(F.desc("dup_word_frac")).show(3)

    # 2. near-duplicate structure (scale path: MinHash banding)
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=60, bands=10, shingle_size=6, jaccard_threshold=0.45, n=5
    )
    print("near-dup pairs (minhash + exact verify):", pairs.count())

    # 3. one-call curation: filter -> scrub -> dedup -> decontaminate -> pack
    eval_split = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    curated = curation.curate_corpus(
        docs,
        eval_df=eval_split,
        decontaminate_n=3,
        dedup_kwargs={"n": 3, "threshold": 0.62, "block_cols": ["lang"]},
        pack_capacity=2048,
        pack_shard_col="lang",
        quality_kwargs={"min_words": 20, "min_stopword_hits": 1},
    )
    kept = curated.count()
    print(f"curated corpus: {kept}/{n} documents survive; packed bins:")
    curated.groupBy("lang", "bin_id").agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("lang", "bin_id").show(5)

    # 3b. surgical alternative: keep contaminated documents but excise the
    # shared spans (same eval slice)
    surgical = curation.decontaminate_spans(docs, eval_split, n=3)
    surgical.where("n_removed_tokens > 0").orderBy(
        F.desc("n_removed_tokens")
    ).show(3, truncate=50)

    # 4. salient terms + mixture plan for the survivors
    curation.tfidf_top_terms(curated, k=3).where("rank = 1").show(5)
    curation.mixture_plan(curated, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}).show()

    # 5. embedding-space clustering (exact-integer distributed k-means)
    # + PCA (one-scan covariance partials, driver eigensolve)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ann.kmeans_fit_assign(emb, k=8, iterations=2).groupBy("cluster").count().orderBy(
        "cluster"
    ).show()
    from splink_spark.pipeline import embeddings as embmod

    pca = embmod.pca_fit(emb, k=4)
    print("PCA explained variance ratio:",
          [round(r, 3) for r in pca["explained_variance_ratio"]])
    embmod.pca_transform(emb, pca).select("vec_id", "pca").show(3, truncate=60)

    # 6. data selection: DSIR importance resampling toward an English target
    # (hashed feature space = the web-scale path: B-row broadcast dictionary)
    target = docs.where(F.col("lang") == "en").limit(50)
    picked = curation.dsir_resample(
        docs, target, 50, n=2, hash_buckets=1 << 14
    )
    print("DSIR-selected language mix:")
    picked.join(docs, "doc_id").groupBy("lang").count().orderBy(
        F.desc("count")
    ).show()

    # 7. model-based quality: distributed logistic regression (each GD
    # iteration = one aggregation scan) + CCNet-style perplexity gate
    from splink_spark.pipeline import classifier as clf
    from splink_spark.pipeline import lm

    labelled = docs.withColumn("label", (F.col("lang") == "en").cast("int"))
    clf.quality_classifier(labelled, "label", iterations=8).orderBy(
        F.desc("p")
    ).show(3)
    lm.perplexity_filter(
        docs, lm_docs=docs.where(F.col("doc_id") % 2 == 0), max_perplexity=15.0
    ).groupBy("keep").count().show()

    # 8. ongoing ingestion: screen a new shard against the settled corpus
    # (corpus never shuffled — every pass is one scan vs broadcast batch
    # artifacts) and cap any over-represented source
    batch = docs.where(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    settled = docs.where(F.col("doc_id") % 7 != 0)
    screened = dedup.incremental_dedup(batch, settled, jaccard_threshold=0.45)
    screened.groupBy("exact_dup_corpus", "near_dup_corpus", "keep").count().show()
    capped = curation.cap_per_group(docs, "source", 10, order_col="n_chars")
    print("after per-source cap:", capped.count(), "docs")

    # 8b. corpus-scale statistics without corpus-scale state: a count-min
    # sketch summarizes token frequencies in a fixed 4x8192-cell artifact
    # (mergeable across shards; probes never rescan the corpus), and a
    # Bloom filter screens any future batch's fingerprints against the
    # settled corpus with zero shuffle on the batch side
    from splink_spark.pipeline import sketches

    toks = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("key")
    )
    sketch = sketches.cms_build(toks, depth=4, width=8192)
    common = sketches.heavy_hitters(toks, min_count=n // 4)
    sketches.cms_estimate(sketch, common.select("key"), depth=4, width=8192).join(
        common, "key"
    ).orderBy(F.desc("count")).show(5)
    corpus_bloom = sketches.bloom_build(
        settled.select(F.md5("text").alias("key")), num_bits=1 << 18
    )
    sketches.bloom_probe(
        batch.select("doc_id", F.md5("text").alias("key")),
        corpus_bloom,
        num_bits=1 << 18,
    ).groupBy("maybe_member").count().show()

    # 9. training output: deterministic shuffle + sharding (epoch = seed);
    # per-shard balance check before writing
    sharded = curation.shard_corpus(docs, num_shards=4, seed=0)
    curation.shard_stats(sharded.withColumn("n_tokens", F.lit(1))).show()
    # sharded.write.partitionBy("shard").parquet(...) is the write path

    # 10. embedding storage: SQ8 scalar quantization (4x smaller, integer
    # dot products) with a frozen calibration for later batches
    from splink_spark.pipeline import embeddings as emb

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.quantize_embeddings(vecs, "embedding", "vec_id")
    print("SQ8 sample:", q.select("vec_id", "q").first()["q"][:8])

    spark.stop()


if __name__ == "__main__":
    main()
