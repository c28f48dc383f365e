"""incremental_dedup (batch vs existing corpus) and cap_per_group."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline import curation, dedup
from splink_spark.pipeline.text import fingerprint


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    base = [
        "the cat sat on the mat and looked at the moon",
        "a completely different document about spark plans",
        "quantum chemistry notes with long derivations follow here",
        "weather report for tuesday rain likely in the north",
    ]
    corpus = spark.createDataFrame(
        [(i, base[i % 4] + f" corpus tail {i // 4}") for i in range(40)],
        "doc_id long, text string",
    )
    batch_rows = [
        # 100: exact dup of corpus doc 0 (same text)
        (100, base[0] + " corpus tail 0"),
        # 101: NEAR dup of corpus doc 1 (one word changed)
        (101, base[1].replace("different", "diffrent") + " corpus tail 0"),
        # 102/103: exact dups of each other, novel text
        (102, "a brand new never seen story about llamas and tea"),
        (103, "a brand new never seen story about llamas and tea"),
        # 104: fully novel
        (104, "entirely novel content with no relation to anything prior"),
    ]
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    return corpus, batch


def test_incremental_flags(corpus_and_batch):
    corpus, batch = corpus_and_batch
    out = dedup.incremental_dedup(
        batch, corpus, jaccard_threshold=0.5, shingle_size=5
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[100]["exact_dup_corpus"] and not rows[100]["keep"]
    assert rows[101]["near_dup_corpus"] and not rows[101]["exact_dup_corpus"]
    assert not rows[101]["keep"]
    # 102 kept (first of the within-batch pair), 103 flagged
    assert rows[102]["keep"] and not rows[102]["exact_dup_batch"]
    assert rows[103]["exact_dup_batch"] and not rows[103]["keep"]
    assert rows[104]["keep"]
    assert len(rows) == 5


def test_incremental_exact_only(corpus_and_batch):
    corpus, batch = corpus_and_batch
    out = dedup.incremental_dedup(batch, corpus, near_dup=False)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert not rows[101]["near_dup_corpus"]  # near stage disabled
    assert rows[101]["keep"]
    assert not rows[100]["keep"]


def test_incremental_reuses_precomputed_corpus_artifacts(corpus_and_batch):
    corpus, batch = corpus_and_batch
    fps = fingerprint(corpus)
    sigs = dedup.minhash_signatures(corpus, "text", "doc_id", 64, 5)
    out = dedup.incremental_dedup(
        batch, corpus, corpus_fingerprints=fps, corpus_signatures=sigs
    )
    base = dedup.incremental_dedup(batch, corpus)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, base.collect()))


def test_incremental_corpus_never_shuffled_on_exact_path(corpus_and_batch):
    corpus, batch = corpus_and_batch
    out = dedup.incremental_dedup(batch, corpus, near_dup=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every join against corpus-derived tables is broadcast on the batch side
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cap_per_group_exact(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}", float(i)) for i in range(30)],
        "doc_id long, source string, quality double",
    )
    out = curation.cap_per_group(df, "source", 4, order_col="quality")
    rows = out.collect()
    assert len(rows) == 12
    # keeps the highest-quality rows per group
    kept = {r["source"]: sorted(r2["doc_id"] for r2 in rows if r2["source"] == r["source"]) for r in rows}
    assert kept["src0"] == [18, 21, 24, 27]


def test_cap_per_group_sampled(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i < 900 else f"cold{i}") for i in range(1000)],
        "doc_id long, source string",
    )
    out = curation.cap_per_group(df, "source", 100, method="sampled")
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # hot group capped to ~100 (binomial: wide tolerance), cold groups intact
    assert 60 <= counts["hot"] <= 140
    assert sum(1 for k in counts if k != "hot") == 100
    # deterministic
    again = curation.cap_per_group(df, "source", 100, method="sampled")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_incremental_dedup_band_bucket_cap(spark):
    from splink_spark.pipeline.dedup import incremental_dedup

    # degenerate corpus: every document identical text -> ALL corpus rows
    # share every band bucket. With the cap the bucket is dropped (no
    # candidate blow-up, batch doc not flagged near-dup); with the cap
    # disabled the batch doc matches.
    corpus = spark.createDataFrame(
        [(i, "the same words repeated here for everyone to share today")
         for i in range(200)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1000, "the same words repeated here for everyone to share today x")],
        "doc_id long, text string",
    )
    capped = incremental_dedup(
        batch, corpus, jaccard_threshold=0.5, max_band_bucket=50
    ).collect()[0]
    assert capped["near_dup_corpus"] is False
    uncapped = incremental_dedup(
        batch, corpus, jaccard_threshold=0.5, max_band_bucket=None
    ).collect()[0]
    assert uncapped["near_dup_corpus"] is True
    # a small (signal-bearing) bucket is untouched by the cap
    mixed_corpus = spark.createDataFrame(
        [(0, "the same words repeated here for everyone to share today")]
        + [(i, f"totally different document number {i} with its own words "
               f"and unique content {i * 37}") for i in range(1, 100)],
        "doc_id long, text string",
    )
    small = incremental_dedup(
        batch, mixed_corpus, jaccard_threshold=0.5, max_band_bucket=50
    ).collect()[0]
    assert small["near_dup_corpus"] is True


def test_consecutive_batches_release_caches(spark, corpus_and_batch):
    """An ingestion loop over many batches must not accumulate
    MEMORY_AND_DISK frames: each incremental_dedup output carries handles
    to the frames it persisted (attach_caches) and unpersist_caches
    releases them all, returning the session's persistent-RDD count to
    its pre-loop baseline."""
    from splink_spark.internals.misc import unpersist_caches

    corpus, _ = corpus_and_batch

    def pinned_ids():
        # track SPECIFIC persistent-RDD ids: the session is shared across
        # test modules and Spark's ContextCleaner unpersists other tests'
        # dropped frames asynchronously, so raw counts are not stable
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    base_ids = pinned_ids()
    for i in range(3):
        batch = spark.createDataFrame(
            [(1000 + i * 10 + j, f"batch {i} novel doc {j} about topic {j}")
             for j in range(4)],
            "doc_id long, text string",
        )
        out = dedup.incremental_dedup(batch, corpus, jaccard_threshold=0.5)
        assert out.count() == 4  # consume the batch output fully
        new_ids = pinned_ids() - base_ids
        assert new_ids  # the per-batch caches exist while consuming
        released = unpersist_caches(out)
        assert released >= 3  # batch_fp, banded_batch, cand
        assert not (pinned_ids() & new_ids), "per-batch caches not released"
    # double release is a no-op
    assert unpersist_caches(out) == 0
