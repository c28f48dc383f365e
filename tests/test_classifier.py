"""Distributed logistic regression + DSIR importance resampling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline import classifier as clf
from splink_spark.pipeline import curation


@pytest.fixture(scope="module")
def lr_frame(spark):
    # two separable-ish clusters with noise overlap
    rows = []
    for i in range(200):
        x1 = (i % 17) / 17.0
        x2 = ((i * 7) % 13) / 13.0
        y = 1 if (x1 + 0.5 * x2 + ((i * 3) % 5) / 25.0) > 0.75 else 0
        rows.append((i, x1, x2, y))
    return rows, spark.createDataFrame(rows, "id long, x1 double, x2 double, y int")


def test_fit_matches_pure_python_reference(lr_frame):
    rows, df = lr_frame
    model = clf.logistic_regression_fit(
        df, ["x1", "x2"], "y", iterations=10, learning_rate=1.0
    )
    ref = clf.fit_reference_numpy(
        [[r[1], r[2]] for r in rows], [r[3] for r in rows],
        iterations=10, learning_rate=1.0,
    )
    for a, b in zip(model["weights"], ref["weights"]):
        assert abs(a - b) < 1e-9
    assert abs(model["bias"] - ref["bias"]) < 1e-9
    assert model["n"] == 200


def test_training_reduces_loss_and_separates(lr_frame):
    rows, df = lr_frame
    m1 = clf.logistic_regression_fit(df, ["x1", "x2"], "y", iterations=1)
    m20 = clf.logistic_regression_fit(df, ["x1", "x2"], "y", iterations=20)
    assert m20["final_loss"] < m1["final_loss"] < math.log(2.0) + 0.01
    scored = clf.logistic_regression_score(df, m20, output_col="p")
    agg = scored.groupBy("y").agg(F.avg("p").alias("p")).collect()
    means = {r["y"]: r["p"] for r in agg}
    assert means[1] > 0.5 > means[0]


def test_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1), (2, None, 0), (3, 0.0, None), (4, 0.0, 0)],
        "id long, x1 double, y int",
    )
    model = clf.logistic_regression_fit(df, ["x1"], "y", iterations=2)
    assert model["n"] == 2


def test_l2_shrinks_weights(lr_frame):
    _, df = lr_frame
    m0 = clf.logistic_regression_fit(df, ["x1", "x2"], "y", iterations=15, l2=0.0)
    m1 = clf.logistic_regression_fit(df, ["x1", "x2"], "y", iterations=15, l2=0.5)
    assert sum(w * w for w in m1["weights"]) < sum(w * w for w in m0["weights"])


def test_quality_classifier_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (i,
             ("the quick brown fox " * (3 + i % 4)).strip() if i % 2 == 0
             else ("zzzzzzzzzzzzzzzzzzzzzzzzzzzz " * 1).strip(),
             1 if i % 2 == 0 else 0)
            for i in range(40)
        ],
        "doc_id long, text string, label int",
    )
    out = clf.quality_classifier(docs, "label", iterations=15)
    assert out.columns == ["doc_id", "p"]
    means = {
        r["k"]: r["p"]
        for r in out.withColumn("k", F.col("doc_id") % 2)
        .groupBy("k").agg(F.avg("p").alias("p")).collect()
    }
    assert means[0] > means[1]


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dsir_frames(spark):
    # corpus: half "sciencey" docs, half "spammy"; target: sciencey only
    sci = "the experiment measured the signal against the control sample"
    spam = "buy cheap deals now click here win big prizes today free"
    corpus = spark.createDataFrame(
        [(i, sci if i % 2 == 0 else spam) for i in range(100)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(1000 + i, sci) for i in range(10)], "doc_id long, text string"
    )
    return corpus, target


def test_dsir_weights_prefer_target_like_docs(dsir_frames):
    corpus, target = dsir_frames
    w = curation.dsir_importance_weights(corpus, target, n=2)
    means = {
        r["k"]: r["w"]
        for r in w.withColumn("k", F.col("doc_id") % 2)
        .groupBy("k").agg(F.avg("log_weight").alias("w")).collect()
    }
    assert means[0] > means[1]


def test_dsir_hashed_matches_exact_ordering(dsir_frames):
    # hashed feature space preserves the class separation (collisions only
    # blur magnitudes) — the paper's scale construction
    corpus, target = dsir_frames
    w = curation.dsir_importance_weights(corpus, target, n=2, hash_buckets=1 << 16)
    means = {
        r["k"]: r["w"]
        for r in w.withColumn("k", F.col("doc_id") % 2)
        .groupBy("k").agg(F.avg("log_weight").alias("w")).collect()
    }
    assert means[0] > means[1]


def test_dsir_hashed_dictionary_is_broadcast(dsir_frames):
    corpus, target = dsir_frames
    w = curation.dsir_importance_weights(corpus, target, n=2, hash_buckets=1024)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dsir_resample_topk_and_gumbel(dsir_frames):
    corpus, target = dsir_frames
    top = curation.dsir_resample(corpus, target, 20, method="topk")
    ids = [r["doc_id"] for r in top.collect()]
    assert len(ids) == 20
    assert all(i % 2 == 0 for i in ids)  # all sciencey

    g = curation.dsir_resample(corpus, target, 20, method="gumbel", temperature=1.0)
    rows = g.collect()
    assert len(rows) == 20
    # deterministic: second run identical
    g2 = curation.dsir_resample(corpus, target, 20, method="gumbel", temperature=1.0)
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in g2.collect()
    )
    # high temperature admits more noise => unions toward uniform; weights
    # still bias selection toward target-like docs at t=1 on this fixture
    frac_sci = sum(1 for r in rows if r["doc_id"] % 2 == 0) / 20.0
    assert frac_sci >= 0.8


def test_dsir_empty_doc_scores_zero(spark, dsir_frames):
    _, target = dsir_frames
    corpus = spark.createDataFrame(
        [(0, "the experiment measured the signal"), (1, "")],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r["log_weight"] for r in
         curation.dsir_importance_weights(corpus, target, n=2).collect()}
    assert w[1] == 0.0


def test_dsir_resample_large_k_threshold_path(dsir_frames):
    # force the threshold-filter path by shrinking the exact-topk bound;
    # the approximate selection should still pick ~k docs, all ranked at or
    # above the exact path's k-th score
    corpus, target = dsir_frames
    exact = curation.dsir_resample(corpus, target, 30, method="topk")
    approx = curation.dsir_resample(
        corpus, target, 30, method="topk", exact_topk_max=10
    )
    exact_scores = sorted((r["score"] for r in exact.collect()), reverse=True)
    got = approx.collect()
    assert 30 <= len(got) <= 60  # ties/sketch tolerance, never undershoots far
    assert all(r["score"] >= exact_scores[-1] - 1e-9 for r in got)


def test_dsir_resample_large_k_keeps_all_when_k_exceeds_corpus(dsir_frames):
    corpus, target = dsir_frames
    out = curation.dsir_resample(
        corpus, target, 1000, method="topk", exact_topk_max=10
    )
    assert out.count() == 100


def test_dsir_threshold_path_reads_persisted_scores(dsir_frames):
    """The threshold path runs three actions over the scored frame (count,
    percentile cutoff, the returned filter); the narrow frame must be
    persisted so the weights DAG — the corpus gram explode — runs once,
    not per action (measured 3300s vs ~1 pass at 10M docs)."""
    corpus, target = dsir_frames
    out = curation.dsir_resample(
        corpus, target, 30, method="topk", exact_topk_max=10
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    out.collect()
