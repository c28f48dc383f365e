"""Distributed covariance + PCA over embedding columns."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from splink_spark.pipeline import embeddings as emb


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    # anisotropic cloud: strong axis 0, weak axis 2
    base = rng.randn(300, 4) * np.array([5.0, 1.0, 0.2, 1.5])
    base = base + np.array([1.0, -2.0, 0.5, 0.0])
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    return base, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_covariance_matches_numpy(vecs):
    base, df = vecs
    cov_df = emb.embedding_covariance(df)
    got = np.zeros((4, 4))
    for r in cov_df.collect():
        got[r["i"], r["j"]] = r["cov"]
    want = np.cov(base, rowvar=False, ddof=0)
    assert np.allclose(got, want, atol=1e-9)
    meta = cov_df._splink_cov_meta
    assert meta["n"] == 300
    assert np.allclose(meta["mean"], base.mean(axis=0), atol=1e-12)


def test_covariance_exact_quantized(vecs):
    base, df = vecs
    scale = 10**6
    cov_df = emb.embedding_covariance(df, quantize_scale=scale)
    got = np.zeros((4, 4))
    got_p12 = np.zeros((4, 4), dtype=np.int64)
    for r in cov_df.collect():
        got[r["i"], r["j"]] = r["cov"]
        got_p12[r["i"], r["j"]] = r["cov_p12"]
    want = np.cov(base, rowvar=False, ddof=0)
    # quantization at 1e-6 per element: cov error is O(1e-6 * |x|)
    assert np.allclose(got, want, atol=1e-4)
    # cov_p12 is the exact trunc-div integer of the same quantity
    assert np.allclose(got_p12 / 1e12, got, atol=1e-11)
    # partitioning-invariant: repartitioned input gives bit-equal cells
    cov2 = emb.embedding_covariance(df.repartition(7), quantize_scale=scale)
    p12_2 = {(r["i"], r["j"]): r["cov_p12"] for r in cov2.collect()}
    for i in range(4):
        for j in range(4):
            assert p12_2[(i, j)] == got_p12[i, j]


def test_covariance_exact_partial_flush(spark):
    # >100k rows forces the int64-headroom partial flush inside a
    # single partition; result must equal the unflushed arithmetic
    rng = np.random.RandomState(3)
    base = rng.randn(120_000, 2)
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1)
    cov_df = emb.embedding_covariance(df, quantize_scale=10**6)
    got = {(r["i"], r["j"]): r["cov"] for r in cov_df.collect()}
    want = np.cov(base, rowvar=False, ddof=0)
    for (i, j), v in got.items():
        assert abs(v - want[i, j]) < 1e-4


def test_covariance_drops_null_and_ragged(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [3.0]), (3, [3.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    cov_df = emb.embedding_covariance(df)
    assert cov_df._splink_cov_meta["n"] == 2


def test_pca_fit_matches_numpy_eig(vecs):
    base, df = vecs
    model = emb.pca_fit(df, k=4)
    want_cov = np.cov(base, rowvar=False, ddof=0)
    evals, evecs = np.linalg.eigh(want_cov)
    order = np.argsort(evals)[::-1]
    for kk in range(4):
        v = evecs[:, order[kk]]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        assert np.allclose(model["components"][kk], v, atol=1e-6)
        assert abs(model["explained_variance"][kk] - evals[order[kk]]) < 1e-6
    # variance ordering + ratio sums to ~1 with k = d
    ev = model["explained_variance"]
    assert ev == sorted(ev, reverse=True)
    assert abs(sum(model["explained_variance_ratio"]) - 1.0) < 1e-9


def test_pca_transform_matches_numpy_projection(vecs):
    base, df = vecs
    model = emb.pca_fit(df, k=2)
    got = {
        r["vec_id"]: r["pca"]
        for r in emb.pca_transform(df, model).select("vec_id", "pca").collect()
    }
    comps = np.array(model["components"])
    centered = base - np.array(model["mean"])
    want = centered @ comps.T
    for i in range(300):
        assert np.allclose(got[i], want[i], atol=1e-9)
    # projection plan is JVM-only
    plan = (
        emb.pca_transform(df, model)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_pca_first_component_captures_dominant_axis(vecs):
    base, df = vecs
    model = emb.pca_fit(df, k=1)
    # dominant variance is axis 0 (sd 5)
    assert abs(model["components"][0][0]) > 0.99
    assert model["explained_variance_ratio"][0] > 0.8
