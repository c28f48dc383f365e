"""Char n-gram LM + perplexity filter (CCNet-style)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline import lm


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    return spark.createDataFrame(
        [(0, "abab"), (1, "abab"), (2, "zzzz")],
        "doc_id long, text string",
    )


def test_char_ngrams_multiset_keeps_multiplicity(spark):
    df = spark.createDataFrame([(1, "ababa"), (2, "ab"), (3, "")],
                               "doc_id long, text string")
    out = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", lm.char_ngrams_multiset(F.col("text"), 3).alias("g")
        ).collect()
    }
    assert out[1] == ["aba", "bab", "aba"]
    assert out[2] == []
    assert out[3] == []


def test_char_lm_fit_counts_and_vocab(tiny_corpus):
    model = lm.char_lm_fit(tiny_corpus, order=3)
    grams = {r["gram"]: r["gram_count"] for r in model["grams"].collect()}
    # "abab" x2 -> aba, bab each twice; "zzzz" -> zzz twice
    assert grams == {"aba": 2, "bab": 2, "zzz": 2}
    ctx = {r["ctx"]: r["ctx_total"] for r in model["contexts"].collect()}
    assert ctx == {"ab": 2, "ba": 2, "zz": 2}
    assert model["vocab_size"] == 3  # continuations: a, b, z


def test_cross_entropy_matches_hand_calc(tiny_corpus):
    model = lm.char_lm_fit(tiny_corpus, order=3, alpha=1.0)
    ce = {
        r["doc_id"]: r
        for r in lm.char_lm_cross_entropy(tiny_corpus, model).collect()
    }
    # doc 0 grams: aba (cnt 2, ctx ab total 2), bab (cnt 2, ctx ba total 2)
    # P = (2+1)/(2+3) = 0.6 for both -> ce = -ln(0.6)
    assert ce[0]["n_grams"] == 2
    assert abs(ce[0]["cross_entropy"] - (-math.log(0.6))) < 1e-12
    assert abs(ce[0]["perplexity"] - 1 / 0.6) < 1e-9


def test_unseen_grams_back_off_to_one_over_v(spark, tiny_corpus):
    model = lm.char_lm_fit(tiny_corpus, order=3, alpha=1.0)
    novel = spark.createDataFrame([(9, "qqq")], "doc_id long, text string")
    row = lm.char_lm_cross_entropy(novel, model).collect()[0]
    # qqq unseen: P = (0+1)/(0+3) = 1/3
    assert abs(row["cross_entropy"] - math.log(3.0)) < 1e-12


def test_short_docs_score_null(spark, tiny_corpus):
    model = lm.char_lm_fit(tiny_corpus, order=3)
    short = spark.createDataFrame([(5, "ab")], "doc_id long, text string")
    row = lm.char_lm_cross_entropy(short, model).collect()[0]
    assert row["n_grams"] == 0 and row["cross_entropy"] is None


def test_perplexity_filter_separates_ood_docs(spark):
    clean = [(i, "the quick brown fox jumps over the lazy dog " * 3)
             for i in range(20)]
    junk = [(100 + i, "x9#q!z" * 20) for i in range(5)]
    docs = spark.createDataFrame(clean + junk, "doc_id long, text string")
    lm_docs = spark.createDataFrame(clean, "doc_id long, text string")
    out = lm.perplexity_filter(
        docs, lm_docs=lm_docs, order=3, max_perplexity=10.0
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(rows[i]["keep"] for i, _ in clean)
    assert all(not rows[i]["keep"] for i, _ in [(100 + i, None) for i in range(5)])
    assert all(
        rows[100 + i]["perplexity"] > rows[0]["perplexity"] for i in range(5)
    )


def test_model_join_is_broadcast(tiny_corpus):
    # default path: the vectorized kernel scores with NO join at all
    model = lm.char_lm_fit(tiny_corpus, order=3)
    out = lm.char_lm_cross_entropy(tiny_corpus, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Join" not in plan
    # forced join plan: the model tables must broadcast
    out_j = lm.char_lm_cross_entropy(tiny_corpus, model, arrow_kernel=False)
    plan_j = out_j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_j


def test_arrow_kernel_matches_join_plan(spark):
    """The vectorized fit/score kernels must reproduce the exploded join
    plan: identical model tables (exact integers), identical n_grams, and
    cross_entropy/perplexity equal at the declared queries' 6-dp rounding
    (per-doc sums are numpy pairwise vs Spark sequential — same float64
    multiset, ~1 ulp)."""
    import random

    random.seed(21)
    chars = "abcdef 日本é"
    rows = [
        (i, "".join(random.choice(chars) for _ in range(random.randint(0, 30))))
        for i in range(300)
    ]
    rows += [(900, ""), (901, None), (902, "ab"), (903, "aaaa")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm_docs = docs.where(F.col("doc_id") % 3 == 0)  # unseen grams exist
    m_k = lm.char_lm_fit(lm_docs, order=3)
    m_j = lm.char_lm_fit(lm_docs, order=3, arrow_kernel=False)
    assert {tuple(r) for r in m_k["grams"].collect()} == {
        tuple(r) for r in m_j["grams"].collect()
    }
    new = {r["doc_id"]: r for r in lm.char_lm_cross_entropy(
        docs, m_k, id_col="doc_id").collect()}
    old = {r["doc_id"]: r for r in lm.char_lm_cross_entropy(
        docs, m_j, id_col="doc_id", arrow_kernel=False).collect()}
    assert set(new) == set(old)
    for k in old:
        o, n = old[k], new[k]
        assert o["n_grams"] == n["n_grams"]
        if o["cross_entropy"] is None:
            assert n["cross_entropy"] is None
        else:
            assert round(o["cross_entropy"], 6) == round(n["cross_entropy"], 6)
            assert round(o["perplexity"], 6) == round(n["perplexity"], 6)
    m_k["grams"].unpersist()
    m_j["grams"].unpersist()
