"""Dense-regime similarity joins (pipeline/dense.py): the broadcast-matmul
plan must be bit-identical to the sparse postings/prefix plans it replaces,
and the caps must route oversized corpora back to the sparse plan."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _rows(n_docs: int, vocab_size: int, seed: int = 7):
    random.seed(seed)
    vocab = [f"w{i}" for i in range(vocab_size)]
    rows = []
    for i in range(n_docs):
        k = random.randint(1, min(9, vocab_size))
        toks = random.choices(vocab, k=k)  # with repeats -> real tf > 1
        rows.append((i, " ".join(toks)))
    # identical docs and a shared-one-term pair
    rows += [(500, "w0 w1 w1 w2"), (501, "w0 w1 w1 w2"), (502, "w0 zz9")]
    return rows


@pytest.mark.parametrize("threshold", [0.0, 0.5, 0.8, 1.0])
def test_dense_cosine_matches_sparse(spark, threshold):
    from splink_spark.pipeline.search import term_cosine_join

    docs = spark.createDataFrame(_rows(80, 12), "doc_id long, text string")
    dense = term_cosine_join(docs, threshold=threshold)
    assert "MapInPandas" in dense._jdf.queryExecution().executedPlan().toString()
    sparse = term_cosine_join(docs, threshold=threshold, dense_max_vocab=0)

    key = lambda r: (r["doc_id_l"], r["doc_id_r"])  # noqa: E731
    d = {key(r): r.asDict() for r in dense.collect()}
    s = {key(r): r.asDict() for r in sparse.collect()}
    assert d == s


def test_dense_jaccard_matches_sparse(spark):
    from splink_spark.pipeline.fuzzy import jaccard_similarity_join

    rows = [
        (i, t.split())
        for i, t in [
            (r[0], r[1]) for r in _rows(70, 10, seed=13)
        ]
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    for t in (0.4, 0.85, 1.0):
        dense = jaccard_similarity_join(df, "doc_id", "tokens", t)
        plan = dense._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        sparse = jaccard_similarity_join(
            df, "doc_id", "tokens", t, dense_max_vocab=0
        )
        key = lambda r: (r["id_l"], r["id_r"])  # noqa: E731
        d = {key(r): r.asDict() for r in dense.collect()}
        s = {key(r): r.asDict() for r in sparse.collect()}
        assert d == s, f"threshold {t}"


def test_dense_falls_back_over_vocab_cap(spark):
    """A vocabulary over the cap must keep the sparse plan (no MapInPandas)."""
    from splink_spark.pipeline.search import term_cosine_join

    docs = spark.createDataFrame(
        [(i, f"u{i} u{i + 1} shared") for i in range(30)],
        "doc_id long, text string",
    )
    out = term_cosine_join(docs, threshold=0.5, dense_max_vocab=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    # and the dense default on the same corpus agrees with it
    dense = term_cosine_join(docs, threshold=0.5)
    key = lambda r: (r["doc_id_l"], r["doc_id_r"])  # noqa: E731
    assert {key(r): r.asDict() for r in dense.collect()} == {
        key(r): r.asDict() for r in out.collect()
    }


def test_dense_jaccard_keep_tokens_stays_sparse(spark):
    from splink_spark.pipeline.fuzzy import jaccard_similarity_join

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a", "b"])], "doc_id long, tokens array<string>"
    )
    out = jaccard_similarity_join(df, "doc_id", "tokens", 0.5, keep_tokens=True)
    assert "__tl" in out.columns and "MapInPandas" not in (
        out._jdf.queryExecution().executedPlan().toString()
    )


def test_over_doc_cap_never_runs_vector_aggregation(spark, monkeypatch):
    """An over-doc-cap corpus must fall back BEFORE the grouped
    collect_list aggregation (the ids-only probe short-circuit): the full
    vector collect on a 100 TB-shaped corpus is exactly the wasted work
    the probe exists to avoid."""
    from splink_spark.pipeline import dense

    def _boom(*args, **kwargs):  # pragma: no cover - failure path
        raise AssertionError(
            "vector aggregation executed on an over-cap corpus"
        )

    monkeypatch.setattr(dense, "_collect_vectors", _boom)
    docs = spark.createDataFrame(
        [(i, "w0 w1 w2") for i in range(30)], "doc_id long, text string"
    )
    postings = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).withColumn("tf", F.lit(1).cast("bigint"))
    assert dense.dense_cosine_self_join(postings, "doc_id", 0.5, max_docs=10) is None
    toks = docs.select("doc_id", F.split("text", " ").alias("__toks"))
    assert (
        dense.dense_jaccard_self_join(toks, "doc_id", 500_000, max_docs=10) is None
    )


def test_dense_jaccard_threshold_rounds_to_zero_ppm(spark):
    """threshold=1e-7 rounds to t_ppm=0; the dense path must still emit
    only co-occurring pairs, exactly like the sparse prefix join."""
    from splink_spark.pipeline.fuzzy import jaccard_similarity_join

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b", "c"]), (3, ["z"]), (4, ["q"])],
        "doc_id long, tokens array<string>",
    )
    dense = jaccard_similarity_join(df, "doc_id", "tokens", 1e-7)
    assert "MapInPandas" in dense._jdf.queryExecution().executedPlan().toString()
    sparse = jaccard_similarity_join(df, "doc_id", "tokens", 1e-7, dense_max_vocab=0)
    key = lambda r: (r["id_l"], r["id_r"])  # noqa: E731
    d = {key(r): r.asDict() for r in dense.collect()}
    s = {key(r): r.asDict() for r in sparse.collect()}
    # (3,z) and (4,q) share no token with anything: no pair may mention them
    assert d == s
    assert all(i not in (3, 4) for pair in d for i in pair)


def test_dense_string_ids(spark):
    """Non-numeric ids order and emit correctly through the dense path."""
    from splink_spark.pipeline.fuzzy import jaccard_similarity_join

    df = spark.createDataFrame(
        [("b", ["x", "y"]), ("a", ["x", "y"]), ("c", ["x"])],
        "doc_id string, tokens array<string>",
    )
    got = {
        (r["id_l"], r["id_r"]): r["jaccard_ppm"]
        for r in jaccard_similarity_join(df, "doc_id", "tokens", 0.5).collect()
    }
    assert got == {("a", "b"): 1_000_000, ("a", "c"): 500_000, ("b", "c"): 500_000}
