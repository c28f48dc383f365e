"""Character n-gram language model + perplexity filtering.

The published CCNet pipeline (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data") filters web documents by
language-model perplexity. This module implements that stage with a
distributed character-``order``-gram LM (add-alpha smoothing) instead of an
external KenLM binary — no model download, fully engine-portable, and every
step a DataFrame operation:

- ``char_lm_fit``: one explode + two gram-keyed count aggregations (map-side
  combine) produce the model — a (gram, count) table and a (context,
  total) table. Model size is bounded by the observed charset^order, not
  the corpus size, so it stays joinable at any corpus scale.
- ``char_lm_cross_entropy``: score = mean over a document's gram
  OCCURRENCES of ``-ln P(last char | context)`` with
  ``P = (count + alpha) / (ctx_total + alpha * V)``. One explode, two
  gram-keyed left joins (broadcast when the model is genuinely small — a
  probed decision, same policy as decontaminate), one doc-keyed
  re-aggregation.

Unseen grams back off to ``alpha / (alpha * V) = 1/V``; documents shorter
than ``order`` characters score NULL (no evidence), surfaced via
``n_grams = 0``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_ngrams_multiset(col: Column, n: int) -> Column:
    """ALL character n-grams (with multiplicity, document order) — the
    counting base for LM estimation, unlike
    :func:`splink_spark.pipeline.dedup.char_ngrams` which distincts for set
    similarity. Same linear zip_with construction (each array an outer
    argument, evaluated once per row; the naive substring-per-index scan is
    O(L^2) on UTF8). Strings shorter than ``n`` yield an empty array."""
    chars = F.split(col, "")
    grams = chars
    for k in range(1, n):
        grams = F.zip_with(
            grams, F.slice(chars, k + 1, 2_000_000_000), lambda a, b: F.concat(a, b)
        )
    return F.when(
        F.length(col) < n, F.array().cast("array<string>")
    ).otherwise(F.slice(grams, 1, F.greatest(F.size(grams) - (n - 1), F.lit(1))))


def char_lm_fit(
    corpus: DataFrame,
    *,
    order: int = 3,
    text_col: str = "text",
    alpha: float = 1.0,
) -> dict:
    """Estimate the char-``order``-gram model from a training corpus.

    Returns ``{"grams", "contexts", "vocab_size", "order", "alpha"}`` where
    ``grams`` is (gram, gram_count), ``contexts`` is (ctx, ctx_total) with
    ``ctx_total = sum of counts of all grams sharing the (order-1)-char
    prefix`` (so the conditional distribution normalizes by construction,
    with no end-of-string bookkeeping), and ``vocab_size`` is the number of
    distinct continuation characters observed — the smoothing denominator.

    Both model tables shuffle keyed by gram with map-side partial counts;
    their sizes are charset-bounded, independent of corpus row count.

    Cache lifecycle: the returned ``grams`` frame is ``persist()``-ed (every
    downstream consumer — contexts, vocab probe, scoring join — re-reads
    it). The caller owns the model: call ``model["grams"].unpersist()``
    when done with it in a long-lived session.
    """
    if order < 2:
        raise ValueError("order must be >= 2")
    grams_ex = corpus.select(
        F.explode(char_ngrams_multiset(F.col(text_col), order)).alias("gram")
    )
    # persist the POST-aggregation gram table (charset-bounded —
    # |charset|^order rows however big the corpus): it is consumed by the
    # contexts derivation, the vocab_size action, the broadcast-size
    # probe, and the scoring join — each would otherwise re-run the full
    # corpus char-gram explode (billions of rows at 10M docs; the same
    # multi-pass failure measured on dsir's dictionary)
    gram_counts = grams_ex.groupBy("gram").agg(
        F.count(F.lit(1)).alias("gram_count")
    ).persist()
    contexts = (
        gram_counts.groupBy(
            F.substring("gram", 1, order - 1).alias("ctx")
        ).agg(F.sum("gram_count").alias("ctx_total"))
    )
    vocab_size = (
        gram_counts.select(
            F.substring("gram", order, 1).alias("__c")
        ).distinct().count()
    )
    return {
        "grams": gram_counts,
        "contexts": contexts,
        "vocab_size": int(max(vocab_size, 1)),
        "order": order,
        "alpha": float(alpha),
    }


def char_lm_cross_entropy(
    docs: DataFrame,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: Optional[bool] = None,
    broadcast_max_grams: int = 5_000_000,
) -> DataFrame:
    """Per-document cross-entropy (nats/char-gram) and perplexity under a
    :func:`char_lm_fit` model.

    ``broadcast_model=None`` probes the gram table once and broadcasts both
    model tables only below ``broadcast_max_grams`` (charset-bounded models
    virtually always qualify; the guard exists because ``order`` is a free
    parameter). Above it the joins stay unhinted for AQE.

    Returns ``(id_col, n_grams, cross_entropy, perplexity)``;
    ``cross_entropy``/``perplexity`` are NULL when the document is shorter
    than the model order (``n_grams = 0``).
    """
    order = model["order"]
    alpha = model["alpha"]
    v = model["vocab_size"]
    grams, contexts = model["grams"], model["contexts"]
    if broadcast_model is None:
        broadcast_model = grams.count() <= broadcast_max_grams
    if broadcast_model:
        grams, contexts = F.broadcast(grams), F.broadcast(contexts)

    doc_grams = docs.select(
        F.col(id_col),
        F.explode(char_ngrams_multiset(F.col(text_col), order)).alias("gram"),
    )
    neg_logp = -(
        F.log(
            (F.coalesce("gram_count", F.lit(0)).cast("double") + F.lit(alpha))
            / (
                F.coalesce("ctx_total", F.lit(0)).cast("double")
                + F.lit(alpha * v)
            )
        )
    )
    scored = (
        doc_grams.join(grams, "gram", "left")
        .withColumn("ctx", F.substring("gram", 1, order - 1))
        .join(contexts, "ctx", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.avg(neg_logp).alias("cross_entropy"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.col("cross_entropy"),
            F.exp("cross_entropy").alias("perplexity"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    *,
    max_perplexity: float,
    lm_docs: Optional[DataFrame] = None,
    order: int = 3,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_unscored: bool = False,
) -> DataFrame:
    """CCNet-style perplexity gate: fit the char LM on ``lm_docs`` (a
    high-quality slice; defaults to ``docs`` itself — self-perplexity, which
    still isolates out-of-distribution junk) and flag documents whose
    perplexity exceeds ``max_perplexity``.

    Returns ``(id_col, n_grams, cross_entropy, perplexity, keep)``.
    Documents too short to score keep/drop via ``keep_unscored``.
    """
    model = char_lm_fit(
        lm_docs if lm_docs is not None else docs,
        order=order,
        text_col=text_col,
        alpha=alpha,
    )
    ce = char_lm_cross_entropy(
        docs, model, text_col=text_col, id_col=id_col
    )
    return ce.select(
        id_col,
        "n_grams",
        "cross_entropy",
        "perplexity",
        F.when(F.col("n_grams") == 0, F.lit(bool(keep_unscored)))
        .otherwise(F.col("perplexity") <= F.lit(float(max_perplexity)))
        .alias("keep"),
    )
