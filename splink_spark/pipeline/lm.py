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
    arrow_kernel: Optional[bool] = None,
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
    if (arrow_kernel is None or arrow_kernel) and order <= 3:
        # vectorized counting pass (guide §4.2): the exploded JVM plan pays
        # an interpreted zip_with concat per CHARACTER to build each gram
        # array, then shuffles partial counts. The kernel builds packed
        # int64 gram keys from one utf-32 encode per batch (shared helper
        # with the scoring kernel), counts them with np.unique (a sort — a
        # few hundred distinct grams per charset-bounded batch), and emits
        # (gram, partial count) rows for the same map-side-combined
        # groupBy-sum. Counts are exact integers, the decoded gram strings
        # are the same code points the JVM concat produced — the model
        # tables are bit-identical (pinned by test). order > 3 (packing
        # needs 21 bits/char in an int64) keeps the exploded plan.
        o = int(order)

        def count_grams(batches):
            import numpy as np
            import pandas as pd

            mask = (1 << 21) - 1
            for pdf in batches:
                k2, _ = _batch_gram_keys(pdf[text_col], o)
                if not len(k2):
                    continue
                uk, uc = np.unique(k2, return_counts=True)
                grams = [
                    "".join(
                        chr((int(k) >> (21 * (o - 1 - i))) & mask)
                        for i in range(o)
                    )
                    for k in uk
                ]
                yield pd.DataFrame({"gram": grams, "__c": uc})

        grams_ex = corpus.select(F.col(text_col)).mapInPandas(
            count_grams, "gram string, __c bigint"
        )
        gram_counts = grams_ex.groupBy("gram").agg(
            F.sum("__c").alias("gram_count")
        ).persist()
    else:
        grams_ex = corpus.select(
            F.explode(char_ngrams_multiset(F.col(text_col), order)).alias("gram")
        )
        # persist the POST-aggregation gram table (charset-bounded —
        # |charset|^order rows however big the corpus): it is consumed by
        # the contexts derivation, the vocab_size action, the
        # broadcast-size probe, and the scoring join — each would
        # otherwise re-run the full corpus char-gram explode (billions of
        # rows at 10M docs; the same multi-pass failure measured on dsir's
        # dictionary)
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


#: model-LUT row cap for the vectorized Arrow scoring kernel (the table is
#: collected to the driver and broadcast as sorted key/value arrays — 2M
#: rows ≈ 32 MB); larger models keep the JVM join plan
ARROW_SCORE_MAX_GRAMS = 2_000_000


def _pack_key(s: str) -> int:
    """Fixed-length code-point packing (21 bits per char — every Unicode
    code point < 2^21): injective among strings of one length."""
    k = 0
    for ch in s:
        k = (k << 21) | ord(ch)
    return k


def _batch_gram_keys(texts, o: int):
    """Packed int64 keys of every char-``o``-gram occurrence in a batch of
    texts (document order), plus the per-document gram counts. Shared by
    the fit and score kernels: texts are concatenated once, code points
    come from one utf-32 encode, keys from ``o-1`` vectorized shift-ors,
    and the positions that would read across a document boundary (the last
    ``min(len, o-1)`` of each doc) are masked out."""
    import numpy as np

    lens = np.fromiter(
        (0 if t is None else len(t) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    ng = np.maximum(lens - (o - 1), 0)
    total = int(lens.sum())
    if total < o or not (ng > 0).any():
        return np.empty(0, dtype=np.int64), ng
    joined = "".join(t for t in texts if t)
    arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    arr = np.concatenate([arr, np.zeros(o - 1, dtype=np.int64)])
    key = arr[:total].copy()
    for k in range(1, o):
        key = (key << 21) | arr[k : total + k]
    valid = np.ones(total, dtype=bool)
    ends = np.cumsum(lens)
    starts = ends - lens
    for s_, e_ in zip(np.maximum(ends - (o - 1), starts), ends):
        if s_ < e_:
            valid[s_:e_] = False
    return key[valid], ng


def _arrow_score(
    docs: DataFrame,
    model: dict,
    text_col: str,
    id_col: str,
) -> Optional[DataFrame]:
    """Vectorized scoring pass: one ``mapInPandas`` over (id, text) with the
    model folded into broadcast numpy lookup arrays — replaces the exploded
    per-occurrence plan (billions of rows through an interpreted zip_with
    gram build, two broadcast-join probes, a substring and a log PER GRAM
    OCCURRENCE; measured as the dominant slice of the 10M perplexity wall).

    Exactness: every per-gram value is precomputed IN SPARK by the exact
    expression the join plan evaluated per occurrence — (cast(count as
    double) + alpha) / (cast(total as double) + alpha*V) through JVM log —
    so the kernel only looks values up (int64 searchsorted over packed
    code-point keys; a gram's context key is its own key shifted 21 bits)
    and averages them. Per-document summation uses numpy's pairwise
    reduction instead of Spark's sequential fold — same multiset of
    float64 addends, results equal to ~1 ulp; the declared queries round
    to 6 dp (oracle-verified at every sf after this change). Returns None
    when the regime doesn't fit (order > 3 — three 21-bit chars fill an
    int64 — or an over-cap LUT), leaving the join plan to the caller.
    """
    import numpy as np

    order = model["order"]
    alpha = float(model["alpha"])
    v = model["vocab_size"]
    if order > 3:
        return None
    grams, contexts = model["grams"], model["contexts"]
    spark = docs.sparkSession

    # per-gram / per-context values computed by the SAME JVM expressions the
    # join plan used (seen-gram, unseen-gram-seen-ctx, both-unseen)
    lut = (
        grams.where(F.length("gram") == order)
        .withColumn("__ctx", F.substring("gram", 1, order - 1))
        .join(
            contexts.select(F.col("ctx").alias("__ctx"), "ctx_total"), "__ctx"
        )
        .select(
            "gram",
            (
                -F.log(
                    (F.col("gram_count").cast("double") + F.lit(alpha))
                    / (F.col("ctx_total").cast("double") + F.lit(alpha * v))
                )
            ).alias("__v"),
        )
        .limit(ARROW_SCORE_MAX_GRAMS + 1)
        .toPandas()
    )
    if len(lut) > ARROW_SCORE_MAX_GRAMS:
        return None
    ctx_lut = (
        contexts.where(F.length("ctx") == order - 1)
        .select(
            "ctx",
            (
                -F.log(
                    F.lit(alpha)
                    / (F.col("ctx_total").cast("double") + F.lit(alpha * v))
                )
            ).alias("__v"),
        )
        .toPandas()
    )
    # both-unseen backoff, through JVM log like everything else
    miss_const = float(
        spark.range(1)
        .select((-F.log(F.lit(alpha) / F.lit(alpha * v))).alias("v"))
        .collect()[0]["v"]
    )

    gk = np.fromiter(
        (_pack_key(g) for g in lut["gram"]), dtype=np.int64, count=len(lut)
    )
    gv = lut["__v"].to_numpy(dtype=np.float64)
    o_g = np.argsort(gk, kind="stable")
    gk, gv = gk[o_g], gv[o_g]
    ck = np.fromiter(
        (_pack_key(c) for c in ctx_lut["ctx"]), dtype=np.int64, count=len(ctx_lut)
    )
    cv = ctx_lut["__v"].to_numpy(dtype=np.float64)
    o_c = np.argsort(ck, kind="stable")
    ck, cv = ck[o_c], cv[o_c]

    sc = spark.sparkContext
    b_gk, b_gv = sc.broadcast(gk), sc.broadcast(gv)
    b_ck, b_cv = sc.broadcast(ck), sc.broadcast(cv)
    o = int(order)

    id_type = dict(docs.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, n_grams bigint, cross_entropy double"

    def score(batches):
        import numpy as np
        import pandas as pd

        gk_, gv_ = b_gk.value, b_gv.value
        ck_, cv_ = b_ck.value, b_cv.value
        for pdf in batches:
            texts = pdf[text_col]
            k2, ng = _batch_gram_keys(texts, o)
            sums = np.zeros(len(ng), dtype=np.float64)
            nz = ng > 0
            if len(k2):
                vals = np.full(len(k2), miss_const, dtype=np.float64)
                if len(gk_):
                    idx = np.searchsorted(gk_, k2)
                    idx_c = np.minimum(idx, len(gk_) - 1)
                    hit = gk_[idx_c] == k2
                    vals[hit] = gv_[idx_c[hit]]
                else:
                    hit = np.zeros(len(k2), dtype=bool)
                miss = ~hit
                if miss.any() and len(ck_):
                    mk = k2[miss] >> 21
                    j = np.searchsorted(ck_, mk)
                    j_c = np.minimum(j, len(ck_) - 1)
                    chit = ck_[j_c] == mk
                    mvals = np.full(len(mk), miss_const, dtype=np.float64)
                    mvals[chit] = cv_[j_c[chit]]
                    vals[miss] = mvals
                seg_starts = np.concatenate(
                    [np.zeros(1, dtype=np.int64), np.cumsum(ng)[:-1]]
                )
                sums[nz] = np.add.reduceat(vals, seg_starts[nz])
            ce = pd.array(
                sums / np.maximum(ng, 1), dtype="Float64"
            )
            ce[~nz] = pd.NA
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_grams": ng,
                    "cross_entropy": ce,
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        score, out_schema
    )


def char_lm_cross_entropy(
    docs: DataFrame,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: Optional[bool] = None,
    broadcast_max_grams: int = 5_000_000,
    arrow_kernel: Optional[bool] = None,
) -> DataFrame:
    """Per-document cross-entropy (nats/char-gram) and perplexity under a
    :func:`char_lm_fit` model.

    ``arrow_kernel=None`` (auto, the default) scores with the vectorized
    ``mapInPandas`` kernel (:func:`_arrow_score`) whenever the model fits
    its regime — ``order <= 3`` and a LUT under ``ARROW_SCORE_MAX_GRAMS``
    (charset-bounded models virtually always qualify). The kernel removes
    the per-occurrence exploded plan: the 10M-doc scoring pass paid an
    interpreted zip_with gram build, two broadcast hash probes, a substring
    and a log for EVERY gram occurrence. ``False`` forces the join plan.

    ``broadcast_model=None`` probes the gram table once and broadcasts both
    model tables only below ``broadcast_max_grams`` on the join plan.

    Returns ``(id_col, n_grams, cross_entropy, perplexity)``;
    ``cross_entropy``/``perplexity`` are NULL when the document is shorter
    than the model order (``n_grams = 0``).
    """
    order = model["order"]
    alpha = model["alpha"]
    v = model["vocab_size"]
    grams, contexts = model["grams"], model["contexts"]

    if arrow_kernel is None or arrow_kernel:
        scored = _arrow_score(docs, model, text_col, id_col)
        if scored is not None:
            return scored.select(
                id_col,
                F.col("n_grams").cast("bigint").alias("n_grams"),
                F.col("cross_entropy"),
                F.exp("cross_entropy").alias("perplexity"),
            )
        if arrow_kernel:
            raise ValueError(
                "arrow_kernel=True but the model does not fit the kernel "
                "regime (order > 3 or LUT over ARROW_SCORE_MAX_GRAMS)"
            )

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
    from ..internals.misc import attach_caches

    # the model's persisted gram table is internal to this call — hand the
    # caller an unpersist handle (internals.misc.unpersist_caches) instead
    # of leaking one MEMORY_AND_DISK frame per invocation
    return attach_caches(
        ce.select(
            id_col,
            "n_grams",
            "cross_entropy",
            "perplexity",
            F.when(F.col("n_grams") == 0, F.lit(bool(keep_unscored)))
            .otherwise(F.col("perplexity") <= F.lit(float(max_perplexity)))
            .alias("keep"),
        ),
        model["grams"],
    )
