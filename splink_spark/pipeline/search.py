"""Distributed full-text search: inverted-index build + BM25 top-k — the
retrieval primitive a training-data pipeline needs for quality-biased
sampling, dedup triage, and eval-set contamination queries.

Scale design (100 TB corpus):
- ``bm25_index`` is one scan + two map-side-combined aggregations: explode
  tokens -> groupBy(term, doc) tf, then doc lengths as a groupBy(doc) over
  the SAME exploded data; the postings table is the only large output and
  is partitioned by term — exactly the layout the search join wants.
- ``bm25_search`` never moves the postings: the query-term table (small by
  definition) joins broadcast, as does the (query-term ∩ vocabulary)
  document-frequency slice — the full vocabulary DF table is NEVER
  broadcast (web-scale vocabularies don't fit; only terms the queries
  mention matter).
- Scoring is EXACT-INT64: each (term, doc) contribution is quantized to
  integer millionths before the per-(query, doc) sum, so the reduction is
  associative — no float summation-order nondeterminism across partitions,
  and any SQL engine replays it bit-for-bit (same trick as
  ``graph.pagerank``).
- Per-query top-k runs through ``analytics.top_k_per_group`` (prefilter
  plan for huge per-query hit sets, plain window for small ones).

BM25 variant: Lucene/ATIRE ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``
(non-negative), ``k1``/``b`` defaults 1.2/0.75, query term frequency
ignored (terms deduplicated per query — standard for short queries).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokenize_terms",
    "bm25_index",
    "bm25_corpus_stats",
    "bm25_search",
    "bm25_index_write",
    "bm25_index_read",
    "bucket_coverage",
    "bm25_release_cached_slices",
    "term_cosine_join",
    "positional_index",
    "phrase_search",
]

_SCALE = 1_000_000

# bounded registry of persisted query-vocabulary slices: a long-lived
# serving session issuing many query batches would otherwise accumulate
# one cached slice per call until LRU eviction — keep the most recent
# few (repeat/overlapping batches still hit), unpersist the rest eagerly
_CACHED_SLICES: list = []
_MAX_CACHED_SLICES = 4


def _register_cached_slice(df: DataFrame) -> None:
    _CACHED_SLICES.append(df)
    while len(_CACHED_SLICES) > _MAX_CACHED_SLICES:
        old = _CACHED_SLICES.pop(0)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped


def bm25_release_cached_slices() -> int:
    """Unpersist every query-vocabulary slice ``bm25_search`` cached in
    this process (``cache_slice=True`` path). Returns how many were
    released. Call between query batches in long-lived sessions to hand
    storage memory back without waiting for LRU eviction."""
    n = 0
    while _CACHED_SLICES:
        try:
            _CACHED_SLICES.pop().unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n


def tokenize_terms(col: Column) -> Column:
    """Search tokenization: lowercase, split on non-alphanumeric runs,
    drop empties. Deliberately engine-portable (same regex replays in any
    SQL dialect) and consistent with ``text.fingerprint``'s a-z0-9
    normalization."""
    toks = F.split(F.lower(F.trim(col)), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def bm25_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Build the inverted index: one row per (term, doc) with the term
    frequency ``tf`` and the document's token length ``dl`` attached
    (denormalized so search needs no second doc-stats join).

    One scan; ``tf`` and ``dl`` are both map-side-combined aggregations of
    the same exploded projection; the join putting them back together is
    an equi-join on the doc id that AQE plans narrow (doc-lengths is one
    row per doc).
    """
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_terms(F.col(text_col))).alias("term"),
    )
    postings = exploded.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    doclens = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return postings.join(doclens, "doc_id").select("term", "doc_id", "tf", "dl")


def bm25_corpus_stats(index: DataFrame) -> tuple:
    """(n_docs, total_dl) for an index — compute ONCE per index and pass
    to every ``bm25_search`` call to skip its per-call stats scan."""
    row = (
        index.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t"))
        .collect()[0]
    )
    return int(row["n"]), int(row["t"])


def bm25_search(
    index: DataFrame,
    queries: DataFrame,
    query_col: str = "query",
    qid_col: str = "query_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    topk_method: str = "auto",
    stats: Optional[tuple] = None,
    cache_slice: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 over a ``bm25_index`` table.
    Returns (``query_id``, ``rank``, ``doc_id``, ``score``), rank 1-based,
    ties broken by ascending ``doc_id`` — fully deterministic.

    The corpus-level stats (N docs, average doc length) are a one-row
    aggregate crossJoin-broadcast into the scoring expression; document
    frequencies are computed only for the terms the queries mention
    (broadcast query terms -> postings groupBy) so the vocabulary table is
    never materialized driver-side or broadcast whole.

    ``stats``: optional precomputed ``(n_docs, total_dl)`` — corpus stats
    are a property of the INDEX, so repeated search calls should compute
    them once (``bm25_corpus_stats``) instead of re-reducing the postings
    table per call (one full index scan saved per search).
    """
    qterms = queries.select(
        F.col(qid_col).alias("query_id"),
        F.explode(tokenize_terms(F.col(query_col))).alias("term"),
    ).distinct()

    spark = index.sparkSession
    if stats is not None:
        n_docs, total_dl = int(stats[0]), int(stats[1])
        stats_df = spark.createDataFrame(
            [(n_docs, total_dl)], "n_docs bigint, total_dl bigint"
        )
    else:
        # stats over the index: docs appear once per (term, doc); reduce
        # to one row per doc first (map-side combined), then a one-row agg
        per_doc = index.groupBy("doc_id").agg(F.first("dl").alias("dl"))
        stats_df = per_doc.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_dl"),
        )

    # restrict the index to the query vocabulary ONCE and persist the
    # (small) slice: document frequencies and the scoring join both read
    # it — without the persist each branch re-probes the full postings
    # table (measured: the second probe, not the stats scan, dominated
    # per-call cost at 60M postings)
    # (``cache_slice=False`` opts out for callers managing storage memory
    # across many query batches — each call's slice otherwise stays cached
    # until evicted LRU or the session ends; identical results either way)
    q_vocab = qterms.select("term").distinct()
    relevant = index.join(F.broadcast(q_vocab), "term")
    if cache_slice:
        relevant = relevant.persist()
        _register_cached_slice(relevant)
    dfreq = relevant.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    hits = (
        relevant.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats_df))
    )
    n = F.col("n_docs").cast("double")
    avgdl = F.col("total_dl").cast("double") / n
    dfv = F.col("df").cast("double")
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    idf = F.log(F.lit(1.0) + (n - dfv + 0.5) / (dfv + 0.5))
    denom = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl / avgdl)
    contrib = idf * tf * F.lit(k1 + 1.0) / denom
    # integer millionths BEFORE the sum: associative, engine-portable
    c_int = F.round(contrib * F.lit(_SCALE), 0).cast("bigint")

    scores = (
        hits.withColumn("__c", c_int)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("__c").alias("__s_int"))
    )
    from splink_spark.pipeline.analytics import top_k_per_group

    top = top_k_per_group(
        scores,
        group_cols=["query_id"],
        order_col="__s_int",
        k=k,
        ascending=False,
        tie_cols=["doc_id"],
        method=topk_method,
    )
    return top.select(
        "query_id",
        F.col("__rank").alias("rank"),
        "doc_id",
        F.round(F.col("__s_int").cast("double") / F.lit(float(_SCALE)), round_to).alias(
            "score"
        ),
    )


def bm25_index_write(
    index: DataFrame,
    path: str,
    num_buckets: int = 64,
) -> None:
    """Persist an index TERM-BUCKETED: postings partitioned by
    ``pmod(xxhash64(term), num_buckets)``. The point is read-side
    PARTITION PRUNING: a search's query terms hash to a handful of
    buckets, so ``bm25_index_read(..., query_terms=...)`` scans only
    those directories — on a 100 TB corpus the index itself is huge, and
    an unpruned search re-reads all of it per query batch."""
    (
        index.withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(int(num_buckets))),
        )
        .write.partitionBy("term_bucket")
        .mode("overwrite")
        .parquet(path)
    )


def bucket_coverage(
    query_terms: DataFrame, num_buckets: int = 64
) -> "tuple[list, float]":
    """Bucket ids a query batch's terms hash into, plus the coverage
    fraction ``len(buckets)/num_buckets`` — the routing signal for
    :func:`bm25_index_read`: one tiny job bounded by the number of
    distinct query terms."""
    buckets = [
        r[0]
        for r in query_terms.select(
            F.pmod(F.xxhash64("term"), F.lit(int(num_buckets))).alias("b")
        )
        .distinct()
        .collect()
    ]
    return buckets, len(buckets) / max(1, int(num_buckets))


def bm25_index_read(
    spark,
    path: str,
    query_terms: Optional[DataFrame] = None,
    num_buckets: int = 64,
    prune_coverage_max: float = 0.5,
) -> DataFrame:
    """Open a bucketed index. With ``query_terms`` (any DataFrame with a
    ``term`` column — e.g. the queries exploded through
    ``tokenize_terms``), the needed bucket ids are computed with one tiny
    job (bounded by the number of distinct query terms) and pushed down
    as a partition filter — only matching ``term_bucket=`` directories
    are scanned. ``num_buckets`` MUST match the write (it is layout
    metadata, like Spark bucketing's bucket count — inferring it from the
    data would silently mis-prune when the highest buckets happen to be
    empty). Corpus stats must come from the FULL index
    (``bm25_corpus_stats`` on an unpruned read, once per index — store
    them with the index, not per query).

    AUTO-ROUTING: pruning only pays when the query vocabulary misses
    most buckets. A 20-query batch already hashed into all 64 buckets at
    the 100M bench — and the "pruned" read then cost MORE than the full
    read (609s vs 591s: same directories scanned, plus a pass-everything
    partition filter). When measured coverage exceeds
    ``prune_coverage_max`` (default 0.5) the filter is skipped and the
    full index is read; use :func:`bucket_coverage` to inspect the
    signal yourself (e.g. to decide between per-batch pruning and a
    cache-the-slice serving layout for repeated query batches)."""
    df = spark.read.parquet(path)
    if query_terms is not None:
        buckets, coverage = bucket_coverage(query_terms, num_buckets)
        if coverage <= float(prune_coverage_max):
            df = df.where(F.col("term_bucket").isin(buckets))
    return df.drop("term_bucket")


def term_cosine_join(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: Optional[int] = None,
    round_to: int = 6,
    dense_max_vocab: Optional[int] = None,
) -> DataFrame:
    """Sparse term-frequency cosine similarity self-join: every document
    pair sharing at least one term, scored by the cosine of their raw
    term-count vectors, kept at ``cosine >= threshold``. The embedding-free
    complement to ``dedup.embedding_near_duplicates`` (same output shape:
    id_l < id_r) for corpora without an embedding column.

    Exactness: dot products and squared norms are exact integer sums of
    term-count products (bigint — counts are small; a 10M-token document
    still fits), so every engine reproduces them digit-for-digit; only the
    final ``dot / sqrt(norm_l * norm_r)`` converts to double, and both
    operands are exact integers, so the IEEE result — and the threshold
    comparison at the boundary — is bit-identical cross-engine.

    Scale shape: the candidate generator is an equi-join of the postings
    table with itself ON THE TERM — never an all-pairs product; shuffle is
    bounded by Σ df(term)² over terms both sides share. That sum is
    dominated by stop-word-frequency terms, so at corpus scale pass
    ``max_df``: terms appearing in more than ``max_df`` documents are
    EXCLUDED FROM THE VECTORS (dot products and norms — standard stop-word
    pruning semantics, not an approximation of the unpruned metric; the
    docstring contract is the pruned vocabulary). Default None computes
    the exact full-vocabulary cosine.

    ``dense_max_vocab`` (None = the ``dense.DENSE_MAX_VOCAB`` default, 0
    disables): vocabulary cap under which the dense-regime broadcast-matmul
    plan replaces the postings self-join — bit-identical output (see
    ``pipeline/dense.py`` for the exactness argument), orders of magnitude
    faster when a tiny vocabulary makes sum df(term)^2 approach n_docs^2.
    """
    postings = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize_terms(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_df is not None:
        keep = (
            postings.groupBy("term")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= int(max_df))
            .select("term")
        )
        postings = postings.join(keep, "term")

    scored = None
    if dense_max_vocab is None or dense_max_vocab > 0:
        from .dense import DENSE_MAX_VOCAB, dense_cosine_self_join

        dense = dense_cosine_self_join(
            postings,
            "doc_id",
            threshold,
            max_vocab=dense_max_vocab or DENSE_MAX_VOCAB,
        )
        if dense is not None:
            scored = dense.withColumnsRenamed(
                {"doc_id_l": f"{id_col}_l", "doc_id_r": f"{id_col}_r"}
            )
    if scored is None:
        norms = postings.groupBy("doc_id").agg(
            F.sum(F.col("tf") * F.col("tf")).alias("norm_sq")
        )
        l = postings.select(
            F.col("doc_id").alias(f"{id_col}_l"), "term", F.col("tf").alias("__tf_l")
        )
        r = postings.select(
            F.col("doc_id").alias(f"{id_col}_r"), "term", F.col("tf").alias("__tf_r")
        )
        dots = (
            l.join(r, "term")
            .where(F.col(f"{id_col}_l") < F.col(f"{id_col}_r"))
            .groupBy(f"{id_col}_l", f"{id_col}_r")
            .agg(F.sum(F.col("__tf_l") * F.col("__tf_r")).alias("dot"))
        )
        scored = dots.join(
            norms.select(
                F.col("doc_id").alias(f"{id_col}_l"),
                F.col("norm_sq").alias("norm_sq_l"),
            ),
            f"{id_col}_l",
        ).join(
            norms.select(
                F.col("doc_id").alias(f"{id_col}_r"),
                F.col("norm_sq").alias("norm_sq_r"),
            ),
            f"{id_col}_r",
        )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("norm_sq_l").cast("double") * F.col("norm_sq_r").cast("double")
    )
    return (
        scored.where(cos >= F.lit(float(threshold)))
        .select(
            f"{id_col}_l",
            f"{id_col}_r",
            "dot",
            "norm_sq_l",
            "norm_sq_r",
            F.round(cos, round_to).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# positional index / exact phrase search
# ---------------------------------------------------------------------------


def positional_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional postings: one row per (term, doc, position) — the
    index layout phrase and proximity queries need, same ``tokenize_
    terms`` normalization as the BM25 index so the two share a
    vocabulary. Like the BM25 postings, write it partitioned by term
    for pruned reads; positions are 0-based token offsets."""
    return docs.select(
        F.col(id_col),
        F.posexplode(tokenize_terms(F.col(text_col))).alias("pos", "term"),
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    index: Optional[DataFrame] = None,
) -> DataFrame:
    """Exact phrase matching: documents containing the query words as
    CONSECUTIVE tokens, with the occurrence count — the retrieval
    primitive BM25's bag-of-words scoring cannot express ("new york",
    not "new ... york").

    Plan: the positional postings are restricted to the phrase's terms
    FIRST (an ``IN`` filter that reaches the scan — with a term-
    partitioned on-disk index this is partition pruning), then the
    k-term phrase is k-1 equi-joins on ``(doc, pos - offset)``: every
    join uses the SAME key, so Catalyst shuffles once and the rest are
    co-partitioned. Nothing is broadcast — a phrase of stopwords has
    huge posting lists, and the equi-join handles them distributed.

    Pass ``index=`` a precomputed :func:`positional_index` (or its
    on-disk read) to skip re-tokenizing. Returns (id, ``n_matches``),
    matches only.
    """
    import re as _re

    terms = [t for t in _re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    if not terms:
        raise ValueError("phrase contains no tokens")
    idx = index if index is not None else positional_index(
        docs, text_col, id_col
    )
    base = idx.where(F.col("term").isin(terms))
    cur = base.where(F.col("term") == terms[0]).select(id_col, "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = base.where(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - F.lit(i)).alias("pos")
        )
        cur = cur.join(nxt, [id_col, "pos"])
    return cur.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_matches"))
