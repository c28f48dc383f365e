"""Dense-regime exact similarity self-joins (vectorized matmul execution).

When a corpus' vocabulary is small (tens to a few thousand distinct terms)
the sparse postings equi-join ON THE TERM degenerates: almost every term
appears in a large fraction of documents, so the join's output —
sum over terms of df(term)^2 rows — approaches n_docs^2 and the candidate
generator stops pruning anything (measured at the 5k-doc/31-term gate
corpus: 448M joined rows to score 12.5M pairs; DuckDB needs ~113s for the
same plan shape, Spark ~120s).  In that regime every document is a short
DENSE vector over the shared vocabulary and the exact same dot products
are a blocked integer matrix product: ship the (small, capped) vector
matrix to every task once, distribute row ranges with ``spark.range``, and
compute each range's dot-product block with one float64 matmul.

Exactness (why the fast path is bit-identical, not approximate):

- Term frequencies / set memberships are small integers.  A float64
  multiply-add over integers is exact while every intermediate stays below
  2^53, so the matmul produces exactly the integers the sparse join's
  ``SUM(tf_l * tf_r)`` aggregates.  ``dense_cosine_self_join`` verifies
  ``max(norm_sq) < 2^52`` (an upper bound on any dot product) before
  choosing this path; Jaccard intersections are bounded by the vocabulary
  size.
- The cosine comparison ``dot / sqrt(nl * nr) >= t`` is evaluated in
  float64 with the same operation order Spark's Column expression uses, so
  the kept-pair set is identical; the Jaccard comparison is all-integer
  (``1e6 * inter >= t_ppm * union``), replayed exactly in int64.

Scale shape / when NOT to use this: the dense path is only chosen when the
corpus fits the broadcast caps (vocabulary <= ``max_vocab``, documents <=
``max_docs``, matrix cells <= ``max_cells``).  With a real (web-scale)
vocabulary the sparse prefix / postings joins prune candidates and remain
the right plan; with a tiny vocabulary but a huge corpus the OUTPUT of an
exact threshold join is itself ~n^2 (every pair co-occurs), so no
subquadratic plan exists and the caller should be blocking/sharding first
— the caps make the operator fall back to the sparse plan rather than
silently broadcasting gigabytes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dense_cosine_self_join",
    "dense_jaccard_self_join",
]

#: caps for choosing the dense path; beyond these the callers keep their
#: sparse plans (see module docstring for why the caps are semantic, not
#: just memory, guards)
DENSE_MAX_VOCAB = 4096
DENSE_MAX_DOCS = 200_000
DENSE_MAX_CELLS = 32_000_000  # broadcast matrix cells (x8 bytes = 256 MB)
#: bound every float64 dot product must stay under to be exact (2^52 leaves
#: a factor-2 margin below the 2^53 integer-exactness limit)
_EXACT_DOT_BOUND = float(2**52)


def _collect_vectors(postings: DataFrame, id_col: str, vocab: list, max_docs: int):
    """The expensive part of the dense probe: index terms against the
    (already-validated) vocabulary, group per-doc sparse entries and collect
    them to the driver. Split out so the over-cap short-circuit in
    ``_dense_vectors`` is testable — an over-cap corpus must never reach
    this aggregation (it pays a full groupBy shuffle plus an array
    collect)."""
    spark = postings.sparkSession
    vocab_df = F.broadcast(
        spark.createDataFrame(
            [(t, i) for i, t in enumerate(vocab)], ["term", "__term_idx"]
        )
    )
    entries = (
        postings.join(vocab_df, "term")
        .groupBy(id_col)
        .agg(
            F.collect_list("__term_idx").alias("__idx"),
            F.collect_list("tf").alias("__val"),
        )
    )
    return entries.limit(max_docs + 1).toPandas()


def _dense_vectors(
    postings: DataFrame,
    id_col: str,
    max_vocab: int,
    max_docs: int,
    max_cells: int,
):
    """Collect the corpus as (ids ndarray, dense float64 matrix) when it
    fits the dense regime, else None.  Bounded driver probes, cheapest
    first: a LIMIT max_vocab+1 vocabulary fetch, then a LIMIT max_docs+1
    ids-only distinct-doc count — BOTH run before the grouped
    collect_list aggregation, so an over-cap corpus (the 100 TB shape the
    fallback exists for) never pays the full vector aggregation shuffle
    or a max_docs-array collect just to discover it must use the sparse
    plan.  The postings frame is persisted for the duration of the probes
    (all scan it) and unpersisted before returning."""
    import numpy as np
    from pyspark import StorageLevel

    postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        vocab_rows = (
            postings.select("term").distinct().limit(max_vocab + 1).collect()
        )
        if len(vocab_rows) > max_vocab:
            return None
        vocab = sorted(r["term"] for r in vocab_rows)
        # ids-only doc-count probe: narrow rows, early-stops at the cap
        n_docs = (
            postings.select(id_col).distinct().limit(max_docs + 1).count()
        )
        if n_docs > max_docs or n_docs * len(vocab) > max_cells:
            return None
        pdf = _collect_vectors(postings, id_col, vocab, max_docs)
    finally:
        try:
            postings.unpersist()
        except Exception:
            pass
    if len(pdf) > max_docs or len(pdf) * len(vocab) > max_cells:
        return None
    mat = np.zeros((len(pdf), len(vocab)), dtype="float64")
    for i, (idxs, vals) in enumerate(zip(pdf["__idx"], pdf["__val"])):
        mat[i, np.asarray(idxs, dtype="int64")] = np.asarray(vals, dtype="float64")
    return pdf[id_col].to_numpy(), mat


def _row_range(spark, n: int) -> DataFrame:
    from ..internals.misc import default_parallelism

    return spark.range(0, n, numPartitions=max(1, default_parallelism(spark)))


def dense_cosine_self_join(
    postings: DataFrame,
    id_col: str,
    threshold: float,
    max_vocab: int = DENSE_MAX_VOCAB,
    max_docs: int = DENSE_MAX_DOCS,
) -> Optional[DataFrame]:
    """Exact-threshold cosine self-join over a (id, term, tf) postings frame
    via the dense broadcast-matmul plan; returns None when the corpus does
    not fit the dense regime (caller falls back to the sparse join).

    Output matches ``search.term_cosine_join``'s pre-projection frame:
    (id_l, id_r, dot, norm_sq_l, norm_sq_r) — the caller applies the same
    cosine expression/threshold projection to both paths so the emitted
    columns share one code path.
    """
    import numpy as np
    import pandas as pd

    got = _dense_vectors(
        postings.select(F.col(id_col), "term", "tf"),
        id_col, max_vocab, max_docs, DENSE_MAX_CELLS,
    )
    if got is None:
        return None
    ids, mat = got
    norms = np.einsum("ij,ij->i", mat, mat)
    if norms.size and float(norms.max()) >= _EXACT_DOT_BOUND:
        return None  # dot products could round in float64 — keep sparse
    spark = postings.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)
    thr = float(threshold)

    id_l, id_r = f"{id_col}_l", f"{id_col}_r"
    id_type = dict(postings.dtypes)[id_col]
    out_schema = (
        f"{id_l} {id_type}, {id_r} {id_type}, "
        "dot bigint, norm_sq_l bigint, norm_sq_r bigint"
    )
    n = len(ids)
    step = max(16, int(4_000_000 // max(1, n)))

    def score(batches):
        all_ids = b_ids.value
        all_mat = b_mat.value
        all_norms = b_norms.value
        for pdf in batches:
            rows = pdf["id"].to_numpy()
            for s in range(0, len(rows), step):
                ri = rows[s : s + step]
                dots = all_mat[ri] @ all_mat.T
                # same IEEE ops/order as the Column expression:
                # dot / sqrt(nl * nr).  dots > 0 preserves the sparse
                # plan's "pairs sharing at least one term" contract at
                # threshold 0 (the postings join never generates a
                # non-co-occurring pair).
                cos = dots / np.sqrt(np.outer(all_norms[ri], all_norms))
                keep = (
                    (cos >= thr)
                    & (dots > 0)
                    & (all_ids[ri][:, None] < all_ids[None, :])
                )
                li, ci = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        id_l: all_ids[ri][li],
                        id_r: all_ids[ci],
                        "dot": dots[li, ci].astype("int64"),
                        "norm_sq_l": all_norms[ri][li].astype("int64"),
                        "norm_sq_r": all_norms[ci].astype("int64"),
                    }
                )

    return _row_range(spark, n).mapInPandas(score, out_schema)


def dense_jaccard_self_join(
    tokens_df: DataFrame,
    id_col: str,
    t_ppm: int,
    max_vocab: int = DENSE_MAX_VOCAB,
    max_docs: int = DENSE_MAX_DOCS,
) -> Optional[DataFrame]:
    """Exact-threshold Jaccard self-join over a (id, ``__toks`` array)
    frame via the dense broadcast-matmul plan; returns None when the corpus
    does not fit the dense regime.

    Output matches ``fuzzy.jaccard_similarity_join``: (id_l, id_r,
    n_intersect, n_union, jaccard_ppm) with the identical all-integer
    threshold arithmetic (``1e6 * inter >= t_ppm * union``, truncating-div
    ppm).
    """
    import numpy as np
    import pandas as pd

    postings = tokens_df.select(
        F.col(id_col),
        F.explode("__toks").alias("term"),
    ).withColumn("tf", F.lit(1).cast("bigint"))
    got = _dense_vectors(postings, id_col, max_vocab, max_docs, DENSE_MAX_CELLS)
    if got is None:
        return None
    ids, mat = got
    # binary vectors: row sums are the set sizes (tf is 1 per present term)
    np.clip(mat, 0.0, 1.0, out=mat)
    sizes = mat.sum(axis=1).astype("int64")
    spark = tokens_df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_sizes = spark.sparkContext.broadcast(sizes)
    tp = int(t_ppm)

    id_type = dict(tokens_df.dtypes)[id_col]
    out_schema = (
        f"id_l {id_type}, id_r {id_type}, "
        "n_intersect bigint, n_union bigint, jaccard_ppm bigint"
    )
    n = len(ids)
    step = max(16, int(4_000_000 // max(1, n)))

    def score(batches):
        all_ids = b_ids.value
        all_mat = b_mat.value
        all_sizes = b_sizes.value
        for pdf in batches:
            rows = pdf["id"].to_numpy()
            for s in range(0, len(rows), step):
                ri = rows[s : s + step]
                inter = (all_mat[ri] @ all_mat.T).astype("int64")
                union = all_sizes[ri][:, None] + all_sizes[None, :] - inter
                # inter > 0 preserves the sparse plan's "pairs must share a
                # token" contract when t_ppm rounds to 0 (threshold ~1e-7):
                # the prefix join can never emit a non-co-occurring pair,
                # while inter*1e6 >= 0*union alone would keep them all.
                # For t_ppm >= 1 the guard is implied (inter >= union/1e6).
                keep = (
                    (inter * 1_000_000 >= tp * union)
                    & (inter > 0)
                    & (all_ids[ri][:, None] < all_ids[None, :])
                )
                li, ci = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "id_l": all_ids[ri][li],
                        "id_r": all_ids[ci],
                        "n_intersect": inter[li, ci],
                        "n_union": union[li, ci],
                        "jaccard_ppm": inter[li, ci] * 1_000_000 // union[li, ci],
                    }
                )

    return _row_range(spark, n).mapInPandas(score, out_schema)
