"""Approximate-nearest-neighbour search over an embedding column.

Brute-force cosine top-k is the correctness baseline (bounded: queries are a
small broadcast side). The scale path is random-hyperplane LSH bucketing: the
probe join becomes an equi-join on bucket signature, so candidate generation
is O(bucket) not O(corpus) per query — the shape that survives 100 TB.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..internals.functions import cosine_similarity


def _sim(l, r):
    return cosine_similarity(l.cast("array<double>"), r.cast("array<double>"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query side against the
    corpus, window-rank per query. Ties broken by corpus id (deterministic)."""
    from .dedup import _widen

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(embedding_col).alias("__q_emb")
    )
    c = _widen(corpus).select(
        F.col(id_col).alias("neighbour_id"), F.col(embedding_col).alias("__c_emb")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbour_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbour_id",
            _sim(F.col("__q_emb"), F.col("__c_emb")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbour_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbour_id", "cosine_sim")
    )


def random_hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (pure python; tiny)."""
    import hashlib
    import struct

    planes = []
    for p in range(num_planes):
        vec = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            (x,) = struct.unpack("<q", h[:8])
            vec.append(x / 2**63)  # [-1, 1)
        planes.append(vec)
    return planes


def lsh_bucket_signature(embedding_col, planes: Sequence[Sequence[float]]):
    """Sign-bit signature: one bit per hyperplane, packed into a bigint.

    Everything is HOF arithmetic over the array column — JVM-side codegen.
    """
    bits = []
    for i, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(embedding_col.cast("array<double>"), plane_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("bigint")


def _kmeans_centroids(
    corpus: DataFrame,
    embedding_col: str,
    id_col: str,
    num_cells: int,
    iterations: int = 8,
    sample_rows: int = 50_000,
):
    """Spherical k-means centroids, trained driver-side on a deterministic
    hash-sample (numpy Lloyd iterations — the standard IVF index build:
    training on a bounded sample is how FAISS-style IVF indexes scale, the
    full corpus is only ASSIGNED to cells, never collected).

    Init = the ``num_cells`` sample rows with the smallest xxhash64(id)
    (stable across partitionings); assignment by max cosine; update = mean
    of members renormalized; empty cells keep their previous centroid.
    """
    import numpy as np

    sample = (
        corpus.select(id_col, embedding_col)
        .withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h")
        .limit(max(sample_rows, num_cells))
        .collect()
    )
    mat = np.array([list(r[embedding_col]) for r in sample], dtype="float64")
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    # a corpus smaller than num_cells simply gets fewer cells
    num_cells = min(num_cells, len(mat))
    cm = mat[:num_cells].copy()
    cm = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
    for _ in range(max(0, iterations)):
        assign = np.argmax(mat @ cm.T, axis=1)
        new = np.zeros_like(cm)
        np.add.at(new, assign, mat)
        counts = np.bincount(assign, minlength=num_cells)
        empty = counts == 0
        norms = np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        new = new / norms
        new[empty] = cm[empty]
        if np.allclose(new, cm, atol=1e-9):
            cm = new
            break
        cm = new
    return cm


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    num_cells: int = 16,
    nprobe: int = 4,
    kmeans_iterations: int = 8,
) -> DataFrame:
    """IVF-style approximate top-k.

    Index: ``num_cells`` spherical-k-means centroids trained on a bounded
    deterministic sample (``kmeans_iterations=0`` falls back to the raw
    hash-min seed rows); every corpus vector is assigned to its nearest
    centroid by a numpy-vectorized pandas UDF (one matmul per Arrow batch).
    Probe: each query searches its ``nprobe`` nearest cells only — candidate
    generation is an equi-join on cell id, O(corpus/num_cells * nprobe) per
    query.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    cm_norm = _kmeans_centroids(
        corpus, embedding_col, id_col, num_cells, iterations=kmeans_iterations
    )

    def _cells(n: int):
        @pandas_udf(ArrayType(IntegerType()))
        def nearest_cells(embs):
            mat = np.array([list(v) for v in embs], dtype="float64")
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ cm_norm.T  # batch matmul: cosine to every centroid
            top = np.argsort(-sims, axis=1)[:, :n]
            return pd.Series([row.tolist() for row in top])

        return nearest_cells

    c = corpus.select(
        F.col(id_col).alias("neighbour_id"),
        F.col(embedding_col).alias("__c_emb"),
        F.element_at(_cells(1)(F.col(embedding_col)), 1).alias("__cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(embedding_col).alias("__q_emb"),
        F.explode(_cells(nprobe)(F.col(embedding_col))).alias("__cell"),
    )
    cand = c.join(F.broadcast(q), on="__cell").where(
        F.col("neighbour_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbour_id",
        _sim(F.col("__q_emb"), F.col("__c_emb")).alias("cosine_sim"),
    ).dropDuplicates(["query_id", "neighbour_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbour_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbour_id", "cosine_sim")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    num_tables: int = 4,
    dim: Optional[int] = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing any of
    ``num_tables`` LSH bucket signatures with the query, then exact cosine
    rank within candidates."""
    if dim is None:
        dim = len(corpus.select(embedding_col).first()[0])
    cand = None
    for t in range(num_tables):
        planes = random_hyperplanes(dim, num_planes, seed=seed + 1000 * t)
        sig = lambda col: lsh_bucket_signature(col, planes)  # noqa: E731
        c = corpus.select(
            F.col(id_col).alias("neighbour_id"),
            F.col(embedding_col).alias("__c_emb"),
            sig(F.col(embedding_col)).alias("__bucket"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(embedding_col).alias("__q_emb"),
            sig(F.col(embedding_col)).alias("__bucket"),
        )
        pairs = c.join(F.broadcast(q), on="__bucket").where(
            F.col("neighbour_id") != F.col("query_id")
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["query_id", "neighbour_id"])
    scored = cand.select(
        "query_id",
        "neighbour_id",
        _sim(F.col("__q_emb"), F.col("__c_emb")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbour_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbour_id", "cosine_sim")
    )
