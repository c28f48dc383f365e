"""Embedding-matrix operators: distributed covariance and PCA.

PCA is the standard preprocessing for embedding-space pipeline stages
(SemDeDup and friends run on PCA-reduced embeddings; IVF coarse quantizers
train faster in the reduced space).

Scale design — the one-pass partial-aggregate pattern:

- ``embedding_covariance`` computes per-PARTITION partials with
  ``mapInPandas`` (numpy ``X.T @ X``, column sums, row count accumulated
  across the partition's Arrow batches, emitted ONCE per partition as
  ``d*(d+1)/2 + d + 1`` tiny (idx, val) rows), then one groupBy(idx) sum.
  Data crosses the wire only as ``partitions * O(d^2)`` doubles — the
  input embeddings are scanned exactly once and never shuffled. This is
  the shape that survives d in the hundreds where a column-expression
  formulation (d^2 codegen'd sum expressions) would not compile sensibly.
- ``pca_fit`` collects the d x d covariance (model state, O(d^2) on the
  driver by definition) and eigensolves with numpy.
- ``pca_transform`` projects with pure Column arithmetic (zip_with dot
  products against literal component vectors) — whole-stage codegen, no
  Python, applicable to an unbounded scoring stream.

Eigenvector sign is fixed by convention (largest-|coefficient| entry made
positive) so results are deterministic across runs and platforms up to
eigenvalue ties.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial_schema() -> str:
    return "idx long, val double"


def embedding_covariance(
    df: DataFrame,
    embedding_col: str = "embedding",
    *,
    dim: Optional[int] = None,
    quantize_scale: Optional[int] = None,
) -> DataFrame:
    """Population covariance matrix of an ``array<float/double>`` column as
    a (i, j, cov) DataFrame (full d x d, computed from the upper triangle).

    One scan: per-partition numpy partials -> groupBy(idx) sum ->
    d*(d+1)/2 + d + 1 aggregated cells -> covariance entries. NULL or
    wrong-length embeddings are dropped (counted out of n).

    ``quantize_scale`` (e.g. ``10**6``) switches to exact integer
    accumulation: each element is quantized JVM-side to
    ``round(x * scale)`` (Spark's HALF_UP round — identical to
    std::round half-away-from-zero on the same double), and the moment
    sums are exact int64 partials merged as decimal(38,0) — the result is
    bit-identical however the rows are partitioned, and any other engine
    replaying the quantized arithmetic reproduces it digit-for-digit
    (the float path's X^T X partials accumulate in partition order, so
    last-ulp drift can flip a rounded digit across engines). The exact
    path adds a ``cov_p12`` column: the covariance in exact
    parts-per-10^12, ``trunc((n*Sqq - Sq_i*Sq_j) * 10^12 / (n^2 *
    scale^2))`` over pure integers — the cross-engine comparison key.
    """
    import numpy as np

    if dim is None:
        first = df.select(F.size(embedding_col).alias("d")).first()
        if first is None or first["d"] is None:
            raise ValueError("cannot infer embedding dimension from empty input")
        dim = int(first["d"])
    d = dim
    n_tri = d * (d + 1) // 2
    tri_i, tri_j = [], []
    for i in range(d):
        for j in range(i, d):
            tri_i.append(i)
            tri_j.append(j)
    tri_i_arr, tri_j_arr = (list(tri_i), list(tri_j))

    src = df.select(F.col(embedding_col).cast("array<double>").alias("e")).where(
        F.col("e").isNotNull() & (F.size("e") == d)
    )
    exact = quantize_scale is not None
    if exact:
        s = int(quantize_scale)
        # quantize JVM-side: F.round is exact-decimal HALF_UP on the
        # binary double — the one rounding rule every engine reproduces
        src = src.select(
            F.transform(
                "e", lambda x: F.round(x * F.lit(s)).cast("long")
            ).alias("e")
        )

    def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        acc_dtype = np.int64 if exact else np.float64
        idx = list(range(n_tri + d + 1))

        def flush(xtx, colsum, count):
            vals = [xtx[i, j] for i, j in zip(tri_i_arr, tri_j_arr)]
            vals.extend(colsum.tolist())
            vals.append(acc_dtype(count))
            return pd.DataFrame(
                {"idx": idx, "val": np.asarray(vals, dtype=acc_dtype)}
            )

        xtx = np.zeros((d, d), dtype=acc_dtype)
        colsum = np.zeros(d, dtype=acc_dtype)
        count = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(acc_dtype, copy=False)
            xtx += x.T @ x
            colsum += x.sum(axis=0)
            count += x.shape[0]
            if exact and count >= 100_000:
                # int64 headroom: |q| <= scale * |x|; flushing the
                # partial every 100k rows keeps Sum(q_i * q_j) far from
                # 2^63 even for scale=1e6 — the cross-partial merge
                # happens in decimal(38,0) on the Spark side
                yield flush(xtx, colsum, count)
                xtx = np.zeros((d, d), dtype=acc_dtype)
                colsum = np.zeros(d, dtype=acc_dtype)
                count = 0
        if count:
            yield flush(xtx, colsum, count)

    schema = "idx long, val long" if exact else _partial_schema()
    sum_col = (
        F.sum(F.col("val").cast("decimal(38,0)")) if exact else F.sum("val")
    )
    agg = (
        src.mapInPandas(partials, schema)
        .groupBy("idx")
        .agg(sum_col.alias("val"))
    )

    # decode: one tiny collect of n_tri + d + 1 cells (model state)
    raw = {r["idx"]: r["val"] for r in agg.collect()}
    if exact:
        cells = {k: int(v) for k, v in raw.items()}
    else:
        cells = raw
    n = cells.get(n_tri + d, 0)
    if not n:
        raise ValueError("no valid embeddings to aggregate")
    rows = []
    if exact:
        n = int(n)
        s2 = int(quantize_scale) ** 2
        den = n * n * s2
        p12 = 10**12
        for t, (i, j) in enumerate(zip(tri_i_arr, tri_j_arr)):
            num = n * cells[t] - cells[n_tri + i] * cells[n_tri + j]
            # float expression ordered exactly as SQL would write it:
            # double(S)/double(n) per moment, then subtract, then scale
            cov = (
                float(n * cells[t] - cells[n_tri + i] * cells[n_tri + j])
                / float(den)
            )
            # truncating integer division (Spark `div` / DuckDB `//`
            # semantics, NOT Python floor) over exact ints
            q = abs(num) * p12 // den
            cov_p12 = q if num >= 0 else -q
            rows.append((i, j, cov, cov_p12))
            if i != j:
                rows.append((j, i, cov, cov_p12))
        spark = df.sparkSession
        out = spark.createDataFrame(
            rows, "i int, j int, cov double, cov_p12 long"
        )
        mean = [cells[n_tri + i] / n for i in range(d)]
    else:
        mean = [cells[n_tri + i] / n for i in range(d)]
        for t, (i, j) in enumerate(zip(tri_i_arr, tri_j_arr)):
            cov = cells[t] / n - mean[i] * mean[j]
            rows.append((i, j, cov))
            if i != j:
                rows.append((j, i, cov))
        spark = df.sparkSession
        out = spark.createDataFrame(rows, "i int, j int, cov double")
    out._splink_cov_meta = {"n": int(n), "mean": mean, "dim": d}  # type: ignore[attr-defined]
    return out


def pca_fit(
    df: DataFrame,
    embedding_col: str = "embedding",
    k: int = 8,
    *,
    dim: Optional[int] = None,
) -> dict:
    """Fit PCA: distributed covariance + driver eigensolve (numpy.eigh on
    the d x d matrix — O(d^3) driver work, independent of row count).

    Returns ``{"mean", "components" (k x d, rows = principal axes,
    descending eigenvalue), "explained_variance", "explained_variance_ratio",
    "dim", "k", "n"}``.
    """
    import numpy as np

    cov_df = embedding_covariance(df, embedding_col, dim=dim)
    meta = cov_df._splink_cov_meta  # type: ignore[attr-defined]
    d = meta["dim"]
    cov = np.zeros((d, d))
    for r in cov_df.collect():
        cov[r["i"], r["j"]] = r["cov"]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    out_evals = []
    for ix in order:
        v = evecs[:, ix]
        # deterministic sign: largest-|coeff| entry positive
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        out_evals.append(float(max(evals[ix], 0.0)))
    total_var = float(max(np.trace(cov), 1e-300))
    return {
        "mean": [float(m) for m in meta["mean"]],
        "components": comps,
        "explained_variance": out_evals,
        "explained_variance_ratio": [e / total_var for e in out_evals],
        "dim": d,
        "k": len(comps),
        "n": meta["n"],
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    embedding_col: str = "embedding",
    output_col: str = "pca",
) -> DataFrame:
    """Project embeddings onto the fitted components — pure Column
    arithmetic (k zip_with dot products against literal axes), no Python."""
    e = F.col(embedding_col).cast("array<double>")
    mean = model["mean"]
    centered = F.zip_with(
        e, F.array(*[F.lit(m) for m in mean]), lambda a, b: a - b
    )
    projections = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(c) for c in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for comp in model["components"]
    ]
    return df.withColumn(output_col, F.array(*projections))


# ---------------------------------------------------------------------------
# Scalar quantization (per-dimension symmetric int8/intN)
# ---------------------------------------------------------------------------


def absmax_fit(
    df: DataFrame,
    embedding_col: str = "embedding",
    *,
    dim: Optional[int] = None,
) -> list:
    """Per-dimension max(|x|) over the corpus — the scalar-quantization
    calibration pass.  Same one-scan partial-aggregate shape as
    ``embedding_covariance``: per-partition numpy partials (d tiny rows on
    the wire per partition), one groupBy(idx) max, one d-row collect.
    max() is order-independent, so the result is bit-exact in any engine.
    """
    if dim is None:
        first = df.select(F.size(embedding_col).alias("d")).first()
        if first is None or first["d"] is None:
            raise ValueError("cannot infer embedding dimension from empty input")
        dim = int(first["d"])
    d = dim
    src = df.select(F.col(embedding_col).cast("array<double>").alias("e")).where(
        F.col("e").isNotNull() & (F.size("e") == d)
    )

    def partials(batches):
        import numpy as np
        import pandas as pd

        am = np.zeros(d, dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf["e"].to_numpy())
            am = np.maximum(am, np.abs(x).max(axis=0))
            seen = True
        if seen:
            yield pd.DataFrame({"idx": list(range(d)), "val": am.tolist()})

    agg = (
        src.mapInPandas(partials, _partial_schema())
        .groupBy("idx")
        .agg(F.max("val").alias("val"))
    )
    cells = {r["idx"]: r["val"] for r in agg.collect()}
    if not cells:
        raise ValueError("no valid embeddings to calibrate")
    return [float(cells[i]) for i in range(d)]


def quantize_embeddings(
    df: DataFrame,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    bits: int = 8,
    absmax: Optional[list] = None,
    output_col: str = "q",
) -> DataFrame:
    """Symmetric per-dimension scalar quantization of an embedding column
    to ``bits``-bit integers: ``q_i = round(x_i / (absmax_i / L))`` with
    ``L = 2^(bits-1) - 1`` (127 for int8) — the standard SQ8 storage format
    for billion-vector ANN corpora (4x smaller than float32, integer dot
    products).

    Scale design: calibration is one corpus scan (``absmax_fit``); the
    quantization itself is a pure codegen projection — ``F.transform`` of
    the array against a d-element literal scale vector, no Python, no
    shuffle, applicable to an unbounded stream.  The d scales are the only
    driver state.  Cross-engine exactness: max is order-independent, the
    scale division and round-half-away-from-zero match any SQL engine
    (Spark HALF_UP == DuckDB round), so q is bit-identical — the
    ``embedding_quantize`` oracle gate replays the whole pipeline in SQL.

    Returns the input columns plus ``output_col`` (array<int>); the fitted
    scales are attached as ``result._splink_sq_meta`` and accepted back via
    ``absmax=`` to quantize new batches against a frozen calibration.
    """
    levels = (1 << (bits - 1)) - 1
    if absmax is None:
        absmax = absmax_fit(df, embedding_col)
    scales = [a / float(levels) for a in absmax]
    scale_arr = F.array(*[F.lit(s) for s in scales])
    e = F.col(embedding_col).cast("array<double>")
    q = F.zip_with(
        e,
        scale_arr,
        lambda x, s: F.when(s == 0.0, F.lit(0)).otherwise(
            F.round(x / s).cast("int")
        ),
    )
    out = df.withColumn(output_col, q)
    out._splink_sq_meta = {"absmax": absmax, "scales": scales, "bits": bits}  # type: ignore[attr-defined]
    return out


def dequantize_expr(q_col, scales: list):
    """Reconstruction expression for a quantized column: ``q_i * scale_i``
    (pure Column arithmetic)."""
    scale_arr = F.array(*[F.lit(float(s)) for s in scales])
    return F.zip_with(
        F.col(q_col) if isinstance(q_col, str) else q_col,
        scale_arr,
        lambda v, s: v.cast("double") * s,
    )
