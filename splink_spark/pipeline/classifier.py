"""Distributed quality classifier: full-batch logistic regression trained
with gradient descent expressed as DataFrame aggregations.

Scale design (the reason this exists as a first-class pipeline operator):
each GD iteration is ONE scan of the persisted feature frame producing
``k + 1`` partial averages — map-side partial aggregation, a tree of
``k + 1`` doubles per partition, no wide shuffle, model state is O(k) on
the driver. At 100 TB that is ``iterations`` sequential scans, each fully
parallel, which is the canonical distributed-GD layout (equivalent to
MLlib's treeAggregate loop but in plain DataFrame aggregations so Catalyst
keeps whole-stage codegen in the hot path).

Determinism: with fixed iterations / learning rate the trained weights are
a pure function of the input up to float summation order; the oracle gate
replays the identical iterations in DuckDB SQL (see __spark_entry__.py
``quality_classifier``) and matches after rounding.

This has no analogue in the reference linker (fasttext-style quality
filters sit upstream of record linkage); it is part of the
training-data-curation family alongside gopher_quality_flags and
decontaminate.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    # numerically safe in double precision: exp(-z) overflows to +inf for
    # very negative z, and 1/(1+inf) is exactly 0.0 — no NaN path
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logistic_regression_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    *,
    iterations: int = 12,
    learning_rate: float = 1.0,
    l2: float = 0.0,
    standardize: bool = True,
) -> dict:
    """Train logistic regression by full-batch gradient descent.

    Returns a plain-dict model::

        {"feature_cols", "weights", "bias", "means", "stds",
         "iterations", "learning_rate", "l2", "n", "final_loss"}

    ``means``/``stds`` record the standardization applied during training
    (identity if ``standardize=False``); :func:`logistic_regression_score`
    folds them back in so the model applies to raw feature columns.

    The gradient is ``avg((sigmoid(x·w + b) - y) * x_j)`` per feature plus
    the bias term — one ``agg`` per iteration over a persisted narrow
    projection of the input. No ``collect`` of data ever happens; only the
    ``k + 1`` aggregated doubles come back per iteration.
    """
    k = len(feature_cols)
    if k == 0:
        raise ValueError("feature_cols must be non-empty")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    data = df.select(
        *[F.col(c).cast("double").alias(f"x{i}") for i, c in enumerate(feature_cols)],
        F.col(label_col).cast("double").alias("y"),
    )
    # drop rows with any null feature/label: a null would silently shrink
    # the whole-batch averages (avg ignores nulls) while n counts the row
    complete = F.col("y").isNotNull()
    for i in range(k):
        complete = complete & F.col(f"x{i}").isNotNull()
    data = data.where(complete)

    means = [0.0] * k
    stds = [1.0] * k
    if standardize:
        stat_row = data.agg(
            *[F.avg(f"x{i}").alias(f"m{i}") for i in range(k)],
            *[F.stddev_pop(f"x{i}").alias(f"s{i}") for i in range(k)],
        ).first()
        means = [float(stat_row[f"m{i}"] or 0.0) for i in range(k)]
        stds = [float(stat_row[f"s{i}"] or 0.0) for i in range(k)]
        stds = [s if s > 0.0 else 1.0 for s in stds]
        data = data.select(
            *[
                ((F.col(f"x{i}") - F.lit(means[i])) / F.lit(stds[i])).alias(f"x{i}")
                for i in range(k)
            ],
            "y",
        )

    data = data.persist()
    try:
        n = data.count()
        if n == 0:
            raise ValueError("no complete rows to train on")

        w = [0.0] * k
        b = 0.0
        for _ in range(iterations):
            z = F.lit(b)
            for i in range(k):
                z = z + F.lit(w[i]) * F.col(f"x{i}")
            resid = _sigmoid(z) - F.col("y")
            row = data.agg(
                *[F.avg(resid * F.col(f"x{i}")).alias(f"g{i}") for i in range(k)],
                F.avg(resid).alias("gb"),
            ).first()
            w = [
                w[i] - learning_rate * (float(row[f"g{i}"]) + l2 * w[i])
                for i in range(k)
            ]
            b = b - learning_rate * float(row["gb"])

        # one extra scan for the final log-loss (reported, not used)
        z = F.lit(b)
        for i in range(k):
            z = z + F.lit(w[i]) * F.col(f"x{i}")
        p = _sigmoid(z)
        eps = F.lit(1e-12)
        loss_row = data.agg(
            F.avg(
                -(
                    F.col("y") * F.log(F.greatest(p, eps))
                    + (F.lit(1.0) - F.col("y")) * F.log(F.greatest(F.lit(1.0) - p, eps))
                )
            ).alias("loss")
        ).first()
        final_loss = float(loss_row["loss"])
    finally:
        data.unpersist()

    return {
        "feature_cols": list(feature_cols),
        "weights": w,
        "bias": b,
        "means": means,
        "stds": stds,
        "iterations": iterations,
        "learning_rate": learning_rate,
        "l2": l2,
        "n": n,
        "final_loss": final_loss,
    }


def logistic_regression_score(
    df: DataFrame,
    model: dict,
    *,
    output_col: str = "p",
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Apply a :func:`logistic_regression_fit` model to raw feature columns.

    Standardization is folded into the linear form (``(x - m) / s`` per
    feature) so the expression stays a single whole-stage-codegen
    projection — no join, no UDF, applicable to an unbounded stream of
    documents.
    """
    feats = model["feature_cols"]
    z = F.lit(float(model["bias"]))
    for i, c in enumerate(feats):
        m = float(model["means"][i])
        s = float(model["stds"][i]) or 1.0
        z = z + F.lit(float(model["weights"][i])) * (
            (F.col(c).cast("double") - F.lit(m)) / F.lit(s)
        )
    cols = list(keep_cols) if keep_cols is not None else df.columns
    return df.select(*cols, _sigmoid(z).alias(output_col))


def quality_classifier(
    docs: DataFrame,
    label_col: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    iterations: int = 12,
    learning_rate: float = 1.0,
) -> DataFrame:
    """End-to-end quality classifier over a documents table.

    Derives three cheap, engine-portable features per document —
    ``log1p(n_chars)``, whitespace token count, and mean token length —
    trains logistic regression against ``label_col`` (0/1), and returns
    ``(id_col, p)`` scored over the full table. The features are Column
    expressions only; both fit and score stay JVM-side.
    """
    c = F.trim(F.col(text_col))
    n_chars = F.length(F.col(text_col)).cast("double")
    n_tokens = (
        F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))
    ).cast("double")
    feats = docs.select(
        F.col(id_col),
        F.log1p(n_chars).alias("f_logchars"),
        n_tokens.alias("f_tokens"),
        (n_chars / F.greatest(n_tokens, F.lit(1.0))).alias("f_avg_tok_len"),
        F.col(label_col).cast("double").alias("y"),
    )
    model = logistic_regression_fit(
        feats,
        ["f_logchars", "f_tokens", "f_avg_tok_len"],
        "y",
        iterations=iterations,
        learning_rate=learning_rate,
    )
    return logistic_regression_score(
        feats, model, output_col="p", keep_cols=[id_col]
    )


def fit_reference_numpy(x, y, *, iterations=12, learning_rate=1.0, l2=0.0):
    """Pure-Python reference implementation (lists of lists) for tests —
    identical math, serial summation."""
    n = len(x)
    k = len(x[0])
    means = [sum(r[i] for r in x) / n for i in range(k)]
    stds = [
        math.sqrt(sum((r[i] - means[i]) ** 2 for r in x) / n) or 1.0 for i in range(k)
    ]
    xs = [[(r[i] - means[i]) / stds[i] for i in range(k)] for r in x]
    w = [0.0] * k
    b = 0.0
    for _ in range(iterations):
        grads = [0.0] * k
        gb = 0.0
        for r, yy in zip(xs, y):
            z = b + sum(w[i] * r[i] for i in range(k))
            p = 1.0 / (1.0 + math.exp(-z))
            d = p - yy
            gb += d
            for i in range(k):
                grads[i] += d * r[i]
        w = [w[i] - learning_rate * (grads[i] / n + l2 * w[i]) for i in range(k)]
        b -= learning_rate * (gb / n)
    return {"weights": w, "bias": b, "means": means, "stds": stds}
