"""Data-layout utilities: Z-order (Morton) clustering keys for
multi-column data skipping.

Why this matters at 100 TB: parquet/Delta min-max pruning only skips
files when the data is CLUSTERED on the filter columns. Sorting on
(a, b) gives perfect pruning on `a`, nearly none on `b`; sorting on the
interleaved-bit Morton code of (a, b) gives good pruning on BOTH — each
file covers a small hyper-rectangle of the key space. This is the same
mechanism behind Delta Lake's OPTIMIZE ZORDER BY.

Everything here is exact integer bit arithmetic (shift/or on int64),
constant-folded by codegen and bit-for-bit replayable in any SQL engine
— no hashing, no floats.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_uniform", "zorder_key", "zorder_sort"]


def quantize_uniform(
    col: Column, cmin: int, cmax: int, bits: int = 16
) -> Column:
    """Map an integer column linearly onto [0, 2^bits): exact integer
    arithmetic ``((v - min) * (2^bits - 1)) div max(1, max - min)`` —
    engine-portable (`div`, not float division). Values outside
    [cmin, cmax] clamp."""
    span = max(1, int(cmax) - int(cmin))
    top = (1 << int(bits)) - 1
    v = F.greatest(
        F.lit(int(cmin)), F.least(F.lit(int(cmax)), col.cast("bigint"))
    )
    # `div` invoked as a named function: Column-composed (no _jc, so it
    # works under Spark Connect and with any column name), same
    # truncating integer division as the `div` operator
    return F.call_function(
        "div", (v - F.lit(int(cmin))) * F.lit(top), F.lit(span)
    )


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of each (already
    quantized, non-negative) column — bit i of column j lands at output
    position ``i * n_cols + j``. ``bits * n_cols`` must be <= 63."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError("bits * n_cols must fit in int64")
    z = F.lit(0).cast("bigint")
    for i in range(int(bits)):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_sort(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    z_col: str = "z_value",
    keep_key: bool = False,
) -> DataFrame:
    """Cluster ``df`` by the Morton code of ``cols`` (integer columns):
    one min/max aggregate per call (a single one-row job) fixes the
    quantization range, then a range-partitioned sort on the z-value —
    the write-side layout pass you run before a big parquet/Delta dump
    so downstream scans prune files on ANY of ``cols``.

    ``keep_key=True`` keeps ``z_col`` in the output (the gate uses it);
    otherwise the key is dropped after sorting.
    """
    stats = df.agg(
        *[F.min(c).cast("bigint").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("bigint").alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    # an all-NULL (or empty) clustered column has no min/max stats: it
    # contributes nothing to pruning, so give it a constant 0 lane
    # instead of crashing on int(None)
    qs = [
        quantize_uniform(
            F.col(c), stats[f"__mn_{c}"], stats[f"__mx_{c}"], bits
        )
        if stats[f"__mn_{c}"] is not None
        else F.lit(0).cast("bigint")
        for c in cols
    ]
    # global clustering: range-repartition on the key, then local sort
    out = (
        df.withColumn(z_col, zorder_key(qs, bits))
        .repartitionByRange(z_col)
        .sortWithinPartitions(z_col)
    )
    return out if keep_key else out.drop(z_col)
