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

from ..internals.misc import optimizer_barrier_numeric

__all__ = [
    "quantize_uniform",
    "zorder_key",
    "zorder_sort",
    "hilbert_key",
    "hilbert_index",
    "hilbert_index_vectorized",
    "hilbert_sort",
    "geohash_key",
]


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


def _hilbert_level(
    xc: Column, yc: Column, d: Column, level: int
) -> "tuple[Column, Column, Column]":
    """One level of the classic Hilbert xy→d walk (the public-domain
    formulation on the Hilbert curve Wikipedia page):
    ``rx = (x >> l) & 1; ry = (y >> l) & 1; d += s*s*((3*rx) XOR ry)``
    then the quadrant rotation — if ``ry == 0`` swap x/y, flipping both
    to ``s-1-…`` when ``rx == 1``. Pure integer shift/and/xor/when."""
    s = 1 << level
    rx = F.shiftright(xc, level).bitwiseAND(F.lit(1))
    ry = F.shiftright(yc, level).bitwiseAND(F.lit(1))
    nd = d + F.lit(s) * F.lit(s) * ((rx * F.lit(3)).bitwiseXOR(ry))
    nx = F.when(
        ry == 0, F.when(rx == 1, F.lit(s - 1) - yc).otherwise(yc)
    ).otherwise(xc)
    ny = F.when(
        ry == 0, F.when(rx == 1, F.lit(s - 1) - xc).otherwise(xc)
    ).otherwise(yc)
    return nx, ny, nd


def hilbert_key(x: Column, y: Column, bits: int = 6) -> Column:
    """Hilbert-curve index of two (already quantized, non-negative)
    columns as a single Column expression.

    Why over Z-order: the Hilbert curve never makes the long diagonal
    jumps Morton codes make at quadrant boundaries, so consecutive key
    ranges cover tighter rectangles — measurably better min-max file
    pruning on BOTH columns at the same file count (this is what Delta
    Lake's liquid clustering moved to). Z-order still wins for >2
    columns (Hilbert's rotation logic is 2-D here); ``zorder_key``
    remains the n-column path.

    EXPRESSION-SIZE LIMIT: each level's x/y rewrite references the
    previous level's x AND y several times, so the inline expression
    tree multiplies ~5x per level. MEASURED: 6 levels (~15k nodes,
    4096 cells — plenty for ad-hoc keys) analyzes instantly; 8 levels
    is a ~400k-node tree that takes tens of seconds to analyze and
    OOMs a shared 4g driver heap intermittently; 16 levels OOMs
    Catalyst ANALYSIS outright. ``bits`` is therefore capped at 6
    here; use ``hilbert_index`` (the staged DataFrame form,
    constant-size per level) for anything deeper — it is also the
    faster path at every depth.
    """
    if int(bits) > 6:
        raise ValueError(
            "hilbert_key inlines the walk and is capped at bits=6 "
            "(expression tree multiplies ~5x per level; 8 levels "
            "intermittently OOMs a 4g driver); use hilbert_index "
            "for deeper curves"
        )
    xc = x.cast("bigint")
    yc = y.cast("bigint")
    d = F.lit(0).cast("bigint")
    for level in range(int(bits) - 1, -1, -1):
        xc, yc, d = _hilbert_level(xc, yc, d, level)
    return d


def hilbert_index(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "h_value",
    levels_per_stage: int = 4,
) -> DataFrame:
    """Hilbert-curve index as a staged DataFrame pass: the walk's
    levels are grouped into stages of ``levels_per_stage`` — WITHIN a
    stage the level updates compose inline (the tree multiplies ~5× per
    level, so 4 levels ≈ 600 expression nodes — cheap for codegen),
    and BETWEEN stages the x/y/d state is staged as named columns, so a
    16-bit curve is 4 narrow Projects instead of one million-node
    expression (which OOMs Catalyst analysis — see ``hilbert_key``).
    Stage boundaries sit behind ``optimizer_barrier_numeric`` (the
    allocation-free ``+ rand*0`` form) because CollapseProject would
    otherwise substitute each stage into the next and rebuild the
    exponential tree the staging exists to avoid (same pattern as the
    token-array staging in curation). MEASURED at 10M rows: per-level
    staging with the array barrier (16 stages) cost 16× the Morton
    sort; 4-level batching + the numeric barrier cut the walk ~3×
    again (5M rows: 40s → 14s).

    ``x_col``/``y_col`` must already be quantized non-negative integers
    (``quantize_uniform``); ``2*bits`` must be <= 63;
    ``levels_per_stage`` is capped at 6 (tree growth is exponential).
    """
    if 2 * int(bits) > 63:
        raise ValueError("2 * bits must fit in int64")
    if not 1 <= int(levels_per_stage) <= 6:
        raise ValueError("levels_per_stage must be in [1, 6]")
    keep = [c for c in df.columns if c != out_col]
    out = df.select(
        *keep,
        F.col(x_col).cast("bigint").alias("__hx"),
        F.col(y_col).cast("bigint").alias("__hy"),
        F.lit(0).cast("bigint").alias(out_col),
    )
    levels = list(range(int(bits) - 1, -1, -1))
    step = int(levels_per_stage)
    for start in range(0, len(levels), step):
        xc, yc, d = F.col("__hx"), F.col("__hy"), F.col(out_col)
        for level in levels[start : start + step]:
            xc, yc, d = _hilbert_level(xc, yc, d, level)
        out = out.select(
            *keep,
            optimizer_barrier_numeric(xc).alias("__hx"),
            optimizer_barrier_numeric(yc).alias("__hy"),
            optimizer_barrier_numeric(d).alias(out_col),
        )
    return out.drop("__hx", "__hy")


def _hilbert_d_numpy(x, y, bits: int):
    """Vectorized Hilbert xy→d walk over int64 numpy arrays — the same
    level recurrence as :func:`_hilbert_level`, verbatim (parity-tested
    against the staged Column walk), executed as C-speed array ops."""
    import numpy as np

    x = x.astype(np.int64, copy=True)
    y = y.astype(np.int64, copy=True)
    d = np.zeros_like(x)
    for level in range(int(bits) - 1, -1, -1):
        s = np.int64(1) << np.int64(level)
        rx = (x >> np.int64(level)) & np.int64(1)
        ry = (y >> np.int64(level)) & np.int64(1)
        d += s * s * ((np.int64(3) * rx) ^ ry)
        swap = ry == 0
        flip = swap & (rx == 1)
        nx = np.where(swap, np.where(flip, s - 1 - y, y), x)
        ny = np.where(swap, np.where(flip, s - 1 - x, x), y)
        x, y = nx, ny
    return d


def hilbert_index_vectorized(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "h_value",
) -> DataFrame:
    """Hilbert-curve index via one Arrow-batched ``mapInPandas`` pass:
    numpy bit-twiddling computes the whole walk per batch at C speed —
    measured ~10× the staged Column walk at 100M rows (the walk's
    per-level x/y rewrite is the wrong substrate for codegen: 16 levels
    of WHEN-chains never collapse into tight loops). Pure map — no
    shuffle, scales with partitions like any projection.

    Same contract as :func:`hilbert_index` (which stays as the
    engine-portable / oracle-parity reference): ``x_col``/``y_col``
    already-quantized non-negative ints, ``2*bits <= 63``. Bit-equal
    output — pytest pins the parity on random inputs.
    """
    if 2 * int(bits) > 63:
        raise ValueError("2 * bits must fit in int64")
    from pyspark.sql.types import LongType, StructField, StructType

    keep = [c for c in df.columns if c != out_col]
    base = df.select(*keep)
    schema = StructType(
        list(base.schema.fields) + [StructField(out_col, LongType())]
    )
    b = int(bits)

    def compute(batches):
        for pdf in batches:
            x = pdf[x_col].to_numpy(dtype="int64")
            y = pdf[y_col].to_numpy(dtype="int64")
            out = pdf.copy()
            out[out_col] = _hilbert_d_numpy(x, y, b)
            yield out

    return base.mapInPandas(compute, schema)


def hilbert_sort(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    h_col: str = "h_value",
    keep_key: bool = False,
    engine: str = "vectorized",
) -> DataFrame:
    """Cluster ``df`` by the Hilbert index of exactly two integer
    columns — same stats-probe + range-partitioned sort shape as
    ``zorder_sort`` (one one-row min/max job, all-NULL columns get a
    constant lane instead of crashing), different space-filling curve.

    ``engine="vectorized"`` (default) computes the walk via
    :func:`hilbert_index_vectorized` (numpy ``mapInPandas`` — the 100M
    scale path); ``engine="staged"`` uses the pure-Column staged walk
    (engine-portable arithmetic, the oracle-parity reference). Both
    produce bit-identical keys. The vectorized path needs an
    Arrow-capable runtime (pandas + pyarrow + numpy); when those imports
    fail the default silently falls back to the pure-Column staged walk,
    so the API stays usable on a JVM-only client.
    """
    if len(cols) != 2:
        raise ValueError("hilbert_sort clusters exactly 2 columns")
    if engine not in ("vectorized", "staged"):
        raise ValueError("engine must be 'vectorized' or 'staged'")
    if engine == "vectorized":
        try:  # pragma: no cover - environment-dependent
            import numpy  # noqa: F401
            import pandas  # noqa: F401
            import pyarrow  # noqa: F401
        except ImportError:
            # loud downgrade: at 100M+ rows the staged Column walk is ~3x
            # the vectorized engine, and a silently broken Arrow install
            # would otherwise read as an unexplained perf regression
            import warnings

            warnings.warn(
                "hilbert_sort: pandas/pyarrow/numpy unavailable — falling "
                "back from engine='vectorized' to the staged Column walk "
                "(same keys, slower at scale)",
                RuntimeWarning,
                stacklevel=2,
            )
            engine = "staged"
    stats = df.agg(
        *[F.min(c).cast("bigint").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("bigint").alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    quantized = df
    qnames = []
    for c in cols:
        qn = f"__q_{c}"
        qnames.append(qn)
        quantized = quantized.withColumn(
            qn,
            quantize_uniform(
                F.col(c), stats[f"__mn_{c}"], stats[f"__mx_{c}"], bits
            )
            if stats[f"__mn_{c}"] is not None
            else F.lit(0).cast("bigint"),
        )
    indexer = (
        hilbert_index_vectorized if engine == "vectorized" else hilbert_index
    )
    out = (
        indexer(quantized, qnames[0], qnames[1], bits, h_col)
        .drop(*qnames)
        .repartitionByRange(h_col)
        .sortWithinPartitions(h_col)
    )
    return out if keep_key else out.drop(h_col)


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_key(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Standard geohash of (lat, lon) as pure Column arithmetic — the
    spatial cousin of ``zorder_key``: a geohash IS a Morton interleave
    of quantized longitude/latitude rendered in base32 (lon takes the
    even bit positions starting at the MSB, per the public geohash
    spec), so rows sorted by it cluster spatially and prefix matches
    are bounding-box containment. Deterministic double quantization
    (same ops both engines), integer bit assembly, and base32 chars via
    substring on a literal alphabet — no UDF, engine-replayable.

    ``precision`` is the output length in characters (5 bits each);
    out-of-range coordinates clamp to the poles/antimeridian cell.
    """
    if not 1 <= int(precision) <= 12:
        raise ValueError("precision must be in [1, 12]")
    total = 5 * int(precision)
    nlon = (total + 1) // 2
    nlat = total // 2
    qlon = F.least(
        F.lit((1 << nlon) - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (lon.cast("double") + F.lit(180.0))
                / F.lit(360.0)
                * F.lit(float(1 << nlon))
            ).cast("bigint"),
        ),
    )
    qlat = F.least(
        F.lit((1 << nlat) - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (lat.cast("double") + F.lit(90.0))
                / F.lit(180.0)
                * F.lit(float(1 << nlat))
            ).cast("bigint"),
        ),
    )
    z = F.lit(0).cast("bigint")
    for p in range(total):
        # even positions (0-based from the MSB) take longitude bits
        if p % 2 == 0:
            bit = F.shiftright(qlon, nlon - 1 - p // 2).bitwiseAND(F.lit(1))
        else:
            bit = F.shiftright(qlat, nlat - 1 - p // 2).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit, total - 1 - p))
    chars = []
    alpha = F.lit(_GEOHASH32)
    for g in range(int(precision)):
        idx = F.shiftright(z, 5 * (int(precision) - 1 - g)).bitwiseAND(
            F.lit(31)
        )
        chars.append(alpha.substr(idx.cast("int") + F.lit(1), F.lit(1)))
    return F.concat(*chars)
