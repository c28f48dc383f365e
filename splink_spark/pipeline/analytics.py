"""Generic distributed analytics primitives. Currently: exact top-k per
group with a scale-safe physical plan.

Spark has a global top-k physical operator (TakeOrderedAndProject) but
nothing per-group: the idiomatic ``row_number() OVER (PARTITION BY g ORDER
BY v)`` sorts EVERY group in full — for a group holding 100M rows that is
a 100M-row sort (and spill) to keep k=10 rows. ``top_k_per_group`` keeps
the exact semantics but bounds the sorted input: an approximate per-group
cutoff (one map-side-combined sketch aggregation) pre-filters each group
to ~k·margin candidate rows, a survivor-count check detects any group
where the sketch over-cut (then that group falls back to its full rows),
and one exact window ranks the survivors. Output is bit-identical to the
plain window for every input — the sketch only shapes the PLAN.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "top_k_per_group",
    "group_quantiles",
    "group_moments",
    "group_outliers",
    "winsorize",
    "robust_outliers",
    "column_correlations",
    "histogram",
]

# percentile grid for the prefilter cutoff: the chosen fraction is the
# DEEPEST grid point at or below the needed depth, so the cutoff can only
# be too permissive (more survivors), never silently too aggressive —
# the survivor-count check catches sketch rank error on top of that
_GRID = [
    0.0, 0.25, 0.5, 0.75, 0.9, 0.95, 0.98, 0.99,
    0.995, 0.998, 0.999, 0.9995, 0.9999,
]


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tie_cols: Optional[Sequence[str]] = None,
    method: str = "auto",
    margin: int = 8,
    large_group_rows: int = 100_000_000,
    accuracy: int = 10_000,
) -> DataFrame:
    """Exactly the top ``k`` rows of every group by ``order_col`` (desc by
    default), with ``__rank`` (1-based) added; ties broken by ``tie_cols``
    ascending — deterministic when the tie columns are a per-group key.

    ``method``: ``"window"`` = plain row_number (right for many small
    groups); ``"prefilter"`` = sketch-cutoff plan above (right when single
    groups are huge); ``"auto"`` probes max group size with one cheap
    aggregate and routes (same auto-router pattern as
    ``dedup.embedding_near_duplicates``). All three return identical rows.

    The ``large_group_rows`` default is deliberately high: MEASURED on
    local[32] (BENCH_SEARCH.json), the plain window's per-group sort beats
    the prefilter's three extra shuffles up to at least a 50M-row group
    (4.7s vs 13.9s) because 50M narrow rows still sort in executor memory.
    The prefilter pays off only when a single group's sort buffer exceeds
    executor memory (spill/OOM territory) — size the threshold to roughly
    ``executor_memory / row_width``, it is a memory bound, not a speed
    knob.
    """
    groups = list(group_cols)
    ties = list(tie_cols) if tie_cols else []
    ordv = F.col(order_col)
    order = [ordv.asc() if ascending else ordv.desc()] + [
        F.col(t).asc() for t in ties
    ]
    w = Window.partitionBy(*groups).orderBy(*order)

    def plain(frame: DataFrame) -> DataFrame:
        return (
            frame.withColumn("__rank", F.row_number().over(w))
            .where(F.col("__rank") <= k)
        )

    if method == "auto":
        probe = (
            df.groupBy(*groups)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .collect()
        )
        mx = probe[0]["mx"] if probe else 0
        method = "prefilter" if (mx or 0) > large_group_rows else "window"
    if method == "window":
        return plain(df)
    if method != "prefilter":
        raise ValueError(f"unknown method {method!r}")

    # NULL group keys never match an equi-join, so the prefilter joins
    # below would silently drop them while the window method ranks them
    # (partitionBy groups NULLs); route NULL-key rows straight into the
    # final window pool so all three methods return identical rows
    null_key = None
    for g in groups:
        c = F.col(g).isNull()
        null_key = c if null_key is None else (null_key | c)
    null_rows = df.where(null_key)
    df = df.where(~null_key)

    depth = k * margin
    cut = (
        df.groupBy(*groups).agg(
            F.count(F.lit(1)).alias("__n"),
            F.percentile_approx(
                order_col, [float(g) for g in _GRID], accuracy
            ).alias("__pcts"),
        )
    )
    # needed cutoff: keep ~depth rows per group — descending wants the
    # LARGEST grid fraction <= 1 - depth/n (deeper grid point => more
    # survivors => permissive), ascending the SMALLEST grid fraction
    # >= depth/n. A 13-arm CASE chain over the fixed grid, walked so the
    # last matching arm wins; no match => null cutoff => keep the whole
    # group (n <= depth: nothing to prune).
    n = F.col("__n").cast("double")
    cutoff = F.lit(None).cast(df.schema[order_col].dataType)
    walk = reversed(range(len(_GRID))) if ascending else range(len(_GRID))
    for i in walk:
        g = F.lit(float(_GRID[i]))
        cond = (
            g >= F.lit(float(depth)) / n
            if ascending
            else g <= F.lit(1.0) - F.lit(float(depth)) / n
        )
        cutoff = F.when(cond, F.element_at("__pcts", i + 1)).otherwise(cutoff)
    cut = cut.select(*groups, "__n", cutoff.alias("__cutoff"))

    # no broadcast hint on the cut/flags joins: they scale with GROUP
    # CARDINALITY, and a dataset with one huge group (what routes here)
    # plus millions of small ones would broadcast a multi-million-row
    # table — let AQE pick broadcast when the stats say it is small
    joined = df.join(cut, groups)
    keep = (
        F.col("__cutoff").isNull()
        | (ordv <= F.col("__cutoff") if ascending else ordv >= F.col("__cutoff"))
    )
    survivors = joined.where(keep)
    # sketch-error guard: a group is GOOD iff it kept at least min(k, n)
    # rows — otherwise the cutoff overshot and that group re-runs in full
    scount = survivors.groupBy(*groups).agg(F.count(F.lit(1)).alias("__s"))
    flags = cut.join(scount, groups, "left").select(
        *groups,
        (
            F.coalesce(F.col("__s"), F.lit(0))
            >= F.least(F.lit(int(k)), F.col("__n"))
        ).alias("__good"),
    )
    good = survivors.join(flags.where(F.col("__good")).select(*groups), groups)
    bad = joined.join(flags.where(~F.col("__good")).select(*groups), groups)
    pool = good.unionByName(bad).drop("__cutoff", "__n")
    return plain(pool.unionByName(null_rows))


def group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    fractions: Sequence[float] = (0.5, 0.9, 0.99),
    method: str = "lower",
) -> DataFrame:
    """EXACT per-group quantiles by rank selection: the q-quantile is the
    value at rank ``ceil(q * n)`` (``method="lower"``, type-1/inverted-CDF
    in the Hyndman–Fan taxonomy) or ``floor(q * n) + 1`` capped at n
    (``"upper"``). Selection, not interpolation — the result is an actual
    data value, so it is bit-identical in every engine (interpolated
    quantiles differ across engines in last-ulp float arithmetic).

    One ordered window per group (rank + group size in the same pass);
    each requested fraction filters to exactly one row per group.
    Output: (group cols…, ``fraction``, ``value``, ``n``). Nulls in
    ``value_col`` are excluded. For monster groups see
    ``top_k_per_group``'s notes — a quantile needs the middle of the
    sort, so there is no top-k shortcut; this is the honest full-sort
    per group.
    """
    if method not in ("lower", "upper"):
        raise ValueError(f"unknown method {method!r}")
    groups = list(group_cols)
    base = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*groups).orderBy(F.col(value_col).asc())
    ranked = base.select(
        *groups,
        F.col(value_col).alias("value"),
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(Window.partitionBy(*groups)).alias("n"),
    )
    fracs = [float(q) for q in fractions]
    if any(not 0.0 < q <= 1.0 for q in fracs):
        raise ValueError("fractions must be in (0, 1]")
    # ONE pass for every fraction: each ranked row explodes the (usually
    # empty) set of fractions whose target rank equals its own — a
    # per-fraction union of filters would re-run the window per fraction.
    # Target ranks use integer MICRO-UNIT arithmetic: ceil(0.9 * 100) is
    # 91 in binary floats; (900000 * 100 + 999999) div 1000000 is the
    # exact 90.
    farr = F.array(*[F.lit(round(q * 1_000_000)).alias("qm") for q in fracs])
    qlabel = {round(q * 1_000_000): q for q in fracs}

    def hits(qm):
        # exact while qm*n < 2^53, i.e. groups under ~9e9 rows — far past
        # where a full per-group sort is sane anyway
        prod = qm.cast("bigint") * F.col("n").cast("bigint")
        if method == "lower":
            target = F.greatest(
                F.lit(1).cast("bigint"),
                F.floor((prod + F.lit(999_999)) / F.lit(1_000_000)).cast("bigint"),
            )
        else:
            target = F.least(
                F.col("n").cast("bigint"),
                (F.floor(prod / F.lit(1_000_000)) + 1).cast("bigint"),
            )
        return target == F.col("__r")

    out = ranked.select(
        *groups,
        F.explode(F.filter(farr, hits)).alias("__qm"),
        "value",
        "n",
    )
    frac = F.lit(None).cast("double")
    for qm, q in qlabel.items():
        frac = F.when(F.col("__qm") == qm, F.lit(q)).otherwise(frac)
    return out.select(*groups, frac.alias("fraction"), "value", "n")


def group_moments(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group count / min / max / mean / population variance / stddev
    from EXACT integer sums: values quantize to integer millionths, and
    Σv and Σv² accumulate in decimal(38,0) — both sums are exact
    integers (no float summation order, no int64 overflow: v² ≤ 1e24,
    summable over 1e12 rows inside 38 digits), so ANY engine reproduces
    them digit-for-digit; only the final mean/variance division converts
    to double, and both engines IEEE-round the SAME exact integer, so
    the doubles match too. One map-side-combined aggregation pass.
    """
    groups = list(group_cols)
    v = F.expr(f"cast(round(`{value_col}` * 1000000, 0) as bigint)")
    vd = v.cast("decimal(38,0)")
    agg = (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, v.alias("__v"), vd.alias("__vd"))
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__v").alias("__mn"),
            F.max("__v").alias("__mx"),
            F.sum("__vd").alias("__s1"),
            F.sum((F.col("__vd") * F.col("__vd")).cast("decimal(38,0)")).alias(
                "__s2"
            ),
        )
    )
    m = 1_000_000.0
    nd = F.col("n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    mean = s1 / m / nd
    # population variance in micro-units²: s2/n - (s1/n)²; both terms from
    # exact integer sums cast identically in every engine
    var = (s2 / nd - (s1 / nd) * (s1 / nd)) / F.lit(m * m)
    var = F.greatest(var, F.lit(0.0))  # guard tiny negative cancellation
    return agg.select(
        *groups,
        "n",
        F.round(F.col("__mn") / F.lit(m), round_to).alias("min_value"),
        F.round(F.col("__mx") / F.lit(m), round_to).alias("max_value"),
        F.round(mean, round_to).alias("mean"),
        F.round(var, round_to).alias("variance"),
        F.round(F.sqrt(var), round_to).alias("stddev"),
    )


def group_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z_threshold: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-group z-score outliers: rows whose value sits at least
    ``z_threshold`` population standard deviations from their group's mean.
    NULL values never flag; groups with zero variance (or a single row)
    flag nothing. Output is the input row plus ``z_score`` (rounded).

    Mean and stddev come from the same EXACT integer-micro-unit sums as
    :func:`group_moments` (Σv and Σv² in decimal(38,0)) — any engine
    reproduces the moments digit-for-digit, so the z-scores and the
    threshold comparison are bit-identical cross-engine (no float-sum
    order sensitivity at the |z| = threshold boundary).

    Scale shape: one map-side-combined aggregation over the group keys,
    then one equi-join of the (group -> moments) table back to the rows —
    broadcast when small, shuffle-on-group otherwise (AQE's call); the join
    is NULL-SAFE on every group column so NULL-keyed groups keep their
    rows (groupBy treats NULL as a group; a plain equi-join would silently
    drop them).
    """
    groups = list(group_cols)
    v = F.expr(f"cast(round(`{value_col}` * 1000000, 0) as bigint)")
    vd = v.cast("decimal(38,0)")
    stats = (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, vd.alias("__vd"))
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__vd").alias("__s1"),
            F.sum((F.col("__vd") * F.col("__vd")).cast("decimal(38,0)")).alias(
                "__s2"
            ),
        )
    )
    st = stats.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups], "__n", "__s1", "__s2"
    )
    cond = None
    for g in groups:
        c = F.col(g).eqNullSafe(F.col(f"__g_{g}"))
        cond = c if cond is None else (cond & c)
    m = 1_000_000.0
    nd = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    var = F.greatest(
        (s2 / nd - (s1 / nd) * (s1 / nd)) / F.lit(m * m), F.lit(0.0)
    )
    std = F.sqrt(var)
    z = (v.cast("double") / F.lit(m) - s1 / nd / F.lit(m)) / std
    return (
        df.join(st, on=cond, how="inner")
        .where(
            F.col(value_col).isNotNull()
            & (std > 0)
            & (F.abs(z) >= F.lit(float(z_threshold)))
        )
        .select(*df.columns, F.round(z, round_to).alias("z_score"))
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    method: str = "lower",
    out_col: Optional[str] = None,
) -> DataFrame:
    """Clamp ``value_col`` to its per-group ``[lower, upper]`` quantile
    bounds (winsorization — the standard outlier treatment that keeps
    the row but caps the tail instead of dropping it). Bounds come from
    :func:`group_quantiles` — EXACT rank selection, so the clamp values
    are actual data values and both the bounds and the clamped column
    replay bit-for-bit in any engine.

    Null-safe on the group keys (NULL-key groups winsorize like any
    other — the ``top_k_per_group`` ADVICE lesson), and the bounds join
    is left unhinted: per-group bounds scale with group cardinality, so
    forcing a broadcast would be a driver-OOM lever at 100 TB; AQE picks
    broadcast when the cut table is actually small. Groups absent from
    the bounds (all-NULL values) pass through unclamped; NULL values
    stay NULL.

    Output: all input columns plus ``out_col`` (default
    ``{value_col}_winsorized``) and the per-group ``__lo``/``__hi``
    bounds under ``{value_col}_lo`` / ``{value_col}_hi``.
    """
    if not (0.0 < float(lower) < float(upper) <= 1.0):
        raise ValueError("need 0 < lower < upper <= 1")
    groups = list(group_cols)
    out_col = out_col or f"{value_col}_winsorized"
    qs = group_quantiles(
        df, groups, value_col, fractions=(float(lower), float(upper)),
        method=method,
    )
    lo = qs.where(F.col("fraction") == float(lower)).select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("value").alias("__lo"),
    )
    hi = qs.where(F.col("fraction") == float(upper)).select(
        *[F.col(g).alias(f"__h_{g}") for g in groups],
        F.col("value").alias("__hi"),
    )

    def _cond(prefix, frame_cols):
        cond = None
        for g in groups:
            piece = F.col(g).eqNullSafe(F.col(f"{prefix}_{g}"))
            cond = piece if cond is None else (cond & piece)
        return cond

    joined = (
        df.join(lo, _cond("__g", groups), "left")
        .join(hi, _cond("__h", groups), "left")
    )
    v = F.col(value_col)
    clamped = F.when(
        v.isNotNull(),
        F.least(
            F.greatest(v, F.coalesce(F.col("__lo"), v)),
            F.coalesce(F.col("__hi"), v),
        ),
    )
    return joined.select(
        *df.columns,
        clamped.alias(out_col),
        F.col("__lo").alias(f"{value_col}_lo"),
        F.col("__hi").alias(f"{value_col}_hi"),
    )


def robust_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z_threshold: float = 3.5,
    round_to: int = 6,
) -> DataFrame:
    """Per-group MEDIAN/MAD outliers — the robust twin of
    ``group_outliers``: the modified z-score ``0.6745 * (v - median) /
    MAD`` (Iglewicz & Hoaglin 1993, threshold 3.5 recommended there).
    Mean/std outlier detection is corrupted by the very outliers it
    hunts (one 1e9 reading inflates std until nothing is an outlier);
    the median and the median-absolute-deviation have a 50% breakdown
    point.

    Both the median and the MAD come from :func:`group_quantiles` —
    exact rank selection, actual data values — so the score arithmetic
    and the threshold boundary replay bit-for-bit in any engine. Two
    window passes (median of v, then median of |v - median|) + two
    null-safe group joins; groups with MAD = 0 (over half the values
    identical) flag nothing, same contract as ``group_outliers``'s
    ``std > 0`` guard.

    Returns the flagged rows with ``robust_z`` appended.
    """
    groups = list(group_cols)

    def _nsjoin(left, right, prefix):
        cond = None
        for g in groups:
            piece = F.col(g).eqNullSafe(F.col(f"{prefix}_{g}"))
            cond = piece if cond is None else (cond & piece)
        return left.join(right, cond, "left")

    med = group_quantiles(df, groups, value_col, fractions=(0.5,)).select(
        *[F.col(g).alias(f"__m_{g}") for g in groups],
        F.col("value").alias("__med"),
    )
    with_med = _nsjoin(df, med, "__m")
    dev = with_med.select(
        *groups,
        F.abs(F.col(value_col) - F.col("__med")).alias("__dev"),
    )
    mad = group_quantiles(dev, groups, "__dev", fractions=(0.5,)).select(
        *[F.col(g).alias(f"__d_{g}") for g in groups],
        F.col("value").alias("__mad"),
    )
    scored = _nsjoin(with_med, mad, "__d")
    z = (
        F.lit(0.6745)
        * (F.col(value_col) - F.col("__med"))
        / F.col("__mad")
    )
    return (
        scored.where(
            F.col(value_col).isNotNull()
            & (F.col("__mad") > 0)
            & (F.abs(z) >= F.lit(float(z_threshold)))
        )
        .select(*df.columns, F.round(z, round_to).alias("robust_z"))
    )


def column_correlations(
    df: DataFrame,
    cols: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """Pearson correlation matrix over numeric columns in ONE
    map-side-combined aggregation pass (k columns → k(k+1)/2 + k sums,
    all in the same groupBy-less agg — the data is scanned once however
    many columns you correlate).

    Exactness discipline (the ``group_moments`` pattern): values
    quantize to integer millionths and every Σa, Σa², Σab accumulates
    in decimal(38,0) — exact integers, no float summation order — then
    the correlation ``(nΣab − ΣaΣb) / √(nΣa²−(Σa)²) √(nΣb²−(Σb)²)``
    evaluates in doubles FROM those exact integers with a fixed
    parenthesization, so any engine reproduces every digit. Rows with a
    NULL in ANY of ``cols`` are excluded (listwise deletion — the n is
    the same for every pair). Zero-variance columns yield NULL
    correlations.

    Output: one row per unordered pair in ``cols`` order —
    (``col_a``, ``col_b``, ``n``, ``corr``).
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("need at least 2 columns")
    base = df
    for c in cols:
        base = base.where(F.col(c).isNotNull())
    staged = base.select(
        *[
            F.expr(f"cast(round(`{c}` * 1000000, 0) as bigint)")
            .cast("decimal(38,0)")
            .alias(f"__q_{i}")
            for i, c in enumerate(cols)
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(len(cols)):
        q = F.col(f"__q_{i}")
        aggs.append(F.sum(q).alias(f"__s_{i}"))
        aggs.append(F.sum((q * q).cast("decimal(38,0)")).alias(f"__ss_{i}"))
    pairs = [
        (i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))
    ]
    for i, j in pairs:
        aggs.append(
            F.sum(
                (F.col(f"__q_{i}") * F.col(f"__q_{j}")).cast("decimal(38,0)")
            ).alias(f"__sp_{i}_{j}")
        )
    agg = staged.agg(*aggs)

    nd = F.col("n").cast("double")

    def _corr(i, j):
        sa = F.col(f"__s_{i}").cast("double")
        sb = F.col(f"__s_{j}").cast("double")
        saa = F.col(f"__ss_{i}").cast("double")
        sbb = F.col(f"__ss_{j}").cast("double")
        sab = F.col(f"__sp_{i}_{j}").cast("double")
        num = nd * sab - sa * sb
        va = nd * saa - sa * sa
        vb = nd * sbb - sb * sb
        return F.when(
            (va > 0) & (vb > 0),
            F.round(num / (F.sqrt(va) * F.sqrt(vb)), round_to),
        )

    out = agg.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(cols[i]).alias("col_a"),
                        F.lit(cols[j]).alias("col_b"),
                        _corr(i, j).alias("corr"),
                    )
                    for i, j in pairs
                ]
            )
        ).alias("__p"),
    )
    return out.select(
        F.col("__p.col_a").alias("col_a"),
        F.col("__p.col_b").alias("col_b"),
        F.col("n").cast("bigint").alias("n"),
        F.col("__p.corr").alias("corr"),
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bin_width: float,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Fixed-width histogram (optionally per group): one map-side
    combined aggregate, bins assigned by EXACT integer arithmetic —
    the value quantizes to integer millionths and divides by the
    micro-unit bin width with truncating integer division (`div`,
    matching DuckDB `//`), so bin membership at boundaries is
    bit-identical cross-engine (a float ``floor(v / w)`` flips at
    boundary values). Truncation is toward zero: negative values share
    bin 0's width split at zero — document-stated semantics, matching
    both engines. NULL values are excluded.

    Returns (group cols…, ``bin``, ``bin_start``, ``n``) — only
    occupied bins (sparse; a dense grid is ``gap_fill``'s job).
    """
    if not bin_width > 0:
        raise ValueError("bin_width must be positive")
    groups = list(group_cols) if group_cols else []
    bw_micro = int(round(bin_width * 1_000_000))
    if bw_micro <= 0:
        raise ValueError("bin_width below 1e-6 resolution")
    staged = df.where(F.col(value_col).isNotNull()).select(
        *groups, F.expr(
            f"cast(round(`{value_col}` * 1000000, 0) as bigint) "
            f"div {bw_micro}"
        ).alias("bin")
    )
    return (
        staged.groupBy(*groups, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *groups,
            F.col("bin").cast("bigint").alias("bin"),
            F.round(
                F.col("bin").cast("double") * F.lit(float(bw_micro))
                / F.lit(1_000_000.0),
                6,
            ).alias("bin_start"),
            "n",
        )
    )
