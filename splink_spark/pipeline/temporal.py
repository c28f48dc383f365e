"""Temporal joins Spark lacks as built-ins: as-of join (point-in-time
lookup) and bounded range join — the event-table companions to the
sessionization/window operators.

Scale design: NO join at all. The classic as-of formulations (inequality
join, per-key collect) either explode into range joins or hold unbounded
per-key state; the union trick needs exactly ONE shuffle of
left ∪ right by the key — each row crosses the wire once — then a single
ordered window pass carries the most recent right payload forward
(``last(..., ignorenulls=True)``). Per-key skew behaves exactly like any
window aggregation (AQE handles it); memory is one row of carried state
per partition stream, not per key.

Determinism contract: when several right rows share the same ``on``
value, the winner is decided by ``tie_break_col`` (max wins for
backward, min for forward). Without a tie-break column, pre-deduplicate
the right side per (key, on) — the oracle-gated driver query does
exactly that.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "range_join",
    "time_rollup",
    "funnel",
    "sessionize",
    "retention",
    "gap_fill",
    "rolling_aggregate",
    "conversion_attribution",
    "event_paths",
    "merge_intervals",
    "time_weighted_average",
]


def _as_list(x: Union[str, Sequence[str], None]) -> list[str]:
    if x is None:
        return []
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    direction: str = "backward",
    tolerance: Optional[int] = None,
    prefix: str = "r_",
    tie_break_col: Optional[str] = None,
    bucket_size: Optional[int] = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest ``on``
    <= left's (``backward``, inclusive), the least ``on`` >= left's
    (``forward``, inclusive), or whichever of the two is closer
    (``nearest``, ties to backward) — pandas ``merge_asof`` semantics,
    DuckDB ``ASOF JOIN`` semantics for the backward case.

    One shuffle total: both sides union (right payload packed into a
    struct), partition by ``by``, one ordered window carries the latest
    payload to each left row. Right rows sort before left rows at equal
    ``on`` so the match is inclusive. ``tolerance`` (same units as ``on``,
    which must be numeric for ``tolerance``/``nearest``) nulls matches
    farther than the bound. Unmatched left rows keep null payload columns
    (left join semantics).

    ``bucket_size`` (same units as ``on``) is the SKEW lever: a plain
    per-key window puts one hot key's whole timeline in one task;
    bucketing salts the window partition to (key, on div bucket_size)
    and stitches buckets back with a per-key carry window over bucket
    summaries (one row per bucket — tiny) plus a co-partitioned join.
    Output is identical (tested); use it when single keys hold millions
    of rows.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = _as_list(by)

    if direction == "nearest":
        # two passes, no join: the backward output (left cols + prefixed
        # backward match) is itself the left side of the forward pass — its
        # extra columns just ride along in the carried left-row struct, so
        # both candidate matches land on one row deterministically
        f_cols = [c for c in right.columns if c not in keys]
        b = asof_join(left, right, on, by, "backward", tolerance, prefix,
                      tie_break_col, bucket_size)
        both = asof_join(b, right, on, by, "forward", tolerance, "__fwd_",
                         tie_break_col, bucket_size)
        on_val = F.col(on).cast("double")
        bdelta = F.abs(on_val - F.col(f"{prefix}{on}").cast("double"))
        fdelta = F.abs(on_val - F.col(f"__fwd_{on}").cast("double"))
        use_fwd = F.col(f"{prefix}{on}").isNull() | (
            F.col(f"__fwd_{on}").isNotNull() & (fdelta < bdelta)
        )
        return both.select(
            *[c for c in left.columns],
            *[
                F.when(use_fwd, F.col(f"__fwd_{c}"))
                .otherwise(F.col(f"{prefix}{c}"))
                .alias(f"{prefix}{c}")
                for c in f_cols
            ],
        )

    payload_cols = [c for c in right.columns if c not in keys]
    marker = "__asof_is_left"
    payload = "__asof_payload"
    # the tie-break column keeps its NATIVE type end-to-end: casting to
    # string would make numeric tie-breaks lexicographic (9 > 10)
    tb_type = (
        right.schema[tie_break_col].dataType if tie_break_col else None
    )
    lhs = left.select(
        *keys,
        F.col(on).alias("__asof_on"),
        F.lit(1).alias(marker),
        (F.lit(None).cast(tb_type) if tb_type else F.lit(None).cast("string")).alias("__asof_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_lrow"),
        F.lit(None)
        .cast(
            right.select(
                F.struct(*[F.col(c) for c in payload_cols]).alias("s")
            ).schema["s"].dataType
        )
        .alias(payload),
    )
    tb = (
        F.col(tie_break_col)
        if tie_break_col
        else F.lit(None).cast("string")
    )
    rhs = right.select(
        *keys,
        F.col(on).alias("__asof_on"),
        F.lit(0).alias(marker),
        tb.alias("__asof_tb"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType
        ).alias("__asof_lrow"),
        F.struct(*[F.col(c) for c in payload_cols]).alias(payload),
    )
    u = lhs.unionByName(rhs)
    if direction == "backward":
        order = [F.asc("__asof_on"), F.asc(marker), F.asc("__asof_tb")]
    else:  # forward
        order = [F.desc("__asof_on"), F.asc(marker), F.desc("__asof_tb")]
    if bucket_size is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = u.withColumn(
            "__asof_match", F.last(payload, ignorenulls=True).over(w)
        ).where(F.col(marker) == 1)
    else:
        # skew-proof variant: salt the window by time bucket so one hot key
        # parallelizes across its timeline. Local pass carries matches
        # WITHIN each (key, bucket); a bucket-level summary (one row per
        # (key, bucket): the bucket's winning right payload) is windowed
        # per key — #buckets rows, trivially small — to produce the
        # carry-in from all earlier (later, for forward) buckets; left rows
        # with no local match take the carry. Output identical to the
        # unbucketed pass (tested), cost = one extra tiny window + one
        # co-partitioned join.
        bucket = "__asof_bucket"
        # true integer division (Spark `div`): `/` is double division and
        # loses integer precision above 2^53 (epoch-nanos territory)
        u = u.withColumn(
            bucket,
            F.expr(f"cast(__asof_on as bigint) div {int(bucket_size)}"),
        )
        wloc = (
            Window.partitionBy(*keys, bucket)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = u.withColumn(
            "__asof_match", F.last(payload, ignorenulls=True).over(wloc)
        )
        # per-bucket winner among RIGHT rows: what carries OUT of a bucket
        # is the right row sorting last in the window order — backward:
        # (max on, then max tie); forward: (min on, then min tie)
        ord_struct = F.struct(F.col("__asof_on"), F.col("__asof_tb"))
        winner = (
            F.max_by(payload, ord_struct)
            if direction == "backward"
            else F.min_by(payload, ord_struct)
        )
        rb = (
            u.where(F.col(marker) == 0)
            .groupBy(*keys, bucket)
            .agg(winner.alias("__asof_bwin"))
        )
        # carry must cover EVERY bucket that has rows (a left-only bucket
        # still inherits from earlier right-bearing buckets)
        all_buckets = u.select(*keys, bucket).distinct()
        rb_full = all_buckets.join(rb, keys + [bucket], "left")
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.asc(bucket) if direction == "backward" else F.desc(bucket))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = rb_full.withColumn(
            "__asof_carry", F.last("__asof_bwin", ignorenulls=True).over(wb)
        ).select(*keys, bucket, "__asof_carry")
        carried = (
            local.where(F.col(marker) == 1)
            .join(carry, keys + [bucket], "left")
            .withColumn(
                "__asof_match",
                F.coalesce(F.col("__asof_match"), F.col("__asof_carry")),
            )
        )
    m = F.col("__asof_match")
    if tolerance is not None:
        delta = F.abs(
            F.col("__asof_on").cast("double") - m[on].cast("double")
        )
        carried = carried.withColumn(
            "__asof_match", F.when(delta <= F.lit(tolerance), m)
        )
        m = F.col("__asof_match")
    return carried.select(
        *[F.col(f"__asof_lrow.{c}").alias(c) for c in left.columns],
        *[m[c].alias(f"{prefix}{c}") for c in payload_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lower: str,
    right_upper: str,
    by: Union[str, Sequence[str], None] = None,
    bin_size: Optional[int] = None,
) -> DataFrame:
    """Join left points into right [lower, upper) intervals. Without help
    Catalyst plans point-in-interval predicates as a nested loop; binning
    turns it into an equi-join: each interval replicates into its
    ceil(len/bin) covering bins, each point hashes to exactly one bin, and
    the exact predicate filters within the bin bucket. ``bin_size``
    defaults to a coarse guess (1h in nanos) — set it near the TYPICAL
    interval length: replication factor is interval_len/bin_size + 1.
    """
    keys = _as_list(by)
    if bin_size is None:
        bin_size = 3600 * 1_000_000_000
    # bins via true integer division (`div`): `/` is double division and
    # mis-bins values above 2^53 (epoch-nanos) near bucket boundaries
    b = int(bin_size)
    r_binned = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"cast(`{right_lower}` as bigint) div {b}"),
                F.expr(f"(cast(`{right_upper}` as bigint) - 1) div {b}"),
            )
        ),
    )
    l_binned = left.withColumn(
        "__bin", F.expr(f"cast(`{left_point}` as bigint) div {b}")
    )
    cond = [l_binned["__bin"] == r_binned["__bin"]] + [
        l_binned[k] == r_binned[k] for k in keys
    ]
    joined = l_binned.join(r_binned, cond, "inner").where(
        (l_binned[left_point].cast("bigint") >= r_binned[right_lower].cast("bigint"))
        & (l_binned[left_point].cast("bigint") < r_binned[right_upper].cast("bigint"))
    )
    return joined.select(
        *[l_binned[c] for c in left.columns],
        *[r_binned[c] for c in right.columns if c not in keys],
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    granularities: Sequence[int] = (3600 * 1_000_000_000, 86400 * 1_000_000_000),
    by: Union[str, Sequence[str], None] = None,
    round_to: int = 6,
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: per-bucket
    count/sum/min/max/avg of ``value_col`` at EVERY requested granularity
    (same units as ``ts_col``, e.g. epoch-nanos) in ONE pass.

    Scale design: one scan + one shuffle for all granularities via
    GROUPING SETS — the Expand node emits one row per (input row,
    granularity) into a single partial-aggregated exchange, instead of N
    scans/N shuffles for N granularities. At 100 TB the scan dominates, so
    rollup cost is ~independent of how many granularities you keep.
    Buckets are ``(ts div g) * g`` — truncating integer division
    (identical to DuckDB's integer ``//`` for negatives too), so the
    arithmetic is engine-portable. Coarser rollups are NOT derived from finer ones (that
    would be a second shuffle); all levels share the one Expand.
    """
    keys = _as_list(by)
    bucket_cols = []
    for g in granularities:
        name = f"__bucket_{g}"
        # floor(ts/g)*g via true integer division — `/` is double division
        # and rounds ts just below a boundary INTO the next bucket once
        # values pass 2^53 (epoch-nanos)
        df = df.withColumn(
            name,
            F.expr(f"(cast(`{ts_col}` as bigint) div {int(g)}) * {int(g)}"),
        )
        bucket_cols.append(name)
    sets = [tuple(keys + [b]) for b in bucket_cols]
    grouped = df.groupingSets(
        [list(s) for s in sets], *[F.col(c) for c in keys + bucket_cols]
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), round_to).alias("sum_value"),
        F.round(F.min(value_col), round_to).alias("min_value"),
        F.round(F.max(value_col), round_to).alias("max_value"),
        F.round(F.avg(value_col), round_to).alias("avg_value"),
    )
    # each output row belongs to exactly one grouping set: its granularity
    # is the single non-null bucket column
    gran = F.lit(None).cast("bigint")
    bucket = F.lit(None).cast("bigint")
    for g, b in zip(granularities, bucket_cols):
        gran = F.when(F.col(b).isNotNull(), F.lit(int(g))).otherwise(gran)
        bucket = F.when(F.col(b).isNotNull(), F.col(b)).otherwise(bucket)
    return grouped.select(
        *keys,
        gran.alias("granularity"),
        bucket.alias("bucket_start"),
        "n",
        "sum_value",
        "min_value",
        "max_value",
        "avg_value",
    )


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    within: Optional[int] = None,
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest completion chain of
    ``steps`` (greedy-earliest semantics: step k's time is the first
    occurrence at or after step k-1's time; optional ``within`` bounds the
    WHOLE chain relative to step 1, in ``ts_col`` units). Returns one row
    per step: ``step``, ``step_name``, ``users`` (count who reached it),
    ``conversion`` (fraction of step-1 users).

    Scale design: k tiny aggregations, each a map-side-combined
    groupBy(user) over ONLY that step's events (filter pushed to the
    scan), chained by broadcast-or-shuffled equi-joins on user — no
    window over the full event stream, no per-user state. k is the
    funnel length (single digits); each stage's output is one row per
    surviving user.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ts = F.col(ts_col).cast("bigint")
    reached = None  # DataFrame(user, t_k, t_1)
    counts = []
    for k, step in enumerate(steps):
        ev_k = df.where(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), ts.alias("t")
        )
        if reached is None:
            reached = ev_k.groupBy("user").agg(F.min("t").alias("t_k"))
            reached = reached.withColumn("t_1", F.col("t_k"))
        else:
            j = ev_k.join(reached, "user").where(F.col("t") >= F.col("t_k"))
            if within is not None:
                j = j.where(F.col("t") <= F.col("t_1") + F.lit(int(within)))
            reached = j.groupBy("user", "t_1").agg(F.min("t").alias("t_k"))
        counts.append(
            reached.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(k + 1).alias("step"),
                F.lit(step).alias("step_name"),
                "users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    w_first = F.first("users").over(
        Window.orderBy("step").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return out.withColumn(
        "conversion",
        F.round(F.col("users").cast("double") / F.greatest(w_first, F.lit(1)).cast("double"), 6),
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: int = 1800 * 1_000_000_000,
    order_cols: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Gaps-and-islands sessionization: assign every event a per-user
    ``session_idx`` (1-based), a new session starting when the gap to the
    previous event EXCEEDS ``gap`` (same units as ``ts_col`` — the batch
    twin of ``streaming.stream_session_aggregate``, whose
    ``F.session_window`` splits at >=; both are oracle-gated).

    One shuffle (the per-user window); ``order_cols`` breaks ordering ties
    deterministically (defaults to the timestamp only).
    """
    ts = F.col(ts_col).cast("bigint")
    order = [ts.asc()] + [F.col(c).asc() for c in _as_list(order_cols)]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts).over(w)
    is_new = (prev.isNull() | ((ts - prev) > F.lit(int(gap)))).cast("int")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__is_new", is_new).withColumn(
        "session_idx", F.sum("__is_new").over(wc)
    ).drop("__is_new")


def retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period: int = 7 * 24 * 3600 * 1_000_000_000,
    max_periods: int = 8,
) -> DataFrame:
    """Cohort retention: a user's cohort is the period of their FIRST
    activity; cell (cohort, k) counts the cohort's users active in period
    cohort+k, with ``retention_frac`` relative to the cohort size (k = 0
    row). Periods are ``ts div period`` — truncating integer division
    (matches DuckDB's integer ``//`` exactly, negatives included) in
    ``ts_col`` units.

    Scale shape: first-activity and distinct-activity both reduce BY USER
    (map-side combined; output one row per user / per user-period), the
    cohort attach is a co-partitioned equi-join on the user, and the final
    aggregate's key space is at most cohorts x max_periods. No windows, no
    per-user state beyond the aggregates.
    """
    # true integer division — see time_rollup: double `/` mis-buckets
    # epoch-nanos (> 2^53) at bucket boundaries
    p = F.expr(f"cast(`{ts_col}` as bigint) div {int(period)}")
    firsts = (
        df.select(F.col(user_col).alias("user"), p.alias("p"))
        .groupBy("user")
        .agg(F.min("p").alias("cohort"))
    )
    active = (
        df.select(F.col(user_col).alias("user"), p.alias("p")).distinct()
    )
    cells = (
        active.join(firsts, "user")
        .withColumn("k", (F.col("p") - F.col("cohort")).cast("int"))
        .where((F.col("k") >= 0) & (F.col("k") <= F.lit(int(max_periods))))
        .groupBy("cohort", "k")
        .agg(F.count_distinct("user").alias("n_users"))
    )
    base = cells.where(F.col("k") == 0).select(
        "cohort", F.col("n_users").alias("__base")
    )
    return (
        cells.join(base, "cohort")
        .select(
            (F.col("cohort") * F.lit(int(period))).alias("cohort_start"),
            F.col("k").alias("period_index"),
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("__base").cast("double"), 6
            ).alias("retention_frac"),
        )
    )


def gap_fill(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: int = 3600 * 1_000_000_000,
    by: Union[str, Sequence[str], None] = None,
    method: str = "locf",
    round_to: int = 6,
) -> DataFrame:
    """Regularize a sparse per-key time series onto a dense bucket grid
    (the hypertable ``time_bucket_gapfill`` shape): one row per (key,
    bucket) from each key's first to last observed bucket, with missing
    buckets filled by ``method``:

    - ``"locf"``: last observation carried forward (null before the
      first observation — none exist by construction of the grid);
    - ``"zero"``: 0.0;
    - ``"null"``: left null (just the dense grid).

    Multiple observations in one bucket reduce to their MEAN before
    filling (deterministic: computed from an exact integer micro-unit
    sum). Scale shape: one aggregate to buckets, one per-key min/max
    aggregate, ``sequence``+``explode`` to generate each key's grid (rows
    generated distributed, proportional to the output), one equi-join
    back, and for locf one per-key ordered window. No driver loops.
    """
    if method not in ("locf", "zero", "null"):
        raise ValueError(f"unknown method {method!r}")
    keys = _as_list(by)
    b = F.expr(f"(cast(`{ts_col}` as bigint) div {int(bucket)}) * {int(bucket)}")
    v_micro = F.expr(f"cast(round(`{value_col}` * 1000000, 0) as bigint)")
    per_bucket = (
        df.select(*keys, b.alias("bucket_start"), v_micro.alias("__v"))
        .groupBy(*keys, "bucket_start")
        .agg(
            F.sum("__v").alias("__s"),
            F.count(F.lit(1)).alias("__n"),
            # non-null count: the mean denominator, so NULL values are
            # zero-weight (SQL AVG semantics), not mean-deflating rows
            F.count(F.col("__v")).alias("__nv"),
        )
    )
    spans = per_bucket.groupBy(*keys).agg(
        F.min("bucket_start").alias("__lo"), F.max("bucket_start").alias("__hi")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(int(bucket)))
        ).alias("bucket_start"),
    )
    joined = grid.join(per_bucket, keys + ["bucket_start"], "left")
    mean = F.round(F.col("__s") / F.lit(1_000_000.0) / F.col("__nv"), round_to)
    if method == "locf":
        w = (
            Window.partitionBy(*keys)
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last(mean, ignorenulls=True).over(w)
    elif method == "zero":
        filled = F.coalesce(mean, F.lit(0.0))
    else:
        filled = mean
    return joined.select(
        *keys,
        "bucket_start",
        filled.alias("value"),
        F.col("__n").isNotNull().alias("observed"),
    )


def rolling_aggregate(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Union[str, Sequence[str], None] = None,
    window_size: int = 3600 * 1_000_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Per-event trailing-window aggregates: for every row, the count /
    sum / mean of ``value_col`` over the key's events in
    ``[ts - window_size, ts]`` (inclusive both ends — the SQL RANGE frame).
    The moving-feature primitive (rates, rolling means) for event feature
    engineering.

    One shuffle (the per-key window); the RANGE frame makes Spark keep a
    sliding buffer bounded by the window's row count, not the partition.
    Sums run over integer MICRO-UNITS so the trailing sum is exact and
    engine-portable (a float running sum depends on eviction order).
    Output adds ``w_count``, ``w_sum``, ``w_mean``.
    """
    keys = _as_list(by)
    ts = F.col(ts_col).cast("bigint")
    v_micro = F.expr(f"cast(round(`{value_col}` * 1000000, 0) as bigint)")
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts)
        .rangeBetween(-int(window_size), 0)
    )
    staged = df.withColumn("__vm", v_micro)
    cnt = F.count(F.lit(1)).over(w)
    # mean denominator is the NON-NULL count (SQL AVG semantics): rows
    # with NULL value_col stay in w_count but carry zero weight in w_mean
    cnt_v = F.count(F.col("__vm")).over(w)
    s = F.sum("__vm").over(w)
    return (
        staged.withColumn("w_count", cnt)
        .withColumn("w_sum", F.round(s / F.lit(1_000_000.0), round_to))
        .withColumn(
            "w_mean",
            F.round(s / F.lit(1_000_000.0) / cnt_v.cast("double"), round_to),
        )
        .drop("__vm")
    )


def conversion_attribution(
    df: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: Union[str, Sequence[str], None] = None,
    touch_types: Optional[Sequence[str]] = None,
) -> DataFrame:
    """First-touch / last-touch conversion attribution over an event log
    (the standard "since previous conversion" model): each user's timeline
    is segmented at conversion events, and every touch attributes to the
    NEXT conversion after it. Touches with no later conversion are
    unattributed (dropped); a conversion with no preceding touch since the
    previous conversion comes back with NULL touch columns and
    ``n_touches = 0``.

    ``touch_types`` restricts which event types count as touches (default:
    every non-conversion event). Pass ``order_cols`` (e.g. an event id) to
    make first/last deterministic under timestamp ties.

    Output: one row per conversion — (``user_col``, conversion_ts,
    conversion_value?, first_touch, first_touch_ts, last_touch,
    last_touch_ts, n_touches). The ``value`` column is carried through only
    if the input has one.

    Scale shape: one window (cumulative conversion count per user — the
    segment id) plus one per-(user, segment) aggregate joined back to the
    conversion rows on the co-partitioned (user, segment) key; no range
    join, no per-user collect. Window state is a running sum only.
    """
    order = [ts_col] + _as_list(order_cols)
    w = (
        Window.partitionBy(user_col)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_conv = (F.col(type_col) == F.lit(conversion_type)).cast("int")
    staged = df.withColumn("__cum", F.sum(is_conv).over(w)).withColumn(
        "__is_conv", is_conv
    )
    has_value = "value" in df.columns

    convs = staged.where(F.col("__is_conv") == 1).select(
        F.col(user_col),
        (F.col("__cum") - 1).alias("__seg"),
        F.col(ts_col).alias("conversion_ts"),
        *([F.col("value").alias("conversion_value")] if has_value else []),
    )
    touches = staged.where(F.col("__is_conv") == 0)
    if touch_types is not None:
        touches = touches.where(F.col(type_col).isin(list(touch_types)))
    ord_key = F.struct(*[F.col(c) for c in order])
    touch_agg = (
        touches.select(
            F.col(user_col),
            F.col("__cum").alias("__seg"),
            F.col(type_col).alias("__ch"),
            F.col(ts_col).alias("__ts"),
            ord_key.alias("__o"),
        )
        .groupBy(user_col, "__seg")
        .agg(
            F.min_by("__ch", F.col("__o")).alias("first_touch"),
            F.min_by("__ts", F.col("__o")).alias("first_touch_ts"),
            F.max_by("__ch", F.col("__o")).alias("last_touch"),
            F.max_by("__ts", F.col("__o")).alias("last_touch_ts"),
            F.count(F.lit(1)).alias("n_touches"),
        )
    )
    return (
        convs.join(touch_agg, on=[user_col, "__seg"], how="left")
        .withColumn("n_touches", F.coalesce(F.col("n_touches"), F.lit(0)))
        .drop("__seg")
    )


def event_paths(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    event_col: str = "event_type",
    gap: int = 1800 * 1_000_000_000,
    max_steps: int = 5,
    top_n: Optional[int] = 50,
    order_cols: Union[str, Sequence[str], None] = None,
    separator: str = " > ",
) -> DataFrame:
    """Top user-journey paths: sessionize (same gaps-and-islands
    semantics as :func:`sessionize`), take each session's first
    ``max_steps`` events in time order, render them as one path string,
    and count sessions per path — the product-analytics "what do users
    actually do" query.

    Scale shape: the sessionize window is the only per-user shuffle;
    the per-session path assembles via collect_list of (step, event)
    structs sorted IN the aggregate (array_sort then project — no
    second window), the path count is a map-side-combined groupBy, and
    the top-n is a sort-limit (TakeOrderedAndProject, k rows to the
    driver side of the exchange). Ordering ties break by ``order_cols``
    (pass the event id for full determinism), count ties by path text.

    Returns (``path``, ``n_sessions``, ``n_steps``) — at most ``top_n``
    rows, most frequent first. ``top_n=None`` returns EVERY path as a
    plain global sort — pass None rather than a huge limit: Spark's
    TakeOrderedAndProject preallocates a top-k buffer of the LIMIT size,
    so limit 10^9 is an executor OOM even on tiny data (measured).
    """
    s = sessionize(df, ts_col, user_col, gap, order_cols)
    ts = F.col(ts_col).cast("bigint")
    order = [ts.asc()] + [F.col(c).asc() for c in _as_list(order_cols)]
    w = Window.partitionBy(user_col, "session_idx").orderBy(*order)
    ranked = s.withColumn("__step", F.row_number().over(w)).where(
        F.col("__step") <= int(max_steps)
    )
    per_session = ranked.groupBy(user_col, "session_idx").agg(
        F.concat_ws(
            separator,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__step").alias("s"),
                            F.col(event_col).alias("e"),
                        )
                    )
                ),
                lambda x: x["e"],
            ),
        ).alias("path"),
        F.count(F.lit(1)).alias("n_steps"),
    )
    counted = (
        per_session.groupBy("path", "n_steps")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .select("path", "n_sessions", F.col("n_steps").cast("bigint").alias("n_steps"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    )
    return counted if top_n is None else counted.limit(int(top_n))


def merge_intervals(
    df: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    by: Union[str, Sequence[str], None] = None,
    min_gap: int = 0,
) -> DataFrame:
    """Flatten overlapping/adjacent intervals per key into their union
    (the classic gaps-and-islands coalesce: availability windows,
    maintenance periods, stitched sessions). Intervals are half-open
    ``[start, end)``; two intervals merge when the next start is within
    ``min_gap`` of the running maximum end (``min_gap=0`` merges
    touching intervals; a positive gap also bridges small holes).

    One shuffle (the per-key ordered window): a running ``max(end)``
    decides island breaks exactly like ``sessionize`` decides session
    breaks, then one aggregate per (key, island) emits the merged
    bounds and the source-interval count. NULL starts/ends are dropped.

    Returns (keys…, ``start``, ``end``, ``n_merged``).
    """
    keys = _as_list(by)
    s = F.col(start_col).cast("bigint")
    e = F.col(end_col).cast("bigint")
    base = df.where(s.isNotNull() & e.isNotNull()).select(
        *keys, s.alias("__s"), e.alias("__e")
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__s").asc(), F.col("__e").asc())
    # running max end over all PRECEDING intervals; a new island starts
    # when this interval's start clears it by more than min_gap
    prev_max_end = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = (
        prev_max_end.isNull()
        | (F.col("__s") > prev_max_end + F.lit(int(min_gap)))
    ).cast("int")
    islands = base.withColumn("__new", is_new).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(*keys, "__island")
        .agg(
            F.min("__s").alias("start"),
            F.max("__e").alias("end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__island")
    )


def time_weighted_average(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Union[str, Sequence[str], None] = None,
    bucket: int = 3600 * 1_000_000_000,
    order_cols: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Time-weighted average per (key, bucket): each observation's value
    holds until the NEXT observation (step/last-observation-carried-
    forward semantics — the TWAP every metrics/financial pipeline
    wants, where irregular samples must not let burst periods dominate
    a plain AVG). An observation spanning a bucket boundary contributes
    to its own bucket only up to the boundary; the opening value of the
    next bucket is the carried previous observation re-emitted at the
    boundary (standard step-interpolation bucketing). The last
    observation per key gets zero weight (nothing to hold until), and
    duplicate-timestamp observations superseded instantly (zero-duration
    steps) are excluded from the output entirely — they carry no weight
    and do not count toward ``n_obs``.

    Exactness: weights are integer time deltas (``ts`` units) and each
    weighted term quantizes to integer micro-units before a
    decimal(38,0) sum — the division to double happens once per bucket,
    so results replay bit-for-bit (the ``group_moments`` pattern).

    One shuffle (per-key ordered window for ``lead``), then a map-side
    combined (key, bucket) aggregate. Returns
    (keys…, ``bucket_start``, ``twa``, ``n_obs``).
    """
    keys = _as_list(by)
    b = int(bucket)
    ts = F.col(ts_col).cast("bigint")
    tiebreaks = _as_list(order_cols)
    staged = (
        df.where(ts.isNotNull() & F.col(value_col).isNotNull())
        .select(
            *keys,
            *tiebreaks,
            ts.alias("__t"),
            F.expr(
                f"cast(round(`{value_col}` * 1000000, 0) as bigint)"
            ).alias("__v"),
        )
        .withColumn("__next", F.lead("__t").over(
            Window.partitionBy(*keys).orderBy(
                F.col("__t").asc(), *[F.col(c).asc() for c in tiebreaks]
            )
        ))
        # zero-duration steps (duplicate timestamps) carry no weight and
        # must not reach the explode: on an exact bucket boundary
        # last_b < first_b and F.sequence would generate a DESCENDING
        # range, emitting spurious segments (inflated n_obs, possible
        # 0/0 NaN buckets)
        .where(F.col("__next") > F.col("__t"))
    )
    # explode the observation across the buckets it spans: segment k
    # covers [max(t, k*b), min(next, (k+1)*b)) — generated distributed
    # via sequence() over bucket indices, never on the driver
    first_b = F.expr(f"__t div {b}")
    last_b = F.expr(f"(__next - 1) div {b}")
    seg = staged.select(
        *keys,
        "__v",
        "__t",
        "__next",
        F.explode(F.sequence(first_b, last_b)).alias("__bk"),
    ).select(
        *keys,
        "__v",
        (F.col("__bk") * b).alias("bucket_start"),
        (
            F.least(F.col("__next"), (F.col("__bk") + 1) * b)
            - F.greatest(F.col("__t"), F.col("__bk") * b)
        ).alias("__w"),
    )
    agg = seg.groupBy(*keys, "bucket_start").agg(
        F.sum(
            (F.col("__v").cast("decimal(38,0)") * F.col("__w")).cast(
                "decimal(38,0)"
            )
        ).alias("__num"),
        F.sum(F.col("__w").cast("decimal(38,0)")).alias("__den"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    twa = (
        F.col("__num").cast("double")
        / F.col("__den").cast("double")
        / F.lit(1000000.0)
    )
    return agg.select(
        *keys,
        "bucket_start",
        F.round(twa, 6).alias("twa"),
        F.col("n_obs").cast("bigint").alias("n_obs"),
    )
