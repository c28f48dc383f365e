"""Mergeable sketches for corpus-scale statistics: count-min sketch
(point-frequency estimates over unbounded key spaces) and Bloom filter
(membership screening without a join against the full reference set).

Why sketches at 100 TB: an exact token-frequency table over a web corpus
is itself huge (vocabulary grows with the corpus) and must be re-derived
per corpus version; a CMS is a FIXED-SIZE artifact (depth x width cells)
built in one scan whose shuffle is bounded by depth*width per mapper
regardless of corpus size or key skew, and two corpora's sketches merge
by cell-wise addition. A Bloom filter plays the same role for membership
(e.g. "was this fingerprint in the eval set / the previous crawl?"):
k*|keys| set bits packed into fixed-width int64 words, probed without
shuffling the probe side.

All hashing is md5-derived integer arithmetic (same family as
pipeline/dedup.py's span keys): ``conv(substr(md5(key||':'||i)),16,10)``
— bit-identical in any engine with md5 + string concat, which is what
makes the driver's DuckDB oracles able to replay every cell and bit.

Honesty note on heavy hitters: in Spark, *enumerating* keys above a
frequency floor is best done by the engine itself — ``groupBy(key)
.count().where(>= T)`` already performs Misra-Gries-style local
compression via map-side partial aggregation, so a sketch-based
candidate pass would only add scans. The sketch's value is point
queries, cross-shard merging, and screening NEW batches against an
already-summarized corpus (the ``incremental_dedup`` pattern) — not
replacing the one-shuffle exact aggregate. ``heavy_hitters`` therefore
IS the exact aggregate, and ``cms_estimate`` exists for the lookups
that shouldn't rescan the corpus.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "heavy_hitters",
    "bloom_build",
    "bloom_probe",
    "bloom_merge",
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "group_distinct_approx",
]


def _md5_int(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint — the cross-engine
    portable hash (DuckDB: ``('0x' || substr(md5(x),1,15))::bigint``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 8192,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Build a count-min sketch over a key column (one occurrence = count 1,
    or ``weight_col`` for weighted counts). Returns rows
    ``(sketch_row, cell, count)`` — at most ``depth * width`` of them.

    Scale design: the posexplode makes ``depth`` rows per occurrence, but
    they immediately enter a hash aggregate whose key space is capped at
    depth*width, so map-side partial aggregation collapses everything
    before the exchange — the shuffle carries at most depth*width rows
    per mapper no matter how large or skewed the corpus is. The output is
    broadcastable by construction (32k cells at the defaults).

    Estimate error: with probability 1 - (1/2)^depth, an estimate
    overshoots the true count by at most (total_count / width); CMS never
    undercounts.
    """
    k = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.pmod(_md5_int(F.concat(k, F.lit(f":{i}"))), F.lit(width))
            for i in range(depth)
        ]
    )
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    return (
        df.select(w.alias("__w"), F.posexplode(cells).alias("sketch_row", "cell"))
        .groupBy("sketch_row", "cell")
        .agg(F.sum("__w").alias("count"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a built sketch: the min
    over the key's ``depth`` cells (absent cell = 0). ``depth``/``width``
    must match the build.

    Scale design: the sketch is <= depth*width rows and is explicitly
    broadcast — the (possibly huge) key side is never shuffled; each key
    reads its depth cells map-side and folds them with one bounded
    groupBy on the key itself (depth rows per key in, one out).
    """
    k = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(
                *[
                    F.pmod(_md5_int(F.concat(k, F.lit(f":{i}"))), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("sketch_row", "cell"),
    )
    return (
        probes.join(F.broadcast(sketch), ["sketch_row", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).alias("est_count"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): cell-wise sum.
    This is the cross-shard / cross-day composition path — each shard
    summarizes locally, only depth*width rows per shard move."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("sketch_row", "cell").agg(F.sum("count").alias("count"))


def heavy_hitters(
    df: DataFrame,
    key_col: str = "key",
    min_count: int = 2,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Exact keys with total count >= min_count. Deliberately NOT
    sketch-based (see module docstring): Spark's hash aggregate with
    map-side partial aggregation is already the optimal single-pass plan —
    per-partition partial counts are the Misra-Gries summary, the exchange
    carries one row per (partition, distinct-key-in-partition), and AQE
    handles skewed reducers."""
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    return (
        df.select(F.col(key_col), w.alias("__w"))
        .groupBy(key_col)
        .agg(F.sum("__w").alias("count"))
        .where(F.col("count") >= F.lit(min_count))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970), packed into int64 words
# ---------------------------------------------------------------------------


def _bloom_word_mask(key: Column, i: int, num_bits: int) -> tuple[Column, Column]:
    pos = F.pmod(_md5_int(F.concat(key, F.lit(f"#{i}"))), F.lit(num_bits))
    word = (pos / F.lit(64)).cast("bigint")
    # F.shiftleft only accepts a literal shift; the SQL function takes a column
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), F.pmod(pos, F.lit(64)).cast("int")
    )
    return word, mask


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a Bloom filter over a key set, packed as int64 words:
    rows ``(word, bits)`` with at most ``num_bits/64`` rows.

    Scale design: each key emits its ``num_hashes`` (word, bit) pairs and
    a bounded-key-space hash aggregate ORs them — the shuffle is capped at
    num_bits/64 rows per mapper (16k words at the 1M-bit default). The
    result is a fixed-size, broadcastable, mergeable artifact: false
    positive rate ~= (1 - e^(-k*n/m))^k, zero false negatives.
    """
    k = F.col(key_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                _bloom_word_mask(k, i, num_bits)[0].alias("word"),
                _bloom_word_mask(k, i, num_bits)[1].alias("mask"),
            )
            for i in range(num_hashes)
        ]
    )
    ex = keys.select(F.explode(pairs).alias("p")).select("p.word", "p.mask")
    # bit_or partial-aggregates map-side exactly like sum
    return ex.groupBy("word").agg(
        F.bit_or(F.col("mask")).alias("bits")
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    result_col: str = "maybe_member",
) -> DataFrame:
    """Screen rows against a built filter: adds ``result_col`` true iff
    EVERY probe bit is set (possible member — definite members always
    pass; non-members pass only at the filter's false-positive rate).
    ``num_bits``/``num_hashes`` must match the build.

    Scale design: the probe side is NEVER shuffled and never grows — the
    plan is ``num_hashes`` chained broadcast-hash left joins of the same
    <= num_bits/64-row word table (128 KiB at the defaults), all map-side
    in one stage, followed by a pure Column AND over the joined bits. For
    the decontamination use this replaces a join against the full
    reference key set with joins against a fixed-size artifact.
    """
    k = F.col(key_col).cast("string")
    out = df
    hit_cols = []
    for i in range(num_hashes):
        word, mask = _bloom_word_mask(k, i, num_bits)
        side = bloom.select(
            F.col("word").alias(f"__bw{i}"), F.col("bits").alias(f"__bb{i}")
        )
        out = (
            out.withColumn(f"__w{i}", word)
            .withColumn(f"__m{i}", mask)
            .join(F.broadcast(side), F.col(f"__w{i}") == F.col(f"__bw{i}"), "left")
        )
        hit_cols.append(
            F.coalesce(F.col(f"__bb{i}"), F.lit(0)).bitwiseAND(F.col(f"__m{i}")) != 0
        )
    flag = hit_cols[0]
    for h in hit_cols[1:]:
        flag = flag & h
    drop = [c for i in range(num_hashes) for c in (f"__w{i}", f"__m{i}", f"__bw{i}", f"__bb{i}")]
    return out.withColumn(result_col, flag).drop(*drop)


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """OR together filters built with identical (num_bits, num_hashes)."""
    if not filters:
        raise ValueError("bloom_merge needs at least one filter")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or(F.col("bits")).alias("bits"))


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007)
# ---------------------------------------------------------------------------

HLL_HEX_REG_DIGITS = 3  # 12 register-index bits -> m = 4096 registers
HLL_M = 16 ** HLL_HEX_REG_DIGITS
_HLL_RHO_HEX_DIGITS = 13  # 52 rank bits; rho in [1, 53]


def hll_sketch(df: DataFrame, col: str) -> DataFrame:
    """HyperLogLog registers for the distinct count of ``col``: one
    map-side-combined aggregate producing (``register``, ``max_rho``) —
    only OBSERVED registers are emitted, so the sketch is a tiny
    (<= 4096-row) mergeable table however big the input.

    Engine-portable by construction: the 64-bit-ish hash is md5 hex
    (identical strings everywhere), the register index is the first 3
    hex digits, and rho is 1 + leading-zeros of the next 52 bits decoded
    via binary-string arithmetic — every step replays exactly in any SQL
    engine, so two systems building sketches of the same data produce
    bit-equal registers (the property that lets a Spark-built sketch be
    merged with one built elsewhere).

    Merge = ``unionByName -> groupBy(register).max(max_rho)``
    (:func:`hll_merge`); estimate = :func:`hll_estimate`. Spark's own
    ``approx_count_distinct`` is also HLL but its sketch is not
    exportable/mergeable across engines — this one is the PIPELINE
    artifact (per-shard distinct-count state a 100 TB ingest keeps per
    partition/day and folds associatively).
    """
    h = F.md5(F.col(col).cast("string"))
    staged = df.where(F.col(col).isNotNull()).select(
        F.conv(F.substring(h, 1, HLL_HEX_REG_DIGITS), 16, 10)
        .cast("int")
        .alias("register"),
        F.lpad(
            F.conv(
                F.substring(h, HLL_HEX_REG_DIGITS + 1, _HLL_RHO_HEX_DIGITS),
                16,
                2,
            ),
            4 * _HLL_RHO_HEX_DIGITS,
            "0",
        ).alias("__bits"),
    )
    rho = F.expr(
        f"{4 * _HLL_RHO_HEX_DIGITS + 1} - "
        "length(trim(LEADING '0' FROM __bits))"
    )
    return (
        staged.select("register", rho.cast("int").alias("__rho"))
        .groupBy("register")
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge HLL sketches: per-register max — associative/commutative/
    idempotent, so shard-parallel or incremental building is exact."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(sketch: DataFrame) -> float:
    """Distinct-count estimate from an ``hll_sketch`` table: the standard
    HLL harmonic mean with the small-range linear-counting correction
    (Flajolet et al. 2007 §4; typical error ~1.04/sqrt(4096) = 1.6%).
    The collect is <= 4096 rows of model state."""
    import math

    m = HLL_M
    regs = {int(r["register"]): int(r["max_rho"]) for r in sketch.collect()}
    zeros = m - len(regs)
    s = float(zeros)  # 2^-0 per empty register
    for rho in regs.values():
        s += 2.0 ** (-rho)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / s
    if e <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)  # linear counting
    return e


def group_distinct_approx(
    df: DataFrame,
    group_cols: "Sequence[str]",
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group approximate distinct counts, fully DISTRIBUTED — no
    per-group driver collect, so millions of groups are fine: the HLL
    registers aggregate keyed by (group, register) (<= 4096 rows per
    group whatever the group's size), then one more group-keyed
    aggregate evaluates the Flajolet estimator with the linear-counting
    small-range correction in place.

    Exactness discipline for the estimator inputs: the harmonic-mean
    denominator Σ 2^-rho is accumulated as EXACT integers — each term
    is 2^(53-rho), a whole number since rho <= 53, summed in
    decimal(38,0) (4096 * 2^52 overflows int64) — and converted to
    double once, so the estimate is bit-identical in any engine (the
    group_moments pattern). Typical error ~1.6% (m = 4096).

    Spark's approx_count_distinct gives the same numbers cheaper if you
    don't need engine portability or mergeable state; this exists so
    per-group sketches share the hll_sketch register format.

    Output: (group cols…, ``n_registers``, ``zeros``, ``estimate``).
    NULL values are excluded (matching count(DISTINCT)).
    """
    groups = list(group_cols)
    h = F.md5(F.col(value_col).cast("string"))
    staged = df.where(F.col(value_col).isNotNull()).select(
        *groups,
        F.conv(F.substring(h, 1, HLL_HEX_REG_DIGITS), 16, 10)
        .cast("int")
        .alias("register"),
        F.lpad(
            F.conv(
                F.substring(h, HLL_HEX_REG_DIGITS + 1, _HLL_RHO_HEX_DIGITS),
                16,
                2,
            ),
            4 * _HLL_RHO_HEX_DIGITS,
            "0",
        ).alias("__bits"),
    )
    rho = F.expr(
        f"{4 * _HLL_RHO_HEX_DIGITS + 1} - "
        "length(trim(LEADING '0' FROM __bits))"
    )
    regs = (
        staged.select(*groups, "register", rho.cast("int").alias("__rho"))
        .groupBy(*groups, "register")
        .agg(F.max("__rho").alias("max_rho"))
    )
    m = HLL_M
    # 2^(53 - rho) is exact; decimal(38,0) holds the full-register sum
    term = F.pow(F.lit(2.0), (F.lit(53) - F.col("max_rho")).cast("double"))
    agg = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(term.cast("decimal(38,0)")).alias("__s_int"),
    )
    zeros = (F.lit(m) - F.col("n_registers")).cast("bigint")
    # s = zeros * 2^0 + Σ 2^-rho  (scaled by 2^53 while integer)
    s = (
        F.col("__s_int").cast("double") / F.lit(float(2**53))
        + zeros.cast("double")
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m) / s
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lin).otherwise(raw)
    return agg.select(
        *groups,
        F.col("n_registers").cast("bigint").alias("n_registers"),
        zeros.alias("zeros"),
        F.round(est, round_to).alias("estimate"),
    )
