"""Scalable fuzzy equi-joins: deletion-neighborhood blocking (the FastSS
family — Bocek et al. 2007, also the spelling-correction trick behind
SymSpell). Levenshtein-distance-1 candidate pairs WITHOUT a quadratic
comparison: two strings within edit distance 1 share at least one
member of their single-deletion neighborhoods, so generating the ≤ L+1
deletion variants per string turns the fuzzy join into a plain
equi-join on the variant key + an exact verify on the candidates.

Scale shape: variants per string = length+1 (bounded by ``max_len``),
generated JVM-side with higher-order functions; the join is a hash
equi-join on the variant; the exact ``levenshtein`` verify runs only on
candidates. Contrast with the linkage engine's blocking rules: this is
the right tool when there is NO other blocking key and the value set is
large (a raw θ-join on levenshtein <= 1 is quadratic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "deletion_variants",
    "fuzzy_join_ed1",
    "sorted_neighborhood_pairs",
    "jaccard_similarity_join",
]


def deletion_variants(col: Column, max_len: int = 64) -> Column:
    """Array of the string itself plus every single-character-deletion
    variant (distinct). Strings longer than ``max_len`` contribute only
    themselves — a guard against pathological long values blowing up the
    variant table; such strings still match EXACT duplicates."""
    s = col
    full = F.array(s)
    # deletion of position i: prefix [1, i-1] + suffix [i+1, end]
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
        ),
    )
    return F.when(
        (F.length(s) > int(max_len)) | s.isNull(), full
    ).otherwise(F.array_distinct(F.concat(full, dels)))


def fuzzy_join_ed1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    max_len: int = 64,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(left_col, right_col)``
    <= 1, as (``left_id``, ``right_id``, left value, right value,
    distance) — exact (the deletion-neighborhood property guarantees no
    candidate is missed at distance 1), deduplicated, deterministic.

    Skew honesty: VERY short values are promiscuous — every 1-character
    string is within distance 1 of every other, so their candidate set
    is quadratic in their count. That is the semantics, not a plan
    artifact; pre-filter values below a sensible length for your domain
    before joining (names/codes are fine, single letters are not).
    """
    lv = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_col).alias("__lval"),
        F.explode(deletion_variants(F.col(left_col), max_len)).alias("__var"),
    )
    rv = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_col).alias("__rval"),
        F.explode(deletion_variants(F.col(right_col), max_len)).alias("__var"),
    )
    cand = lv.join(rv, "__var").select(
        "__lid", "__lval", "__rid", "__rval"
    ).distinct()
    dist = F.levenshtein(F.col("__lval"), F.col("__rval"))
    return (
        cand.withColumn("distance", dist)
        .where(F.col("distance") <= 1)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__lval").alias(left_col),
            F.col("__rval").alias(right_col),
            "distance",
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge):
    order records by a sorting key and emit every pair within ``window``
    positions — the classic alternative to equality blocking when keys
    are dirty (typo-adjacent values usually sort near each other).

    Plan: one global rank (row_number over the key order, ties broken by
    the id for determinism), then ``window`` self-equi-joins on
    ``rank = rank + d`` (d = 1..window) — each is a co-partitioned hash
    join on the rank, never a window carrying a growing buffer, and the
    output is exactly ``window * (n-1) - ...`` bounded pairs. The global
    sort is the scale limiter (same as any sorted-neighborhood
    implementation); shard by a coarse prefix first if one sort is too
    hot.

    Output: (``id_l``, ``id_r``, ``key_l``, ``key_r``, ``rank_gap``)
    with ``id_l``/``id_r`` ordered by rank (not id).
    """
    from pyspark.sql import Window as W

    if window < 1:
        raise ValueError("window must be >= 1")
    ranked = df.select(
        F.col(id_col).alias("__id"), F.col(key_col).alias("__key")
    ).withColumn(
        "__rank",
        F.row_number().over(
            W.orderBy(F.col("__key").asc(), F.col("__id").asc())
        ),
    )
    l = ranked.select(
        F.col("__id").alias("id_l"),
        F.col("__key").alias("key_l"),
        F.col("__rank").alias("__rl"),
    )
    pieces = []
    for d in range(1, int(window) + 1):
        r = ranked.select(
            F.col("__id").alias("id_r"),
            F.col("__key").alias("key_r"),
            (F.col("__rank") - d).alias("__rl"),
        )
        pieces.append(
            l.join(r, "__rl").select(
                "id_l", "id_r", "key_l", "key_r", F.lit(d).alias("rank_gap")
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def jaccard_similarity_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold: float,
    keep_tokens: bool = False,
    dense_max_vocab: "int | None" = None,
) -> DataFrame:
    """EXACT-threshold Jaccard self-join via prefix filtering (the
    PPJoin/AllPairs family — Bayardo et al. WWW'07, Xiao et al. WWW'08):
    every pair of records whose token-SET Jaccard similarity is
    >= ``threshold``, with no false negatives — the guarantee
    ``dedup.minhash_lsh`` trades away for speed.

    Prefix-filter theorem: order every record's tokens by a global total
    order (here: ascending corpus frequency, ties by token — rarest
    first) and keep only the first ``n - ceil(t*n) + 1`` tokens (the
    "prefix"); two sets with Jaccard >= t MUST share a prefix token. So
    candidates come from a plain equi-join of the exploded prefixes —
    the rarest tokens of each record, which is exactly what bounds the
    join's fan-out — and only candidates pay the exact verification.

    All threshold arithmetic is integer (the ceil on doubles misrounds):
    t is snapped to millionths, ``ceil(t*n) = (t_ppm*n + 999999) div
    1e6``, and the verify compares ``1e6 * |∩| >= t_ppm * |∪|`` — no
    float ever decides membership, so any engine replays it exactly.

    Scale shape: one token-frequency aggregate (map-side combined), a
    per-record JVM-side sort of (freq, token) structs, prefix explode
    (output ∝ corpus tokens * (1-t), NOT quadratic), hash equi-join on
    the token, distinct candidate pairs, then one join back to fetch both
    token sets for the exact intersection. The global frequency order
    needs no global rank assignment — (freq, token) itself is the order,
    so there is no single-partition row_number bottleneck.

    Output: (``id_l``, ``id_r``, ``n_intersect``, ``n_union``,
    ``jaccard_ppm``) with ``id_l < id_r``; ``jaccard_ppm`` is the exact
    truncating-integer millionths of the Jaccard.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    t_ppm = int(round(threshold * 1_000_000))

    base = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(F.col(tokens_col)).alias("__toks"),
    ).where(F.col("__toks").isNotNull() & (F.size("__toks") > 0))

    # dense regime (tiny vocabulary — prefix filtering stops pruning because
    # even the rarest tokens are frequent): bit-identical output via the
    # broadcast-matmul plan, see pipeline/dense.py.  ``dense_max_vocab``
    # None = default cap, 0 disables.
    if not keep_tokens and (dense_max_vocab is None or dense_max_vocab > 0):
        from .dense import DENSE_MAX_VOCAB, dense_jaccard_self_join

        dense = dense_jaccard_self_join(
            base, "__id", t_ppm, max_vocab=dense_max_vocab or DENSE_MAX_VOCAB
        )
        if dense is not None:
            return dense

    freq = (
        base.select(F.explode("__toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__freq"))
    )

    with_freq = (
        base.select("__id", F.explode("__toks").alias("token"))
        .join(freq, "token")
        .groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__freq", "token"))
            ).alias("__ordered")
        )
        .select(
            "__id",
            F.transform("__ordered", lambda s: s["token"]).alias("__toks"),
            F.size("__ordered").alias("__n"),
        )
    )
    # prefix_len = n - ceil(t*n) + 1, all-integer ceil
    prefix_len = (
        F.col("__n")
        - F.expr(f"(__n * {t_ppm} + 999999) div 1000000")
        + F.lit(1)
    )
    prefixes = with_freq.select(
        "__id",
        "__n",
        F.explode(F.slice("__toks", 1, prefix_len)).alias("token"),
    )

    pl = prefixes.select(
        F.col("__id").alias("id_l"), F.col("__n").alias("__nl"), "token"
    )
    pr = prefixes.select(
        F.col("__id").alias("id_r"), F.col("__n").alias("__nr"), "token"
    )
    # length filter rides the candidate join: Jaccard >= t forces
    # t*max(n1,n2) <= min(n1,n2); prune before the distinct
    cands = (
        pl.join(pr, "token")
        .where(F.col("id_l") < F.col("id_r"))
        .where(
            F.expr(f"least(__nl, __nr) * 1000000")
            >= F.expr(f"greatest(__nl, __nr) * {t_ppm}")
        )
        .select("id_l", "id_r")
        .distinct()
    )

    sets = with_freq.select("__id", "__toks", "__n")
    lt = sets.select(
        F.col("__id").alias("id_l"),
        F.col("__toks").alias("__tl"),
        F.col("__n").alias("__nl"),
    )
    rt = sets.select(
        F.col("__id").alias("id_r"),
        F.col("__toks").alias("__tr"),
        F.col("__n").alias("__nr"),
    )
    inter = F.size(F.array_intersect("__tl", "__tr"))
    union = F.col("__nl") + F.col("__nr") - inter
    verified = (
        cands.join(lt, "id_l")
        .join(rt, "id_r")
        .withColumn("n_intersect", inter.cast("bigint"))
        .withColumn("n_union", union.cast("bigint"))
        .where(
            F.col("n_intersect") * F.lit(1_000_000)
            >= F.lit(t_ppm) * F.col("n_union")
        )
        .withColumn(
            "jaccard_ppm",
            F.expr("(n_intersect * 1000000) div n_union"),
        )
    )
    cols = ["id_l", "id_r", "n_intersect", "n_union", "jaccard_ppm"]
    if keep_tokens:
        cols += ["__tl", "__tr"]
    return verified.select(*cols)
