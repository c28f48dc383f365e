"""Count-min sketch and Bloom filter: exactness/containment properties vs
exact Python references, merge laws, and plan-shape pins (bounded shuffles,
broadcast-only probes)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline.sketches import (
    bloom_build,
    bloom_merge,
    bloom_probe,
    cms_build,
    cms_estimate,
    cms_merge,
    heavy_hitters,
)


@pytest.fixture(scope="module")
def words(spark):
    rows = (
        [("the",)] * 40 + [("of",)] * 25 + [("linkage",)] * 9 + [("spark",)] * 3
        + [(f"tail{i}",) for i in range(60)]
    )
    return spark.createDataFrame(rows, ["key"]), Counter(r[0] for r in rows)


def test_cms_never_undercounts_and_is_tight_when_wide(spark, words):
    df, truth = words
    sketch = cms_build(df, depth=4, width=4096)
    keys = spark.createDataFrame([(k,) for k in truth], ["key"])
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(sketch, keys, depth=4, width=4096).collect()
    }
    for k, true_n in truth.items():
        assert est[k] >= true_n, k  # CMS never undercounts
    # at width >> distinct keys, collisions are rare: the heavy keys exact
    assert est["the"] == 40 and est["of"] == 25


def test_cms_absent_key_estimates_small(spark, words):
    df, truth = words
    sketch = cms_build(df, depth=4, width=4096)
    keys = spark.createDataFrame([("never-seen-key",)], ["key"])
    est = cms_estimate(sketch, keys, depth=4, width=4096).collect()[0]["est_count"]
    assert 0 <= est <= 3  # bounded by total/width scale collisions


def test_cms_merge_equals_build_over_union(spark, words):
    df, _ = words
    a = df.where(F.md5("key").startswith("a") | F.md5("key").startswith("b"))
    b = df.subtract(a)  # multiset caveat avoided: subtract is set-based, so
    # instead split deterministically by row hash
    df_i = df.withColumn("__i", F.monotonically_increasing_id())
    a = df_i.where(F.col("__i") % 2 == 0).drop("__i")
    b = df_i.where(F.col("__i") % 2 == 1).drop("__i")
    merged = cms_merge(cms_build(a, width=512), cms_build(b, width=512))
    direct = cms_build(df, width=512)
    got = {(r["sketch_row"], r["cell"]): r["count"] for r in merged.collect()}
    want = {(r["sketch_row"], r["cell"]): r["count"] for r in direct.collect()}
    assert got == want


def test_heavy_hitters_exact(spark, words):
    df, truth = words
    out = {r["key"]: r["count"] for r in heavy_hitters(df, min_count=5).collect()}
    want = {k: n for k, n in truth.items() if n >= 5}
    assert out == want


def test_cms_weighted(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)], ["key", "w"])
    sketch = cms_build(df, weight_col="w", width=1024)
    keys = spark.createDataFrame([("a",), ("b",)], ["key"])
    est = {r["key"]: r["est_count"] for r in cms_estimate(sketch, keys, width=1024).collect()}
    assert est["a"] == 15 and est["b"] == 2


def test_bloom_no_false_negatives_and_low_fp(spark):
    members = spark.createDataFrame([(f"member-{i}",) for i in range(200)], ["key"])
    probes = spark.createDataFrame(
        [(f"member-{i}",) for i in range(200)]
        + [(f"other-{i}",) for i in range(500)],
        ["key"],
    )
    bloom = bloom_build(members, num_bits=1 << 14, num_hashes=5)
    out = bloom_probe(probes, bloom, num_bits=1 << 14, num_hashes=5)
    rows = {r["key"]: r["maybe_member"] for r in out.collect()}
    for i in range(200):
        assert rows[f"member-{i}"], "bloom false negative"
    fp = sum(rows[f"other-{i}"] for i in range(500))
    # m=16384, k=5, n=200 → fpr ~ 3e-6; allow generous slack
    assert fp <= 2, fp


def test_bloom_merge_is_union(spark):
    a = spark.createDataFrame([("x",), ("y",)], ["key"])
    b = spark.createDataFrame([("z",)], ["key"])
    m = bloom_merge(
        bloom_build(a, num_bits=4096, num_hashes=3),
        bloom_build(b, num_bits=4096, num_hashes=3),
    )
    direct = bloom_build(a.unionByName(b), num_bits=4096, num_hashes=3)
    got = {r["word"]: r["bits"] for r in m.collect()}
    want = {r["word"]: r["bits"] for r in direct.collect()}
    assert got == want


def test_bloom_probe_plan_is_broadcast_only_no_exchange_on_probe(spark):
    """The probe side must not shuffle: every join is a BroadcastHashJoin
    and no Exchange hashes the probe rows (the only exchanges allowed are
    on the tiny word table feeding the broadcasts)."""
    members = spark.createDataFrame([("m1",), ("m2",)], ["key"])
    bloom = bloom_build(members, num_bits=4096, num_hashes=4)
    probes = spark.range(1000).select(F.concat(F.lit("p"), F.col("id")).alias("key"))
    out = bloom_probe(probes, bloom, num_bits=4096, num_hashes=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_cms_build_shuffle_is_bounded_hash_aggregate(spark):
    """cms_build's exchange must be the partial-aggregated (sketch_row, cell)
    key space, never raw occurrences: the plan shows HashAggregate below the
    Exchange (map-side combine)."""
    df = spark.range(10000).select((F.col("id") % 7).cast("string").alias("key"))
    plan = cms_build(df, width=64)._jdf.queryExecution().executedPlan().toString()
    before_exchange = plan.split("Exchange")[-1]  # text BELOW/after is the map side
    assert "HashAggregate" in before_exchange


def test_hll_estimate_accuracy_and_exact_state(spark):
    """HLL estimate within ~5% at 20k distinct (theoretical RSE 1.6% at
    m=4096); the register table is deterministic (same data, same
    sketch, any partitioning)."""
    from splink_spark.pipeline.sketches import hll_estimate, hll_sketch

    df = spark.range(20_000).select(
        F.concat(F.lit("user_"), F.col("id")).alias("v")
    )
    sk = hll_sketch(df, "v")
    est = hll_estimate(sk)
    assert abs(est - 20_000) / 20_000 < 0.05
    # partitioning-invariant state
    a = sorted(map(tuple, sk.collect()))
    b = sorted(map(tuple, hll_sketch(df.repartition(7), "v").collect()))
    assert a == b
    # duplicates don't move the estimate: distinct-ness only
    dup = df.unionByName(df).unionByName(df)
    c = sorted(map(tuple, hll_sketch(dup, "v").collect()))
    assert a == c


def test_hll_merge_equals_whole_corpus_sketch(spark):
    from splink_spark.pipeline.sketches import (
        hll_estimate, hll_merge, hll_sketch,
    )

    df = spark.range(8_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("v"), F.col("id")
    )
    left = df.where("id % 2 = 0")
    right = df.where("id % 2 = 1")
    merged = hll_merge(hll_sketch(left, "v"), hll_sketch(right, "v"))
    whole = hll_sketch(df, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # overlapping shards: idempotent max, still equal to the whole
    over = hll_merge(
        hll_sketch(df.where("id < 5000"), "v"),
        hll_sketch(df.where("id >= 3000"), "v"),
    )
    assert sorted(map(tuple, over.collect())) == sorted(
        map(tuple, whole.collect())
    )
    assert abs(hll_estimate(merged) - 8000) / 8000 < 0.06


def test_hll_small_range_linear_counting(spark):
    from splink_spark.pipeline.sketches import hll_estimate, hll_sketch

    df = spark.createDataFrame([(f"x{i}",) for i in range(50)], ["v"])
    est = hll_estimate(hll_sketch(df, "v"))
    assert abs(est - 50) < 3  # linear counting is near-exact here


def test_group_distinct_approx_accuracy_and_determinism(spark):
    from splink_spark.pipeline.sketches import group_distinct_approx

    rows = [(f"g{i % 3}", f"v{i % (1000 * (1 + i % 3))}") for i in range(30000)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r["g"]: r for r in group_distinct_approx(df, ["g"], "v").collect()}
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        est = out[g]["estimate"]
        assert abs(est - n) / n < 0.06, (g, est, n)  # m=4096 -> ~1.6% typical
    # deterministic: identical second run
    again = {r["g"]: r["estimate"] for r in
             group_distinct_approx(df, ["g"], "v").collect()}
    assert again == {g: r["estimate"] for g, r in out.items()}


def test_group_distinct_approx_small_groups_use_linear_counting(spark):
    from splink_spark.pipeline.sketches import group_distinct_approx

    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(5)] + [("b", "only")],
        "g string, v string",
    )
    out = {r["g"]: r["estimate"] for r in
           group_distinct_approx(df, ["g"], "v").collect()}
    # linear counting is near-exact at tiny cardinalities
    assert round(out["a"]) == 5 and round(out["b"]) == 1
