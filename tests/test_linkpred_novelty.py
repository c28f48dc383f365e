"""Tests for link_prediction_scores (graph.py), weighted_sample_per_group
and ngram_novelty (curation.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline.curation import (
    ngram_novelty,
    weighted_sample_per_group,
)
from splink_spark.pipeline.graph import link_prediction_scores

networkx = pytest.importorskip("networkx")


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 1), (2, 6), (6, 3), (6, 7),
]


def _edge_df(spark):
    return spark.createDataFrame(EDGES, "src bigint, dst bigint")


def test_resource_allocation_matches_networkx(spark):
    out = link_prediction_scores(
        _edge_df(spark), index="resource_allocation"
    ).collect()
    g = networkx.Graph(EDGES)
    for r in out:
        expected = sum(
            1.0 / g.degree[z]
            for z in networkx.common_neighbors(g, r["node_a"], r["node_b"])
        )
        assert r["score"] == pytest.approx(expected, abs=1e-5), (
            r["node_a"],
            r["node_b"],
        )
        assert r["n_common"] == len(
            list(networkx.common_neighbors(g, r["node_a"], r["node_b"]))
        )


def test_adamic_adar_matches_networkx(spark):
    out = link_prediction_scores(
        _edge_df(spark), index="adamic_adar"
    ).collect()
    g = networkx.Graph(EDGES)
    for r in out:
        expected = sum(
            1.0 / math.log(g.degree[z])
            for z in networkx.common_neighbors(g, r["node_a"], r["node_b"])
        )
        assert r["score"] == pytest.approx(expected, abs=1e-5)


def test_link_prediction_rejects_unknown_index(spark):
    with pytest.raises(ValueError):
        link_prediction_scores(_edge_df(spark), index="katz")


def test_weighted_sample_per_group_shape_and_determinism(spark):
    rows = [(i, "g%d" % (i % 3), float(1 + i % 7)) for i in range(60)]
    rows.append((999, "g0", 0.0))  # weight 0: excluded
    df = spark.createDataFrame(rows, "doc_id bigint, grp string, w double")
    out = weighted_sample_per_group(df, 5, "w", "grp", id_col="doc_id")
    per = {r[0]: r[1] for r in out.groupBy("grp").count().collect()}
    assert per == {"g0": 5, "g1": 5, "g2": 5}
    assert 999 not in {r["doc_id"] for r in out.collect()}
    again = weighted_sample_per_group(df, 5, "w", "grp", id_col="doc_id")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    # different seed draws a different (valid) set
    other = weighted_sample_per_group(df, 5, "w", "grp", id_col="doc_id", seed=7)
    assert {r["doc_id"] for r in other.collect()} != {
        r["doc_id"] for r in out.collect()
    }
    # top-k nesting: the 3 winners are a subset of the 5 winners
    three = weighted_sample_per_group(df, 3, "w", "grp", id_col="doc_id")
    assert {r["doc_id"] for r in three.collect()} <= {
        r["doc_id"] for r in out.collect()
    }


def test_ngram_novelty_hand_computed(spark):
    corpus = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams(2): ab, bc, cd
            (2, "a b x y"),        # grams(2): ab, bx, xy
            (3, "z"),              # too short: 0 grams
        ],
        "doc_id bigint, text string",
    )
    ref = spark.createDataFrame([(10, "a b c")], "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_ppm"])
        for r in ngram_novelty(corpus, ref, n=2).collect()
    }
    # ref grams: "a b", "b c"
    assert out[1] == (3, 1, 333333)   # only "c d" novel
    assert out[2] == (3, 2, 666666)   # "b x", "x y" novel
    assert out[3] == (0, 0, None)


def test_winsorize_clamps_to_group_quantile_bounds(spark):
    from splink_spark.pipeline.analytics import winsorize

    rows = [(i, "a" if i < 20 else None, float(i)) for i in range(40)]
    rows.append((100, "a", None))
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    out = winsorize(df, ["g"], "v", lower=0.1, upper=0.9)
    a = {r["id"]: r["v_winsorized"] for r in out.collect() if r["g"] == "a"}
    # group a = 0..19: lower rank ceil(0.1*20)=2 -> 1.0, upper rank 18 -> 17.0
    assert a[0] == 1.0 and a[19] == 17.0 and a[5] == 5.0
    assert a[100] is None  # NULL value passes through NULL
    n = {r["id"]: r["v_winsorized"] for r in out.collect() if r["g"] is None}
    # NULL-key group (20..39) winsorizes like any other: rank2=21, rank18=37
    assert n[20] == 21.0 and n[39] == 37.0 and n[25] == 25.0
    assert out.count() == 41
    with pytest.raises(ValueError):
        winsorize(df, ["g"], "v", lower=0.9, upper=0.1)


def test_bipartite_project_counts_shared_left_nodes(spark):
    from splink_spark.pipeline.graph import bipartite_project

    rows = [
        ("o1", "p1"), ("o1", "p2"), ("o1", "p3"),
        ("o2", "p1"), ("o2", "p2"),
        ("o3", "p2"), ("o3", "p3"),
        ("o3", "p2"),           # duplicate edge: ignored
        (None, "p9"), ("o4", None),  # null endpoints dropped
    ]
    df = spark.createDataFrame(rows, "left string, right string")
    out = {
        (r["node_a"], r["node_b"]): r["weight"]
        for r in bipartite_project(df).collect()
    }
    assert out == {
        ("p1", "p2"): 2,   # o1, o2
        ("p1", "p3"): 1,   # o1
        ("p2", "p3"): 2,   # o1, o3
    }
    strong = bipartite_project(df, min_weight=2).collect()
    assert {(r["node_a"], r["node_b"]) for r in strong} == {
        ("p1", "p2"), ("p2", "p3")
    }


def test_bipartite_project_hub_cap_warns(spark):
    import warnings

    from splink_spark.pipeline.graph import bipartite_project

    rows = [("hub", f"p{i}") for i in range(30)] + [("o", "p0"), ("o", "p1")]
    df = spark.createDataFrame(rows, "left string, right string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = bipartite_project(df, auto_cap=10).collect()
    assert any("auto_cap" in str(x.message) for x in w)
    # hub dropped: only o's single pair survives
    assert {(r["node_a"], r["node_b"]) for r in out} == {("p0", "p1")}


def test_robust_outliers_median_mad(spark):
    from splink_spark.pipeline.analytics import robust_outliers

    rows = [(i, "a", float(i % 10)) for i in range(50)]
    rows += [(99, "a", 1000.0), (98, "a", None), (97, "b", 5.0), (96, "b", 5.0)]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    out = {r["id"]: r["robust_z"] for r in robust_outliers(df, ["g"], "v").collect()}
    # only the 1000.0 spike flags; MAD=0 group b flags nothing; NULL skipped
    assert set(out) == {99}
    # median of a = 5.0 (rank 26 of 51), MAD = 3.0: z = .6745*(1000-5)/3
    import pytest as _p
    assert out[99] == _p.approx(0.6745 * (1000.0 - 5.0) / 3.0, abs=1e-4)


def test_column_correlations_matches_spark_corr(spark):
    import random

    from splink_spark.pipeline.analytics import column_correlations

    rng = random.Random(1)
    rows = [
        (float(i), 2.0 * i + rng.random() * 10, rng.random() * 100, 7.0)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in column_correlations(df, ["a", "b", "c", "d"]).collect()
    }
    assert len(got) == 6
    for (a, b), v in got.items():
        if v is None:
            # zero-variance column -> NULL (Spark's own F.corr raises
            # DIVIDE_BY_ZERO here under ANSI mode)
            assert b == "d" or a == "d"
        else:
            ref = df.agg(F.corr(a, b)).collect()[0][0]
            assert abs(v - ref) < 1e-4, (a, b, v, ref)
    with pytest.raises(ValueError):
        column_correlations(df, ["a"])
