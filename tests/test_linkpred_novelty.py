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
