"""Hilbert-curve layout key tests (splink_spark/pipeline/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline.layout import (
    hilbert_index,
    hilbert_key,
    hilbert_sort,
)


def _xy2d_py(order: int, x: int, y: int) -> int:
    """Reference python implementation of the classic Hilbert xy->d walk."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_exhaustive_bits4(spark):
    n = 1 << 4
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=4).alias("h")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d_py(n, x, y), (x, y)
    # a space-filling curve visits every cell exactly once
    assert sorted(got.values()) == list(range(n * n))


def test_hilbert_adjacency_bits4(spark):
    """Consecutive d values must be 4-neighbours in the grid — the
    locality property Z-order lacks at quadrant boundaries."""
    n = 1 << 4
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    rows = df.select(
        "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=4).alias("h")
    ).collect()
    by_d = {r["h"]: (r["x"], r["y"]) for r in rows}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_index_staged_matches_inline(spark):
    """The deep staged form must agree with the inline form where both
    exist (bits=6 — the inline cap; bits=8 inline was a ~400k-node
    tree that intermittently OOMed the shared test heap), and analyze
    fast at bits=16 where inline cannot."""
    import random

    rng = random.Random(7)
    pts = [(i, rng.randrange(64), rng.randrange(64)) for i in range(300)]
    df = spark.createDataFrame(pts, "id bigint, x bigint, y bigint")
    staged = {
        r["id"]: r["h_value"]
        for r in hilbert_index(df, "x", "y", bits=6).collect()
    }
    inline = {
        r["id"]: r["h"]
        for r in df.select(
            "id", hilbert_key(F.col("x"), F.col("y"), bits=6).alias("h")
        ).collect()
    }
    assert staged == inline
    # deep curve: python-reference parity on a sample
    deep = hilbert_index(df, "x", "y", bits=16)
    got = {r["id"]: r["h_value"] for r in deep.collect()}
    for i, x, y in pts[:50]:
        assert got[i] == _xy2d_py(1 << 16, x, y), (x, y)


def test_hilbert_index_vectorized_parity(spark):
    """The numpy mapInPandas fast path must be bit-equal to the staged
    Column walk (the oracle-parity reference) on random inputs at full
    16-bit depth, including the corner cells."""
    import random

    from splink_spark.pipeline.layout import hilbert_index_vectorized

    rng = random.Random(21)
    top = (1 << 16) - 1
    pts = [(i, rng.randrange(1 << 16), rng.randrange(1 << 16))
           for i in range(500)]
    pts += [(500, 0, 0), (501, top, top), (502, 0, top), (503, top, 0)]
    df = spark.createDataFrame(pts, "id bigint, x bigint, y bigint")
    staged = {
        r["id"]: r["h_value"]
        for r in hilbert_index(df, "x", "y", bits=16).collect()
    }
    vec = {
        r["id"]: r["h_value"]
        for r in hilbert_index_vectorized(df, "x", "y", bits=16).collect()
    }
    assert vec == staged
    # sort engines agree on the resulting key column
    s1 = sorted(
        r["h_value"]
        for r in hilbert_sort(
            df, ["x", "y"], bits=12, keep_key=True, engine="vectorized"
        ).collect()
    )
    s2 = sorted(
        r["h_value"]
        for r in hilbert_sort(
            df, ["x", "y"], bits=12, keep_key=True, engine="staged"
        ).collect()
    )
    assert s1 == s2
    with pytest.raises(ValueError):
        hilbert_index_vectorized(df, "x", "y", bits=32)
    with pytest.raises(ValueError):
        hilbert_sort(df, ["x", "y"], engine="nope")


def test_hilbert_sort_shapes_and_null_column(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 100, None) for i in range(200)],
        "id bigint, a bigint, b bigint",
    )
    out = hilbert_sort(df, ["a", "b"], bits=8, keep_key=True)
    assert out.count() == 200
    assert "h_value" in out.columns
    with pytest.raises(ValueError):
        hilbert_sort(df, ["a"], bits=8)
    with pytest.raises(ValueError):
        hilbert_key(F.col("a"), F.col("b"), bits=8)
    with pytest.raises(ValueError):
        hilbert_index(df, "a", "b", bits=32)


def test_hilbert_beats_zorder_on_range_query_pruning(spark):
    """File-skipping proxy: split the sorted order into 16 'files' and
    count files whose min-max h/z range intersects a small x-band query.
    Hilbert should need no more files than Z-order on average."""
    from splink_spark.pipeline.layout import zorder_key

    n = 1 << 6  # 64x64 grid
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    both = df.select(
        "x",
        "y",
        hilbert_key(F.col("x"), F.col("y"), bits=6).alias("h"),
        zorder_key([F.col("x"), F.col("y")], bits=6).alias("z"),
    ).collect()
    n_files = 16
    per_file = (n * n) // n_files

    def files_hit(keyname):
        rows = sorted(both, key=lambda r: r[keyname])
        hit = 0
        for f in range(n_files):
            chunk = rows[f * per_file : (f + 1) * per_file]
            if any(r["x"] < 4 for r in chunk):  # query: x in [0, 4)
                hit += 1
        return hit

    assert files_hit("h") <= files_hit("z")


def test_geohash_known_vectors_and_clamping(spark):
    from splink_spark.pipeline.layout import geohash_key

    cases = [
        (57.64911, 10.40744, "u4pruydq"),  # the canonical example
        (42.6, -5.6, "ezs42"),
        (48.669, -4.329, "gbsuv"),
        (0.0, 0.0, "s000"),
    ]
    df = spark.createDataFrame(
        [(la, lo) for la, lo, _ in cases], "lat double, lon double"
    )
    for la, lo, expect in cases:
        got = (
            df.where((F.col("lat") == la) & (F.col("lon") == lo))
            .select(geohash_key(F.col("lat"), F.col("lon"), len(expect)))
            .collect()[0][0]
        )
        assert got == expect, (la, lo, got, expect)
    # out-of-range coordinates clamp instead of corrupting bits
    edge = spark.createDataFrame([(95.0, 200.0)], "lat double, lon double")
    g = edge.select(geohash_key(F.col("lat"), F.col("lon"), 4)).collect()[0][0]
    pole = spark.createDataFrame([(89.999999, 179.999999)], "lat double, lon double")
    gp = pole.select(geohash_key(F.col("lat"), F.col("lon"), 4)).collect()[0][0]
    assert g == gp
    with pytest.raises(ValueError):
        geohash_key(F.col("lat"), F.col("lon"), 13)


def test_histogram_exact_bins(spark):
    from splink_spark.pipeline.analytics import histogram

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 9.999999), ("a", 10.0), ("a", 25.0), ("b", 10.0),
         ("a", None)],
        "g string, v double",
    )
    out = {
        (r["g"], r["bin"]): (r["bin_start"], r["n"])
        for r in histogram(df, "v", 10.0, group_cols=["g"]).collect()
    }
    # boundary 10.0 lands in bin 1 exactly (integer micro-unit div)
    assert out == {
        ("a", 0): (0.0, 2),
        ("a", 1): (10.0, 1),
        ("a", 2): (20.0, 1),
        ("b", 1): (10.0, 1),
    }
    with pytest.raises(ValueError):
        histogram(df, "v", 0.0)


def test_hilbert_sort_vectorized_falls_back_without_arrow(spark, monkeypatch):
    """The default engine needs pandas/pyarrow/numpy; when any import
    fails it must silently fall back to the pure-Column staged walk
    (same keys — pytest pins bit-equality elsewhere), not crash."""
    import builtins

    from splink_spark.pipeline.layout import hilbert_sort

    df = spark.createDataFrame(
        [(i, (i * 37) % 101, (i * 61) % 97) for i in range(200)],
        "id bigint, x bigint, y bigint",
    )
    want = [
        (r["id"], r["h_value"])
        for r in hilbert_sort(
            df, ["x", "y"], bits=8, keep_key=True, engine="staged"
        ).collect()
    ]

    real_import = builtins.__import__

    def no_arrow(name, *args, **kwargs):
        if name == "pyarrow":
            raise ImportError("pyarrow disabled for test")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_arrow)
    got_df = hilbert_sort(df, ["x", "y"], bits=8, keep_key=True)
    monkeypatch.undo()  # let Spark's collect path import freely
    got = [(r["id"], r["h_value"]) for r in got_df.collect()]
    assert sorted(got) == sorted(want)
    # and the plan is the staged Column walk — no Arrow eval node
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
