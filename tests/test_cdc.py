"""CDC compaction / SCD2 / snapshot-diff operator tests
(splink_spark/pipeline/cdc.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from splink_spark.pipeline.cdc import latest_by_key, scd2_history, snapshot_diff


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _changelog(spark):
    # (offset, key, ts, op, val)
    rows = [
        (1, "a", _ts("2024-01-01T00:00:00"), "I", 10),
        (2, "a", _ts("2024-01-02T00:00:00"), "U", 11),
        (3, "b", _ts("2024-01-01T00:00:00"), "I", 20),
        (4, "b", _ts("2024-01-03T00:00:00"), "D", None),
        (5, "c", _ts("2024-01-01T00:00:00"), "I", 30),
        (6, "c", _ts("2024-01-02T00:00:00"), "D", None),
        (7, "c", _ts("2024-01-04T00:00:00"), "I", 31),
        # tie on ts for d: offset breaks it (6 beats 5 -> wait, keys differ)
        (8, "d", _ts("2024-01-01T00:00:00"), "I", 40),
        (9, "d", _ts("2024-01-01T00:00:00"), "U", 41),
    ]
    return spark.createDataFrame(
        rows, "offset bigint, k string, ts timestamp, op string, val bigint"
    )


def test_latest_by_key_upserts_and_tombstones(spark):
    log = _changelog(spark)
    out = latest_by_key(
        log, "k", "ts", tiebreak_col="offset", op_col="op",
        delete_values=("D",),
    )
    got = {r["k"]: (r["val"], r["op"]) for r in out.collect()}
    # a: latest update wins; b: tombstoned (latest is D); c: delete then
    # re-insert -> re-insert survives; d: ts tie broken by offset desc
    assert got == {"a": (11, "U"), "c": (31, "I"), "d": (41, "U")}


def test_latest_by_key_null_op_is_not_a_delete(spark):
    # the common CDC shape: only deletes carry an op marker — a key
    # whose latest op is NULL must survive (three-valued NOT IN would
    # silently drop it)
    rows = [
        (1, "a", _ts("2024-01-01T00:00:00"), None, 10),
        (2, "b", _ts("2024-01-01T00:00:00"), "D", None),
        (3, "c", _ts("2024-01-01T00:00:00"), "I", 30),
        (4, "c", _ts("2024-01-02T00:00:00"), None, 31),
    ]
    log = spark.createDataFrame(
        rows, "offset bigint, k string, ts timestamp, op string, val bigint"
    )
    out = latest_by_key(
        log, "k", "ts", tiebreak_col="offset", op_col="op",
        delete_values=("D",),
    )
    got = {r["k"]: r["val"] for r in out.collect()}
    assert got == {"a": 10, "c": 31}


def test_latest_by_key_without_op_keeps_all_keys(spark):
    log = _changelog(spark)
    out = latest_by_key(log, "k", "ts", tiebreak_col="offset")
    assert out.count() == 4  # one row per key incl. the tombstoned b


def test_scd2_history_collapses_unchanged_and_cuts_intervals(spark):
    rows = [
        ("a", _ts("2024-01-01T00:00:00"), "gold"),
        ("a", _ts("2024-01-02T00:00:00"), "gold"),   # no-op: collapsed
        ("a", _ts("2024-01-03T00:00:00"), "silver"),
        ("b", _ts("2024-01-01T00:00:00"), None),
        ("b", _ts("2024-01-02T00:00:00"), None),     # null==null: collapsed
        ("b", _ts("2024-01-03T00:00:00"), "bronze"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, tier string")
    out = scd2_history(df, "k", "ts", attr_cols=["tier"]).orderBy("k", "ts")
    got = [
        (r["k"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    ]
    assert got == [
        ("a", "gold", _ts("2024-01-01T00:00:00"), _ts("2024-01-03T00:00:00"), False),
        ("a", "silver", _ts("2024-01-03T00:00:00"), None, True),
        ("b", None, _ts("2024-01-01T00:00:00"), _ts("2024-01-03T00:00:00"), False),
        ("b", "bronze", _ts("2024-01-03T00:00:00"), None, True),
    ]


def test_scd2_history_no_collapse_keeps_every_version(spark):
    rows = [
        ("a", _ts("2024-01-01T00:00:00"), "gold"),
        ("a", _ts("2024-01-02T00:00:00"), "gold"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, tier string")
    out = scd2_history(df, "k", "ts", collapse_unchanged=False)
    assert out.count() == 2
    assert out.where(F.col("is_current")).count() == 1


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0), (4, None, 40.0)],
        "id bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y2", 20.0), (4, None, 40.0), (5, "w", 50.0)],
        "id bigint, s string, v double",
    )
    out = snapshot_diff(old, new, "id", ["s", "v"])
    got = {r["id"]: r["change_status"] for r in out.collect()}
    # 1 unchanged (excluded), 4 unchanged w/ null attr (null-safe, excluded)
    assert got == {2: "changed", 3: "removed", 5: "added"}
    row2 = out.where(F.col("id") == 2).collect()[0]
    assert (row2["old_s"], row2["new_s"]) == ("y", "y2")

    full = snapshot_diff(old, new, "id", ["s", "v"], include_unchanged=True)
    assert full.count() == 5


def test_snapshot_diff_null_key_rows_classify_correctly(spark):
    # NULL is a legitimate key value under the null-safe join: removal /
    # addition of a NULL-keyed row must not be misread as a change
    old = spark.createDataFrame(
        [(None, "x", 1.0), (1, "a", 2.0)], "id bigint, s string, v double"
    )
    new = spark.createDataFrame([(1, "a", 2.0)], "id bigint, s string, v double")
    out = {r["id"]: r["change_status"]
           for r in snapshot_diff(old, new, "id", ["s", "v"]).collect()}
    assert out == {None: "removed"}
    back = {r["id"]: r["change_status"]
            for r in snapshot_diff(new, old, "id", ["s", "v"]).collect()}
    assert back == {None: "added"}
    # NULL-keyed row present in both with a changed value
    new2 = spark.createDataFrame(
        [(None, "x", 9.0), (1, "a", 2.0)], "id bigint, s string, v double"
    )
    both = {r["id"]: r["change_status"]
            for r in snapshot_diff(old, new2, "id", ["s", "v"]).collect()}
    assert both == {None: "changed"}
