"""Property tests for the CDC/interval operators: randomized inputs,
invariants checked against simple in-python reference implementations.
Deterministic (fixed hypothesis seeds via derandomize) so CI never
flakes."""

from __future__ import annotations

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st

from splink_spark.pipeline.cdc import latest_by_key
from splink_spark.pipeline.temporal import merge_intervals

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(0, 50),
        st.integers(1, 30),
    ),
    min_size=1,
    max_size=25,
)


@settings(**_SETTINGS)
@given(intervals)
def test_merge_intervals_covers_exactly_the_input_union(spark, ivs):
    rows = [(k, s, s + w) for k, s, w in ivs]
    df = spark.createDataFrame(rows, "k string, start bigint, end bigint")
    merged = merge_intervals(df, by="k").collect()
    # reference: per-key set of covered integer points
    ref = {}
    for k, s, e in rows:
        ref.setdefault(k, set()).update(range(s, e))
    got = {}
    for r in merged:
        got.setdefault(r["k"], set()).update(range(r["start"], r["end"]))
    assert got == ref
    # islands are disjoint and non-touching per key
    by_k = {}
    for r in merged:
        by_k.setdefault(r["k"], []).append((r["start"], r["end"]))
    for k, spans in by_k.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # strict gap: touching spans must have merged
    # n_merged conserves the input count
    assert sum(r["n_merged"] for r in merged) == len(rows)


changelog = st.lists(
    st.tuples(
        st.integers(0, 4),        # key
        st.integers(0, 10),       # ts (collisions on purpose)
        st.sampled_from(["U", "D"]),
        st.integers(0, 100),
    ),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(changelog)
def test_latest_by_key_matches_python_argmax(spark, log):
    rows = [(i, k, ts, op, v) for i, (k, ts, op, v) in enumerate(log)]
    df = spark.createDataFrame(
        rows, "offset bigint, k bigint, ts bigint, op string, val bigint"
    )
    got = {
        r["k"]: (r["offset"], r["op"], r["val"])
        for r in latest_by_key(
            df, "k", "ts", tiebreak_col="offset", op_col="op",
            delete_values=("D",),
        ).collect()
    }
    ref = {}
    for off, k, ts, op, v in rows:
        cur = ref.get(k)
        if cur is None or (ts, off) > (cur[0], cur[1]):
            ref[k] = (ts, off, op, v)
    expected = {
        k: (off, op, v)
        for k, (ts, off, op, v) in ref.items()
        if op != "D"
    }
    assert got == expected
