"""URL normalization / dedup / domain stats: literal semantics and
JVM-side plan pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline.web import domain_stats, url_dedup, url_normalize


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(
        [
            (1, "HTTPS://WWW.Example.COM:443/Docs/A/?b=2&utm_source=x&a=1#frag"),
            (2, "https://www.example.com/Docs/A?a=1&b=2"),
            (3, "http://example.com:80/"),
            (4, "http://example.com"),
            (5, "https://other.org:8443/p/?gclid=9"),
            (6, "ftp://Files.example.com:21/pub/"),
        ],
        "doc_id long, url string",
    )


def test_url_normalize_literals(urls):
    got = {r["doc_id"]: r["url_norm"] for r in url_normalize(urls).collect()}
    # scheme+host lowered, default port dropped, trailing slash stripped,
    # tracking params removed, rest sorted, fragment dropped
    assert got[1] == "https://www.example.com/Docs/A?a=1&b=2"
    assert got[1] == got[2]
    assert got[3] == got[4] == "http://example.com"
    assert got[5] == "https://other.org:8443/p"  # non-default port kept
    assert got[6] == "ftp://files.example.com:21/pub"  # unknown scheme: port kept


def test_url_normalize_domain_strips_www(urls):
    got = {r["doc_id"]: r["domain"] for r in url_normalize(urls).collect()}
    assert got[1] == got[3] == "example.com"
    assert got[6] == "files.example.com"  # only LEADING www. strips


def test_url_dedup_keeps_min_id(urls):
    got = {r["url_norm"]: (r["doc_id"], r["n_dupes"]) for r in url_dedup(urls).collect()}
    assert got["https://www.example.com/Docs/A?a=1&b=2"] == (1, 2)
    assert got["http://example.com"] == (3, 2)
    assert len(got) == 4


def test_domain_stats_shares(urls):
    got = {r["domain"]: (r["n_docs"], r["share"]) for r in domain_stats(urls).collect()}
    assert got["example.com"] == (4, pytest.approx(4 / 6, abs=1e-6))
    assert got["other.org"][0] == 1


def test_url_ops_are_pure_codegen(urls):
    plan = url_dedup(urls)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # one partial+final hash aggregate on the normalized key, nothing else
    assert "HashAggregate" in plan and "partial_min" in plan


def test_remove_boilerplate_lines_literals(spark):
    from splink_spark.pipeline.text import remove_boilerplate_lines

    df = spark.createDataFrame(
        [
            (1, "cookie banner\nreal content one\nnav bar"),
            (2, "cookie banner\nunique thoughts\nnav bar"),
            (3, "cookie banner\nmore real text"),
            (4, "cookie banner\nnav bar"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_lines"], r["n_removed_lines"])
        for r in remove_boilerplate_lines(df, min_count=3).collect()
    }
    # 'cookie banner' in 4 docs, 'nav bar' in 3 -> both removed everywhere
    assert got[1] == ("real content one", 3, 2)
    assert got[2] == ("unique thoughts", 3, 2)
    assert got[3] == ("more real text", 2, 1)
    assert got[4] == ("", 2, 2)  # fully-boilerplate doc kept, emptied


def test_remove_boilerplate_preserves_blank_lines(spark):
    from splink_spark.pipeline.text import remove_boilerplate_lines

    # blank lines appear in every doc but are paragraph STRUCTURE, not
    # boilerplate content — they must survive (ADVICE r06)
    df = spark.createDataFrame(
        [
            (1, "para one\n\npara two"),
            (2, "intro\n\noutro"),
            (3, "alpha\n\nbeta"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["cleaned_text"]
        for r in remove_boilerplate_lines(df, min_count=2).collect()
    }
    assert got[1] == "para one\n\npara two"
    assert got[2] == "intro\n\noutro"


def test_remove_boilerplate_counts_documents_not_occurrences(spark):
    from splink_spark.pipeline.text import remove_boilerplate_lines

    # 'x' appears 3 times but in ONE doc: per-document counting keeps it
    df = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "y\nz")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_removed_lines"]
        for r in remove_boilerplate_lines(df, min_count=2).collect()
    }
    assert got == {1: 0, 2: 0}


def test_remove_boilerplate_regex_delimiter_is_literal(spark):
    from splink_spark.pipeline.text import remove_boilerplate_lines

    df = spark.createDataFrame(
        [(1, "a.b"), (2, "a.c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["cleaned_text"]
        for r in remove_boilerplate_lines(df, delimiter=".", min_count=2).collect()
    }
    assert got == {1: "b", 2: "c"}  # '.' split literally, 'a' removed


def test_expectations_report_literals(spark):
    from splink_spark.pipeline.quality import expectations_report

    df = spark.createDataFrame(
        [(1, "a@x.com", 10.0), (2, None, 5.0), (3, "bad", 200.0),
         (3, "c@y.org", None)],
        "id long, email string, amount double",
    )
    rules = [
        {"name": "id_not_null", "type": "not_null", "column": "id"},
        {"name": "id_unique", "type": "unique", "column": "id"},
        {"name": "email_format", "type": "matches", "column": "email",
         "pattern": r"^[^@]+@[^@]+\.[a-z]+$"},
        {"name": "amount_range", "type": "in_range", "column": "amount",
         "min": 0, "max": 100},
        {"name": "seg_values", "type": "accepted_values", "column": "email",
         "values": ["a@x.com", "c@y.org"]},
        {"name": "amount_gt_id", "type": "expression",
         "predicate": "amount > id"},
    ]
    got = {r["rule_name"]: r for r in expectations_report(df, rules).collect()}
    assert got["id_not_null"]["n_violations"] == 0 and got["id_not_null"]["passed"]
    assert got["id_unique"]["n_violations"] == 1  # 3 appears twice
    assert got["email_format"]["n_violations"] == 2  # null + 'bad'
    assert got["amount_range"]["n_violations"] == 2  # 200 + null
    assert got["seg_values"]["n_violations"] == 2
    # NULL predicate = not satisfied = violation (row amount=None)
    assert got["amount_gt_id"]["n_violations"] == 1
    assert got["id_unique"]["violation_frac"] == 0.25
    # exact integer ppm: v * 1e6 div n — the cross-engine comparison key
    assert got["id_unique"]["violation_ppm"] == 250_000
    assert got["email_format"]["violation_ppm"] == 500_000
    assert got["id_not_null"]["violation_ppm"] == 0


def test_expectations_report_is_single_aggregation_job(spark):
    from splink_spark.pipeline.quality import expectations_report

    df = spark.createDataFrame([(1,), (2,)], "id long")
    rules = [
        {"name": f"r{i}", "type": "expression", "predicate": f"id > {i}"}
        for i in range(20)
    ]
    out = expectations_report(df, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # 20 rules still plan ONE aggregate pair (partial+final), not 20 scans
    assert plan.count("Scan ") <= 1
    assert len(out.collect()) == 20


def _py_quant(v, lo, hi, bits):
    span = max(1, hi - lo)
    top = (1 << bits) - 1
    return ((max(lo, min(hi, v)) - lo) * top) // span


def _py_z(vals, bits):
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_key_matches_python_reference(spark):
    import random

    from splink_spark.pipeline.layout import quantize_uniform, zorder_key

    random.seed(1)
    rows = [(random.randint(0, 999), random.randint(-50, 50)) for _ in range(300)]
    df = spark.createDataFrame(rows, "x long, y long")
    qx = quantize_uniform(F.col("x"), 0, 999, 8)
    qy = quantize_uniform(F.col("y"), -50, 50, 8)
    out = df.withColumn("z", zorder_key([qx, qy], 8)).collect()
    for r in out:
        want = _py_z(
            [_py_quant(r["x"], 0, 999, 8), _py_quant(r["y"], -50, 50, 8)], 8
        )
        assert r["z"] == want


def test_zorder_sort_improves_secondary_column_skipping(spark):
    """The data-skipping claim, measured: for a narrow query on the
    SECOND column, far fewer z-ordered chunks intersect the predicate
    than x-sorted chunks (where every chunk spans all of y)."""
    import random

    from splink_spark.pipeline.layout import zorder_sort

    random.seed(2)
    rows = [(random.randint(0, 999), random.randint(0, 999)) for _ in range(2000)]
    df = spark.createDataFrame(rows, "x long, y long").coalesce(1)
    z = [(r["x"], r["y"]) for r in
         zorder_sort(df, ["x", "y"], bits=10, keep_key=True)
         .coalesce(1).sortWithinPartitions("z_value").collect()]
    xs = sorted(rows)
    chunk = 100

    def chunks_touched(ordered, lo, hi):
        n = 0
        for i in range(0, len(ordered), chunk):
            ch = ordered[i:i + chunk]
            if max(c[1] for c in ch) >= lo and min(c[1] for c in ch) <= hi:
                n += 1
        return n

    t_z = sum(chunks_touched(z, q, q + 20) for q in range(0, 1000, 100))
    t_x = sum(chunks_touched(xs, q, q + 20) for q in range(0, 1000, 100))
    assert t_z < t_x * 0.6, (t_z, t_x)


def test_functional_dependency_report(spark):
    from splink_spark.pipeline.quality import functional_dependency_report

    df = spark.createDataFrame(
        [("94016", "SF"), ("94016", "SF"), ("10001", "NY"), ("10001", "NYC"),
         (None, "X"), (None, "X"), ("02139", None)],
        "zip string, city string",
    )
    out = {
        (r["lhs"], r["rhs"]): (r["n_lhs_values"], r["n_violating"],
                               r["violation_ppm"], r["holds"])
        for r in functional_dependency_report(
            df, [("zip", "city"), (["zip", "city"], "zip")]
        ).collect()
    }
    # 10001 maps to {NY, NYC}: 1 of 4 LHS values violates (NULL zip and
    # NULL city both group as values)
    assert out[("zip", "city")] == (4, 1, 250000, False)
    assert out[("zip,city", "zip")][3] is True
    import pytest as _p
    with _p.raises(ValueError):
        functional_dependency_report(df, [])


def test_functional_dependency_native_distinct_no_sentinel_conflation(spark):
    from splink_spark.pipeline.quality import functional_dependency_report

    # a genuine '\x00null' string must stay distinct from a real NULL,
    # and NULL + one value = 2 distinct RHS (a violation) — the old
    # string-cast sentinel conflated these
    df = spark.createDataFrame(
        [("a", "\x00null"), ("a", None), ("b", "x"), ("b", None)],
        "k string, v string",
    )
    r = functional_dependency_report(df, [("k", "v")]).collect()[0]
    assert (r["n_lhs_values"], r["n_violating"], r["holds"]) == (
        2, 2, False,
    )
