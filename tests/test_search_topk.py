"""BM25 search and exact top-k-per-group: reference-literal semantics,
method equivalence (the sketch prefilter must be plan-only), fallback
guard, and plan pins."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline.analytics import top_k_per_group
from splink_spark.pipeline.search import bm25_index, bm25_search


def _key(rows):
    return sorted(tuple(r[c] for c in ("g", "__rank", "v", "rid")) for r in rows)


@pytest.fixture(scope="module")
def grouped(spark):
    import random

    random.seed(7)
    rows = [(g, random.randint(0, 1000), i) for i in range(3000) for g in ("a", "b")]
    rows += [("tiny", 5, 9001), ("tiny", 3, 9002)]  # group smaller than k
    return spark.createDataFrame(rows, "g string, v long, rid long")


def test_topk_methods_identical(grouped):
    outs = [
        _key(
            top_k_per_group(
                grouped, ["g"], "v", 5, method=m, tie_cols=["rid"]
            ).collect()
        )
        for m in ("window", "prefilter", "auto")
    ]
    assert outs[0] == outs[1] == outs[2]
    # tiny group returns all its rows, ranked
    tiny = [t for t in outs[0] if t[0] == "tiny"]
    assert [t[1] for t in tiny] == [1, 2]


def test_topk_ascending_identical(grouped):
    a = _key(
        top_k_per_group(
            grouped, ["g"], "v", 4, ascending=True, method="window",
            tie_cols=["rid"],
        ).collect()
    )
    b = _key(
        top_k_per_group(
            grouped, ["g"], "v", 4, ascending=True, method="prefilter",
            tie_cols=["rid"],
        ).collect()
    )
    assert a == b
    assert all(t[2] <= 20 for t in a if t[0] != "tiny")  # genuinely smallest


def test_topk_guard_catches_overshot_cutoff(grouped):
    """margin=0 snaps the cutoff to the deepest grid point (0.9999), which
    keeps ~n/10000 rows — fewer than k for this group size. The survivor
    guard must detect it and fall back to the full group: output stays
    exactly the plain-window answer."""
    want = _key(
        top_k_per_group(
            grouped, ["g"], "v", 5, method="window", tie_cols=["rid"]
        ).collect()
    )
    got = _key(
        top_k_per_group(
            grouped, ["g"], "v", 5, method="prefilter", margin=0,
            tie_cols=["rid"],
        ).collect()
    )
    assert got == want


def test_topk_null_group_keys_all_methods(spark):
    """NULL group keys form a real group under window partitionBy; the
    prefilter path must not lose them to its equi-joins (ADVICE r06) —
    it routes them straight into the final window pool."""
    rows = [(None, v, i) for i, v in enumerate([9, 7, 5, 3, 1])]
    rows += [("a", v, 100 + i) for i, v in enumerate(range(10))]
    df = spark.createDataFrame(rows, "g string, v long, rid long")

    def nkey(recs):  # None-safe variant of _key
        return sorted(
            (r["g"] or "", r["__rank"], r["v"], r["rid"]) for r in recs
        )

    outs = [
        nkey(
            top_k_per_group(
                df, ["g"], "v", 3, method=m, tie_cols=["rid"]
            ).collect()
        )
        for m in ("window", "prefilter", "auto")
    ]
    assert outs[0] == outs[1] == outs[2]
    null_group = [t for t in outs[0] if t[0] == ""]
    assert [t[2] for t in null_group] == [9, 7, 5]


def test_topk_rank_is_deterministic_on_ties(spark):
    df = spark.createDataFrame(
        [("g", 7, i) for i in range(20)], "g string, v long, rid long"
    )
    out = {
        r["rid"]: r["__rank"]
        for r in top_k_per_group(
            df, ["g"], "v", 3, tie_cols=["rid"], method="prefilter"
        ).collect()
    }
    assert out == {0: 1, 1: 2, 2: 3}


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the lazy dog sleeps all day long"),
            (3, "quick quick quick foxes everywhere"),
            (4, "an unrelated document about spark and parquet"),
            (5, "dog dog dog dog dog"),
        ],
        "doc_id long, text string",
    )


def _py_bm25(docs, query, k1=1.2, b=0.75):
    """Independent pure-python BM25 (same Lucene idf variant), with the
    engine's integer-millionths quantization applied per contribution."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in dict.fromkeys(query.lower().split()):
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if not tf:
                continue
            contrib = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            scores[d] = scores.get(d, 0) + round(contrib * 1_000_000)
    return {d: s / 1_000_000 for d, s in scores.items()}


def test_bm25_matches_pure_python_reference(spark, corpus):
    docs = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    idx = bm25_index(corpus)
    qs = spark.createDataFrame(
        [(1, "quick fox"), (2, "lazy dog"), (3, "parquet")],
        "query_id long, query string",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_search(idx, qs, k=10).collect()
    }
    for qid, q in [(1, "quick fox"), (2, "lazy dog"), (3, "parquet")]:
        want = _py_bm25(docs, q)
        mine = {d: s for (g, d), s in got.items() if g == qid}
        assert mine == pytest.approx(want, abs=1e-6), (qid, mine, want)


def test_bm25_rank_and_tie_break(spark, corpus):
    idx = bm25_index(corpus)
    qs = spark.createDataFrame([(1, "lazy dog")], "query_id long, query string")
    rows = bm25_search(idx, qs, k=3).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert rows[0]["score"] >= rows[1]["score"] >= rows[2]["score"]


def test_bm25_unknown_terms_yield_no_rows(spark, corpus):
    idx = bm25_index(corpus)
    qs = spark.createDataFrame([(1, "zzzzz qqqqq")], "query_id long, query string")
    assert bm25_search(idx, qs, k=3).count() == 0


def test_bm25_plan_is_jvm_side_and_broadcasts_queries_not_postings(corpus, spark):
    idx = bm25_index(corpus)
    qs = spark.createDataFrame([(1, "quick fox")], "query_id long, query string")
    plan = (
        bm25_search(idx, qs, k=3, topk_method="window")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan


def test_bm25_precomputed_stats_identical(spark, corpus):
    from splink_spark.pipeline.search import bm25_corpus_stats

    idx = bm25_index(corpus)
    qs = spark.createDataFrame(
        [(1, "quick fox"), (2, "lazy dog")], "query_id long, query string"
    )
    st = bm25_corpus_stats(idx)
    assert st == (5, sum(len(t.split()) for _, t in [
        (r["doc_id"], r["text"]) for r in corpus.collect()]))
    a = sorted(map(tuple, bm25_search(idx, qs, k=5).collect()))
    b = sorted(map(tuple, bm25_search(idx, qs, k=5, stats=st).collect()))
    assert a == b


def test_streaming_bm25_state_retry_append_law(spark, corpus, tmp_path):
    """A foreachBatch retry re-appends bit-identical partial-index rows;
    the read-side distinct must collapse them so the merged index equals
    the batch build exactly."""
    from splink_spark.pipeline.search import bm25_index
    from splink_spark.streaming.operators import read_bm25_index_state

    state = str(tmp_path / "bm25_state")
    half1 = corpus.where("doc_id <= 2")
    half2 = corpus.where("doc_id > 2")
    for batch_id, part in ((0, half1), (1, half2), (1, half2)):  # batch 1 retried
        (
            bm25_index(part)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(state)
        )
    merged = read_bm25_index_state(spark, state)
    want = sorted(map(tuple, bm25_index(corpus).collect()))
    got = sorted(map(tuple, merged.collect()))
    assert got == want


def test_group_quantiles_rank_selection(spark):
    from splink_spark.pipeline.analytics import group_quantiles

    rows = [("g", float(v)) for v in range(1, 101)]
    rows += [("h", 5.0), ("h", 1.0), ("h", 9.0), ("h", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["fraction"]): (r["value"], r["n"])
        for r in group_quantiles(df, ["g"], "v", [0.5, 0.9, 1.0]).collect()
    }
    assert got[("g", 0.5)] == (50.0, 100)  # ceil(0.5*100) = rank 50
    assert got[("g", 0.9)] == (90.0, 100)
    assert got[("g", 1.0)] == (100.0, 100)
    assert got[("h", 0.5)] == (5.0, 3)  # nulls excluded; ceil(1.5)=2nd
    assert got[("h", 1.0)] == (9.0, 3)
    # upper method: floor(q*n)+1 capped
    up = {
        (r["g"], r["fraction"]): r["value"]
        for r in group_quantiles(df, ["g"], "v", [0.5], method="upper").collect()
    }
    assert up[("g", 0.5)] == 51.0 and up[("h", 0.5)] == 5.0  # rank floor(1.5)+1 = 2


def test_group_quantiles_single_window_pass(spark):
    from splink_spark.pipeline.analytics import group_quantiles

    df = spark.createDataFrame([("g", 1.0), ("g", 2.0)], "g string, v double")
    plan = (
        group_quantiles(df, ["g"], "v", [0.25, 0.5, 0.75, 0.99])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # rank + group-size are two window specs over ONE shared sort/shuffle;
    # the point is no per-fraction re-execution
    assert plan.count("Window") <= 2


def test_bm25_bucketed_disk_index_prunes_and_matches(spark, corpus, tmp_path):
    """Searching a reloaded term-bucketed index with partition pruning
    must return exactly the in-memory results, and the pruned read's plan
    must carry a PartitionFilters entry on term_bucket."""
    from splink_spark.pipeline.search import (
        bm25_corpus_stats,
        bm25_index_read,
        bm25_index_write,
        tokenize_terms,
    )

    idx = bm25_index(corpus)
    st = bm25_corpus_stats(idx)
    path = str(tmp_path / "idx")
    bm25_index_write(idx, path, num_buckets=16)

    qs = spark.createDataFrame(
        [(1, "quick fox"), (2, "lazy dog")], "query_id long, query string"
    )
    qterms = qs.select(F.explode(tokenize_terms(F.col("query"))).alias("term"))
    pruned = bm25_index_read(spark, path, query_terms=qterms, num_buckets=16)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [term_bucket" in plan.replace("#", " #").replace(
        "term_bucket #", "term_bucket#"
    ) or "term_bucket" in plan.split("PartitionFilters")[1][:200]

    want = sorted(map(tuple, bm25_search(idx, qs, k=5, stats=st).collect()))
    got = sorted(map(tuple, bm25_search(pruned, qs, k=5, stats=st).collect()))
    assert got == want

    # full (unpruned) read also reproduces the index
    full = bm25_index_read(spark, path)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, idx.collect()))


def test_bm25_index_read_auto_routes_on_bucket_coverage(spark, corpus, tmp_path):
    """When the query vocabulary covers most buckets, pruning costs more
    than it saves (the 100M bench measured pruned 609s vs full 591s at
    coverage 1.0) — the read must skip the partition filter above the
    coverage threshold, and bucket_coverage must report the signal."""
    from splink_spark.pipeline.search import (
        bm25_index_read,
        bm25_index_write,
        bucket_coverage,
        tokenize_terms,
    )

    idx = bm25_index(corpus)
    path = str(tmp_path / "idx_cov")
    bm25_index_write(idx, path, num_buckets=4)

    # wide vocabulary: every corpus term -> all 4 buckets covered
    wide = idx.select("term").distinct()
    buckets, cov = bucket_coverage(wide, num_buckets=4)
    assert cov == 1.0 and sorted(buckets) == [0, 1, 2, 3]
    routed = bm25_index_read(spark, path, query_terms=wide, num_buckets=4)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    # no isin filter planned — the full read
    assert "term_bucket" not in plan.split("PartitionFilters")[1][:80]
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, idx.collect())
    )

    # narrow vocabulary still prunes
    qs = spark.createDataFrame([(1, "quick")], "query_id long, query string")
    qterms = qs.select(F.explode(tokenize_terms(F.col("query"))).alias("term"))
    _, cov_narrow = bucket_coverage(qterms, num_buckets=4)
    assert cov_narrow <= 0.5
    pruned = bm25_index_read(spark, path, query_terms=qterms, num_buckets=4)
    plan2 = pruned._jdf.queryExecution().executedPlan().toString()
    assert "term_bucket" in plan2.split("PartitionFilters")[1][:200]


def test_group_moments_matches_statistics_module(spark):
    import statistics

    from splink_spark.pipeline.analytics import group_moments

    vals = [1.5, 2.25, 100000.0, -3.125, 7.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals] + [("g", None)], "g string, v double"
    )
    r = group_moments(df, ["g"], "v").collect()[0]
    mean = sum(vals) / len(vals)
    var = statistics.pvariance(vals)
    assert r["n"] == 5
    assert r["mean"] == pytest.approx(mean, abs=1e-6)
    assert r["variance"] == pytest.approx(var, rel=1e-9)
    assert r["stddev"] == pytest.approx(var ** 0.5, rel=1e-9)
    assert (r["min_value"], r["max_value"]) == (-3.125, 100000.0)


def test_group_moments_deterministic_across_partitionings(spark):
    """The decimal sums are associative: repartitioning cannot change a
    single output digit (a double-sum implementation would drift)."""
    from splink_spark.pipeline.analytics import group_moments

    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("g"),
        ((F.col("id") * 48271 % 100_000).cast("double") / 7.0).alias("v"),
    )
    a = sorted(map(tuple, group_moments(df.coalesce(1), ["g"], "v").collect()))
    b = sorted(map(tuple, group_moments(df.repartition(37), ["g"], "v").collect()))
    assert a == b


def test_fuzzy_join_ed1_matches_brute_force(spark):
    import itertools

    from splink_spark.pipeline.fuzzy import fuzzy_join_ed1

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    names = ["smith", "smyth", "smitt", "smith ", "jones", "jonse",
             "joness", "brown", "browne", "crown", "", "a", "b", "ab"]
    L = [(i, n) for i, n in enumerate(names)]
    R = [(100 + i, n) for i, n in enumerate(names)]
    ldf = spark.createDataFrame(L, "lid long, name string")
    rdf = spark.createDataFrame(R, "rid long, rname string")
    got = {
        (r["lid"], r["rid"]): r["distance"]
        for r in fuzzy_join_ed1(ldf, rdf, "name", "rname", "lid", "rid").collect()
    }
    want = {
        (li, ri): lev(ln, rn)
        for (li, ln), (ri, rn) in itertools.product(L, R)
        if lev(ln, rn) <= 1
    }
    assert got == want


def test_fuzzy_join_ed1_long_string_guard_keeps_exact_matches(spark):
    from splink_spark.pipeline.fuzzy import fuzzy_join_ed1

    long = "x" * 100
    ldf = spark.createDataFrame([(1, long), (2, "ab")], "lid long, v string")
    rdf = spark.createDataFrame(
        [(9, long), (10, long + "y"), (11, "ab")], "rid long, w string"
    )
    got = {(r["lid"], r["rid"]) for r in
           fuzzy_join_ed1(ldf, rdf, "v", "w", "lid", "rid", max_len=64).collect()}
    # over max_len: exact duplicates still match; the ED1 neighbor is
    # (documented) not guaranteed
    assert (1, 9) in got and (2, 11) in got


def test_sorted_neighborhood_pairs_literals(spark):
    from splink_spark.pipeline.fuzzy import sorted_neighborhood_pairs

    rows = [(1, "smith"), (2, "smyth"), (3, "smithe"), (4, "jones"), (5, "jonse")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_l"], r["id_r"]): r["rank_gap"]
        for r in sorted_neighborhood_pairs(df, "name", "id", window=2).collect()
    }
    # sort order: jones(4) jonse(5) smith(1) smithe(3) smyth(2)
    assert got == {
        (4, 5): 1, (4, 1): 2, (5, 1): 1, (5, 3): 2,
        (1, 3): 1, (1, 2): 2, (3, 2): 1,
    }
    # window w over n rows yields w*n - w*(w+1)/2 pairs
    assert len(got) == 2 * 5 - 3


def test_jaccard_similarity_join_matches_bruteforce(spark):
    """Prefix-filter exactness: the candidate pruning must lose NOTHING —
    output == brute-force quadratic Jaccard at the same threshold,
    including boundary pairs exactly AT the threshold."""
    import itertools
    import random

    from splink_spark.pipeline.fuzzy import jaccard_similarity_join

    random.seed(11)
    vocab = [f"t{i}" for i in range(30)]
    rows = []
    for i in range(60):
        n = random.randint(1, 8)
        rows.append((i, random.sample(vocab, n)))
    # adversarial: identical sets, subset pairs, single-token sets
    rows += [(100, ["t0", "t1", "t2"]), (101, ["t0", "t1", "t2"]),
             (102, ["t0", "t1"]), (103, ["t0"]), (104, ["t0"])]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")

    for t in (0.5, 2 / 3, 0.9, 1.0):
        t_ppm = int(round(t * 1_000_000))
        want = {}
        for (ia, sa), (ib, sb) in itertools.combinations(
            [(i, set(tk)) for i, tk in rows], 2
        ):
            inter = len(sa & sb)
            union = len(sa | sb)
            if inter * 1_000_000 >= t_ppm * union:
                a, b = min(ia, ib), max(ia, ib)
                want[(a, b)] = (inter, union, inter * 1_000_000 // union)
        got = {
            (r["id_l"], r["id_r"]): (
                r["n_intersect"], r["n_union"], r["jaccard_ppm"]
            )
            for r in jaccard_similarity_join(
                df, "doc_id", "tokens", t
            ).collect()
        }
        assert got == want, f"mismatch at threshold {t}"


def test_jaccard_join_dedups_tokens_and_skips_empty(spark):
    from splink_spark.pipeline.fuzzy import jaccard_similarity_join

    df = spark.createDataFrame(
        [(1, ["a", "a", "b"]), (2, ["b", "a"]), (3, []), (4, None)],
        "doc_id long, tokens array<string>",
    )
    got = jaccard_similarity_join(df, "doc_id", "tokens", 0.9).collect()
    # {a,b} vs {b,a}: jaccard 1.0; empties/nulls dropped silently
    assert len(got) == 1 and got[0]["jaccard_ppm"] == 1_000_000


def test_group_outliers_zscore_and_null_groups(spark):
    """Outlier rows flagged per group at |z| >= threshold; NULL group keys
    keep their rows (null-safe join); zero-variance groups flag nothing."""
    from splink_spark.pipeline.analytics import group_outliers

    rows = (
        [("a", i, 10.0) for i in range(10)]
        + [("a", 99, 1000.0)]            # the outlier
        + [("b", 1, 5.0), ("b", 2, 5.0)]  # zero variance
        + [(None, 1, 0.0), (None, 2, 0.0), (None, 3, 100.0)]
    )
    df = spark.createDataFrame(rows, "g string, id int, value double")
    got = group_outliers(df, ["g"], "value", z_threshold=1.2).collect()
    flagged = {(r["g"], r["id"]): r["z_score"] for r in got}
    assert ("a", 99) in flagged and flagged[("a", 99)] > 3.0
    assert not any(g == "b" for g, _ in flagged)
    assert (None, 3) in flagged  # NULL-keyed group not dropped
    assert all(gid != ("a", 0) for gid in flagged)


def test_term_cosine_join_exact_and_max_df(spark):
    """Cosine over raw term counts, exact integer dot/norms; max_df prunes
    stop-word terms from the vectors (documented semantics change)."""
    from splink_spark.pipeline.search import term_cosine_join

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat sat"),          # identical -> cosine 1.0
            (3, "the dog ran far away"),  # shares only 'the' with 1/2
            (4, "zzz qqq"),              # shares nothing
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id_l"], r["doc_id_r"]): r
        for r in term_cosine_join(docs, threshold=0.0).collect()
    }
    assert out[(1, 2)]["cosine"] == 1.0
    assert out[(1, 2)]["dot"] == 3 and out[(1, 2)]["norm_sq_l"] == 3
    # pairs via shared 'the' only
    import math

    assert out[(1, 3)]["dot"] == 1
    assert out[(1, 3)]["cosine"] == round(1 / math.sqrt(3 * 5), 6)
    assert (1, 4) not in out and (3, 4) not in out
    # max_df=2 drops 'the' (df=3): pair (1,3) loses its only shared term
    pruned = {
        (r["doc_id_l"], r["doc_id_r"])
        for r in term_cosine_join(docs, threshold=0.0, max_df=2).collect()
    }
    assert (1, 3) not in pruned and (1, 2) in pruned


def test_phrase_search_consecutive_and_overlapping(spark):
    from splink_spark.pipeline.search import phrase_search, positional_index

    docs = spark.createDataFrame(
        [
            (1, "new york city new york"),   # 2 matches of "new york"
            (2, "york new"),                 # reversed: no match
            (3, "new-york!"),                # punctuation splits: match
            (4, "a b a b a"),                # overlapping 3-gram
            (5, None),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, "New York").collect()
    }
    assert got == {1: 2, 3: 1}
    tri = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, "a b a").collect()
    }
    assert tri == {4: 2}  # positions 0 and 2 overlap; both count
    # precomputed index path gives identical results
    idx = positional_index(docs)
    via_idx = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, "new york", index=idx).collect()
    }
    assert via_idx == got
    import pytest as _pytest
    with _pytest.raises(ValueError):
        phrase_search(docs, "!!!")
