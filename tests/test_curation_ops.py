"""Tests for the corpus-curation operators (Gopher rules, repetition,
decontamination, stratified sampling, packing, PII redaction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splink_spark.pipeline import curation as cu


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # long doc with required stopwords and clean words -> keeps
        (0, " ".join(["the data of a run that we have built with care"] * 6), "en"),
        (1, "short doc", "en"),  # fails word count
        (2, " ".join(["spam"] * 80), "en"),  # repetitive, no stopwords
        (3, "#### ### ## # #### " + " ".join(["the of and to word list here okay fine"] * 7), "en"),
        (4, "", "en"),  # empty
        (5, " ".join(f"w{i}" for i in range(60)) + " the of", "de"),  # all distinct
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_gopher_flags(docs):
    out = {r["doc_id"]: r for r in cu.gopher_quality_flags(docs).collect()}
    assert out[0]["keep"] is True
    assert out[1]["pass_word_count"] is False
    assert out[2]["pass_stopwords"] is False and out[2]["stopword_hits"] == 0
    # doc 3: 14 '#' chars over 75 words > 0.1
    assert out[3]["pass_symbol_ratio"] is False
    assert out[4]["n_words"] == 0 and out[4]["keep"] is False
    assert out[0]["stopword_hits"] >= 2


def test_repetition_metrics_both_methods_equal(docs):
    a = sorted(
        cu.repetition_metrics(docs, method="hof").collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        cu.repetition_metrics(docs, method="explode").collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # default auto routing: identical output whatever the per-doc route —
    # hof_max_tokens=30 sends the long docs (60-80 tokens) down the explode
    # branch and the short ones down hof in ONE result
    c = sorted(
        cu.repetition_metrics(docs, method="auto", hof_max_tokens=30).collect(),
        key=lambda r: r["doc_id"],
    )
    d = sorted(cu.repetition_metrics(docs).collect(), key=lambda r: r["doc_id"])
    assert [tuple(r) for r in c] == [tuple(r) for r in a]
    assert [tuple(r) for r in d] == [tuple(r) for r in a]
    out = {r["doc_id"]: r for r in a}
    # all-identical doc: dup fraction (n-1)/n, top word = everything
    assert out[2]["dup_word_frac"] == pytest.approx(79 / 80, abs=1e-6)
    assert out[2]["top_word_char_frac"] == 1.0
    assert out[2]["top_2gram_char_frac"] == 1.0
    # all-distinct doc: no duplicate words
    assert out[5]["dup_word_frac"] == 0.0
    assert out[5]["top_word_char_frac"] < 0.1
    assert out[4]["n_words"] == 0 and out[4]["dup_word_frac"] == 0.0


def test_decontaminate_flags_overlap(spark, docs):
    ev = spark.createDataFrame(
        [(100, "the data of a run that we have built")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in cu.decontaminate(docs, ev, n=5).collect()}
    assert out[0]["contaminated"] is True and out[0]["n_overlap"] >= 1
    assert out[2]["contaminated"] is False
    assert out[4]["n_overlap"] == 0
    # a SMALL eval dictionary is broadcast: no shuffle on the corpus-gram join
    plan = cu.decontaminate(docs, ev, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_decontaminate_large_eval_dictionary_not_broadcast(spark, docs):
    """The eval gram dictionary is unbounded input; above the probe bound the
    join must be left unhinted (no forced driver-side broadcast that would
    OOM at a 100k-doc eval slice). Routing must not change results."""
    ev = spark.createDataFrame(
        [(100, "the data of a run that we have built")], ["doc_id", "text"]
    )
    big = cu.decontaminate(
        docs, ev, n=5, broadcast_max_grams=1, bloom_prescreen=False
    )
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    forced_off = cu.decontaminate(
        docs, ev, n=5, broadcast_eval=False, bloom_prescreen=False
    )
    default = cu.decontaminate(docs, ev, n=5)
    assert sorted(map(tuple, big.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, default.collect()), key=lambda t: t[0]
    )
    assert sorted(map(tuple, forced_off.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, default.collect()), key=lambda t: t[0]
    )


def test_decontaminate_bloom_prescreen_identical_output(spark, docs):
    """The non-broadcast path auto-enables a Bloom prescreen of corpus grams
    (no false negatives → exact join output unchanged); the dictionary join
    itself must still not be a driver broadcast."""
    ev = spark.createDataFrame(
        [(100, "the data of a run that we have built")], ["doc_id", "text"]
    )
    default = cu.decontaminate(docs, ev, n=5)
    screened = cu.decontaminate(docs, ev, n=5, broadcast_max_grams=1,
                                bloom_bits=1 << 14, bloom_hashes=4)
    assert sorted(map(tuple, screened.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, default.collect()), key=lambda t: t[0]
    )
    plan = screened._jdf.queryExecution().executedPlan().toString()
    # the prescreen's word-table joins are broadcast; the gram-dictionary
    # join is not (it stays a shuffled join on gram)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_stratified_sample_deterministic_and_exclusive(spark):
    df = spark.range(0, 10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    s1 = cu.stratified_sample(df, "lang", {"en": 0.25}, id_col="doc_id")
    s2 = cu.stratified_sample(df, "lang", {"en": 0.25}, id_col="doc_id")
    r1 = sorted(r["doc_id"] for r in s1.collect())
    assert r1 == sorted(r["doc_id"] for r in s2.collect())
    # default fraction 0: the un-named stratum is dropped entirely
    assert all(i % 3 == 0 for i in r1)
    n_en = df.where("lang = 'en'").count()
    assert 0.2 * n_en < len(r1) < 0.3 * n_en
    # nested sampling property: a 10% sample is a subset of a 25% sample
    s3 = set(
        r["doc_id"]
        for r in cu.stratified_sample(df, "lang", {"en": 0.10}, id_col="doc_id").collect()
    )
    assert s3 <= set(r1)


def test_mixture_plan_limiting_stratum(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, "code")
        .when(F.col("id") < 400, "web")
        .otherwise("books")
        .alias("kind"),
    )
    out = {
        r["kind"]: r
        for r in cu.mixture_plan(df, "kind", {"code": 0.5, "web": 0.3, "books": 0.2}).collect()
    }
    # code is limiting: 100/0.5 = 200 total -> web keeps 60/300, books 40/600
    assert out["code"]["keep_frac"] == 1.0
    assert out["web"]["expected_rows"] == 60
    assert out["books"]["expected_rows"] == 40
    assert out["web"]["keep_frac"] == pytest.approx(0.2, abs=1e-6)


def test_pack_sequences_straddle(spark):
    df = spark.createDataFrame(
        [(i, "s", 60) for i in range(10)], ["doc_id", "shard", "ntok"]
    )
    out = sorted(
        cu.pack_sequences(df, capacity=100, shard_col="shard", token_count_col="ntok").collect(),
        key=lambda r: r["doc_id"],
    )
    # starts: 0,60,120,...  bin = start // 100
    assert [r["bin_id"] for r in out] == [(60 * i) // 100 for i in range(10)]
    assert [r["bin_offset"] for r in out] == [(60 * i) % 100 for i in range(10)]
    stats = cu.packing_stats(
        cu.pack_sequences(df, 100, "shard", token_count_col="ntok"), 100
    ).collect()
    assert sum(r["n_docs"] for r in stats) == 10


def test_pii_redact(spark):
    df = spark.createDataFrame(
        [
            (0, "email a.b+c@test-mail.org then ip 192.168.1.10 ok"),
            (1, "call +44 20 7946 0958 twice: +44 20 7946 0958"),
            (2, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in cu.pii_redact(df).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_ipv4"] == 1
    assert out[0]["redacted"] == "email <EMAIL> then ip <IPV4> ok"
    assert out[1]["n_phone"] == 1 or out[1]["n_phone"] == 2
    assert "<PHONE>" in out[1]["redacted"] and "0958" not in out[1]["redacted"]
    assert out[2]["redacted"] == "no pii here at all"
    assert out[2]["n_email"] == out[2]["n_ipv4"] == out[2]["n_phone"] == 0


def test_pack_sequences_invariants(spark):
    """Packing invariants on irregular doc sizes: offsets stay in [0,cap),
    bins are dense per shard, token totals are preserved, and assignment is
    independent of input partitioning."""
    import random

    rng = random.Random(7)
    rows = [(i, "s%d" % (i % 3), rng.randint(1, 300)) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "ntok"])
    out = cu.pack_sequences(df, capacity=256, shard_col="shard", token_count_col="ntok")
    rows_out = out.collect()
    assert len(rows_out) == 500
    assert all(0 <= r["bin_offset"] < 256 for r in rows_out)
    by_shard = {}
    for r in rows_out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        # bin ids non-decreasing in doc order, starting at 0, no gaps
        bins = [r["bin_id"] for r in rs]
        assert bins[0] == 0
        assert all(b2 - b1 >= 0 for b1, b2 in zip(bins, bins[1:]))
        total = sum(r["n_tokens"] for r in rs)
        # last doc's start position equals total minus its own tokens
        last = rs[-1]
        assert last["bin_id"] * 256 + last["bin_offset"] == total - last["n_tokens"]
    again = cu.pack_sequences(
        df.repartition(13), capacity=256, shard_col="shard", token_count_col="ntok"
    ).collect()
    assert sorted(map(tuple, rows_out)) == sorted(map(tuple, again))


def test_decontaminate_monotone_in_eval_set(spark, docs):
    """A larger eval set can only increase per-doc overlap counts."""
    ev_small = docs.where("doc_id = 0").select("doc_id", "text")
    ev_big = docs.where("doc_id in (0, 2)").select("doc_id", "text")
    small = {r["doc_id"]: r["n_overlap"] for r in cu.decontaminate(docs, ev_small, n=4).collect()}
    big = {r["doc_id"]: r["n_overlap"] for r in cu.decontaminate(docs, ev_big, n=4).collect()}
    assert all(big[k] >= v for k, v in small.items())
    # every eval member overlaps itself (if it has >= n tokens)
    assert small[0] > 0 and big[2] > 0


def test_gopher_flags_tunable_thresholds(spark, docs):
    """Thresholds are parameters, not baked constants."""
    loose = cu.gopher_quality_flags(docs, min_words=1, min_stopword_hits=0)
    out = {r["doc_id"]: r["keep"] for r in loose.collect()}
    assert out[1] is True  # "short doc" passes with min_words=1
    assert out[4] is False  # empty doc still fails mean-word-len bounds


def test_curate_corpus_end_to_end(spark):
    rows = [
        (0, "the data of a run that we have built with care " * 8, "en"),
        (1, "the data of a run that we have built with care " * 8 + "extra", "en"),  # near-dup of 0
        (2, "tiny", "en"),  # quality-dropped
        (3, "mail x@y.io " + "the story total of and worthy tales told here " * 8, "en"),
        (4, "the quiz parts of and sundry words that we have kept with care " * 6, "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    ev = spark.createDataFrame([(99, "sundry words that we have kept")], ["doc_id", "text"])
    from splink_spark.pipeline.curation import curate_corpus

    out = curate_corpus(
        docs,
        eval_df=ev,
        decontaminate_n=5,
        dedup_kwargs={"n": 3, "threshold": 0.6, "block_cols": ["lang"]},
        pack_capacity=128,
        pack_shard_col="lang",
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert 2 not in got  # quality filter
    assert 4 not in got  # decontaminated (5-gram overlap with eval)
    assert len({0, 1} & set(got)) == 1  # near-dup cluster keeps one canonical
    assert 3 in got and "<EMAIL>" in got[3]["text"]  # PII scrubbed
    assert all("bin_id" in r.asDict() for r in got.values())


def test_tfidf_top_terms(spark):
    rows = [
        (0, "apple banana apple apple cherry"),
        (1, "banana banana durian"),
        (2, "cherry durian elder elder"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = cu.tfidf_top_terms(docs, k=2)
    got = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    assert len(got) == 6
    # doc 0: apple (tf=3, df=1) must outrank cherry (tf=1, df=2)
    assert got[(0, 1)]["token"] == "apple"
    assert got[(0, 1)]["tfidf"] > got[(0, 2)]["tfidf"]
    # a term present in every doc gets the minimum idf = 1.0 scale
    import math
    n, df = 3, 1
    expected = round(3 * round((math.log((n + 1) / (df + 1)) + 1) * 1e6) / 1e6, 6)
    assert got[(0, 1)]["tfidf"] == expected
    # deterministic under repartitioning
    again = {(r["doc_id"], r["rank"]): r["token"] for r in cu.tfidf_top_terms(docs.repartition(5), k=2).collect()}
    assert again == {k: v["token"] for k, v in got.items()}


def test_corpus_stats(spark):
    rows = [(0, "a bb ccc", "en"), (1, "bb bb dddd", "en"), (2, "x", "fr")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    one = cu.corpus_stats(docs).collect()[0]
    assert one["n_docs"] == 3 and one["total_tokens"] == 7
    assert one["vocab_size"] == 5  # a bb ccc dddd x
    assert one["median_doc_tokens"] == 3.0
    by = {r["lang"]: r for r in cu.corpus_stats(docs, by="lang").collect()}
    assert by["en"]["vocab_size"] == 4 and by["fr"]["n_docs"] == 1


def test_chunk_documents_windows(spark):
    """chunk_documents: disjoint and overlapping windows, suffix-duplicate
    suppression, empty docs emit nothing, exact reconstruction when
    stride == chunk_tokens."""
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, "a b c"), (2, ""),
         (3, "solo")],
        ["doc_id", "text"],
    )
    out = cu.chunk_documents(docs, chunk_tokens=4, stride=3) \
        .orderBy("doc_id", "chunk_id").collect()
    d0 = [r for r in out if r["doc_id"] == 0]
    # starts 0,3,6 emitted; start 9 suppressed (window 6..9 already reached the end)
    assert [(r["chunk_id"], r["chunk_text"]) for r in d0] == [
        (0, "t0 t1 t2 t3"), (1, "t3 t4 t5 t6"), (2, "t6 t7 t8 t9")]
    assert [r["chunk_text"] for r in out if r["doc_id"] == 1] == ["a b c"]
    assert not [r for r in out if r["doc_id"] == 2]
    assert [r["n_tokens"] for r in out if r["doc_id"] == 3] == [1]

    # stride == chunk_tokens: concatenating chunks reconstructs the doc
    disjoint = cu.chunk_documents(docs, chunk_tokens=4) \
        .orderBy("doc_id", "chunk_id").collect()
    rebuilt = " ".join(r["chunk_text"] for r in disjoint if r["doc_id"] == 0)
    assert rebuilt == " ".join(f"t{i}" for i in range(10))

    with pytest.raises(ValueError):
        cu.chunk_documents(docs, chunk_tokens=0)


def test_dedup_within_document(spark):
    from splink_spark.pipeline.text import dedup_within_document

    docs = spark.createDataFrame(
        [
            (1, "header\nbody one\nheader\nbody two\nheader"),
            (2, "all\nunique\nlines"),
            (3, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup_within_document(docs).collect()}
    assert out[1]["text"] == "header\nbody one\nbody two"
    assert out[1]["n_segments"] == 5 and out[1]["n_removed"] == 2
    assert out[2]["text"] == "all\nunique\nlines" and out[2]["n_removed"] == 0
    assert out[3]["n_segments"] == 1 and out[3]["n_removed"] == 0
    # custom delimiter: repeated tokens
    tok = dedup_within_document(
        spark.createDataFrame([(1, "a b a c b")], "doc_id bigint, text string"),
        delimiter=" ",
    ).collect()[0]
    assert tok["text"] == "a b c" and tok["n_removed"] == 2


def test_decontaminate_spans_removes_only_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "one two three four"),
            (2, ""),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(9, "BETA GAMMA delta")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in cu.decontaminate_spans(corpus, ev, n=3).collect()}
    # case-insensitive match removes tokens 1..3 of doc 0, keeps the rest
    assert out[0]["n_removed_tokens"] == 3
    assert out[0]["n_contaminated_spans"] == 1
    assert out[0]["cleaned_text"] == "alpha epsilon zeta"
    assert out[1]["n_removed_tokens"] == 0
    assert out[1]["cleaned_text"] == "one two three four"
    assert out[2]["n_tokens"] == 0 and out[2]["cleaned_text"] == ""


def test_decontaminate_spans_overlapping_spans_union(spark):
    corpus = spark.createDataFrame(
        [(0, "a b c d e")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(9, "a b c"), (10, "c d e")], ["doc_id", "text"])
    r = cu.decontaminate_spans(corpus, ev, n=3).collect()[0]
    # spans [0..2] and [2..4] union to all five positions
    assert r["n_removed_tokens"] == 5
    assert r["n_contaminated_spans"] == 2
    assert r["cleaned_text"] == ""


def test_skew_report_shares_and_uniform_multiple(spark):
    df = spark.createDataFrame(
        [("hot",)] * 60 + [("a",)] * 20 + [("b",)] * 15 + [("c",)] * 5,
        ["k"],
    )
    out = {r["key"]: r for r in cu.skew_report(df, "k", top_n=3).collect()}
    assert set(out) == {"hot", "a", "b"}
    assert out["hot"]["rank"] == 1 and out["hot"]["n"] == 60
    assert out["hot"]["row_share"] == pytest.approx(0.6, abs=1e-6)
    # 4 distinct keys, uniform share would be 0.25 → hot is 2.4x uniform
    assert out["hot"]["x_uniform"] == pytest.approx(2.4, abs=1e-3)


def test_weighted_sample_deterministic_and_weight_biased(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 100.0).otherwise(1.0).alias("w"),
    )
    a = sorted(r["doc_id"] for r in cu.weighted_sample(df, 200, "w").collect())
    b = sorted(r["doc_id"] for r in cu.weighted_sample(df, 200, "w").collect())
    assert a == b and len(a) == 200
    # the 100 heavy rows (100x weight) should dominate the sample
    heavy = sum(1 for i in a if i < 100)
    assert heavy >= 80
    # a different seed draws a different (but still deterministic) sample
    c = sorted(r["doc_id"] for r in cu.weighted_sample(df, 200, "w", seed=7).collect())
    assert c != a
    # zero/negative weights are excluded
    z = cu.weighted_sample(
        df.withColumn("w", F.when(F.col("doc_id") < 1999, 0.0).otherwise(1.0)),
        10, "w",
    ).collect()
    assert [r["doc_id"] for r in z] == [1999]


def test_skew_report_plan_is_take_ordered_not_global_window(spark):
    """The top-n must plan as TakeOrderedAndProject (per-partition heaps),
    never a single-task global row_number window over the full key
    cardinality — that is the exact skew this diagnostic exists to find."""
    df = spark.createDataFrame([(str(i % 7),) for i in range(100)], ["k"])
    plan = (
        cu.skew_report(df, "k", top_n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_dedup_repeated_spans_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat today"),
            (2, "yesterday the cat sat on the mat again"),
            (3, "completely unrelated text here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_removed_tokens"], r["n_repeated_spans"])
        for r in cu.dedup_repeated_spans(df, n=3).collect()
    }
    # doc 1 holds every repeated 3-gram's first occurrence -> untouched
    assert got[1] == ("the cat sat on the mat today", 0, 0)
    # doc 2 loses the shared 6-token run (4 overlapping repeated 3-grams)
    assert got[2] == ("yesterday again", 6, 4)
    assert got[3] == ("completely unrelated text here now", 0, 0)


def test_dedup_repeated_spans_within_one_document(spark):
    # repetition INSIDE a doc is also deduplicated (first window kept)
    df = spark.createDataFrame(
        [(1, "a b c x a b c")], "doc_id long, text string"
    )
    r = cu.dedup_repeated_spans(df, n=3).collect()[0]
    assert r["cleaned_text"] == "a b c x"
    assert r["n_removed_tokens"] == 3 and r["n_repeated_spans"] == 1


def test_dedup_repeated_spans_min_count_threshold(spark):
    df = spark.createDataFrame(
        [(1, "p q r"), (2, "p q r"), (3, "p q r")], "doc_id long, text string"
    )
    # min_count=4: three occurrences stay under the bar -> nothing removed
    out = cu.dedup_repeated_spans(df, n=3, min_count=4).collect()
    assert all(r["n_removed_tokens"] == 0 for r in out)
    # default min_count=2: docs 2 and 3 empty, doc 1 kept
    got = {r["doc_id"]: r["cleaned_text"]
           for r in cu.dedup_repeated_spans(df, n=3).collect()}
    assert got == {1: "p q r", 2: "", 3: ""}


def test_split_dataset_coverage_and_determinism(spark):
    from splink_spark.pipeline.curation import split_dataset

    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    s = split_dataset(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in s.groupBy("split").count().collect()}
    assert sum(counts.values()) == 20000       # total coverage, no overlap
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    # repartition-stable and reproducible
    s2 = split_dataset(df.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, s2.collect()))
    # a different seed draws a different assignment
    s3 = split_dataset(df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    assert sorted(map(tuple, s3.collect())) != sorted(map(tuple, s.collect()))
    import pytest as _p
    with _p.raises(ValueError):
        split_dataset(df, {})
    with _p.raises(ValueError):
        split_dataset(df, {"a": -1.0, "b": 2.0})


def test_k_anonymity_report_classes_and_nulls(spark):
    from splink_spark.pipeline.curation import k_anonymity_report

    df = spark.createDataFrame(
        [("US", "M"), ("US", "M"), ("US", "F"), ("FR", None), ("FR", None),
         ("DE", "X")],
        "country string, gender string",
    )
    rep = {
        (r["country"], r["gender"]): (r["n"], r["at_risk"])
        for r in k_anonymity_report(df, ["country", "gender"], k=2).collect()
    }
    assert rep[("US", "M")] == (2, False)
    assert rep[("US", "F")] == (1, True)
    assert rep[("FR", None)] == (2, False)   # NULL groups as a value
    assert rep[("DE", "X")] == (1, True)
    import pytest as _p
    with _p.raises(ValueError):
        k_anonymity_report(df, [], k=2)
    with _p.raises(ValueError):
        k_anonymity_report(df, ["country"], k=0)
