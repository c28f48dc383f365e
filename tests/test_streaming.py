"""Structured Streaming operator tests: file-source streams with
availableNow trigger + memory sink → deterministic end-to-end runs."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import splink_spark.internals.comparison_library as cl
from splink_spark import Linker, SettingsCreator, block_on
from splink_spark.streaming import (
    incremental_link,
    stream_dedupe_exact,
    stream_session_aggregate,
    stream_stateful_neardupe,
    stream_windowed_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_stream(spark, tmp_path, rows, schema, name):
    src = str(tmp_path / f"src_{name}")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    return spark.readStream.schema(static.schema).parquet(src)


def _run_to_memory(stream_df, name, tmp_path, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_dedupe_exact(spark, tmp_path):
    rows = [
        (0, T0, "hello world"),
        (1, T0 + dt.timedelta(minutes=1), "hello world"),   # dup
        (2, T0 + dt.timedelta(minutes=2), "something else"),
    ]
    stream = _mk_stream(spark, tmp_path, rows, "id long, ts timestamp, text string", "dd")
    out = stream_dedupe_exact(stream, watermark="10 minutes")
    _run_to_memory(out, "dedup_sink", tmp_path)
    got = spark.sql("select * from dedup_sink").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["hello world", "something else"]


def test_stream_windowed_counts(spark, tmp_path):
    rows = [
        (0, T0 + dt.timedelta(minutes=5), "click", 1.0),
        (1, T0 + dt.timedelta(minutes=40), "click", 2.0),
        (2, T0 + dt.timedelta(minutes=70), "click", 4.0),
        (3, T0 + dt.timedelta(minutes=75), "view", 8.0),
    ]
    stream = _mk_stream(
        spark, tmp_path, rows, "id long, ts timestamp, event_type string, value double", "wc"
    )
    out = stream_windowed_counts(stream, window_duration="1 hour", watermark="2 hours")
    # append mode only emits a window once the watermark passes its end —
    # with one availableNow batch nothing would flush; complete mode shows all
    _run_to_memory(out, "wc_sink", tmp_path, output_mode="complete")
    got = spark.sql(
        "select window_start, event_type, n_events, total_value from wc_sink"
    ).collect()
    by_key = {(r["window_start"], r["event_type"]): r for r in got}
    assert by_key[(T0, "click")]["n_events"] == 2
    assert by_key[(T0, "click")]["total_value"] == 3.0
    assert by_key[(T0 + dt.timedelta(hours=1), "view")]["n_events"] == 1


def test_stream_session_aggregate(spark, tmp_path):
    rows = [
        (0, T0, 1, 1.0),
        (1, T0 + dt.timedelta(minutes=10), 1, 2.0),                # same session
        (2, T0 + dt.timedelta(minutes=60), 1, 4.0),                # new session
        (3, T0 + dt.timedelta(minutes=5), 2, 8.0),
    ]
    stream = _mk_stream(
        spark, tmp_path, rows, "id long, ts timestamp, user_id long, value double", "sess"
    )
    out = stream_session_aggregate(stream, gap="30 minutes", watermark="2 hours")
    _run_to_memory(out, "sess_sink", tmp_path, output_mode="complete")
    got = spark.sql("select user_id, n_events, session_value from sess_sink").collect()
    sessions = sorted((r["user_id"], r["n_events"], r["session_value"]) for r in got)
    assert sessions == [(1, 1, 4.0), (1, 2, 3.0), (2, 1, 8.0)]


def test_stream_stateful_neardupe(spark, tmp_path):
    rows = [
        (10, "en", "the quick brown fox jumps over the lazy dog"),
        (11, "en", "the quick brown fox jumped over the lazy dog"),  # near dup of 10
        (12, "en", "completely different content about spark streams"),
        (13, "de", "the quick brown fox jumps over the lazy dog"),   # other key
    ]
    stream = _mk_stream(
        spark, tmp_path, rows, "doc_id long, lang string, text string", "nd"
    )
    out = stream_stateful_neardupe(stream, key_col="lang", threshold=0.6)
    _run_to_memory(out, "nd_sink", tmp_path, output_mode="append")
    got = {
        r["doc_id"]: (r["canonical_id"], r["similarity"])
        for r in spark.sql("select * from nd_sink").collect()
    }
    assert got[10][0] == 10  # first seen → self-canonical
    assert got[11][0] == 10 and got[11][1] >= 0.6
    assert got[12][0] == 12
    assert got[13][0] == 13  # same text, different key → separate state

    # second batch against the SAME checkpoint: state persists across batches
    extra = [(14, "en", "the quick brown fox jumps over the lazy dog")]
    src = str(tmp_path / "src_nd")
    spark.createDataFrame(extra, "doc_id long, lang string, text string").write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema("doc_id long, lang string, text string").parquet(src)
    out2 = stream_stateful_neardupe(stream2, key_col="lang", threshold=0.6)
    _run_to_memory(out2, "nd_sink2", tmp_path)  # same ckpt_nd_sink2? fresh name/ckpt
    got2 = {
        r["doc_id"]: r["canonical_id"]
        for r in spark.sql("select * from nd_sink2").collect()
    }
    # fresh checkpoint replays all 5 docs in one batch — 14 still dedupes to 10
    assert got2[14] == 10


def test_incremental_link(spark, tmp_path, persons):
    def _set(comp, mus):
        for lv in comp.comparison_levels:
            if lv.is_null_level:
                continue
            lv.m_probability, lv.u_probability = mus[lv.comparison_vector_value]
        return comp

    settings = SettingsCreator(
        comparisons=[
            _set(cl.ExactMatch("surname"), {1: (0.9, 0.02), 0: (0.1, 0.98)}),
            _set(cl.ExactMatch("dob"), {1: (0.85, 0.01), 0: (0.15, 0.99)}),
        ],
        blocking_rules_to_generate_predictions=[block_on("dob")],
        probability_two_random_records_match=0.05,
    )
    linker = Linker(persons, settings)

    new_rows = [(300, "julia", "taylor", "2015-10-29", "london", None, -1)]
    stream = _mk_stream(spark, tmp_path, new_rows, persons.schema, "link")

    results = []
    q = incremental_link(
        stream, linker,
        sink_fn=lambda df, bid: results.append((bid, df.collect())),
        checkpoint_dir=str(tmp_path / "ckpt_link"),
    )
    q.awaitTermination(120)
    assert len(results) == 1
    scored = results[0][1]
    assert any(
        r["match_probability"] > 0.9 and r["unique_id_r"] == 300 for r in scored
    ), "streamed julia taylor must match the base entity"


def test_stream_curation_pipeline(spark, tmp_path):
    """Stateless curation ops (quality flags -> PII scrub) compose with
    Structured Streaming unchanged: pure Column expressions are valid on a
    streaming DataFrame, and an availableNow run equals the batch result."""
    from splink_spark.pipeline import curation as cu

    rows = [
        (0, "the data of a run that we have built with care " * 6),
        (1, "mail me at a@b.io from 10.1.2.3 " + "the paper total of and wordy " * 10),
        (2, "tiny"),
    ]
    src = str(tmp_path / "src_curation")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)

    def curate(df):
        flags = cu.gopher_quality_flags(df).select("doc_id", "keep")
        red = cu.pii_redact(df)
        return red.join(flags, "doc_id").where(F.col("keep")).drop("keep")

    out_batch = sorted(map(tuple, curate(static).collect()))
    q = (
        curate(stream)
        .writeStream.format("memory")
        .queryName("curated_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out_stream = sorted(map(tuple, spark.sql("select * from curated_stream").collect()))
    assert out_stream == out_batch
    assert len(out_stream) == 2  # doc 2 dropped by the word-count rule
    redacted = {r[0]: r[1] for r in out_stream}
    assert "<EMAIL>" in redacted[1] and "<IPV4>" in redacted[1]


def test_incremental_dedup_stream(spark, tmp_path):
    from splink_spark.streaming.operators import incremental_dedup_stream

    corpus_rows = [
        (i, "the settled corpus document number " + str(i) + " about topic x")
        for i in range(20)
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    batch_rows = [
        (100, corpus_rows[3][1]),                      # exact dup of corpus
        (101, "a totally fresh document about llamas and tea ceremonies"),
        (102, "a totally fresh document about llamas and tea ceremonies"),
    ]
    src = str(tmp_path / "docs_in")
    spark.createDataFrame(batch_rows, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    got = {}

    def sink(df, batch_id):
        got.update({r["doc_id"]: r for r in df.collect()})

    q = incremental_dedup_stream(
        stream, corpus, sink, jaccard_threshold=0.45,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert got[100]["exact_dup_corpus"] and not got[100]["keep"]
    assert got[101]["keep"]
    assert got[102]["exact_dup_batch"] and not got[102]["keep"]


def test_incremental_dedup_stream_grow_corpus(spark, tmp_path):
    from splink_spark.streaming.operators import incremental_dedup_stream

    corpus = spark.createDataFrame(
        [(0, "seed document about settled things")], ["doc_id", "text"]
    )
    src = str(tmp_path / "docs_grow")
    # two files -> with maxFilesPerTrigger=1, two micro-batches; the second
    # batch's doc duplicates a KEPT doc from the first batch
    spark.createDataFrame(
        [(10, "first wave novel content entirely new")], ["doc_id", "text"]
    ).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(20, "first wave novel content entirely new")], ["doc_id", "text"]
    ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    got = {}

    def sink(df, batch_id):
        got.update({r["doc_id"]: r for r in df.collect()})

    q = incremental_dedup_stream(
        stream, corpus, sink, grow_corpus=True, near_dup=False,
        checkpoint_dir=str(tmp_path / "ckpt_grow"),
    )
    q.awaitTermination(120)
    assert len(got) == 2
    # exactly one of the twins was kept, the other flagged against the
    # grown corpus (file->batch order is not guaranteed, flags are)
    keeps = sorted((d, got[d]["keep"]) for d in got)
    assert [k for _, k in keeps].count(True) == 1
    flagged = [d for d in got if not got[d]["keep"]]
    assert got[flagged[0]]["exact_dup_corpus"]


def test_sketch_update_stream_matches_batch_cms(spark, tmp_path):
    """Per-micro-batch partial sketches appended to parquet state must merge
    to exactly the batch CMS over all rows (merge law), and a duplicated
    (retried) batch append must not change the merged result."""
    from splink_spark.pipeline.sketches import cms_build
    from splink_spark.streaming import read_sketch_state, sketch_update_stream

    rows = [(f"k{i % 13}",) for i in range(300)]
    src = str(tmp_path / "src_cms")
    spark.createDataFrame(rows, ["key"]).repartition(3).write.mode(
        "overwrite"
    ).parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "cms_state")
    q = sketch_update_stream(
        stream, state, depth=4, width=256,
        checkpoint_dir=str(tmp_path / "ckpt_cms"),
    )
    q.awaitTermination()
    merged = {
        (r["sketch_row"], r["cell"]): r["count"]
        for r in read_sketch_state(spark, state).collect()
    }
    direct = {
        (r["sketch_row"], r["cell"]): r["count"]
        for r in cms_build(static, depth=4, width=256).collect()
    }
    assert merged == direct
    # simulate a foreachBatch retry: re-append batch 0's partial verbatim
    batch0 = spark.read.parquet(state).where("batch_id = 0")
    batch0.write.mode("append").parquet(state)
    again = {
        (r["sketch_row"], r["cell"]): r["count"]
        for r in read_sketch_state(spark, state).collect()
    }
    assert again == direct


def test_bloom_update_stream_matches_batch_filter(spark, tmp_path):
    from splink_spark.pipeline.sketches import bloom_build
    from splink_spark.streaming import bloom_update_stream, read_bloom_state

    rows = [(f"m{i}",) for i in range(50)]
    src = str(tmp_path / "src_bloom")
    spark.createDataFrame(rows, ["key"]).repartition(2).write.mode(
        "overwrite"
    ).parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "bloom_state")
    q = bloom_update_stream(
        stream, state, num_bits=4096, num_hashes=3,
        checkpoint_dir=str(tmp_path / "ckpt_bloom"),
    )
    q.awaitTermination()
    merged = {
        r["word"]: r["bits"] for r in read_bloom_state(spark, state).collect()
    }
    direct = {
        r["word"]: r["bits"]
        for r in bloom_build(static, num_bits=4096, num_hashes=3).collect()
    }
    assert merged == direct


def test_rollup_state_retry_append_and_batch_split_invariance(spark, tmp_path):
    """Two laws at once: (1) a retried batch re-appends identical partial
    rows and the read-side distinct collapses them; (2) the merged state
    is identical regardless of HOW rows were split into batches (the
    integer-micro-unit partials make the merge associative)."""
    from pyspark.sql import functions as F

    hour = 3_600_000_000_000
    rows = [(i % 3, i * 7_000_000_000_000 % (50 * hour), (i % 13) / 7.0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")

    def write_partials(path, splits, retry_batch=None):
        from splink_spark.streaming import operators as ops
        import pyspark.sql.functions as F

        for bid, part in enumerate(splits):
            partial = (
                part.select(
                    "user_id",
                    F.lit(hour).alias("granularity"),
                    F.expr(f"(cast(ts as bigint) div {hour}) * {hour}").alias(
                        "bucket_start"
                    ),
                    F.expr("cast(round(value * 1000000, 0) as bigint)").alias("__v"),
                )
                .groupBy("user_id", "granularity", "bucket_start")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("__v").alias("sum_micro"),
                    F.min("__v").alias("min_micro"),
                    F.max("__v").alias("max_micro"),
                )
                .withColumn("batch_id", F.lit(bid))
            )
            partial.write.mode("append").parquet(path)
            if retry_batch == bid:
                partial.write.mode("append").parquet(path)  # simulated retry

    from splink_spark.streaming.operators import read_rollup_state

    p1 = str(tmp_path / "s1")
    write_partials(p1, [df.where("user_id = 0"), df.where("user_id != 0")],
                   retry_batch=1)
    p2 = str(tmp_path / "s2")
    write_partials(p2, [df.where("ts < 20 * %d" % hour),
                        df.where("ts >= 20 * %d" % hour)])
    a = sorted(map(tuple, read_rollup_state(spark, p1, by="user_id").collect()))
    b = sorted(map(tuple, read_rollup_state(spark, p2, by="user_id").collect()))
    assert a == b and len(a) > 0


def test_hll_update_stream_matches_batch_sketch(spark, tmp_path):
    """Per-micro-batch HLL partials appended to parquet state must merge
    (per-register max) to exactly the batch sketch, and a retried batch
    append is harmless WITHOUT any dedup — max is idempotent."""
    from splink_spark.pipeline.sketches import hll_estimate, hll_sketch
    from splink_spark.streaming import hll_update_stream, read_hll_state

    rows = [(f"user_{i % 500}",) for i in range(2000)]
    src = str(tmp_path / "src_hll")
    spark.createDataFrame(rows, ["key"]).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "hll_state")
    q = hll_update_stream(
        stream, state, value_col="key",
        checkpoint_dir=str(tmp_path / "ckpt_hll"),
    )
    q.awaitTermination()
    merged = {
        r["register"]: r["max_rho"]
        for r in read_hll_state(spark, state).collect()
    }
    direct = {
        r["register"]: r["max_rho"]
        for r in hll_sketch(static, "key").collect()
    }
    assert merged == direct
    # retried batch: re-append batch 0's partial verbatim — max absorbs it
    spark.read.parquet(state).where("batch_id = 0").write.mode(
        "append"
    ).parquet(state)
    again = {
        r["register"]: r["max_rho"]
        for r in read_hll_state(spark, state).collect()
    }
    assert again == direct
    est = hll_estimate(read_hll_state(spark, state))
    assert abs(est - 500) / 500 < 0.1


def test_cdc_upsert_stream_matches_batch_compaction(spark, tmp_path):
    """Per-batch compaction partials appended to state must merge to
    exactly the batch latest_by_key over the whole log (argmax merge
    law), including cross-batch tombstone resolution; a retried batch
    append must not change the merged result (idempotent merge)."""
    import datetime as dt

    from splink_spark.pipeline.cdc import latest_by_key
    from splink_spark.streaming import cdc_upsert_stream, read_cdc_state

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, f"k{i % 7}", t0 + dt.timedelta(minutes=i),
         "D" if i % 11 == 0 and i > 0 else "U", i * 10)
        for i in range(60)
    ]
    src = str(tmp_path / "src_cdc")
    spark.createDataFrame(
        rows, "offset bigint, k string, ts timestamp, op string, val bigint"
    ).repartition(3).write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "cdc_state")
    q = cdc_upsert_stream(
        stream, state, "k", "ts", tiebreak_col="offset",
        checkpoint_dir=str(tmp_path / "ckpt_cdc"),
    )
    q.awaitTermination()
    merged = sorted(
        map(
            tuple,
            read_cdc_state(
                spark, state, "k", "ts", tiebreak_col="offset",
                op_col="op", delete_values=("D",),
            ).collect(),
        )
    )
    direct = sorted(
        map(
            tuple,
            latest_by_key(
                static, "k", "ts", tiebreak_col="offset",
                op_col="op", delete_values=("D",),
            ).collect(),
        )
    )
    assert merged == direct and len(direct) > 0
    # retry simulation: re-append one partial file's rows verbatim
    some = spark.read.parquet(state).limit(3)
    some.write.mode("append").parquet(state)
    again = sorted(
        map(
            tuple,
            read_cdc_state(
                spark, state, "k", "ts", tiebreak_col="offset",
                op_col="op", delete_values=("D",),
            ).collect(),
        )
    )
    assert again == direct


def test_interval_union_stream_matches_batch_merge(spark, tmp_path):
    """Per-batch merged islands appended to state must re-merge to
    exactly the batch merge over all intervals (union merge law),
    with n_merged counting SOURCE intervals end-to-end; a retried
    batch append must not change the merged bounds."""
    from splink_spark.pipeline.temporal import merge_intervals
    from splink_spark.streaming import (
        interval_union_stream,
        read_interval_state,
    )

    rows = [
        ("a", i * 10, i * 10 + 15 if i % 3 else i * 10 + 5)
        for i in range(60)
    ] + [("b", 0, 100), ("b", 50, 60), ("b", 200, 210)]
    src = str(tmp_path / "src_iv")
    spark.createDataFrame(rows, "k string, start bigint, end bigint") \
        .repartition(3).write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "iv_state")
    q = interval_union_stream(
        stream, state, by="k",
        checkpoint_dir=str(tmp_path / "ckpt_iv"),
    )
    q.awaitTermination()
    merged = sorted(map(tuple, read_interval_state(spark, state, by="k").collect()))
    direct = sorted(map(tuple, merge_intervals(static, by="k").collect()))
    assert merged == direct and len(direct) > 0
    # retry: re-append some state rows; bounds must not move (union is
    # idempotent); n_merged inflates for the duplicated islands, so
    # compare bounds only
    spark.read.parquet(state).limit(2).write.mode("append").parquet(state)
    again = sorted(
        (r["k"], r["start"], r["end"])
        for r in read_interval_state(spark, state, by="k").collect()
    )
    assert again == sorted((t[0], t[1], t[2]) for t in direct)
