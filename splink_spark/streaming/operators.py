"""Structured Streaming operators.

The reference is wholly batch (SURVEY §2.13); these extend its semantics to
streams the idiomatic Spark way:

- ``incremental_link``: the ``predict_between`` / find-matches semantics per
  micro-batch via ``foreachBatch`` — each batch of new records is linked
  against the static indexed base with the trained model; results append to a
  sink. This is the streaming shape of reference inference.py:1156-1511.
- ``stream_dedupe_exact``: exact dedup on a content fingerprint with a
  watermark bounding the dedup state (``dropDuplicates`` within watermark).
- ``stream_windowed_counts``: watermarked tumbling-window aggregation.
- ``stream_session_aggregate``: native session windows (``F.session_window``)
  — the gaps-and-islands sessionization of the batch path, stateful.

All operators return the transformed streaming DataFrame (or a query via
``foreachBatch``) so callers pick their own sink/trigger.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedupe_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first record per exact content fingerprint, with state bounded
    by the watermark (late duplicates beyond it are not deduped — the standard
    streaming-dedup contract).

    ``dropDuplicatesWithinWatermark`` is required for the state bound: plain
    ``dropDuplicates`` on a subset that EXCLUDES the event-time column never
    evicts its state (Spark only cleans dedup state when the watermark column
    is part of the key), so a long-running stream would accumulate every
    fingerprint ever seen until executors OOM."""
    deduped = (
        stream.withColumn("__fingerprint", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
    )
    if hasattr(deduped, "dropDuplicatesWithinWatermark"):
        deduped = deduped.dropDuplicatesWithinWatermark(["__fingerprint"])
    else:  # pragma: no cover - Spark < 3.5
        deduped = deduped.dropDuplicates(["__fingerprint", ts_col])
    return deduped.drop("__fingerprint")


def stream_windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums — late data within the
    watermark updates its window; beyond it, dropped."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration), *group_cols)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n_events",
            *(["total_value"] if value_col else []),
        )
    )


def stream_session_aggregate(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    group_cols: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Session windows with a gap timeout — the stateful streaming equivalent
    of the batch gaps-and-islands sessionization (q_events_sessions)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *group_cols,
            "n_events",
            "session_value",
        )
    )


def stream_stateful_neardupe(
    stream: DataFrame,
    key_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    ngram: int = 3,
    max_state_docs: int = 1000,
    state_timeout_ms: Optional[int] = None,
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): incremental
    near-duplicate assignment. Per blocking key, executor-local state holds
    the canonical documents seen so far as hashed character-n-gram sets; each
    arriving document is Jaccard-compared against them and either assigned
    the FIRST canonical at/above ``threshold`` (insertion order — the
    same first-seen-wins contract as ``stream_dedupe_exact``) or registered
    as a new canonical itself.

    This is the streaming shape the batch MinHash/LSH path cannot express:
    candidate state must persist ACROSS micro-batches, keyed by the blocking
    column, with bounded memory — exactly what flatMapGroupsWithState exists
    for. State is bounded two ways: ``max_state_docs`` canonicals per key
    (later docs fall back to self-canonical — dedup degrades, never OOMs)
    and an optional processing-time timeout that evicts idle keys.

    Output: (``key_col``, ``id_col``, canonical_id, similarity).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StringType, StructField, StructType,
    )

    out_schema = StructType([
        StructField(key_col, StringType()),
        StructField(id_col, LongType()),
        StructField("canonical_id", LongType()),
        StructField("similarity", DoubleType()),
    ])
    state_schema = StructType([
        StructField("ids", ArrayType(LongType())),
        StructField("sigs", ArrayType(ArrayType(LongType()))),
    ])

    def _gram_hashes(text: str) -> set:
        # deterministic polynomial hash (no PYTHONHASHSEED dependence)
        if text is None:
            return set()
        t = " ".join(str(text).lower().split())
        out = set()
        for i in range(max(len(t) - ngram + 1, 0)):
            acc = 0
            for ch in t[i : i + ngram]:
                acc = (acc * 1_000_003 + ord(ch)) & 0x7FFFFFFFFFFFFFFF
            out.add(acc)
        return out

    def assign(key, pdfs, state: "GroupState"):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids, sigs = state.get
            ids, sigs = list(ids), [set(s) for s in sigs]
        else:
            ids, sigs = [], []
        rows = []
        for pdf in pdfs:
            # deterministic intra-batch order
            for _, r in pdf.sort_values(id_col).iterrows():
                doc_id = int(r[id_col])
                g = _gram_hashes(r[text_col])
                canonical, sim = doc_id, 1.0
                for cid, s in zip(ids, sigs):
                    inter = len(g & s)
                    union = len(g) + len(s) - inter
                    j = inter / union if union else 1.0
                    if j >= threshold:
                        canonical, sim = cid, j
                        break
                if canonical == doc_id and len(ids) < max_state_docs:
                    ids.append(doc_id)
                    sigs.append(g)
                rows.append((key[0], doc_id, canonical, float(sim)))
        state.update((ids, [sorted(s) for s in sigs]))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(rows, columns=[key_col, id_col, "canonical_id", "similarity"])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(id_col).cast("long").alias(id_col),
            F.col(text_col).cast("string").alias(text_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            assign,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def incremental_link(
    stream: DataFrame,
    linker,
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Link each micro-batch of new records against the static base using the
    trained model (foreachBatch → ``find_matches_to_new_records``).

    ``sink_fn(scored_df, batch_id)`` receives the scored pairs per batch.
    Returns the started StreamingQuery.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scored = linker.inference.find_matches_to_new_records(batch_df)
        sink_fn(scored, batch_id)

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_dedup_stream(
    stream: DataFrame,
    corpus: DataFrame,
    sink_fn: Callable[[DataFrame, int], None],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
    grow_corpus: bool = False,
    **dedup_kwargs,
):
    """Screen each micro-batch of NEW documents against the settled corpus
    (foreachBatch → :func:`splink_spark.pipeline.dedup.incremental_dedup`).

    Every batch inherits incremental_dedup's scale contract: the corpus is
    scanned, never shuffled, never broadcast; all broadcast tables derive
    from the (small) micro-batch. ``sink_fn(flags_df, batch_id)`` receives
    the per-document flags (exact/near dup, keep).

    ``grow_corpus=True`` additionally unions each batch's kept documents
    into the in-memory view of the corpus for SUBSEQUENT batches — exact
    within-stream dedup across micro-batches. This accumulates a
    driver-held plan union per batch, so it is meant for bounded
    availableNow replays; a production pipeline should instead append kept
    docs (and their stored fingerprints/signatures) to the corpus tables
    between runs.

    ``**dedup_kwargs`` forwards to ``incremental_dedup`` — note its
    ``max_band_bucket`` default changed in round 9 from 100_000 to None
    (exact semantics, no bucket cap): on low-diversity corpora an uncapped
    degenerate LSH band bucket can make a batch effectively unbounded.
    Long-running streams over adversarial/low-entropy text should pass an
    explicit ``max_band_bucket`` (documented recall trade-off in
    ``incremental_dedup``).

    Returns the started StreamingQuery.
    """
    from ..pipeline.dedup import incremental_dedup

    state = {"corpus": corpus}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        flags = incremental_dedup(
            batch_df,
            state["corpus"],
            text_col=text_col,
            id_col=id_col,
            **dedup_kwargs,
        )
        if grow_corpus:
            kept = batch_df.join(
                flags.where(F.col("keep")).select(id_col), id_col, "leftsemi"
            ).select(*state["corpus"].columns)
            # localCheckpoint truncates the growing union lineage so batch
            # N's plan doesn't re-derive batches 1..N-1
            state["corpus"] = state["corpus"].unionByName(kept).localCheckpoint()
        sink_fn(flags, batch_id)

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sketch_update_stream(
    stream: DataFrame,
    state_path: str,
    *,
    key_col: str = "key",
    depth: int = 4,
    width: int = 8192,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Maintain a count-min sketch over an unbounded stream
    (pipeline/sketches.py): each micro-batch builds its own partial
    sketch — the bounded cms_build plan, <= depth*width rows however large
    or skewed the batch — and APPENDS it (tagged with ``batch_id``) to the
    parquet state at ``state_path``.

    Append-only state is the point: every commit is a plain file append
    (no read-modify-write race with concurrent readers), and because a
    batch's partial sketch is a pure function of its rows, a foreachBatch
    retry re-appends IDENTICAL rows — :func:`read_sketch_state` drops
    per-batch duplicates before summing, making the merged sketch
    exactly-once under retries. Compaction (read, merge, overwrite) is an
    optional periodic batch job; the CMS merge law (cell-wise sum) makes
    the compacted and uncompacted reads identical.
    """
    from ..pipeline.sketches import cms_build

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            cms_build(batch_df, key_col=key_col, depth=depth, width=width)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(state_path)
        )

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sketch_state(spark, state_path: str) -> DataFrame:
    """Merge the appended per-batch partial sketches into the current
    sketch: retry-duplicate batches collapse first (a batch's partial is
    deterministic, so duplicates are row-identical), then cells sum."""
    return (
        spark.read.parquet(state_path)
        .dropDuplicates(["batch_id", "sketch_row", "cell"])
        .groupBy("sketch_row", "cell")
        .agg(F.sum("count").alias("count"))
    )


def bloom_update_stream(
    stream: DataFrame,
    state_path: str,
    *,
    key_col: str = "key",
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Maintain a Bloom filter over a stream of keys: per-batch partial
    filters append to parquet state; read-side merge is a bit_or, which is
    idempotent — retries and duplicate appends cannot corrupt membership
    (same append-only design as :func:`sketch_update_stream`)."""
    from ..pipeline.sketches import bloom_build

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            bloom_build(
                batch_df, key_col=key_col, num_bits=num_bits, num_hashes=num_hashes
            )
            .write.mode("append")
            .parquet(state_path)
        )

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_bloom_state(spark, state_path: str) -> DataFrame:
    """Merge appended per-batch filters: bit_or per word (idempotent)."""
    return (
        spark.read.parquet(state_path)
        .groupBy("word")
        .agg(F.bit_or(F.col("bits")).alias("bits"))
    )


def bm25_index_update_stream(
    stream: DataFrame,
    state_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Maintain a BM25 inverted index (pipeline/search.py) over an
    unbounded document stream: each micro-batch builds its own partial
    postings table — ``bm25_index`` over just the batch, tagged with
    ``batch_id`` — and APPENDS it to the parquet state.

    Same append-only contract as ``sketch_update_stream``: a partial index
    is a pure function of the batch's rows, so a foreachBatch retry
    re-appends IDENTICAL rows and :func:`read_bm25_index_state` drops the
    duplicates — exactly-once under retries. Contract: each DOCUMENT
    arrives in exactly one logical batch (an append-only corpus); a doc's
    ``tf``/``dl`` are complete within its batch, so the merged index is the
    row-union of per-batch postings — no cross-batch recombination, which
    is what makes the merge embarrassingly parallel and the streamed index
    EQUAL to a batch build over the full corpus (gate-checked).
    """
    from ..pipeline.search import bm25_index

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            bm25_index(batch_df, text_col=text_col, id_col=id_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(state_path)
        )

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_bm25_index_state(spark, state_path: str) -> DataFrame:
    """Merge appended per-batch partial indexes: retry duplicates are
    bit-identical rows, so a distinct over the tagged rows removes them;
    the result drops the tag and is a regular ``bm25_index`` table."""
    return (
        spark.read.parquet(state_path)
        .select("batch_id", "term", "doc_id", "tf", "dl")
        .distinct()
        .drop("batch_id")
    )


def rollup_update_stream(
    stream: DataFrame,
    state_path: str,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    granularities: Sequence[int] = (3600 * 1_000_000_000,),
    by: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Continuous aggregate (the streaming twin of
    ``pipeline.temporal.time_rollup``): each micro-batch reduces to one
    partial row per (key, granularity, bucket) — count / sum / min / max
    — and APPENDS it (tagged with ``batch_id``) to parquet state; the
    read side merges by the aggregates' own merge laws.

    Exactness contract: values are quantized to integer MILLIONTHS before
    summation, so the cross-batch merge is associative — the merged state
    is bit-equal to a batch build over the full table regardless of how
    rows were split into batches (float partial sums would drift with
    batch boundaries). Buckets use true integer division (epoch-safe).
    Retry law as everywhere in this module: a batch's partial is a pure
    function of its rows; read-side drops duplicate (batch_id, key,
    granularity, bucket) rows before merging.
    """

    def partial(batch_df: DataFrame) -> DataFrame:
        keys = [by] if by else []
        pieces = []
        v_micro = F.expr(
            f"cast(round(`{value_col}` * 1000000, 0) as bigint)"
        )
        for g in granularities:
            bucket = F.expr(
                f"(cast(`{ts_col}` as bigint) div {int(g)}) * {int(g)}"
            )
            pieces.append(
                batch_df.select(
                    *keys,
                    F.lit(int(g)).alias("granularity"),
                    bucket.alias("bucket_start"),
                    v_micro.alias("__v"),
                )
                .groupBy(*keys, "granularity", "bucket_start")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("__v").alias("sum_micro"),
                    F.min("__v").alias("min_micro"),
                    F.max("__v").alias("max_micro"),
                )
            )
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            partial(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(state_path)
        )

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup_state(
    spark,
    state_path: str,
    by: Optional[str] = None,
    round_to: int = 6,
) -> DataFrame:
    """Merge appended partial rollups: retry duplicates dropped by
    distinct, then count/sum merge by +, min/max by min/max — all
    associative on the integer micro-units. Emits the ``time_rollup``
    column shape (sum/min/max/avg as rounded doubles)."""
    keys = [by] if by else []
    merged = (
        spark.read.parquet(state_path)
        .distinct()
        .groupBy(*keys, "granularity", "bucket_start")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_micro").alias("__s"),
            F.min("min_micro").alias("__mn"),
            F.max("max_micro").alias("__mx"),
        )
    )
    m = 1_000_000.0
    return merged.select(
        *keys,
        "granularity",
        "bucket_start",
        "n",
        F.round(F.col("__s") / m, round_to).alias("sum_value"),
        F.round(F.col("__mn") / m, round_to).alias("min_value"),
        F.round(F.col("__mx") / m, round_to).alias("max_value"),
        F.round(F.col("__s") / m / F.col("n"), round_to).alias("avg_value"),
    )


def hll_update_stream(
    stream: DataFrame,
    state_path: str,
    *,
    value_col: str = "key",
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Maintain a HyperLogLog distinct-count sketch over an unbounded
    stream (pipeline/sketches.py hll_sketch): each micro-batch appends its
    own <= 4096-row partial register table tagged with ``batch_id``; the
    HLL merge law (per-register MAX — associative, commutative AND
    idempotent) makes the merged read exactly-once under foreachBatch
    retries even WITHOUT the duplicate-drop the CMS state needs: a
    re-appended identical partial cannot move a max. Same append-only
    state shape as :func:`sketch_update_stream`."""
    from ..pipeline.sketches import hll_sketch

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            hll_sketch(batch_df, value_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(state_path)
        )

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_state(spark, state_path: str) -> DataFrame:
    """Current HLL registers from the appended per-batch partials:
    per-register max (idempotent — retry duplicates are harmless by the
    merge law). Feed to pipeline.sketches.hll_estimate."""
    return (
        spark.read.parquet(state_path)
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def cdc_upsert_stream(
    stream: DataFrame,
    state_path: str,
    key_cols: "Sequence[str] | str",
    order_col: str,
    *,
    tiebreak_col: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Maintain a latest-record-per-key table over an unbounded change
    log (the streaming twin of :func:`splink_spark.pipeline.cdc.
    latest_by_key`): each micro-batch compacts ITSELF to one row per key
    — the only shuffle is batch-sized — and APPENDS that partial to the
    parquet state. Per-key argmax by (order, tiebreak) is associative,
    commutative and idempotent, so the merged read is exactly-once under
    foreachBatch retries without any duplicate-drop, the same merge-law
    argument as the HLL state. No tombstone filtering happens here —
    delete markers must survive batches so a later read knows the key
    died; :func:`read_cdc_state` applies ``op_col`` at read time.

    State grows by <= distinct-keys-per-batch rows per batch; a periodic
    compaction (read_cdc_state → overwrite) is an ordinary batch job and,
    by the merge law, cannot change any read.
    """
    from ..pipeline.cdc import latest_by_key

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            latest_by_key(
                batch_df, key_cols, order_col, tiebreak_col=tiebreak_col
            )
            .write.mode("append")
            .parquet(state_path)
        )

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cdc_state(
    spark,
    state_path: str,
    key_cols: "Sequence[str] | str",
    order_col: str,
    *,
    tiebreak_col: Optional[str] = None,
    op_col: Optional[str] = None,
    delete_values: Sequence[str] = ("D", "delete"),
) -> DataFrame:
    """Current compacted table from the appended per-batch partials: one
    more ``latest_by_key`` pass over the (already heavily reduced) state,
    with tombstone filtering applied here — after the global argmax — so
    delete-then-reinsert across batches resolves correctly."""
    from ..pipeline.cdc import latest_by_key

    return latest_by_key(
        spark.read.parquet(state_path),
        key_cols,
        order_col,
        tiebreak_col=tiebreak_col,
        op_col=op_col,
        delete_values=delete_values,
    )


def interval_union_stream(
    stream: DataFrame,
    state_path: str,
    *,
    start_col: str = "start",
    end_col: str = "end",
    by: "Sequence[str] | str | None" = None,
    min_gap: int = 0,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Maintain merged interval unions over an unbounded stream (the
    streaming twin of :func:`splink_spark.pipeline.temporal.
    merge_intervals`): each micro-batch merges ITSELF (batch-sized
    shuffle only) and appends its merged islands to parquet state.
    Interval union is associative, commutative and idempotent —
    merge(merge(A), merge(B)) == merge(A ∪ B) — so
    :func:`read_interval_state` just re-merges the appended partials
    and the result equals the batch computation over the whole stream.
    Retry semantics are split: the merged BOUNDS are exactly-once under
    foreachBatch retries (union is idempotent — a re-appended island
    cannot move a min/max), but ``n_merged`` is a SUM of source-interval
    counts and double-counts a retried batch's islands — treat it as
    approximate in at-least-once deployments, or compact the state
    (read → overwrite) after failures.
    """
    from ..pipeline.temporal import merge_intervals

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            merge_intervals(
                batch_df, start_col=start_col, end_col=end_col, by=by,
                min_gap=min_gap,
            )
            .write.mode("append")
            .parquet(state_path)
        )

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_interval_state(
    spark,
    state_path: str,
    *,
    by: "Sequence[str] | str | None" = None,
    min_gap: int = 0,
) -> DataFrame:
    """Current merged intervals from the appended per-batch partials:
    one more merge pass over the (already reduced) state. The source
    count re-aggregates by summing the partials' ``n_merged`` — a
    second islands pass over (start, end, n_merged) triples weighted by
    their counts."""
    from ..pipeline.temporal import _as_list

    from pyspark.sql import Window

    keys = _as_list(by)
    base = spark.read.parquet(state_path).select(
        *keys,
        F.col("start").alias("__s"),
        F.col("end").alias("__e"),
        F.col("n_merged").alias("__n"),
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__s").asc(), F.col("__e").asc())
    prev_max_end = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = (
        prev_max_end.isNull()
        | (F.col("__s") > prev_max_end + F.lit(int(min_gap)))
    ).cast("int")
    islands = base.withColumn("__new", is_new).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(*keys, "__island")
        .agg(
            F.min("__s").alias("start"),
            F.max("__e").alias("end"),
            F.sum("__n").cast("bigint").alias("n_merged"),
        )
        .drop("__island")
    )
