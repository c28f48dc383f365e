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

from typing import Callable, Optional

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
