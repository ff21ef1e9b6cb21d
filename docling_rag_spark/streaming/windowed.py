"""Watermarked streaming aggregation + bounded-state streaming dedup.

Fills the two §2.6 shapes the suite still lacked next to checkpointed
ingest and stateful sessionization:

``windowed_counts_stream`` — the streaming analog of
operators/retrieval.events_daily: tumbling event-time windows over an
unbounded event stream, a watermark bounding both state and lateness.
Append output mode, so a window row is emitted EXACTLY ONCE — when the
watermark passes its end — and late events are folded for free as long as
they arrive within the watermark delay; events later than that are
DROPPED (the documented watermark trade; the batch operator over the full
table is the reconciliation path, same as the reference recomputes its
dashboard aggregates from Postgres rather than trusting incremental
state). ``n_users`` is deliberately absent: exact COUNT(DISTINCT) is not
supported inside a streaming aggregation — ``approx_count_distinct`` is
the streaming answer and would break exact batch parity, so this operator
reports the exactly-mergeable stats (count + decimal-cast sum) and leaves
distincts to the batch path.

``dedup_stream`` — streaming exact dedup by content digest:
``dropDuplicatesWithinWatermark`` keeps digest state only for the
watermark window (plain ``dropDuplicates`` on a stream grows state
forever — the thing that kills a long-running job), and the emit side
goes through ``idempotent_append(key="digest")`` in foreachBatch, so a
replica arriving AFTER its digest left the state store is still dropped
by the sink's keyed anti-join. State stays bounded, exactly-once per
digest stays corpus-wide — each mechanism covering the other's gap, the
same two-layer contract as streaming ingest (streaming/ingest.py).

At 100-TB scale both queries shuffle once on their natural key (window ×
event_type; digest) per micro-batch; state is per-key and watermark-
bounded; the parquet file source is the stand-in for Kafka/Iceberg CDC —
swap the reader, keep the plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

DOCS_STREAM_SCHEMA = "doc_id long, ingest_ts timestamp, text string"


def windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    window: str = "1 day",
    watermark: str = "2 hours",
) -> None:
    """Run one Trigger.AvailableNow pass; finalized windows append to
    ``out_dir/windows``. Re-running with the same checkpoint resumes the
    watermark and emits only newly-closed windows."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "windows"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    watermark: str = "1 hour",
) -> None:
    """Run one Trigger.AvailableNow pass; first-seen docs per content
    digest append to ``out_dir/unique_docs``."""
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )
    firsts = (
        stream.withColumn("digest", F.unhex(F.md5(F.coalesce("text", F.lit("")))))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )
    unique_dir = os.path.join(out_dir, "unique_docs")

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # keyed sink backstop: drops (a) foreachBatch replays after a
        # mid-batch failure and (b) replicas arriving after their digest
        # aged out of the state store
        from ..sources.sinks import idempotent_append

        idempotent_append(spark, batch_df, unique_dir, key="digest")

    q = (
        firsts.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def attribution_join_stream(
    spark: SparkSession,
    views_dir: str,
    clicks_dir: str,
    out_dir: str,
    watermark: str = "2 hours",
    horizon_minutes: int = 30,
    how: str = "inner",
) -> None:
    """Watermarked stream-stream interval join — the remaining §2.6 shape
    next to windowed aggregation / streaming dedup / sessionization: join
    two unbounded streams (a ``view`` stream and a ``click`` stream, both
    the events schema) on user_id where the click lands within
    ``horizon_minutes`` AFTER the view. Both sides carry an event-time
    watermark AND the join condition bounds event-time distance, so Spark
    derives a state watermark for each side — per-key join state is
    evicted once it can no longer match (without BOTH bounds the state
    store grows forever, the stream-stream analog of the unbounded
    dropDuplicates trap documented on dedup_stream). ``how='leftOuter'``
    additionally emits a NULL-click row for a view once the watermark
    proves no click can arrive — the attribution "no conversion" record,
    emitted exactly once. Append mode; re-running on the same checkpoint
    resumes the watermark and never re-emits. Per micro-batch the shuffle
    is one hash exchange per side on user_id (skew: a bot user fans out,
    same mitigation as the batch as-of join — AQE inside the micro-batch);
    the parquet file source stands in for Kafka, swap the reader and the
    plan survives.
    """
    views = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(views_dir)
        .select(
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            "user_id",
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(clicks_dir)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("click_user_id"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = views.join(
        clicks,
        F.expr(
            "user_id = click_user_id "
            "AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + interval {int(horizon_minutes)} minutes"
        ),
        how,
    ).select(
        "view_id",
        "view_ts",
        "user_id",
        "click_id",
        "click_ts",
        "click_value",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "attributed"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
