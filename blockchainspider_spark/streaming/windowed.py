"""Structured Streaming stages: event-time windows + watermarked aggs.

The reference consumes streams as tail-follow polls (S7); at cluster
scale the same contracts run as Structured Streaming queries. This
module gives the engine's streaming shapes:

* ``stream_block_counts`` — file-source readStream over a block/event
  directory → watermarked tumbling-window aggregation → sink. With
  ``Trigger.AvailableNow`` it drains existing data and stops, which is
  also how the tests drive it hermetically.
* watermark handles late data: rows older than the watermark horizon
  drop out of state (bounded state at 10^10 scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, src_dir: str, schema) -> DataFrame:  # str DDL or StructType
    return spark.readStream.schema(schema).parquet(src_dir)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a
    late-data watermark (bounded streaming state)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "sum_value",
        )
    )


def run_available_now(result: DataFrame, out_dir: str, ckpt_dir: str) -> None:
    """Drain all currently-available input and stop (hermetic batch-like
    execution of the streaming plan, offset-tracked via checkpoint)."""
    q = (
        result.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup for continuous ingestion (the training-
    data pipeline's streaming twin of operators/dedup.exact_duplicates):
    emit each dedup key's FIRST arrival, drop every later duplicate
    whose event time lands within ``watermark`` of the state entry.
    ``dropDuplicatesWithinWatermark`` keeps per-key state only for the
    watermark horizon, so state is bounded at 10^10-row scale by the
    horizon's key cardinality, not the stream's. The dedup state lives
    in the checkpoint: a killed-and-resumed query continues dropping
    duplicates of keys it emitted before the restart (pinned in
    tests/test_streaming_windowed.py).

    Callers that want a deterministic output contract should project
    away non-key payload columns first — WHICH duplicate survives is
    arrival-order dependent; the key set itself is exact.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
