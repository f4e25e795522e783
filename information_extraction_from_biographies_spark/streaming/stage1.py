"""Streaming stage 0-1: per-turn mention detection over a transcript
stream + watermarked per-conversation activity aggregation.

Design (SURVEY §2.10): the batch pipeline's conv-grouped extraction needs
whole conversations, so the streaming surface exposes the operators that
are per-turn stateless (mention scan via the broadcast automaton — J1) or
watermark-windowed (turn counts / mention counts per conv per window).
Late data beyond the watermark is dropped by Spark's state eviction; the
batch pipeline re-derives exact results from the table of record.

Works against any streaming source with the input_hint schema
(``readStream.parquet`` on a landing directory stands in for the Iceberg
streaming read; Kafka etc. drop in unchanged).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from ..functions.matcher import SurfaceIndexHandle

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_MENTION_SCHEMA = "conv_id string, turn_idx int, person string, surface string"


def read_transcript_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Streaming scan of a transcript landing directory (parquet files
    appended by an upstream writer)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def streaming_mentions(stream: DataFrame, index: SurfaceIndexHandle) -> DataFrame:
    """Per-turn mention rows (conv_id, turn_idx, person, surface) —
    stateless, so it runs identically under micro-batch or availableNow.
    Same automaton distribution as batch: broadcast rows, build-once per
    worker (matcher.cached_index)."""
    getter = index.worker_getter()

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = getter()
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                if not isinstance(text, str):
                    continue
                for person, surface, _k in idx.persons_in(text):
                    rows.append((conv_id, int(turn_idx), person, surface))
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx", "person", "surface"])

    return stream.select("conv_id", "turn_idx", "text").mapInPandas(
        _scan, schema=_MENTION_SCHEMA
    )


def windowed_conv_activity(
    stream: DataFrame, watermark: str = "10 minutes", window: str = "1 hour"
) -> DataFrame:
    """Watermarked per-conversation turn counts per event-time window —
    the late-data-tolerant aggregation shape for stream monitoring."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"), F.max("turn_idx").alias("max_turn_idx"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conv_id",
            "n_turns",
            "max_turn_idx",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, table_name: str, output_mode: str = "append"
) -> None:
    """Drain everything currently in the source into an in-memory sink
    (test/driver harness path; production writes to the Iceberg table).

    Use output_mode='complete' for watermarked aggregations when the
    bounded drain must surface windows the watermark has not yet closed
    (append would hold them in state)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
