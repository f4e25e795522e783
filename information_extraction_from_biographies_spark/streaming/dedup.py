"""Streaming deduplication — the incremental counterpart of
operators/dedup.exact_dedup for a document/transcript stream.

Built on Structured Streaming's state store: ``dropDuplicatesWithinWatermark``
on the content hash keeps first-seen rows and evicts state past the
watermark, so memory is bounded by (arrival-rate × watermark horizon)
instead of corpus size — the posture a 10^12-row ingest needs. Exact
global dedup over all history remains the batch operator's job against
the table of record; the stream guard stops duplicates *within the
late-data horizon* from ever landing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812


def streaming_exact_dedup(
    stream: DataFrame,
    watermark: str = "10 minutes",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """First-seen rows per content hash within the watermark horizon.

    Output keeps the input schema plus ``content_hash``; duplicates of a
    hash already seen inside the horizon are dropped; state for hashes
    older than the watermark is evicted (bounded state)."""
    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
