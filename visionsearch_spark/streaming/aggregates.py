"""Watermarked streaming window aggregation — the built-in-only streaming
shape (readStream -> withWatermark -> window agg -> writeStream/append).

Batch twin: the `tumbling_window_events` contract query. In append mode a
window row is emitted exactly once, when the watermark passes its end —
late events inside the watermark still land in their window; later ones
are dropped (documented, bounded-state contract). State is O(open
windows x event types), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """events: STREAMING DataFrame with (ts timestamp, event_type string,
    value double). Returns finalized (window_start epoch-sec, event_type,
    n, sum_value) rows — schema-identical to the batch
    tumbling_window_events query, which is the oracle in tests."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
