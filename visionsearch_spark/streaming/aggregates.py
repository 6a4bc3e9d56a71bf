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


def source_token_counts_stream(docs: DataFrame, text_col: str = "text",
                               source_col: str = "source") -> DataFrame:
    """Continuous training-mixture accounting: running (source, n_docs,
    n_tokens) totals over an unbounded document stream — the streaming
    twin of operators/textstats.source_mixture's aggregation stage (the
    share division happens at read time over the handful of source rows).

    Streaming groupBy with NO watermark/window: totals are running
    forever-aggregates, so the sink mode is update/complete (a total is
    never "final"). State is O(#sources) — bounded by construction, the
    same argument as the batch op's global window. Tokenization is the
    frozen JVM analyzer (tokens_col), so counts are bit-identical to the
    batch twin, which is the oracle in tests."""
    from visionsearch_spark.analyzer import tokens_col

    return (
        docs.select(source_col,
                    F.size(tokens_col(text_col)).alias("_n"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("n_tokens"),
        )
    )
