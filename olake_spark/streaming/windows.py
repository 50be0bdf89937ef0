"""Watermarked windowed aggregation — late-data handling for streams.

The reference has no event-time windowing (its CDC loop is arrival-
ordered); training-data ingestion needs it the moment events arrive out
of order: tumbling per-window counts that tolerate stragglers up to the
watermark and drop anything later (bounded state — without a watermark
Spark must keep every window open forever).

Pure Structured Streaming composition: withWatermark + window() groupBy;
'append' output emits each window exactly once, when the watermark
passes its end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts per group with late-data tolerance.

    Output: (window_start, window_end, *group_cols, n_events) — one row
    per closed window in append mode.
    """
    w = events.withWatermark(ts_col, watermark)
    agg = (
        w.groupBy(F.window(F.col(ts_col), window), *group_cols)
        .agg(F.count("*").alias("n_events"))
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_cols,
        "n_events",
    )
