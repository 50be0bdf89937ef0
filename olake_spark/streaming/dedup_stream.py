"""Streaming dedup with TTL-bounded state — at-least-once in,
effectively-once out.

The reference's CDC delivery is at-least-once and leans on the
``olake_id`` idempotency key to make duplicates harmless downstream
(/root/reference/types/data_types.go:26-31); its dedup happens at the
destination. For a streaming pipeline the engine-side fix is dropping
re-deliveries BEFORE they hit sinks, with state that cannot grow
forever: ``dropDuplicatesWithinWatermark`` keeps a key's dedup state
only until the event-time watermark passes its last occurrence plus the
delay, so state is O(keys seen within one watermark window), not
O(all keys ever) — the only shape that survives 10^12 events.

A re-delivery arriving AFTER its key's state expired passes through
again (documented TTL trade-off, pinned by test); exact forever-dedup
belongs to the idempotent batch MERGE path (operators/merge.py), which
keys on _olake_id at apply time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("_olake_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """First delivery of each key within the watermark TTL survives;
    later re-deliveries of the same key are dropped while its state is
    live. Append-mode safe; works with any downstream sink."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
