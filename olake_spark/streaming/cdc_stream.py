"""Micro-batch CDC apply — Structured Streaming -> MERGE INTO.

Re-expresses the reference's CDC loop (§3.3 of SURVEY.md:
capture cursor -> backfill -> stream -> per-batch write -> ack LSN only
after a clean flush, /root/reference/drivers/postgres/internal/cdc.go:33-120)
with Spark semantics:

- the change feed is a ``readStream`` of JSON lines;
- each micro-batch is deduped last-wins and applied via the
  copy-on-write ``merge_into`` in ``foreachBatch`` (exactly-once per
  key against at-least-once delivery, keyed on ``_olake_id``);
- the global cursor (max LSN) is written to the job ledger ONLY AFTER
  the table snapshot commit succeeds — the reference's
  ack-after-commit ordering. A crashed batch replays from the
  checkpoint; replay is harmless because the MERGE is idempotent.
- bounded runs use ``availableNow`` (the reference's idle-timeout
  bounded sync, /root/reference/pkg/waljs/waljs.go:126-129).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame

from olake_spark.operators.merge import merge_into
from olake_spark.sources.cdc import decode_changes
from olake_spark.table.format import Table
from olake_spark.plans.ledger import _atomic_write


class CdcApplier:
    """foreachBatch sink applying decoded CDC batches to the table."""

    def __init__(self, table: Table, cursor_path: str | None = None):
        self.table = table
        self.cursor_path = cursor_path or os.path.join(
            table.root, "jobs", "cdc-cursor.json"
        )

    def current_cursor(self) -> int | None:
        if not os.path.exists(self.cursor_path):
            return None
        with open(self.cursor_path) as f:
            return json.load(f).get("lsn")

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        changes = batch_df
        if "lsn" not in changes.columns:
            changes = decode_changes(changes)
        rows = changes.cache()
        try:
            max_lsn = rows.agg({"lsn": "max"}).first()[0]
            if max_lsn is None:
                return
            # keep lsn through dedup (last-wins per key by LSN); merge's
            # output projection drops the extra column afterwards
            res = merge_into(self.table, rows, dedup_order_col="lsn")
            # cursor advanced ONLY after the snapshot commit (or no-op)
            _atomic_write(
                self.cursor_path,
                {
                    "lsn": int(max_lsn),
                    "batch_id": batch_id,
                    "snapshot_id": res.snapshot_id,
                    "ts_ms": int(time.time() * 1000),
                },
            )
        finally:
            rows.unpersist()


def run_cdc_stream(
    table: Table,
    feed_dir: str,
    checkpoint_dir: str,
    bounded: bool = True,
) -> int | None:
    """Consume a directory of JSON-line change files as a stream and
    apply every micro-batch. Returns the final cursor LSN."""
    spark = table.spark
    applier = CdcApplier(table)
    raw = (
        spark.readStream.format("text")
        .schema("value string")
        .load(feed_dir)
    )
    changes = decode_changes(raw)
    writer = (
        changes.writeStream.foreachBatch(applier.apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if bounded:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.trigger(processingTime="5 seconds").start()
        q.awaitTermination()
    return applier.current_cursor()
