"""Micro-batch CDC-out — tail the table's snapshot changelog.

The outbound mirror of ``cdc_stream``: where that module applies an
external change feed TO the table (ack-after-commit on the LSN cursor,
/root/reference/drivers/postgres/internal/cdc.go:33-120), this one lets
a downstream consumer tail changes FROM the table. Each poll diffs the
consumer's last acked snapshot against the current one
(``operators/changelog.changes_since`` — manifest diff, O(churn) scan)
and hands the net insert/update/delete batch to a callback; the cursor
file advances ONLY after the callback returns (ack-after-process), so a
crashed consumer replays the same diff — harmless, net diffs are
idempotent to re-apply.

Metadata-only polls (compaction/clustering snapshots) advance the
cursor silently without invoking the callback.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame

from olake_spark.operators.changelog import changes_since
from olake_spark.plans.ledger import _atomic_write
from olake_spark.table.format import Table


class ChangelogTailer:
    """Cursor-persisted consumer of a table's snapshot changelog."""

    def __init__(self, table: Table, cursor_path: str | None = None):
        self.table = table
        self.cursor_path = cursor_path or os.path.join(
            table.root, "jobs", "changelog-cursor.json"
        )

    def current_cursor(self) -> int | None:
        if not os.path.exists(self.cursor_path):
            return None
        with open(self.cursor_path) as f:
            return json.load(f).get("snapshot_id")

    def _ack(self, snapshot_id: int) -> None:
        _atomic_write(
            self.cursor_path,
            {"snapshot_id": snapshot_id, "ts_ms": int(time.time() * 1000)},
        )

    def _rows_changed_since(self, cursor: int) -> bool:
        """Metadata-only pre-check: could any snapshot after the cursor
        carry row-level changes? Pure rewrites commit as 'replace' /
        'expire' with zero added rows beyond what they removed — their
        polls must not pay the changelog's full-outer join just to learn
        the diff is empty. Only trustworthy while the cursor snapshot
        itself is retained (expiry keeps a SUFFIX of the snapshot log,
        so cursor present => every newer snapshot's operation is
        visible); an expired cursor conservatively reports True and the
        diff path raises into the re-bootstrap."""
        snaps = self.table.snapshots()
        if not any(s.snapshot_id == cursor for s in snaps):
            return True
        return any(
            s.snapshot_id > cursor
            and s.operation not in ("replace", "expire")
            for s in snaps
        )

    def poll_once(
        self, process: Callable[[DataFrame, int], None]
    ) -> bool:
        """One poll: deliver the diff since the acked cursor, ack after
        the callback succeeds. Returns True iff the cursor advanced.

        An expired cursor snapshot (expiry outran the consumer despite
        ``protect_snapshot_ids``) re-bootstraps: the full current table
        streams out as inserts — net changes are idempotent to
        re-apply, so the consumer converges."""
        cursor = self.current_cursor()
        try:
            self.table.refresh()
            if (
                cursor is not None
                and self.table.current_snapshot_id is not None
                and not self._rows_changed_since(cursor)
            ):
                new_cursor = self.table.current_snapshot_id
                if new_cursor == cursor:
                    return False
                self._ack(new_cursor)
                return True
            diff, new_cursor = changes_since(self.table, cursor)
        except KeyError:
            diff, new_cursor = changes_since(self.table, None)
        if new_cursor is None or new_cursor == cursor:
            return False
        # one evaluation serves both the emptiness check and the
        # consumer callback
        diff = diff.persist()
        try:
            if not diff.isEmpty():
                process(diff, new_cursor)
            self._ack(new_cursor)
        finally:
            diff.unpersist()
        return True

    def run(
        self,
        process: Callable[[DataFrame, int], None],
        bounded: bool = True,
        poll_interval_s: float = 1.0,
        max_polls: int | None = None,
    ) -> int | None:
        """Drain mode (``bounded=True``): poll until no snapshot is
        newer than the cursor, then return — the availableNow analog.
        Unbounded: poll forever (until ``max_polls``)."""
        polls = 0
        while max_polls is None or polls < max_polls:
            advanced = self.poll_once(process)
            polls += 1
            if bounded and not advanced:
                break
            if not advanced:
                time.sleep(poll_interval_s)
        return self.current_cursor()
