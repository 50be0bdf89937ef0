"""Chunked, ledger-resumable backfill — the reference's core sync loop.

The reference plans key-range chunks BEFORE reading, persists the chunk
set to its state file, deletes each chunk on completion, and resumes a
killed sync from the remaining set
(/root/reference/drivers/postgres/internal/backfill.go:19-100,
/root/reference/types/state.go:94-149). This is that loop over a
source adapter + the engine's lineage ledger:

1. plan chunks from source stats (plans/split.py via the adapter);
2. register every chunk as pending in the job ledger (before any read);
3. per pending chunk: range-scan (predicate pushed to the store),
   inject system columns, write immutable data files, mark done;
4. ONE atomic table commit after all chunks — a killed run restarts
   idempotently, done chunks are never re-read or re-written.

Snapshot isolation per chunk mirrors the reference's REPEATABLE READ
scan: each chunk reads a consistent parquet file set (files are
immutable); for JDBC the per-chunk query runs in its own transaction,
same as the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from olake_spark.plans.ledger import Ledger
from olake_spark.plans.split import Chunk
from olake_spark.schema import with_system_columns
from olake_spark.table.format import Table


def _jsonable(v):
    return v if isinstance(v, (int, float, str, type(None))) else str(v)


@dataclass
class BackfillResult:
    job_id: str
    snapshot_id: int | None
    chunks: int = 0
    rows: int = 0
    skipped: bool = False
    details: dict = field(default_factory=dict)


def chunked_backfill(
    table: Table,
    source,
    stream: str,
    split_col: str,
    num_chunks: int = 8,
    batch_size: int | None = None,
    job_id: str | None = None,
    mode: str = "append",
    transform=None,
) -> BackfillResult:
    """Backfill ``stream`` from ``source`` (a sources/adapter.py adapter)
    into ``table``, chunked on ``split_col``, resumable via the ledger.
    ``transform`` (optional) runs on each chunk after system-column
    injection — e.g. partition_regex routing."""
    import hashlib

    # the destination snapshot id is part of the job identity: a killed
    # run resumes (same snapshot -> same ledger), while a NEW sync after
    # a committed one starts fresh (the commit advanced the snapshot) —
    # otherwise a re-run would find the committed ledger and no-op
    # forever instead of refreshing the data
    dest_snap = table.refresh().current_snapshot_id
    jid = job_id or "backfill-" + hashlib.md5(
        f"{stream}:{split_col}:{num_chunks}:{batch_size}:{mode}:{dest_snap}".encode()
    ).hexdigest()[:10]
    ledger = Ledger.for_job(table.root, jid)
    if ledger.committed_snapshot_id is not None:
        t = ledger.totals()
        return BackfillResult(
            job_id=jid,
            snapshot_id=ledger.committed_snapshot_id,
            chunks=t["groups"],
            rows=t["rows"],
            skipped=True,
        )

    if ledger.state["entries"]:
        # RESUME: chunk bounds come from the ledger's persisted payloads,
        # never from a re-plan — the source may have grown since the
        # crash and shifted quantile boundaries, which would double-read
        # or skip ranges relative to the already-done chunks
        keys = sorted(ledger.state["entries"])
        chunks = [
            Chunk(
                ledger.entry(k)["payload"]["min"],
                ledger.entry(k)["payload"]["max"],
            )
            for k in keys
        ]
    else:
        chunks = source.plan_chunks(
            stream, split_col, num_chunks=num_chunks, batch_size=batch_size
        )
        if not chunks:
            return BackfillResult(job_id=jid, snapshot_id=None, skipped=True)
        for i, c in enumerate(chunks):
            ledger.plan(
                f"c-{i:05d}",
                [f"{split_col}:[{c.min},{c.max}{']' if i == len(chunks) - 1 else ')'}"],
                # json-native values stay typed for the resume path;
                # non-native bounds (timestamps/dates) persist as their
                # string form — Spark coerces string literals back in
                # the range filter
                payload={"min": _jsonable(c.min), "max": _jsonable(c.max)},
            )
    ledger.reset_missing_outputs(table.root)

    by_key = {f"c-{i:05d}": (i, c) for i, c in enumerate(chunks)}
    from olake_spark.cli import _ensure_doc_id

    for key in sorted(ledger.pending_keys()):
        i, c = by_key[key]
        df = source.read_chunk(stream, split_col, c, is_last=(i == len(chunks) - 1))
        out = with_system_columns(_ensure_doc_id(df))
        if transform is not None:
            out = transform(out)
        # same strict frame validation append/overwrite apply — a chunk
        # whose columns drifted from the table schema must be refused,
        # not silently written under the current schema_id
        outputs = table.write_data_files(table.align_to_schema(out))
        rows = sum(o.record_count for o in outputs)
        ledger.mark_done(
            key, [o.to_dict() for o in outputs], {"rows": rows, "files_out": len(outputs)}
        )

    added = [table_file for table_file in _outputs(ledger)]
    removed = (
        {f.path for f in table.refresh().files()} if mode == "overwrite" else set()
    )
    snap = table.commit(
        "overwrite" if mode == "overwrite" else "append",
        added=added,
        removed_paths=removed,
        summary_extra={"job-id": jid, "kind": "backfill", "stream": stream},
    )
    ledger.mark_committed(snap)
    t = ledger.totals()
    return BackfillResult(
        job_id=jid, snapshot_id=snap, chunks=t["groups"], rows=t["rows"]
    )


def _outputs(ledger: Ledger):
    from olake_spark.table.format import DataFile

    return [DataFile.from_dict(d) for d in ledger.all_outputs()]
