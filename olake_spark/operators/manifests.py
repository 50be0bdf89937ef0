"""rewrite_manifests — compact the manifest LOG, not the data.

Every commit writes fresh shards for its added files and carries the
rest over, so a table fed by many small appends (the CDC steady state —
the reference's per-batch sink at
/root/reference/writers/parquet/parquet.go:139-166 produces exactly
this shape) accumulates one tiny shard per commit. Planning cost is
O(shards), so a 10^5-commit table pays 10^5 shard reads per scan plan
even when the file count is modest. Iceberg's answer is the
rewriteManifests action; this is the same op over the engine's JSON
shards:

- small shard count (< SCAN_DISTRIBUTED_MIN_SHARDS, i.e. a bounded
  number of entries): the driver re-sorts the entries and packs them
  into full-size shards — memory O(threshold x MANIFEST_MAX_ENTRIES),
  bounded by the auto-selection rule, not by table size (forcing
  ``distributed=False`` on a huge table is on the caller);
- past ``SCAN_DISTRIBUTED_MIN_SHARDS``: executors re-shard — the
  entries frame is range-partitioned into ceil(n/target) groups (sorted
  by partition value then path, so one shard covers one partition's
  files and manifest-level pruning actually skips shards) and each task
  writes its own shard; the driver handles only shard names.

The swap commits through :meth:`Table.replace_manifests` — a
metadata-only snapshot with the identical file set; a concurrent data
commit wins the version claim and this op deletes its freshly written
shards and reports a conflict instead of clobbering.
"""

from __future__ import annotations

import json
import math
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

import pandas as pd

from olake_spark.table.format import (
    MANIFEST_MAX_ENTRIES,
    SCAN_DISTRIBUTED_MIN_SHARDS,
    CommitConflict,
    Table,
)


@dataclass
class RewriteManifestsResult:
    snapshot_id: int | None
    old_shards: int = 0
    new_shards: int = 0
    entries: int = 0
    skipped: bool = False


def rewrite_manifests(
    table: Table,
    target_entries: int = MANIFEST_MAX_ENTRIES,
    distributed: bool | None = None,
) -> RewriteManifestsResult:
    snap = table.snapshot()
    if snap is None or not snap.manifests:
        return RewriteManifestsResult(None, skipped=True)
    n_old = len(snap.manifests)
    if distributed is None:
        distributed = n_old >= SCAN_DISTRIBUTED_MIN_SHARDS

    use_dist = distributed and table.spark is not None
    if use_dist:
        from olake_spark.table.manifest_df import entries_from_manifests

        ent = entries_from_manifests(table, snap.manifests)
        n_entries = ent.count()
    else:
        entries = []
        for rel in snap.manifests:
            entries.extend(table._read_manifest(rel))
        n_entries = len(entries)

    ideal = max(1, math.ceil(n_entries / target_entries))
    if n_old <= ideal:
        return RewriteManifestsResult(
            snap.snapshot_id, n_old, n_old, n_entries, skipped=True
        )
    if use_dist:
        new_rels = _reshard_distributed(table, ent, n_entries, target_entries)
    else:
        new_rels = _reshard_driver(table, entries, target_entries)
    try:
        sid = table.replace_manifests(
            new_rels, summary_extra={"manifest-entries": n_entries}
        )
    except CommitConflict:
        for rel in new_rels:
            table.io.delete(table.abs_path(rel))
        raise
    return RewriteManifestsResult(sid, n_old, len(new_rels), n_entries)


def _reshard_driver(table: Table, entries: list, target_entries: int) -> list[str]:
    """Pack entries into full new shards, ordered by (partition, path)
    so a shard spans one partition's range and stats-based shard pruning
    stays effective."""
    entries = sorted(entries, key=lambda e: (e.partition or "", e.path))
    new_rels: list[str] = []
    for i in range(0, len(entries), target_entries):
        new_rels.append(table._write_manifest(entries[i : i + target_entries]))
    return new_rels


def _reshard_distributed(
    table: Table, ent, n: int, target_entries: int
) -> list[str]:
    """Executor-side reshard: each task writes its own shard (the same
    executor data plane Spark's parquet writes use; driver-side metadata
    still goes through table.io)."""
    from pyspark.sql import functions as F

    root = table.root
    n_shards = max(1, math.ceil(n / target_entries))
    ranged = ent.repartitionByRange(
        n_shards, F.coalesce("partition", F.lit("")), "path"
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                rows.append(
                    {
                        "path": r.path,
                        "record_count": int(r.record_count),
                        "file_size_bytes": int(r.file_size_bytes),
                        "partition": r.partition,
                        "stats": json.loads(r.stats),
                        "schema_id": int(r.schema_id),
                        "spec_col": r.spec_col,
                        "content": r.content or "data",
                        "sequence_number": int(r.sequence_number),
                    }
                )
        if not rows:
            yield pd.DataFrame({"rel": pd.Series([], dtype=str),
                                "count": pd.Series([], dtype="int64")})
            return
        rel = f"manifests/manifest-{uuid.uuid4().hex[:16]}.json"
        tmp = os.path.join(root, rel + f".tmp{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(rows, f)
        os.replace(tmp, os.path.join(root, rel))
        yield pd.DataFrame({"rel": [rel], "count": [len(rows)]})

    out = ranged.mapInPandas(_write, "rel string, count long").collect()
    new_rels = [r.rel for r in out]
    total = sum(r["count"] for r in out)
    if total != n:
        # a shard went missing mid-write — delete and bail rather than
        # commit a manifest list that drops files
        for rel in new_rels:
            table.io.delete(table.abs_path(rel))
        raise RuntimeError(
            f"manifest reshard wrote {total} entries, expected {n}"
        )
    return new_rels
