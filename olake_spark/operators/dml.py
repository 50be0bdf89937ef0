"""Predicate-addressed row-level UPDATE (copy-on-write).

``UPDATE table SET col = expr, ... WHERE predicate`` — the third leg of
the row-level DML triad next to :func:`operators.deletes.delete_where`
and keyed MERGE INTO (:func:`operators.merge.merge_into`). The
reference ships row changes only as CDC batches keyed by ``_olake_id``
(/root/reference/types/data_types.go:26-31); a lakehouse user also
needs ad-hoc predicate updates ("lower-case every source tag",
"truncate tokens of one partition") without synthesizing a CDC batch.

Physical plan, designed for 100 TB:
1. *discovery*: ONE narrow scan over the (optionally range-scoped)
   snapshot — predicate pushed to parquet, only ``_file`` projected —
   aggregated per file; the driver collects O(touched files), and files
   with zero matches are never rewritten.
2. *rewrite*: scan ONLY the touched files, flag matched rows on their
   OLD values, apply every assignment under the flag, and range-exchange
   into ~target-size output files (same sizing discipline as
   materialize_deletes).
3. *commit*: replace touched files atomically, with the rewrite-vs-
   delete conflict validation maintenance rewrites use (inputs must
   still be live; row-level deletes landed mid-update force a rerun —
   our outputs would out-sequence them).

Lineage (Iceberg v3, when the table tracks it): updated rows KEEP their
``_row_id`` and get a NULL ``_last_updated_sequence_number`` — which
resolves to the update commit's sequence number at read; untouched rows
in rewritten files carry both values through unchanged. Updating
``doc_id`` recomputes ``_olake_id`` (the PK hash) automatically, and
the identity changelog (``snapshot_changes(key_col=ROW_ID)``) then
pairs even that key rewrite as a single UPDATE.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from olake_spark.operators.compaction import DEFAULT_TARGET_FILE_BYTES
from olake_spark.schema import OLAKE_ID, SYSTEM_COLUMNS, olake_id_expr
from olake_spark.table.format import (
    CONTENT_EQ_DELETES,
    LAST_UPDATED_SEQ,
    ROW_ID,
    CommitConflict,
    Table,
    new_delete_entries_since,
)

_FLAG = "_sg_upd"


def _apply_assignments(src, flag, exprs, types):
    """ONE projection applying every assignment, so each expression sees
    the row's OLD values (standard UPDATE semantics — {a: b, b: a}
    swaps; sequential withColumn would feed a's new value into b).
    ``flag``: boolean Column gating per row, or None for every row.
    Casts only on a genuine type mismatch: Spark refuses identity array
    casts differing only in containsNull, and the probe select is
    analysis-only (no job)."""
    assigned = {}
    for c, e in exprs.items():
        probe = src.select(e.alias("_p")).schema[0].dataType
        val = e if probe.simpleString() == types[c].simpleString() else (
            e.cast(types[c])
        )
        if flag is not None:
            val = F.when(flag, val).otherwise(F.col(c))
        assigned[c] = val.alias(c)
    return src.select(*[assigned.get(c, F.col(c)) for c in src.columns])


@dataclass
class UpdateResult:
    snapshot_id: int | None
    updated_rows: int = 0
    rewritten_files: int = 0
    output_files: int = 0
    details: dict = field(default_factory=dict)


def update_where(
    table: Table,
    predicate: Column | str,
    assignments: dict[str, Column | str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    scope_ranges: dict[str, tuple] | None = None,
    sources: list[str] | None = None,
    mode: str = "cow",
) -> UpdateResult:
    """Rewrite every row matching ``predicate`` with ``assignments``
    applied (each value a Column or SQL expression string, evaluated
    against the row's OLD values — standard UPDATE semantics, so
    ``{"a": "b", "b": "a"}`` swaps).

    ``scope_ranges`` / ``sources`` bound discovery via manifest stats
    (same contract as ``compact(where=, sources=)``): at fleet scale an
    update targeting one partition prunes to it without scanning the
    table. They are planning hints only — the predicate is still
    applied exactly.

    ``mode='mor'`` applies merge-on-read instead: ONE pass writes the
    updated rows as new data files and their OLD equality keys as a
    delete file — O(matched rows) written instead of O(touched files)
    rewritten, the right shape for a sparse update over a wide key
    range; ``materialize_deletes`` folds the debt back on the
    maintenance cadence. Same-commit sequence numbering makes the new
    rows survive their own delete batch (the MoR-merge rule), and a
    rewrite landing concurrently is safe in either order (earlier: its
    outputs still under-sequence our deletes; later: its commit
    validation sees our delete file and recomputes). Row identity is
    NOT preserved in this mode — equality deletes retire the old id and
    the rewrite mints a fresh one, as with MoR MERGE.
    """
    if mode not in ("cow", "mor"):
        raise ValueError(f"unknown update_where mode {mode!r}")
    if not assignments:
        raise ValueError("update_where needs at least one assignment")
    bad = [c for c in assignments if c in SYSTEM_COLUMNS]
    if bad:
        raise ValueError(
            f"cannot assign system columns {bad}; {OLAKE_ID} is derived "
            "from doc_id and recomputed automatically"
        )
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    exprs = {
        c: (F.expr(v) if isinstance(v, str) else v)
        for c, v in assignments.items()
    }
    table.refresh()
    snap = table.snapshot()
    if snap is None:
        return UpdateResult(snapshot_id=None)
    schema = table.schema(snap.schema_id)
    types = {f.name: f.dataType for f in schema.fields}
    unknown = [c for c in exprs if c not in types]
    if unknown:
        raise KeyError(f"assigned columns not in table schema: {unknown}")

    candidates = table.prune_files(
        table.files(snap.snapshot_id), sources=sources, ranges=scope_ranges
    )
    if not candidates:
        return UpdateResult(snapshot_id=None)

    if mode == "mor":
        return _update_mor(
            table, snap, pred, exprs, types, candidates, target_file_bytes
        )

    # --- 1. exact touched-file discovery: one narrow scan, predicate
    # pushed down, O(touched) rows to the driver
    per_file = (
        table.scan(
            snapshot_id=snap.snapshot_id, files=candidates, with_position=True
        )
        .filter(pred)
        .groupBy("_file")
        .agg(F.count("*").alias("_n"))
        .collect()
    )
    touched_paths = {r._file for r in per_file}
    n_updated = sum(r._n for r in per_file)
    if n_updated == 0:
        return UpdateResult(snapshot_id=None)
    touched = [f for f in candidates if f.path in touched_paths]

    # --- 2. rewrite touched files with assignments under the OLD-value
    # match flag (lineage rides along when the table tracks it)
    lineage = table.row_lineage
    src = table.scan(
        snapshot_id=snap.snapshot_id, files=touched, with_lineage=lineage
    ).withColumn(_FLAG, pred)
    src = _apply_assignments(src, F.col(_FLAG), exprs, types)
    if "doc_id" in exprs:
        # second projection: the PK hash derives from the NEW doc_id
        src = src.withColumn(
            OLAKE_ID,
            F.when(F.col(_FLAG), olake_id_expr("doc_id")).otherwise(
                F.col(OLAKE_ID)
            ),
        )
    if lineage:
        src = src.withColumn(
            LAST_UPDATED_SEQ,
            F.when(F.col(_FLAG), F.lit(None).cast("long")).otherwise(
                F.col(LAST_UPDATED_SEQ)
            ),
        )
    src = src.drop(_FLAG)
    bytes_est = sum(f.file_size_bytes for f in touched) or 1
    n_bins = max(1, math.ceil(bytes_est / target_file_bytes))
    out_df = src.repartitionByRange(
        n_bins, F.col("source"), F.col("doc_id")
    ).sortWithinPartitions("source", "doc_id")
    outputs = table.write_data_files(out_df)

    # --- 3. commit with maintenance-grade validation
    from olake_spark.plans.retry import retry_on_backoff

    def attempt() -> int:
        table.refresh()
        if table.current_snapshot_id != snap.snapshot_id:
            live = {f.path for f in table.files()}
            if touched_paths - live:
                raise RuntimeError(
                    "update inputs were rewritten concurrently; rerun"
                )
            if new_delete_entries_since(table, snap, table.snapshot()):
                raise RuntimeError(
                    "row-level deletes landed during update; rerun"
                )
        return table.commit(
            "overwrite",
            added=outputs,
            removed_paths=set(touched_paths),
            summary_extra={"kind": "update-where", "updated-rows": n_updated},
        )

    sid = retry_on_backoff(
        attempt, attempts=4, base_sleep_s=0.2, retry_on=(CommitConflict,)
    )
    return UpdateResult(
        snapshot_id=sid,
        updated_rows=n_updated,
        rewritten_files=len(touched),
        output_files=len(outputs),
    )


def _update_mor(
    table: Table,
    snap,
    pred: Column,
    exprs: dict[str, Column],
    types: dict,
    candidates,
    target_file_bytes: int,
) -> UpdateResult:
    """Merge-on-read apply: new data files for the updated rows + one
    equality-delete file of their OLD keys, committed together. The
    shared sequence number makes the new rows survive the delete batch
    (an equality delete applies only to STRICTLY lower-sequence files)."""
    from olake_spark.plans.retry import retry_on_backoff

    matched = table.scan(snapshot_id=snap.snapshot_id, files=candidates).filter(
        pred
    )
    # old keys FIRST (narrow pass): with a doc_id assignment the delete
    # must target the pre-image key
    keys = (
        matched.select(OLAKE_ID, "doc_id")
        .repartitionByRange(1, "doc_id")
        .sortWithinPartitions("doc_id")
    )
    del_files = table.write_delete_files(keys, CONTENT_EQ_DELETES)
    n_updated = sum(f.record_count for f in del_files)
    if n_updated == 0:
        return UpdateResult(snapshot_id=None)

    new_rows = _apply_assignments(matched, None, exprs, types)
    if "doc_id" in exprs:
        new_rows = new_rows.withColumn(OLAKE_ID, olake_id_expr("doc_id"))
    tbl_rows = sum(f.record_count for f in candidates) or 1
    tbl_bytes = sum(f.file_size_bytes for f in candidates)
    n_bins = max(
        1,
        math.ceil(n_updated * (tbl_bytes / tbl_rows) / target_file_bytes),
    )
    outputs = table.write_data_files(
        new_rows.repartitionByRange(
            n_bins, F.col("source"), F.col("doc_id")
        ).sortWithinPartitions("source", "doc_id")
    )

    def attempt() -> int:
        # no liveness validation needed (delete_where mode='eq'
        # reasoning): an earlier rewrite's outputs still under-sequence
        # our deletes; a later one validates against our delete file
        table.refresh()
        return table.commit(
            "overwrite",
            added=outputs,
            added_deletes=del_files,
            summary_extra={
                "kind": "update-where-mor", "updated-rows": n_updated,
            },
        )

    sid = retry_on_backoff(
        attempt, attempts=4, base_sleep_s=0.2, retry_on=(CommitConflict,)
    )
    return UpdateResult(
        snapshot_id=sid,
        updated_rows=n_updated,
        rewritten_files=0,
        output_files=len(outputs),
        details={"delete_files": len(del_files)},
    )
