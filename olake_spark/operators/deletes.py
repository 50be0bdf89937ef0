"""Row-level DELETE + merge-on-read delete-file maintenance.

The reference applies CDC deletes by handing ``_cdc_deleted_at``-flagged
rows to the destination (/root/reference/drivers/postgres/internal/cdc.go:123-131)
— it has no table format to maintain. This module supplies the Iceberg
v2 half of that contract over the engine's own table layer:

- :func:`delete_where` — DELETE FROM t WHERE p, as a merge-on-read
  commit: positional delete files ((file_path, pos) of each matched row,
  found with one predicate scan that reads only manifest-pruned files)
  or equality delete files (the matched keys). No data file is rewritten.
- :func:`materialize_deletes` — fold every live delete file back into
  the data files it applies to (rewrite affected files with deletes
  applied, drop all delete files) — the maintenance op that bounds
  scan-time anti-join work; run it on the compaction cadence.
- :func:`remove_dangling_deletes` — metadata-only drop of delete files
  that can no longer apply to any live data file (equality deletes whose
  sequence number no live data file undercuts in their key range;
  positional deletes whose referenced files are gone). Rewrites
  (compaction/clustering/CoW merge) naturally strand delete files
  because their outputs carry a higher sequence number.
- :func:`write_deletion_vectors` — convert accumulated positional
  delete rows into ONE packed position bitmap per covered data file
  (the Iceberg v3 deletion-vector shape): 64 deleted positions per
  bigint word, applied at scan time as an O(files) join + bit test
  instead of an O(deleted-rows) anti-join. Consumes existing DVs too,
  so repeated runs keep the invariant of at most one live DV row per
  data file.

Scale shape: ``delete_where`` reads only stats-surviving files and
writes O(matched rows) delete bytes; ``materialize_deletes`` rewrites
only files a delete can reach (sequence + key-range pruning); dangling
detection is pure manifest metadata except one tiny distinct-paths read
over positional delete files.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.compaction import DEFAULT_TARGET_FILE_BYTES
from olake_spark.schema import OLAKE_ID
from olake_spark.table.format import (
    CONTENT_DATA,
    CONTENT_DV,
    CONTENT_EQ_DELETES,
    CONTENT_POS_DELETES,
    CommitConflict,
    DataFile,
    Table,
    new_delete_entries_since,
)


@dataclass
class DeleteResult:
    snapshot_id: int | None
    deleted_rows: int = 0
    delete_files: int = 0
    details: dict = field(default_factory=dict)


@dataclass
class MaterializeResult:
    snapshot_id: int | None
    rewritten_files: int = 0
    removed_delete_files: int = 0
    output_files: int = 0


def delete_where(
    table: Table,
    predicate: Column | str,
    mode: str = "pos",
) -> DeleteResult:
    """DELETE FROM table WHERE predicate, merge-on-read.

    ``mode='pos'`` records (file_path, pos) coordinates — exact, works
    for any predicate, and scans only manifest-pruned files; the commit
    validates that every referenced data file is still live (a
    concurrent rewrite would strand the positions and resurrect the
    rows — not retryable, rerun against the new snapshot).

    ``mode='eq'`` records the matched equality keys instead — the right
    shape when the predicate is key-addressable; needs NO commit-time
    validation of its own (a rewrite committing after us conflict-checks
    against our delete file via commit_rewrite's delete-delta check; one
    committing before us just means our keys apply to its outputs).
    """
    from olake_spark.plans.retry import retry_on_backoff

    if mode not in ("pos", "eq"):
        raise ValueError(f"unknown delete_where mode {mode!r}")
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    table.refresh()
    snap = table.snapshot()
    if snap is None:
        return DeleteResult(snapshot_id=None)

    if mode == "eq":
        keys = (
            table.scan(snapshot_id=snap.snapshot_id)
            .filter(pred)
            .select(OLAKE_ID, "doc_id")
            .repartitionByRange(1, "doc_id")
            .sortWithinPartitions("doc_id")
        )
        files = table.write_delete_files(keys, CONTENT_EQ_DELETES)
        n_rows = sum(f.record_count for f in files)
        if n_rows == 0:
            return DeleteResult(snapshot_id=None)

        def attempt_eq() -> int:
            table.refresh()
            return table.commit(
                "delete",
                added_deletes=files,
                summary_extra={"kind": "delete-eq", "deleted-keys": n_rows},
            )

        sid = retry_on_backoff(
            attempt_eq, attempts=4, base_sleep_s=0.2, retry_on=(CommitConflict,)
        )
        return DeleteResult(
            snapshot_id=sid, deleted_rows=n_rows, delete_files=len(files)
        )

    hits = (
        table.scan(snapshot_id=snap.snapshot_id, with_position=True)
        .filter(pred)
        .select(F.col("_file").alias("file_path"), F.col("_pos").alias("pos"))
        .repartitionByRange(1, "file_path", "pos")
        .sortWithinPartitions("file_path", "pos")
    )
    files = table.write_delete_files(hits, CONTENT_POS_DELETES)
    n_rows = sum(f.record_count for f in files)
    if n_rows == 0:
        return DeleteResult(snapshot_id=None)
    referenced = {
        r.file_path
        for r in table.spark.read.schema("file_path string")
        .parquet(*[table.abs_path(f.path) for f in files])
        .distinct()
        .collect()
    }

    def attempt_pos() -> int:
        table.refresh()
        if table.current_snapshot_id != snap.snapshot_id:
            live = {f.path for f in table.files()}
            gone = referenced - live
            if gone:
                raise RuntimeError(
                    "data files referenced by positional deletes were "
                    f"rewritten concurrently; rerun delete_where ({sorted(gone)[:3]}...)"
                )
        return table.commit(
            "delete",
            added_deletes=files,
            summary_extra={"kind": "delete-pos", "deleted-rows": n_rows},
        )

    sid = retry_on_backoff(
        attempt_pos, attempts=4, base_sleep_s=0.2, retry_on=(CommitConflict,)
    )
    return DeleteResult(
        snapshot_id=sid,
        deleted_rows=n_rows,
        delete_files=len(files),
        details={"referenced_files": len(referenced)},
    )


def _pos_referenced_paths(table: Table, pos_dels: list[DataFile]) -> set[str]:
    if not pos_dels:
        return set()
    return {
        r.file_path
        for r in table.spark.read.schema("file_path string")
        .parquet(*[table.abs_path(d.path) for d in pos_dels])
        .distinct()
        .collect()
    }


def _affected_data_files(
    table: Table, snap_id: int
) -> tuple[list[DataFile], list[DataFile]]:
    """(affected data files, live delete files) for one snapshot —
    manifest metadata plus one distinct-paths read of positional delete
    files. A data file is affected iff some equality delete with a
    HIGHER sequence number overlaps its doc_id range, or a positional
    delete references it."""
    dels = table.delete_files(snap_id)
    if not dels:
        return [], []
    eq = [d for d in dels if d.content == CONTENT_EQ_DELETES]
    # deletion-vector files carry the same file_path column, so the
    # one distinct-paths read covers both positional kinds
    pos = [d for d in dels if d.content in (CONTENT_POS_DELETES, CONTENT_DV)]
    pos_refs = _pos_referenced_paths(table, pos)
    affected = []
    for f in table.files(snap_id):
        if f.path in pos_refs:
            affected.append(f)
            continue
        for d in eq:
            if d.sequence_number <= f.sequence_number:
                continue
            st = d.stats.get("doc_id")
            if not st or st.get("min") is None or f.overlaps(
                "doc_id", st["min"], st["max"]
            ):
                affected.append(f)
                break
    return affected, dels


def materialize_deletes(
    table: Table,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> MaterializeResult:
    """Rewrite every data file a live delete file can apply to, with
    deletes applied, and drop ALL delete files — returns the table to a
    pure copy-on-write state. Affected-file selection is sequence- and
    key-range-pruned, so steady-state cost is O(files the CDC tail
    actually touched), not O(table).

    Commit validation mirrors compaction: inputs must still be live, and
    delete files landed since planning force a recompute (our outputs
    would out-sequence them)."""
    from olake_spark.plans.retry import retry_on_backoff

    table.refresh()
    snap = table.snapshot()
    if snap is None:
        return MaterializeResult(snapshot_id=None)
    affected, dels = _affected_data_files(table, snap.snapshot_id)
    if not dels:
        return MaterializeResult(snapshot_id=None)
    del_paths = {d.path for d in dels}

    outputs: list[DataFile] = []
    if affected:
        # lineage tables materialize resolved row ids through the
        # rewrite — surviving rows keep their identity across the
        # delete fold-back (positions change, synthesis would re-number)
        src = table.scan(
            snapshot_id=snap.snapshot_id, files=affected,
            with_lineage=table.row_lineage,
        )
        bytes_est = sum(f.file_size_bytes for f in affected) or 1
        n_bins = max(1, math.ceil(bytes_est / target_file_bytes))
        out_df = src.repartitionByRange(
            n_bins, F.col("source"), F.col("doc_id")
        ).sortWithinPartitions("source", "doc_id")
        outputs = table.write_data_files(out_df)

    affected_paths = {f.path for f in affected}

    def attempt() -> int:
        table.refresh()
        if table.current_snapshot_id != snap.snapshot_id:
            cur = table.snapshot()
            live = {f.path for f in table.files()}
            if affected_paths - live:
                raise RuntimeError(
                    "materialize inputs were rewritten concurrently; rerun"
                )
            if new_delete_entries_since(table, snap, cur):
                raise RuntimeError(
                    "delete files landed during materialize; rerun"
                )
        return table.commit(
            "replace",
            added=outputs,
            removed_paths=affected_paths,
            removed_delete_paths=del_paths,
            summary_extra={
                "kind": "materialize-deletes",
                "materialized-delete-files": len(del_paths),
            },
        )

    sid = retry_on_backoff(
        attempt, attempts=4, base_sleep_s=0.2, retry_on=(CommitConflict,)
    )
    return MaterializeResult(
        snapshot_id=sid,
        rewritten_files=len(affected),
        removed_delete_files=len(del_paths),
        output_files=len(outputs),
    )


def remove_dangling_deletes(table: Table) -> int:
    """Drop delete files that can no longer apply to any live data file
    — pure metadata except one distinct-paths read over positional
    delete files. Rewrites strand delete files naturally (their outputs
    carry a higher sequence number), so run this after compaction /
    clustering sweeps. Returns the number of delete files removed."""
    from olake_spark.plans.retry import retry_on_backoff

    table.refresh()
    snap = table.snapshot()
    if snap is None:
        return 0
    dels = table.delete_files(snap.snapshot_id)
    if not dels:
        return 0
    # DV files expose the same file_path column — the batched
    # liveness pass treats both positional kinds identically
    pos = [d for d in dels if d.content in (CONTENT_POS_DELETES, CONTENT_DV)]
    eq = [d for d in dels if d.content == CONTENT_EQ_DELETES]
    # the eq loop needs driver-side entries (seq + stats bisection); skip
    # the O(table) parse entirely for the common all-positional case —
    # the pos branch gets its live set from the executor-parsed entries
    # frame instead
    data = table.files(snap.snapshot_id) if eq else []
    dangling: set[str] = set()
    if pos:
        # ONE distributed pass over every positional-delete file (this
        # used to be a per-delete-file job loop — O(delete files)
        # driver-scheduled jobs, a scale-killer at 10^4 accumulated
        # files): tag each referenced path with its source delete file
        # via the _metadata column, semi-join the live file set, and
        # any delete file with zero surviving references is dangling.
        # Keys are the (uuid-dir, part-file) tail so the comparison is
        # scheme/root-agnostic across FileIO backends.
        tail2 = {"/".join(d.path.split("/")[-2:]): d.path for d in pos}
        refs = (
            table.spark.read.schema("file_path string")
            .parquet(*[table.abs_path(d.path) for d in pos])
            .select(
                "file_path",
                F.concat_ws(
                    "/",
                    F.element_at(F.split(F.col("_metadata.file_path"), "/"), -2),
                    F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
                ).alias("_delete_tail"),
            )
        )
        from olake_spark.table.manifest_df import manifest_entries_df

        live_df = (
            manifest_entries_df(table, snap.snapshot_id)
            .where(F.col("content") == CONTENT_DATA)
            .select(F.col("path").alias("file_path"))
        )
        applying = {
            r._delete_tail
            for r in refs.join(live_df, "file_path", "left_semi")
            .select("_delete_tail")
            .distinct()
            .collect()
        }
        dangling.update(
            rel for tail, rel in tail2.items() if tail not in applying
        )
    for d in eq:
        st = d.stats.get("doc_id")
        applies = False
        for f in data:
            if f.sequence_number >= d.sequence_number:
                continue
            if not st or st.get("min") is None or f.overlaps(
                "doc_id", st["min"], st["max"]
            ):
                applies = True
                break
        if not applies:
            dangling.add(d.path)
    if not dangling:
        return 0

    def attempt() -> int:
        table.refresh()
        return table.commit(
            "delete",
            removed_delete_paths=dangling,
            summary_extra={"kind": "remove-dangling-deletes"},
        )

    retry_on_backoff(
        attempt, attempts=4, base_sleep_s=0.2, retry_on=(CommitConflict,)
    )
    return len(dangling)


@dataclass
class RewriteDeletesResult:
    snapshot_id: int | None
    input_delete_files: int = 0
    output_delete_files: int = 0
    dropped_dangling_refs: int = 0


def _dv_word_cols(pos: Column) -> tuple[Column, Column]:
    """(word index, bit value) of one deleted position under the packed
    64-bit layout. The SAME expressions the scan-time bit test uses
    (table/format.py scan, dv_dels branch) — the two sides must never
    disagree on where a position lands."""
    widx = F.shiftright(pos, 6).cast("int")
    # call_function: the PySpark shiftleft wrapper wants a literal bit
    # count; the SQL function takes any expression
    bit = F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))
    return widx, bit


def dv_words_df(table: Table, dv_dels: list[DataFile]) -> DataFrame:
    """Unpack deletion-vector files to sparse (file_path, widx, word)
    rows — the exchange format both the DV builder (re-packing existing
    DVs) and changelog (position expansion) start from."""
    return (
        table.spark.read.schema("file_path string, dv array<bigint>, n_pos long")
        .parquet(*[table.abs_path(d.path) for d in dv_dels])
        .select("file_path", F.posexplode("dv").alias("_i", "word"))
        .where(F.col("word") != 0)
        .select("file_path", F.col("_i").cast("int").alias("widx"), "word")
    )


def dv_positions_df(table: Table, dv_dels: list[DataFile]) -> DataFrame:
    """Expand deletion-vector files back to (file_path, pos) rows —
    O(deleted positions), the exact row set the DVs were packed from.
    Used by changelog (which needs per-position visibility) and the
    Arrow DataSource reader's oracle tests."""
    words = dv_words_df(table, dv_dels)
    bits = F.filter(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: (
            F.col("word").bitwiseAND(
                F.call_function("shiftleft", F.lit(1).cast("long"), b)
            )
            != 0
        ),
    )
    return words.select(
        "file_path",
        F.explode(bits).alias("_b"),
        (F.col("widx").cast("long") * 64).alias("_base"),
    ).select("file_path", (F.col("_base") + F.col("_b")).alias("pos"))


def write_deletion_vectors(
    table: Table,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> RewriteDeletesResult:
    """Repack every live positional delete into ONE bitmap row per
    covered data file (the Iceberg v3 deletion-vector shape; Iceberg
    spec #11122 / Delta Lake deletion vectors are the public models):
    64 positions per bigint word, so 10^9 accumulated deleted positions
    become ~16 MB of words instead of 10^9 anti-join rows, and every
    scan applies them as an O(files) broadcast join + constant-time bit
    test per row.

    Consumes BOTH plain positional-delete files and existing DV files,
    so repeated runs keep the invariant the scan join depends on: at
    most one live DV row per data file (two rows for one file would
    duplicate its rows through the left join). References to data files
    no longer live are dropped on the way (same as
    rewrite_position_deletes). Equality deletes are untouched — they
    carry no positions to pack.

    The whole build is one Spark plan with no Python in the row path:
    positions fold to sparse (file, word-index, word) rows via bit_or
    — duplicate positions merge for free, no distinct shuffle — and the
    dense bitmap is assembled from the sorted sparse pairs with an
    indexed transform + flatten (each gap filled once: O(bitmap length)
    per file, never O(words^2) map probing).

    Commit validation mirrors rewrite_position_deletes: consumed delete
    files must still be live; new deletes landed since planning simply
    stay live (scan applies plain positional deletes independently of
    DVs, so a position recorded in both is just deleted)."""
    from olake_spark.plans.retry import retry_on_backoff
    from olake_spark.table.manifest_df import manifest_entries_df

    table.refresh()
    snap = table.snapshot()
    if snap is None:
        return RewriteDeletesResult(snapshot_id=None)
    dels = table.delete_files(snap.snapshot_id)
    pos = [d for d in dels if d.content == CONTENT_POS_DELETES]
    dvs = [d for d in dels if d.content == CONTENT_DV]
    if not pos:
        # nothing to repack; existing DVs already hold the invariant
        return RewriteDeletesResult(snapshot_id=None, input_delete_files=0)

    widx, bit = _dv_word_cols(F.col("pos"))
    words = (
        table.spark.read.schema("file_path string, pos long")
        .parquet(*[table.abs_path(d.path) for d in pos])
        .select("file_path", widx.alias("widx"), bit.alias("word"))
    )
    if dvs:
        words = words.unionByName(dv_words_df(table, dvs))
    live_df = (
        manifest_entries_df(table, snap.snapshot_id)
        .where(F.col("content") == CONTENT_DATA)
        .select(F.col("path").alias("file_path"))
    )
    packed = (
        words.join(live_df, "file_path", "left_semi")
        .groupBy("file_path", "widx")
        .agg(F.bit_or("word").alias("word"))
    )
    pairs = F.array_sort(F.collect_list(F.struct("widx", "word")))
    per_file = packed.groupBy("file_path").agg(
        pairs.alias("pairs"), F.sum(F.bit_count("word")).alias("n_pos")
    )
    # dense bitmap from sorted sparse pairs: entry i contributes
    # (zero-fill since the previous word) + its own word; element_at is
    # O(1) on arrays, so the whole assembly is O(bitmap length)
    prev_end = lambda i: F.when(i == 0, F.lit(0)).otherwise(  # noqa: E731
        F.element_at(F.col("pairs"), i)["widx"] + 1
    )
    dv_col = F.flatten(
        F.transform(
            "pairs",
            lambda e, i: F.concat(
                F.array_repeat(F.lit(0).cast("long"), e["widx"] - prev_end(i)),
                F.array(e["word"]),
            ),
        )
    )
    bytes_est = sum(d.file_size_bytes for d in pos + dvs) or 1
    n_bins = max(1, math.ceil(bytes_est / target_file_bytes))
    out_df = (
        per_file.select("file_path", dv_col.alias("dv"), "n_pos")
        .repartitionByRange(n_bins, F.col("file_path"))
        .sortWithinPartitions("file_path")
    )
    outputs = table.write_delete_files(out_df, CONTENT_DV)

    consumed = {d.path for d in pos} | {d.path for d in dvs}

    def attempt() -> int:
        table.refresh()
        live_del = {d.path for d in table.delete_files()}
        if consumed - live_del:
            raise RuntimeError(
                "input delete files were removed concurrently; rerun"
            )
        return table.commit(
            "replace",
            added_deletes=outputs,
            removed_delete_paths=consumed,
            summary_extra={
                "kind": "write-deletion-vectors",
                "input-delete-files": len(consumed),
                "output-delete-files": len(outputs),
            },
        )

    sid = retry_on_backoff(
        attempt, attempts=4, base_sleep_s=0.2, retry_on=(CommitConflict,)
    )
    return RewriteDeletesResult(
        snapshot_id=sid,
        input_delete_files=len(consumed),
        output_delete_files=len(outputs),
    )


def rewrite_position_deletes(
    table: Table,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_input_files: int = 2,
) -> RewriteDeletesResult:
    """Compact accumulated positional-delete files WITHOUT giving up
    merge-on-read (Iceberg's rewrite_position_delete_files): union every
    live (file_path, pos) row in one distributed pass, de-duplicate
    rows deleted by more than one delete file, drop references to data
    files no longer live (a rewrite stranded them), and write the
    survivors back as few size-bounded delete files in ONE commit.

    materialize_deletes folds deletes into data files (back to CoW);
    this op keeps the cheap MoR apply path while bounding what every
    scan must anti-join: after heavy CDC, a table can carry thousands
    of tiny delete files, and scan cost grows with their count, not
    their row volume. Runs on the compaction cadence.

    Commit validation mirrors materialize_deletes: the consumed delete
    files must still be live; delete files landed since planning are
    left untouched (they simply stay live)."""
    from olake_spark.plans.retry import retry_on_backoff
    from olake_spark.table.manifest_df import manifest_entries_df

    table.refresh()
    snap = table.snapshot()
    if snap is None:
        return RewriteDeletesResult(snapshot_id=None)
    dels = table.delete_files(snap.snapshot_id)
    pos = [d for d in dels if d.content == CONTENT_POS_DELETES]
    if len(pos) < min_input_files:
        return RewriteDeletesResult(snapshot_id=None, input_delete_files=len(pos))

    live_df = (
        manifest_entries_df(table, snap.snapshot_id)
        .where(F.col("content") == CONTENT_DATA)
        .select(F.col("path").alias("file_path"))
    )
    # persist the distinct row set: the count (for the dropped-refs
    # metric) and the rewrite itself would otherwise each re-run the
    # full read + distinct shuffle — the op's dominant cost, doubled
    rows = (
        table.spark.read.schema("file_path string, pos long")
        .parquet(*[table.abs_path(d.path) for d in pos])
        .distinct()
        .persist()
    )
    try:
        n_in = rows.count()
        survivors = rows.join(live_df, "file_path", "left_semi")
        bytes_est = sum(d.file_size_bytes for d in pos) or 1
        n_bins = max(1, math.ceil(bytes_est / target_file_bytes))
        out_df = survivors.repartitionByRange(
            n_bins, F.col("file_path"), F.col("pos")
        ).sortWithinPartitions("file_path", "pos")
        outputs = table.write_delete_files(out_df, CONTENT_POS_DELETES)
    finally:
        rows.unpersist()
    n_out_rows = sum(o.record_count for o in outputs)

    pos_paths = {d.path for d in pos}

    def attempt() -> int:
        table.refresh()
        live_del = {d.path for d in table.delete_files()}
        if pos_paths - live_del:
            raise RuntimeError(
                "input delete files were removed concurrently; rerun"
            )
        return table.commit(
            "replace",
            added_deletes=outputs,
            removed_delete_paths=pos_paths,
            summary_extra={
                "kind": "rewrite-position-deletes",
                "input-delete-files": len(pos),
                "output-delete-files": len(outputs),
            },
        )

    sid = retry_on_backoff(
        attempt, attempts=4, base_sleep_s=0.2, retry_on=(CommitConflict,)
    )
    return RewriteDeletesResult(
        snapshot_id=sid,
        input_delete_files=len(pos),
        output_delete_files=len(outputs),
        dropped_dangling_refs=n_in - n_out_rows,
    )
