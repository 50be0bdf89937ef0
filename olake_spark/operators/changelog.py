"""Snapshot changelog scan — row-level changes between two snapshots.

The reference's CDC path *produces* change records for a downstream
writer (op field + ``_cdc_deleted_at`` tombstones,
/root/reference/drivers/postgres/internal/cdc.go:123-131,
/root/reference/types/data_types.go:26-31). This operator is the
read-side inverse over our copy-on-write snapshots — the Iceberg
changelog-scan / Delta CDF shape: given two snapshot ids, recover the
net row-level INSERT / UPDATE / DELETE set between them.

Physical plan, designed for 100 TB:
1. *manifest diff* (metadata only, driver-side): files present in the
   newer snapshot but not the older one were added; the reverse were
   removed. Files common to both carry byte-identical rows and are never
   scanned — after a small merge, the scan cost is O(churned files), not
   O(table).
2. *one full-outer join* of the removed-file rows vs the added-file rows
   on the record key (``_olake_id``), hashing every column JVM-side
   (``xxhash64``) to classify:
   key only on the new side -> insert; on both sides with different row
   hashes -> update (the new row is emitted); only on the old side ->
   delete (the old row is emitted); both sides equal -> the row was
   merely moved by compaction/clustering — not a change.

The join shuffles on the uniformly-distributed key hash; nothing is
collected driver-side. Net semantics: churn between intermediate
snapshots collapses (insert-then-delete vanishes, like Iceberg's net
changelog). Requires unique keys per snapshot — the invariant MERGE
maintains. Raises ``KeyError`` when either snapshot has been expired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.schema import OLAKE_ID
from olake_spark.table.format import LAST_UPDATED_SEQ, ROW_ID, Table

CHANGE_TYPE = "_change_type"


def snapshot_changes(
    table: Table,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    key_col: str = OLAKE_ID,
) -> DataFrame:
    """Net row-level changes from ``from_snapshot_id`` (exclusive) to
    ``to_snapshot_id`` (inclusive; default: current snapshot). Output is
    the to-snapshot schema plus ``_change_type`` in
    {'insert','update','delete'}; deletes carry the deleted row's last
    contents.

    ``key_col=ROW_ID`` ("_row_id", lineage-enabled tables only) diffs by
    ROW IDENTITY instead of content key: an update that rewrites the
    business key (impossible to pair by ``_olake_id`` — it would report
    delete+insert) pairs exactly, and the output carries ``_row_id`` so
    downstream consumers can apply changes by identity. Requires the
    change window to be CoW (MERGE default mode): equality-delete MoR
    updates retire the old id and mint a new one, which identity-diff
    faithfully reports as delete+insert."""
    to_sid = (
        to_snapshot_id
        if to_snapshot_id is not None
        else table.current_snapshot_id
    )
    # raises KeyError on expired/unknown snapshots before any scan
    to_snap = table.snapshot(to_sid)
    table.snapshot(from_snapshot_id)
    # snapshot ids are monotonic (commit assigns parent+1): reject
    # swapped arguments, which would silently invert insert<->delete
    if to_sid is not None and from_snapshot_id > to_sid:
        raise ValueError(
            f"from_snapshot_id={from_snapshot_id} is newer than "
            f"to_snapshot_id={to_sid}: swapped arguments?"
        )
    schema = table.schema(to_snap.schema_id if to_snap else None)
    out_cols = [f.name for f in schema.fields]
    by_row_id = key_col == ROW_ID
    if by_row_id:
        if not table.row_lineage:
            raise ValueError(
                "key_col=ROW_ID needs a lineage-enabled table; create "
                "with row_lineage=True or call enable_row_lineage() first"
            )
    elif key_col not in out_cols:
        raise ValueError(f"key column {key_col!r} not in table schema")

    empty = table.spark.createDataFrame([], schema)
    if by_row_id:
        empty = empty.withColumn(ROW_ID, F.lit(None).cast("long"))
    empty = empty.withColumn(CHANGE_TYPE, F.lit("insert"))
    # file delta via the manifest SHARD diff — O(churn) manifest reads,
    # never two O(table) file-list materializations
    # (table/format.snapshot_file_delta)
    from olake_spark.table.format import snapshot_file_delta

    from_snap = table.snapshot(from_snapshot_id)
    to_only, from_only = snapshot_file_delta(table, from_snap, to_snap)
    added = [f for p, f in to_only.items() if p not in from_only]
    removed = [f for p, f in from_only.items() if p not in to_only]

    # merge-on-read deletes landed in the window change row visibility
    # WITHOUT touching data manifests: rows of CARRIED-OVER files (live
    # on both sides) killed by a new delete file belong on the old side
    # of the diff. New-since-from deletes always out-sequence carried
    # files, so applicability is key-range overlap (equality) or direct
    # file reference (positional). Removed-file rows are already on the
    # old side; added-file rows already scan with the TO snapshot's
    # deletes applied — only carried files need this extra component.
    from olake_spark.table.format import (
        CONTENT_DV,
        CONTENT_EQ_DELETES,
        CONTENT_POS_DELETES,
        new_delete_entries_since,
    )

    new_dels = new_delete_entries_since(table, from_snap, to_snap)
    killed = None
    if new_dels:
        eq_new = [d for d in new_dels if d.content == CONTENT_EQ_DELETES]
        pos_new = [d for d in new_dels if d.content == CONTENT_POS_DELETES]
        # a deletion-vector landed in the window counts as positional
        # deletes too: a repack that consumed pos files ADDED within the
        # same window leaves the DV as the only surviving record of
        # those row kills (the consumed pos files appear on neither
        # shard-diff side), so its positions must join the kill set
        dv_new = [d for d in new_dels if d.content == CONTENT_DV]
        pos_refs = set()
        if pos_new or dv_new:
            pos_refs = {
                r.file_path
                for r in table.spark.read.schema("file_path string")
                .parquet(*[table.abs_path(d.path) for d in pos_new + dv_new])
                .distinct()
                .collect()
            }
        affected = []
        for f in table.files(from_snapshot_id):
            if f.path in from_only:
                continue  # removed files are already the old side
            if f.path in pos_refs:
                affected.append(f)
                continue
            for d in eq_new:
                st = d.stats.get("doc_id")
                if not st or st.get("min") is None or f.overlaps(
                    "doc_id", st["min"], st["max"]
                ):
                    affected.append(f)
                    break
        if affected:
            vis = table.scan(
                snapshot_id=from_snapshot_id,
                files=affected,
                with_position=True,
                with_lineage=by_row_id,
            )
            if by_row_id:
                vis = vis.drop(LAST_UPDATED_SEQ)
            parts = []
            if eq_new:
                keys = table.spark.read.schema("_olake_id string").parquet(
                    *[table.abs_path(d.path) for d in eq_new]
                )
                if sum(d.file_size_bytes for d in eq_new) <= 64 << 20:
                    keys = F.broadcast(keys)
                parts.append(vis.join(keys, OLAKE_ID, "semi"))
            if pos_new or dv_new:
                pd_df = None
                if pos_new:
                    pd_df = table.spark.read.schema(
                        "file_path string, pos long"
                    ).parquet(*[table.abs_path(d.path) for d in pos_new])
                if dv_new:
                    from olake_spark.operators.deletes import dv_positions_df

                    dv_pos = dv_positions_df(table, dv_new)
                    pd_df = (
                        pd_df.unionByName(dv_pos) if pd_df is not None else dv_pos
                    )
                pd_df = pd_df.withColumnsRenamed(
                    {"file_path": "_file", "pos": "_pos"}
                )
                if sum(d.file_size_bytes for d in pos_new + dv_new) <= 64 << 20:
                    pd_df = F.broadcast(pd_df)
                parts.append(vis.join(pd_df, ["_file", "_pos"], "semi"))
            killed = parts[0]
            for p in parts[1:]:
                killed = killed.unionByName(p)
            # a row killed by BOTH an equality and a positional delete
            # must appear once on the old side
            killed = killed.dropDuplicates(["_file", "_pos"]).drop(
                "_file", "_pos"
            )

    if not added and not removed and killed is None:
        return empty

    row_hash = F.xxhash64(*[F.col(c) for c in out_cols])

    target_schema_sid = to_snap.schema_id if to_snap else None

    def _to_target(df, snapshot_id):
        """Align a frame scanned at ``snapshot_id`` (so carrying THAT
        snapshot's column names) to the target schema: field-id
        projection first — a span crossing a rename_column would
        otherwise null-fill the renamed column on the old side and
        report every carried row as a spurious update."""
        from olake_spark.functions.reformat import coerce_to_schema
        from olake_spark.table.format import project_by_field_id

        extras = [ROW_ID] if by_row_id else None
        snap = table.snapshot(snapshot_id)
        if snap is not None and target_schema_sid is not None:
            m = table.evolution_projection(snap.schema_id, target_schema_sid)
            if m is not None:
                df = project_by_field_id(df, m, extras)
        return coerce_to_schema(df, schema, extra_cols=extras)

    def _side(files, snapshot_id, tag):
        if not files:
            return None
        df = table.scan(
            snapshot_id=snapshot_id, files=files, with_lineage=by_row_id
        )
        if by_row_id:
            df = df.drop(LAST_UPDATED_SEQ)
        df = _to_target(df, snapshot_id)
        return df.select(
            F.col(key_col).alias("_k"),
            row_hash.alias("_h"),
            F.struct(*out_cols).alias("_row"),
            F.lit(tag).alias("_s"),
        )

    old = _side(removed, from_snapshot_id, 0)
    if killed is not None:
        k_proj = _to_target(killed, from_snapshot_id).select(
            F.col(key_col).alias("_k"),
            row_hash.alias("_h"),
            F.struct(*out_cols).alias("_row"),
            F.lit(0).alias("_s"),
        )
        old = k_proj if old is None else old.unionByName(k_proj)
    new = _side(added, to_sid, 1)
    if old is None:
        diff = new.withColumn(CHANGE_TYPE, F.lit("insert"))
        row = F.col("_row")
    elif new is None:
        diff = old.withColumn(CHANGE_TYPE, F.lit("delete"))
        row = F.col("_row")
    else:
        # the two-sided diff as ONE union + hash aggregation instead of
        # a full-outer sort-merge join: same shuffled bytes, one
        # exchange instead of two and no sort of either side. Keys are
        # unique per side (the MERGE invariant this operator already
        # requires), so first(... ignorenulls) is deterministic — at
        # most one old and one new row exist per key.
        u = old.unionByName(new)
        first_of = lambda s, c: F.first(  # noqa: E731
            F.when(F.col("_s") == s, F.col(c)), ignorenulls=True
        )
        j = u.groupBy("_k").agg(
            first_of(0, "_h").alias("_h_old"),
            first_of(1, "_h").alias("_h_new"),
            first_of(0, "_row").alias("_row_old"),
            first_of(1, "_row").alias("_row_new"),
        )
        diff = j.withColumn(
            CHANGE_TYPE,
            F.when(F.col("_h_old").isNull(), F.lit("insert"))
            .when(F.col("_h_new").isNull(), F.lit("delete"))
            .when(F.col("_h_old") != F.col("_h_new"), F.lit("update"))
            .otherwise(F.lit(None)),  # moved by compaction, not a change
        ).filter(F.col(CHANGE_TYPE).isNotNull())
        row = F.coalesce(F.col("_row_new"), F.col("_row_old"))
    tail = (
        [F.col("_k").alias(ROW_ID), F.col(CHANGE_TYPE)]
        if by_row_id
        else [F.col(CHANGE_TYPE)]
    )
    return diff.select(
        *[row.getField(c).alias(c) for c in out_cols], *tail
    )


def changes_since(
    table: Table,
    cursor_snapshot_id: int | None,
    key_col: str = OLAKE_ID,
) -> tuple[DataFrame, int | None]:
    """Resumable CDC-out: ``(changes, new_cursor)`` from the cursor
    snapshot (exclusive) to the table's current snapshot.

    A ``None`` cursor bootstraps: the full current snapshot streams out
    as inserts (the reference's snapshot-then-tail shape, read
    direction). Persist ``new_cursor`` only AFTER downstream processing
    succeeds — ack-after-commit, mirroring the CDC-in ledger — and pass
    it back next call; a crashed consumer simply replays the same diff
    (net changes are idempotent to re-apply). Expiry must keep the
    cursor snapshot alive (``expire_snapshots(keep_last=...)`` sized to
    the consumer lag), else this raises ``KeyError`` and the consumer
    re-bootstraps."""
    table.refresh()
    cur = table.current_snapshot_id
    if cur is None:
        schema = table.schema()
        return (
            table.spark.createDataFrame([], schema).withColumn(
                CHANGE_TYPE, F.lit("insert")
            ),
            None,
        )
    if cursor_snapshot_id is None:
        return (
            table.scan().withColumn(CHANGE_TYPE, F.lit("insert")),
            cur,
        )
    return snapshot_changes(table, cursor_snapshot_id, cur, key_col), cur
