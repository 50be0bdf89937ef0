"""``olake`` Python Data Source — ``spark.read.format("olake")``.

The table layer's native surface is :meth:`Table.scan` (JVM parquet
scan, manifest pruning, MoR delete anti-joins — the fast path). This
module exposes the SAME table through Spark's Python Data Source API
(pyspark.sql.datasource, Spark 4.x) so the engine composes with plain
``spark.read`` / ``spark.readStream`` / ``df.write`` pipelines without
importing the package on the driver-side query:

    spark.dataSource.register(OlakeDataSource)
    spark.read.format("olake").load(root)                      # batch
    spark.read.format("olake").option("snapshot_id", 3).load(root)
    spark.read.format("olake").option("metadata", "files").load(root)
    spark.readStream.format("olake").load(root)                # tail
    df.write.format("olake").mode("append").save(root)

Scale design mirrors ``Table.scan``'s two planning regimes:

- Few manifest shards (< ``SCAN_DISTRIBUTED_MIN_SHARDS``): the driver
  parses shards, prunes files against the pushed filters, and emits one
  :class:`InputPartition` per data file.
- Many shards: one partition PER SHARD — executors parse their shard
  and prune locally, so driver planning stays O(shards) no matter how
  many files the table has (the million-file discipline of
  table/manifest_df.py, without needing a SparkSession at plan time).

Filter pushdown (``pushFilters``) prunes at FILE granularity from
manifest min/max stats — the same predicates ``Table.scan`` prunes
with — and returns every filter back to Spark for exact row-level
re-evaluation, the contract for partial pushdown. Merge-on-read
equality/positional delete files of the pinned snapshot are applied
inside ``read()`` with Arrow compute (sequence-number rules identical
to ``Table.scan``).

The read path stays Arrow-vectorized end to end: ``read()`` yields
``pyarrow.RecordBatch``; the writer subclasses
:class:`DataSourceArrowWriter` and commits written files through the
table's optimistic-concurrency commit protocol (conflict-retried), so a
datasource write IS a real snapshot commit — visible to ``Table.scan``
and vice versa.

Reference provenance: the reference's readers/writers are socket
clients (/root/reference/drivers/mongodb/internal/mon.go:41-67); its
"register a source, then sync" UX (/root/reference/protocol/check.go)
is what ``spark.dataSource.register`` + ``format("olake")`` re-expresses
Spark-natively.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql import types as T

from olake_spark.schema import (
    CDC_DELETED_AT,
    OLAKE_ID,
    OLAKE_INSERT_TIME,
    STATS_COLUMNS,
)
from olake_spark.table.format import (
    CONTENT_DATA,
    CONTENT_DV,
    CONTENT_EQ_DELETES,
    CONTENT_POS_DELETES,
    SCAN_DISTRIBUTED_MIN_SHARDS,
    CommitConflict,
    DataFile,
    Snapshot,
    Table,
    snapshot_file_delta,
)

# operations whose net-added files are NEW rows (streamable); rewrite
# ops (compact/cluster/materialize-deletes) add files but no rows
STREAMABLE_OPS = ("append", "overwrite")

def _get_opt(options, key: str, default=None):
    # DataSource options arrive as a case-insensitive dict of strings
    v = options.get(key)
    if v is None:
        v = options.get(key.lower())
    return default if v is None else v


def _resolve_snapshot(table: Table, options) -> Snapshot | None:
    sid = _get_opt(options, "snapshot_id")
    ref = _get_opt(options, "ref")
    ts = _get_opt(options, "as_of_timestamp_ms")
    if sum(x is not None for x in (sid, ref, ts)) > 1:
        raise ValueError(
            "pass at most one of snapshot_id / ref / as_of_timestamp_ms"
        )
    if ref is not None:
        try:
            sid = table.metadata["refs"][ref]["snapshot_id"]
        except KeyError:
            raise KeyError(f"ref {ref!r} not found") from None
        return table.snapshot(int(sid))
    if ts is not None:
        return table.snapshot_as_of(int(ts))
    if sid is not None:
        return table.snapshot(int(sid))
    return table.snapshot()


@dataclass
class OlakePartition(InputPartition):
    """One read task: either an explicit file slice (small tables) or a
    manifest shard to parse-and-prune executor-side (large tables)."""

    files: list[dict] = field(default_factory=list)  # DataFile dicts
    shard: str | None = None  # manifest rel path
    metadata_kind: str | None = None


# ----------------------------------------------------------- batch read


class OlakeBatchReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        self.root = _get_opt(options, "path")
        if not self.root:
            raise ValueError("olake datasource needs a path: .load(<table root>)")
        self.root = os.path.abspath(self.root)
        self.schema = schema
        self.metadata_kind = _get_opt(options, "metadata")
        self.apply_deletes = str(
            _get_opt(options, "apply_deletes", "true")
        ).lower() != "false"
        self.with_lineage = str(
            _get_opt(options, "with_lineage", "false")
        ).lower() == "true"
        # auto: per-shard partitions past SCAN_DISTRIBUTED_MIN_SHARDS
        # (same threshold as Table.scan); "true"/"false" force a regime
        self.distributed_planning = str(
            _get_opt(options, "distributed_planning", "auto")
        ).lower()
        table = Table.load(None, self.root)
        snap = _resolve_snapshot(table, options)
        self.snapshot_id = snap.snapshot_id if snap else None
        self.manifests = list(snap.manifests) if snap else []
        self.delete_manifests = list(snap.delete_manifests) if snap else []
        self.schemas_json = dict(table.metadata["schemas"])
        self.target_schema_id = (
            snap.schema_id if snap else table.metadata["current_schema_id"]
        )
        self.rename_maps = _rename_maps(table, self.target_schema_id)
        self.stats_columns = list(
            table.metadata.get("stats_columns", STATS_COLUMNS)
        )
        # delete entries are bounded by the maintenance cadence
        # (materialize_deletes folds them back), never by table size
        self.delete_entries: list[dict] = []
        if self.apply_deletes and self.metadata_kind is None:
            for rel in self.delete_manifests:
                self.delete_entries.extend(
                    table.io.get_json(os.path.join(self.root, rel))
                )
        # filled by pushFilters: col -> [lo, hi] (closed interval)
        self.ranges: dict[str, list] = {}
        self.in_sets: dict[str, list] = {}

    # -- pushdown ------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            if col not in self.stats_columns:
                continue
            v = getattr(f, "value", None)
            if isinstance(f, EqualTo) and _scalar(v):
                self._narrow(col, v, v)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) and _scalar(v):
                # file stats are closed min/max bounds: > and >= prune
                # identically at file granularity (rows re-filtered by
                # Spark since every filter is returned as residual)
                self._narrow(col, v, None)
            elif isinstance(f, (LessThan, LessThanOrEqual)) and _scalar(v):
                self._narrow(col, None, v)
            elif isinstance(f, In) and v and all(_scalar(x) for x in v):
                self.in_sets.setdefault(col, []).append(list(v))
        # file-level pruning is partial by nature: Spark re-evaluates
        # every filter on the surviving rows
        return filters

    def _narrow(self, col: str, lo, hi) -> None:
        cur = self.ranges.setdefault(col, [None, None])
        if lo is not None and (cur[0] is None or lo > cur[0]):
            cur[0] = lo
        if hi is not None and (cur[1] is None or hi < cur[1]):
            cur[1] = hi

    # -- planning ------------------------------------------------------
    def _keep(self, f: DataFile) -> bool:
        """Min/max stats pruning (conservative: keep when stats absent).
        Identity-partition pruning needs no special case here — a
        partition-pure file has min == max == partition value in its
        stats, so the stats check subsumes it."""
        if f.content != CONTENT_DATA:
            return False
        for col, (lo, hi) in self.ranges.items():
            if not f.overlaps(
                col,
                lo if lo is not None else _NEG,
                hi if hi is not None else _POS,
            ):
                return False
        for col, sets in self.in_sets.items():
            for values in sets:
                if not any(f.may_contain(col, v) for v in values):
                    return False
        return True

    def partitions(self) -> list[OlakePartition]:
        if self.metadata_kind is not None:
            if self.metadata_kind in ("files", "delete_files"):
                rels = (
                    self.delete_manifests
                    if self.metadata_kind == "delete_files"
                    else self.manifests
                )
                return [
                    OlakePartition(shard=r, metadata_kind=self.metadata_kind)
                    for r in rels
                ] or [OlakePartition(metadata_kind=self.metadata_kind, shard="")]
            return [OlakePartition(metadata_kind=self.metadata_kind)]
        use_shards = (
            self.distributed_planning == "true"
            or (
                self.distributed_planning != "false"
                and len(self.manifests) >= SCAN_DISTRIBUTED_MIN_SHARDS
            )
        )
        if use_shards:
            # large table: plan O(shards); executors parse + prune
            return [OlakePartition(shard=rel) for rel in self.manifests]
        table = Table.load(None, self.root)
        out = []
        for rel in self.manifests:
            for e in table._read_manifest(rel):
                if self._keep(e):
                    out.append(OlakePartition(files=[e.to_dict()]))
        return out or [OlakePartition()]

    # -- execution -----------------------------------------------------
    def read(self, partition: OlakePartition):
        if partition.metadata_kind is not None:
            yield from _metadata_rows(self.root, partition, self.snapshot_id)
            return
        entries = [DataFile.from_dict(d) for d in partition.files]
        if partition.shard is not None:
            table = Table.load(None, self.root)
            entries = [
                e
                for e in table._read_manifest(partition.shard)
                if self._keep(e)
            ]
        if not entries:
            return
        yield from _read_data_files(
            self.root,
            entries,
            self.schema,
            self.schemas_json,
            self.target_schema_id,
            self.delete_entries,
            rename_maps=self.rename_maps,
            with_lineage=self.with_lineage,
        )


def _scalar(v) -> bool:
    return isinstance(v, (str, int, float)) and not isinstance(v, bool)


def _nullable(dt: T.DataType) -> T.DataType:
    """Spark's parquet scan surfaces every column nullable; match it so
    datasource frames union cleanly with Table.scan frames — and so
    schema-evolution null-fill never violates a declared constraint."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _nullable(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_nullable(dt.keyType), _nullable(dt.valueType), True)
    return dt


class _Unbounded:
    """Orders below/above everything — overlaps() sentinel for one-sided
    pushed ranges (works for str and numeric stats alike)."""

    def __init__(self, low: bool):
        self.low = low

    def __lt__(self, other):
        return self.low

    def __gt__(self, other):
        return not self.low

    def __le__(self, other):
        return self.low

    def __ge__(self, other):
        return not self.low


_NEG = _Unbounded(low=True)
_POS = _Unbounded(low=False)


def _rename_maps(table: Table, target_sid: int) -> dict[int, dict[str, str]]:
    """Field-id resolution maps for every schema version that needs one
    (schema DDL: rename / drop+re-add). ``sid -> {target_name:
    source_name}``; schemas where pure name matching is already correct
    are omitted, so the per-batch hot path stays untouched for tables
    with no DDL history."""
    out: dict[int, dict[str, str]] = {}
    for s in table.metadata["schemas"]:
        sid = int(s)
        m = table.evolution_projection(sid, target_sid)
        if m is not None:
            out[sid] = m
    return out


def _arrow_target(schema: T.StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _align_table(tbl, target, spark_schema: T.StructType):
    """Project an arrow table onto the target arrow schema: reorder by
    name, null-fill columns the file predates (schema evolution), cast
    types (nullable-or promotion)."""
    import pyarrow as pa

    cols = []
    for tf in target:
        if tf.name in tbl.column_names:
            arr = tbl.column(tf.name)
            if arr.type != tf.type:
                arr = arr.cast(tf.type)
            cols.append(arr)
        else:
            cols.append(pa.nulls(len(tbl), type=tf.type))
    return pa.Table.from_arrays(cols, schema=target)


def _read_data_files(
    root: str,
    entries: list[DataFile],
    spark_schema: T.StructType,
    schemas_json: dict,
    target_schema_id: int,
    delete_entries: list[dict],
    rename_maps: dict[int, dict[str, str]] | None = None,
    with_lineage: bool = False,
):
    """Arrow-side equivalent of Table.scan's per-file read: positional
    deletes drop row ordinals, equality deletes anti-join _olake_id for
    delete files with STRICTLY GREATER sequence number, then the batch
    is aligned to the pinned snapshot's schema.

    ``with_lineage``: resolve ``_row_id`` / ``_last_updated_sequence_
    number`` exactly like Table.scan — materialized columns where the
    rewrite wrote them, ``first_row_id + physical row position``
    synthesis otherwise (positions taken BEFORE the positional-delete
    mask, so deleted rows' ids stay retired, not reassigned)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from olake_spark.table.format import LAST_UPDATED_SEQ, ROW_ID

    target = _arrow_target(spark_schema)
    eq_dels = [
        d for d in delete_entries if d.get("content") == CONTENT_EQ_DELETES
    ]
    pos_dels = [
        d for d in delete_entries if d.get("content") == CONTENT_POS_DELETES
    ]
    dv_dels = [d for d in delete_entries if d.get("content") == CONTENT_DV]
    # task-local delete caches: loaded at most once per task
    eq_keys_cache: dict[str, list] = {}
    pos_map: dict[str, list] | None = None

    def _eq_keys(applicable: list[dict]):
        keys: set = set()
        for d in applicable:
            p = d["path"]
            if p not in eq_keys_cache:
                eq_keys_cache[p] = (
                    pq.read_table(os.path.join(root, p), columns=[OLAKE_ID])
                    .column(OLAKE_ID)
                    .to_pylist()
                )
            keys.update(eq_keys_cache[p])
        if not keys:
            return None
        return pa.array(sorted(keys), type=pa.string())

    def _positions_for(rel_path: str):
        nonlocal pos_map
        if pos_map is None:
            import numpy as np

            pos_map = {}
            for d in pos_dels:
                t = pq.read_table(
                    os.path.join(root, d["path"]),
                    columns=["file_path", "pos"],
                )
                for fp, pos in zip(
                    t.column("file_path").to_pylist(),
                    t.column("pos").to_pylist(),
                ):
                    pos_map.setdefault(fp, []).append(pos)
            for d in dv_dels:
                # unpack each bitmap row: positions are the set bits of
                # the word array viewed as one little-endian bitfield —
                # the same layout scan's shiftleft(1, pos % 64) bit test
                # and write_deletion_vectors' packer use
                t = pq.read_table(
                    os.path.join(root, d["path"]), columns=["file_path", "dv"]
                )
                for fp, words in zip(
                    t.column("file_path").to_pylist(),
                    t.column("dv").to_pylist(),
                ):
                    arr = np.asarray(words, dtype=np.int64)
                    bits = np.unpackbits(
                        arr.view(np.uint8), bitorder="little"
                    )
                    pos_map.setdefault(fp, []).extend(
                        np.flatnonzero(bits).tolist()
                    )
        return pos_map.get(rel_path)

    for e in entries:
        import numpy as np

        tbl = pq.read_table(os.path.join(root, e.path))
        pos = np.arange(len(tbl), dtype=np.int64)
        drop = _positions_for(e.path)
        if drop:
            mask = np.ones(len(tbl), dtype=bool)
            mask[np.asarray(drop, dtype=np.int64)] = False
            tbl = tbl.filter(pa.array(mask))
            pos = pos[mask]
        if with_lineage:
            if e.first_row_id is not None:
                synth_rid = pa.array(e.first_row_id + pos, type=pa.int64())
            else:
                synth_rid = pa.nulls(len(pos), pa.int64())
            synth_lus = pa.array(
                np.full(len(pos), e.sequence_number, dtype=np.int64)
            )
            if e.lineage_cols and ROW_ID in tbl.column_names:
                rid = pc.coalesce(
                    tbl.column(ROW_ID).cast(pa.int64()), synth_rid
                )
                lus = pc.coalesce(
                    tbl.column(LAST_UPDATED_SEQ).cast(pa.int64()), synth_lus
                )
            else:
                rid, lus = synth_rid, synth_lus
            for name in (ROW_ID, LAST_UPDATED_SEQ):
                if name in tbl.column_names:
                    tbl = tbl.drop_columns(name)
            tbl = tbl.append_column(ROW_ID, rid).append_column(
                LAST_UPDATED_SEQ, lus
            )
        applicable = [
            d
            for d in eq_dels
            if d.get("sequence_number", 0) > e.sequence_number
        ]
        if applicable and len(tbl):
            keys = _eq_keys(applicable)
            if keys is not None and len(keys):
                keep = pc.invert(pc.is_in(tbl.column(OLAKE_ID), value_set=keys))
                tbl = tbl.filter(pc.fill_null(keep, True))
        m = (rename_maps or {}).get(e.schema_id)
        if m is not None:
            # field-id resolution (schema DDL): project ONLY the mapped
            # source columns, renamed — a dropped+re-added name must not
            # leak old values through name matching in _align_table
            names = set(tbl.column_names)
            pairs = [(dst, src) for dst, src in m.items() if src in names]
            if with_lineage:
                # resolved lineage columns ride through the field-id
                # projection untouched
                pairs += [(ROW_ID, ROW_ID), (LAST_UPDATED_SEQ, LAST_UPDATED_SEQ)]
            tbl = tbl.select([src for _, src in pairs]).rename_columns(
                [dst for dst, _ in pairs]
            )
        tbl = _align_table(tbl, target, spark_schema)
        yield from tbl.to_batches(max_chunksize=1 << 16)


def _metadata_rows(root: str, partition: OlakePartition, snapshot_id):
    """Executor-side metadata-table rows; reuses the same builders as
    table/metadata_tables.py so both surfaces always agree."""
    from olake_spark.table import metadata_tables as mt

    table = Table.load(None, root)
    kind = partition.metadata_kind
    if kind == "snapshots":
        yield from mt.snapshot_rows(table)
    elif kind == "history":
        yield from mt.history_rows(table)
    elif kind == "schemas":
        yield from mt.schemas_rows(table)
    elif kind == "refs":
        yield from mt.refs_rows(table)
    elif kind == "manifests":
        yield from mt.manifests_rows(table, snapshot_id)
    elif kind in ("files", "delete_files"):
        if partition.shard:
            yield from mt.files_rows(table, [partition.shard])
    elif kind == "partitions":
        # driver planned a single partition; aggregate here (metadata
        # kind reads are inspection queries, not the data hot path)
        agg: dict[tuple, list] = {}
        snap = table.snapshot(snapshot_id)
        for rel in snap.manifests if snap else []:
            for r in mt.files_rows(table, [rel]):
                key = (r[4], r[5])  # partition, spec_col
                cur = agg.setdefault(key, [0, 0, 0])
                cur[0] += 1
                cur[1] += r[2]
                cur[2] += r[3]
        for (part, spec), (fc, rc, sz) in sorted(
            agg.items(), key=lambda kv: (str(kv[0][0]), str(kv[0][1]))
        ):
            yield (part, spec, fc, rc, sz)
    else:
        raise ValueError(f"unknown metadata kind {kind!r}")


# -------------------------------------------------------- streaming read


class OlakeStreamReader(DataSourceStreamReader):
    """Snapshot-tail streaming source: each microbatch reads the DATA
    files net-added by append-type snapshots since the last offset —
    the same contract as Spark's file stream source (new files are new
    rows), driven by the snapshot log instead of directory listing.
    Rewrite commits (compact/cluster/materialize_deletes) add files
    without adding rows and are skipped; row-level CDC between
    snapshots is the batch ``snapshot_changelog`` surface.

    Schema DDL mid-stream: the output schema is PINNED at query start
    (Spark streaming cannot widen it). Renames/drops resolve by field
    id — ``partitions()`` refreshes the maps driver-side when a batch
    carries a post-start schema id. A mid-stream ``update_column_type``
    streams under the pinned NARROWER type: values that fit cast
    losslessly, an overflowing value fails the microbatch loudly
    (pyarrow safe cast) — restart the query to adopt the widened
    schema. Silent truncation never happens."""

    def __init__(self, options, schema: T.StructType):
        self.root = os.path.abspath(_get_opt(options, "path") or "")
        if not self.root:
            raise ValueError("olake stream needs a path: .load(<table root>)")
        self.schema = schema
        self.start = str(_get_opt(options, "stream_start", "latest")).lower()
        table = Table.load(None, self.root)
        self.schemas_json = dict(table.metadata["schemas"])
        self.target_schema_id = table.metadata["current_schema_id"]
        self.rename_maps = _rename_maps(table, self.target_schema_id)

    def initialOffset(self) -> dict:
        if self.start == "earliest":
            return {"snapshot_id": 0}
        if self.start not in ("latest",):
            return {"snapshot_id": int(self.start)}
        table = Table.load(None, self.root)
        return {"snapshot_id": table.current_snapshot_id or 0}

    def latestOffset(self) -> dict:
        table = Table.load(None, self.root)
        return {"snapshot_id": table.current_snapshot_id or 0}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["snapshot_id"], end["snapshot_id"]
        if hi <= lo:
            return [OlakePartition()]
        table = Table.load(None, self.root)
        by_id = {s.snapshot_id: s for s in table.snapshots()}
        out: list[OlakePartition] = []
        sid = hi
        chain_ok = True
        hops = 0
        seen: list[Snapshot] = []
        while sid is not None and sid > lo:
            s = by_id.get(sid)
            if s is None or hops > len(by_id):
                chain_ok = False
                break
            seen.append(s)
            sid = s.parent_id
            hops += 1
        if chain_ok:
            for s in seen:
                if s.operation not in STREAMABLE_OPS:
                    continue
                parent = by_id.get(s.parent_id)
                # true adds = target-only minus base-only (a path can sit
                # on both sides when its shard was rewritten around some
                # other file's removal) — O(churned shards), never O(table)
                added, removed = snapshot_file_delta(table, parent, s)
                for p, e in sorted(added.items()):
                    if p not in removed and e.content == CONTENT_DATA:
                        out.append(OlakePartition(files=[e.to_dict()]))
        else:
            # expired intermediate snapshots (or a rollback rewrote the
            # line): fall back to the net file delta start -> end
            added, _ = snapshot_file_delta(
                table, by_id.get(lo), by_id.get(hi)
            )
            for p, e in sorted(added.items()):
                if e.content == CONTENT_DATA:
                    out.append(OlakePartition(files=[e.to_dict()]))
        # resolve post-start DDL schema ids HERE (driver, table already
        # loaded) so executors don't reload metadata once per file —
        # this reader object persists across batches and its updated
        # maps ship inside every task's pickle
        fresh = {
            d["schema_id"]
            for part in out
            for d in part.files
        } - {int(s) for s in self.schemas_json}
        for sid in fresh:
            m = table.evolution_projection(sid, self.target_schema_id)
            if m is not None:
                self.rename_maps[sid] = m
            self.schemas_json[str(sid)] = table.metadata["schemas"][str(sid)]
        return out or [OlakePartition()]

    def read(self, partition: OlakePartition):
        entries = [DataFile.from_dict(d) for d in partition.files]
        if not entries:
            return
        rename_maps = self.rename_maps
        # a DDL mid-stream creates schema ids this reader's pinned maps
        # predate; files written under them would silently null-fill the
        # renamed columns through name matching — reload and resolve the
        # missing ids by field id against the PINNED target schema
        known = {int(s) for s in self.schemas_json}
        missing = {e.schema_id for e in entries} - known
        if missing:
            table = Table.load(None, self.root)
            rename_maps = dict(rename_maps)
            for sid in missing:
                m = table.evolution_projection(sid, self.target_schema_id)
                if m is not None:
                    rename_maps[sid] = m
        yield from _read_data_files(
            self.root,
            entries,
            self.schema,
            self.schemas_json,
            self.target_schema_id,
            delete_entries=[],
            rename_maps=rename_maps,
        )

    def commit(self, end: dict) -> None:
        pass


# ---------------------------------------------------------------- write


@dataclass
class OlakeCommitMessage(WriterCommitMessage):
    entries: list = field(default_factory=list)  # DataFile dicts


class OlakeWriter(DataSourceArrowWriter):
    """Arrow-batch writer: each task writes one stats-footed parquet
    file into an uncommitted commit directory; the driver commit() turns
    the collected entries into ONE atomic snapshot through the table's
    optimistic-concurrency protocol (retried on conflict — entries are
    path-unique so a retry is safe). Uncommitted files from failed runs
    are orphans reclaimed by expire's GC sweep, the same
    upload-then-reference discipline as the JVM write path."""

    def __init__(self, options, schema: T.StructType, overwrite: bool):
        self.root = os.path.abspath(_get_opt(options, "path") or "")
        if not self.root:
            raise ValueError("olake writer needs a path: .save(<table root>)")
        self.overwrite = overwrite
        table = Table.load(None, self.root)
        self.table_schema = table.schema()
        self.schema_id = table.metadata["current_schema_id"]
        self.stats_columns = list(
            table.metadata.get("stats_columns", STATS_COLUMNS)
        )
        self.partition_col = table.partition_col
        self.commit_dir = f"data/ds_{uuid.uuid4().hex[:16]}"
        names = set(schema.fieldNames())
        table_names = {f.name for f in self.table_schema.fields}
        required = table_names - {OLAKE_ID, OLAKE_INSERT_TIME, CDC_DELETED_AT}
        if not required <= names:
            raise ValueError(
                f"input is missing table columns {sorted(required - names)}"
            )
        if extra := names - table_names:
            raise ValueError(f"input has unknown columns {sorted(extra)}")

    def write(self, iterator) -> OlakeCommitMessage:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from olake_spark.table.stats import _footer_stats

        target = _arrow_target(self.table_schema)
        batches = []
        now_ms = int(time.time() * 1000)
        for batch in iterator:
            tbl = pa.Table.from_batches([batch])
            tbl = _fill_system_columns(tbl, target, now_ms)
            batches.append(tbl)
        if not batches:
            return OlakeCommitMessage(entries=[])
        out = pa.concat_tables(batches)
        if len(out) == 0:
            return OlakeCommitMessage(entries=[])
        rel = f"{self.commit_dir}/part-{uuid.uuid4().hex[:16]}.parquet"
        abs_path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        pq.write_table(out, abs_path, compression="snappy")
        st = _footer_stats(abs_path, self.stats_columns)
        import json as _json

        stats = _json.loads(st.pop("stats_json"))
        pc_stats = stats.get(self.partition_col, {})
        partition = (
            pc_stats.get("min")
            if pc_stats and pc_stats.get("min") == pc_stats.get("max")
            else None
        )
        entry = DataFile(
            path=rel,
            record_count=st["record_count"],
            file_size_bytes=st["file_size_bytes"],
            partition=partition,
            stats=stats,
            schema_id=self.schema_id,
            spec_col=self.partition_col,
        )
        return OlakeCommitMessage(entries=[entry.to_dict()])

    def commit(self, messages) -> None:
        entries = [
            DataFile.from_dict(d)
            for m in messages
            if m is not None
            for d in m.entries
        ]
        last_err: Exception | None = None
        for _ in range(5):
            table = Table.load(None, self.root)
            removed: set[str] = set()
            removed_dels: set[str] = set()
            op = "append"
            if self.overwrite:
                removed = {f.path for f in table.files()}
                removed_dels = {f.path for f in table.delete_files()}
                op = "overwrite"
            try:
                table.commit(
                    op,
                    added=entries,
                    removed_paths=removed,
                    removed_delete_paths=removed_dels,
                    summary_extra={"writer": "python-datasource"},
                )
                return
            except CommitConflict as exc:
                last_err = exc
                time.sleep(0.05)
        raise last_err  # type: ignore[misc]

    def abort(self, messages) -> None:
        table = Table.load(None, self.root)
        for m in messages or []:
            if m is None:
                continue
            for d in m.entries:
                try:
                    table.io.delete(os.path.join(self.root, d["path"]))
                except OSError:
                    pass
        table.io.delete_empty_prefix(os.path.join(self.root, self.commit_dir))


def _fill_system_columns(tbl, target, now_ms: int):
    """Complete _olake_id / _olake_insert_time / _cdc_deleted_at on an
    arrow table and align it to the table schema. The id hash replicates
    schema.olake_id_expr byte-for-byte (md5 over 'doc_id|')."""
    import hashlib

    import pyarrow as pa

    names = set(tbl.column_names)
    n = len(tbl)
    if OLAKE_ID not in names:
        ids = [
            hashlib.md5(f"{v}|".encode()).hexdigest()
            for v in tbl.column("doc_id").to_pylist()
        ]
        tbl = tbl.append_column(OLAKE_ID, pa.array(ids, type=pa.string()))
    if OLAKE_INSERT_TIME not in names:
        tbl = tbl.append_column(
            OLAKE_INSERT_TIME, pa.array([now_ms] * n, type=pa.int64())
        )
    if CDC_DELETED_AT not in names:
        f = target.field(CDC_DELETED_AT)
        tbl = tbl.append_column(CDC_DELETED_AT, pa.nulls(n, type=f.type))
    cols = []
    for tf in target:
        arr = tbl.column(tf.name)
        if arr.type != tf.type:
            arr = arr.cast(tf.type)
        cols.append(arr)
    return pa.Table.from_arrays(cols, schema=target)


# ------------------------------------------------------------- the source


class OlakeDataSource(DataSource):
    """See module docstring. Register once per session:
    ``spark.dataSource.register(OlakeDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "olake"

    def schema(self):
        kind = _get_opt(self.options, "metadata")
        if kind is not None:
            from olake_spark.table import metadata_tables as mt

            schemas = {
                "snapshots": mt.SNAPSHOTS_SCHEMA,
                "history": mt.HISTORY_SCHEMA,
                "refs": mt.REFS_SCHEMA,
                "files": mt.FILES_SCHEMA,
                "delete_files": mt.FILES_SCHEMA,
                "manifests": mt.MANIFESTS_SCHEMA,
                "partitions": mt.PARTITIONS_SCHEMA,
                "schemas": mt.SCHEMAS_SCHEMA,
            }
            try:
                return schemas[kind]
            except KeyError:
                raise ValueError(
                    f"unknown metadata kind {kind!r}; one of {sorted(schemas)}"
                ) from None
        root = _get_opt(self.options, "path")
        if not root:
            raise ValueError("olake datasource needs a path: .load(<table root>)")
        table = Table.load(None, os.path.abspath(root))
        snap = _resolve_snapshot(table, self.options)
        schema = _nullable(table.schema(snap.schema_id if snap else None))
        if str(_get_opt(self.options, "with_lineage", "false")).lower() == "true":
            if not table.row_lineage:
                raise ValueError(
                    "with_lineage on a table without row lineage; create "
                    "with row_lineage=True or call enable_row_lineage() first"
                )
            from olake_spark.table.format import LAST_UPDATED_SEQ, ROW_ID

            schema = T.StructType(
                list(schema.fields)
                + [
                    T.StructField(ROW_ID, T.LongType()),
                    T.StructField(LAST_UPDATED_SEQ, T.LongType()),
                ]
            )
        return schema

    def reader(self, schema: T.StructType) -> OlakeBatchReader:
        return OlakeBatchReader(self.options, schema)

    def streamReader(self, schema: T.StructType) -> OlakeStreamReader:
        if _get_opt(self.options, "metadata") is not None:
            raise ValueError("metadata tables are batch-only")
        if str(_get_opt(self.options, "with_lineage", "false")).lower() == "true":
            raise ValueError(
                "with_lineage is batch-only; the changelog stream carries "
                "row identity via snapshot_changes(key_col=ROW_ID) instead"
            )
        return OlakeStreamReader(self.options, schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> OlakeWriter:
        if _get_opt(self.options, "metadata") is not None:
            raise ValueError("metadata tables are read-only")
        return OlakeWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Make ``format("olake")`` available on this session."""
    spark.dataSource.register(OlakeDataSource)
