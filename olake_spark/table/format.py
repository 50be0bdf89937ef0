"""Iceberg-semantics table layer in pure PySpark + JSON (SURVEY.md §7 P1).

The reference declares an ``S3_ICEBERG`` destination but ships no
implementation (/root/reference/types/adapter.go:6-8, README.md:60-71) —
this layer fills that gap from scratch, mirroring the public Iceberg spec
shape without the runtime jar:

    <root>/VERSION                     -> current metadata version number
    <root>/metadata/v<N>.json          -> schema(s), partition spec, snapshot log
    <root>/manifests/manifest-*.json   -> immutable lists of data-file entries
                                          (path, partition, record_count, bytes,
                                          per-column min/max/null stats)
    <root>/data/<commit-uuid>/*.parquet-> immutable data files

Commit protocol (atomic, single-writer with optimistic conflict check):
write v<N+1>.json via tmp+rename, then flip VERSION via tmp+rename —
mirrors the reference's ack-after-write ordering
(/root/reference/drivers/postgres/internal/cdc.go:102-120).

Scale notes: manifests are sharded (<= MANIFEST_MAX_ENTRIES files each)
and immutable — a commit carries over untouched manifests and rewrites
only those that lose files, so metadata work is O(changed files), not
O(table). File stats are collected from parquet footers with a
distributed mapInPandas (table/stats.py), never a data scan.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.schema import SEQUENCES_SCHEMA, STATS_COLUMNS
from olake_spark.table.io import FileIO, LocalFileIO
from olake_spark.table.stats import collect_file_stats

MANIFEST_MAX_ENTRIES = 5000

#: CANONICAL manifest-shard threshold above which planning goes
#: distributed by default (scan, merge discovery, compaction small-file
#: selection, cluster-spec derivation, orphan GC all derive from this
#: one constant) — a million-file table must not parse every manifest
#: shard on the driver per planning pass
SCAN_DISTRIBUTED_MIN_SHARDS = 64

_DEFAULT_IO = LocalFileIO()


class CommitConflict(Exception):
    """Another writer advanced VERSION since this Table was loaded."""


def _atomic_write_json(path: str, obj: Any) -> None:
    _DEFAULT_IO.put_json(path, obj)


def _atomic_write_text(path: str, text: str) -> None:
    _DEFAULT_IO.put_text(path, text)


#: DataFile.content values — Iceberg v2 file-content kinds
CONTENT_DATA = "data"
CONTENT_EQ_DELETES = "eq-deletes"  # rows = equality keys to delete
CONTENT_POS_DELETES = "pos-deletes"  # rows = (file_path, pos) to delete
# rows = (file_path, dv: array<bigint>, n_pos) — one packed position
# bitmap per data file (Iceberg v3 deletion-vector analog): 64 deleted
# positions per word instead of one row each, and scan applies them via
# an O(files) equi-join + bit test instead of an O(deleted-rows)
# anti-join. Produced by operators/deletes.write_deletion_vectors.
CONTENT_DV = "deletion-vectors"

#: system column holding the bucket-transform value (Iceberg bucket(N, col)
#: partitioning). Unlike Iceberg we materialize it as a real int column so
#: footer stats carry it and the whole identity-partition machinery
#: (purity detection, exact write routing, manifest pruning) applies
#: unchanged — the Hive-bucketing tradeoff, one int per row of storage.
BUCKET_COL = "_olake_bucket"

#: Row-lineage metadata columns (Iceberg v3 row lineage). ``_row_id`` is
#: a table-unique, stable identifier assigned when a row FIRST enters the
#: table and preserved across rewrites (compaction / clustering / CoW
#: MERGE updates); ``_last_updated_sequence_number`` is the sequence
#: number of the commit that last modified the row. Neither is usually
#: materialized: a freshly appended file stores nothing, and readers
#: synthesize ``first_row_id + row_position`` / the file's own sequence
#: number. Rewrites materialize RESOLVED values as real parquet columns
#: (row positions change, so synthesis would re-number); a materialized
#: NULL still means "synthesize from this file" — exactly the v3 rule,
#: which lets a CoW merge write preserved rows with ids and fresh
#: inserts with NULLs into the same file.
ROW_ID = "_row_id"
LAST_UPDATED_SEQ = "_last_updated_sequence_number"
LINEAGE_COLUMNS = (ROW_ID, LAST_UPDATED_SEQ)

_BUCKET_SPEC_RE = re.compile(r"^bucket\(\s*(\d+)\s*,\s*(\w+)\s*\)$")


def _parse_type(dtype: "str | T.DataType") -> T.DataType:
    """DDL type-string -> DataType, working in sparkless contexts too:
    Spark's parser needs an active session, so simple atomic names fall
    back to a local map (pure-metadata tooling retypes/adds without a
    JVM); genuinely invalid strings report the parse error."""
    if not isinstance(dtype, str):
        return dtype
    try:
        return T._parse_datatype_string(dtype)
    except Exception as e:
        atomic = {
            c().simpleString(): c
            for c in T._atomic_types
            if c not in (T.CharType, T.VarcharType, T.DecimalType)
        }.get(dtype)
        if atomic is not None:
            return atomic()
        from pyspark.errors import PySparkRuntimeError

        if isinstance(e, PySparkRuntimeError):
            raise ValueError(
                f"cannot parse type {dtype!r} without an active "
                "SparkSession; pass a pyspark.sql.types.DataType"
            ) from e
        raise ValueError(f"invalid type string {dtype!r}: {e}") from e


def project_by_field_id(
    df: DataFrame, mapping: dict[str, str], extras: list[str] | None = None
) -> DataFrame:
    """Apply an ``evolution_projection`` mapping (target_name ->
    source_name) to a frame: ONLY mapped source columns survive, renamed
    — a dropped-then-re-added name must not fall back to name matching,
    which would resurrect the old column's values. Shared by Table.scan
    and the changelog's old-side alignment (the Arrow datasource carries
    the same idiom in pyarrow form, sources/datasource.py)."""
    have = set(df.columns)
    return df.select(
        *[
            F.col(src).alias(dst)
            for dst, src in mapping.items()
            if src in have
        ],
        *(extras or []),
    )


def parse_partition_spec(spec: str) -> dict | None:
    """``"bucket(N,col)"`` -> ``{"type": "bucket", "n": N, "source": col}``;
    None for a plain identity column name."""
    m = _BUCKET_SPEC_RE.match(spec)
    if not m:
        return None
    n = int(m.group(1))
    if n < 2:
        raise ValueError(f"bucket count must be >= 2, got {n}")
    return {"type": "bucket", "n": n, "source": m.group(2)}


def bucket_value_expr(source: str, n: int):
    """Deterministic bucket id of a column value: pmod(xxhash64(str), n).
    xxhash64 rather than Iceberg's murmur3_x86_32 — consistency across
    THIS engine's tables is what co-located joins need; the string cast
    makes equal values of different physical types hash alike."""
    return F.pmod(
        F.xxhash64(F.col(source).cast("string")), F.lit(n)
    ).cast("int")


@dataclass
class DataFile:
    """One immutable parquet file tracked by a manifest.

    ``partition`` is the identity-partition value (source) when the file
    is partition-pure, else None (stats-based pruning still applies —
    Iceberg's model: data files can live anywhere; partition info lives
    in the manifest, not the directory layout).

    ``content`` distinguishes data files from merge-on-read DELETE files
    (Iceberg v2): equality-delete files hold key rows, positional-delete
    files hold (file_path, pos) rows. ``sequence_number`` is assigned at
    commit (= the committing snapshot id, which is monotone in commit
    order here): an equality delete applies to data files with a STRICTLY
    SMALLER sequence number — data written in the same or a later commit
    survives its own batch's delete keys.

    ``first_row_id`` (row lineage, Iceberg v3): base of the row-id block
    assigned to this file at commit — row N of the file has
    ``_row_id = first_row_id + N`` unless the file materializes a
    non-null ``_row_id`` for it. ``lineage_cols`` marks files that
    physically contain the two lineage columns (rewrite outputs)."""

    path: str  # relative to table root
    record_count: int
    file_size_bytes: int
    partition: str | None = None
    stats: dict[str, dict] = field(default_factory=dict)  # col -> {min,max,null_count}
    schema_id: int = 0  # schema the file was written under (evolution)
    spec_col: str | None = None  # column `partition` is a value of (spec evolution)
    content: str = CONTENT_DATA
    sequence_number: int = 0
    first_row_id: int | None = None
    lineage_cols: bool = False

    def to_dict(self) -> dict:
        d = {
            "path": self.path,
            "record_count": self.record_count,
            "file_size_bytes": self.file_size_bytes,
            "partition": self.partition,
            "stats": self.stats,
            "schema_id": self.schema_id,
            "spec_col": self.spec_col,
            "content": self.content,
            "sequence_number": self.sequence_number,
        }
        # lineage fields only when set — keeps non-lineage tables'
        # manifests byte-identical to the pre-lineage format
        if self.first_row_id is not None:
            d["first_row_id"] = self.first_row_id
        if self.lineage_cols:
            d["lineage_cols"] = True
        return d

    @classmethod
    def from_dict(cls, d: dict) -> DataFile:
        return cls(
            path=d["path"],
            record_count=d["record_count"],
            file_size_bytes=d["file_size_bytes"],
            partition=d.get("partition"),
            stats=d.get("stats", {}),
            schema_id=d.get("schema_id", 0),
            spec_col=d.get("spec_col"),
            content=d.get("content", CONTENT_DATA),
            sequence_number=d.get("sequence_number", 0),
            first_row_id=d.get("first_row_id"),
            lineage_cols=bool(d.get("lineage_cols", False)),
        )

    def may_contain(self, col: str, value) -> bool:
        """Min/max pruning check; conservative (True) when stats absent."""
        st = self.stats.get(col)
        if not st or st.get("min") is None:
            return True
        return st["min"] <= value <= st["max"]

    def overlaps(self, col: str, lo, hi) -> bool:
        st = self.stats.get(col)
        if not st or st.get("min") is None:
            return True
        return not (st["max"] < lo or st["min"] > hi)


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    timestamp_ms: int
    operation: str  # append | replace | overwrite | delete | expire
    manifests: list[str]  # paths relative to table root (DATA manifests)
    summary: dict[str, Any] = field(default_factory=dict)
    schema_id: int = 0
    # merge-on-read DELETE manifests (Iceberg v2) — kept separate from
    # data manifests so every data-only consumer (files(), shard-diff
    # validation, manifest caches, compaction planning) is untouched
    delete_manifests: list[str] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "timestamp_ms": self.timestamp_ms,
            "operation": self.operation,
            "manifests": self.manifests,
            "summary": self.summary,
            "schema_id": self.schema_id,
            "delete_manifests": self.delete_manifests,
        }

    @classmethod
    def from_dict(cls, d: dict) -> Snapshot:
        return cls(**d)


def snapshot_file_delta(
    table: "Table", base_snap: "Snapshot | None", target_snap: "Snapshot | None"
) -> tuple[dict[str, DataFile], dict[str, DataFile]]:
    """File entries ONLY reachable from ``target_snap`` and ONLY from
    ``base_snap``, as (target_only, base_only) path-keyed dicts.

    Computed from the manifest SHARD diff: manifests are immutable and a
    commit carries untouched shards over, so the file-set delta between
    two snapshots is exactly the delta of their shard sets — O(churned
    shards) manifest reads, never two O(table) file-list walks. A path
    can appear on BOTH sides (its shard was rewritten around some other
    file's removal); true adds are ``target_only - base_only`` keys and
    vice versa — the shared consumers (merge/rewrite commit validation,
    incremental clustering, changelog) each subtract accordingly."""
    base_m = set(base_snap.manifests) if base_snap else set()
    tgt_m = set(target_snap.manifests) if target_snap else set()
    target_only = {
        e.path: e
        for m in sorted(tgt_m - base_m)
        for e in table._read_manifest(m)
    }
    base_only = {
        e.path: e
        for m in sorted(base_m - tgt_m)
        for e in table._read_manifest(m)
    }
    return target_only, base_only


def new_delete_entries_since(
    table: "Table", base_snap: "Snapshot | None", target_snap: "Snapshot | None"
) -> list[DataFile]:
    """Merge-on-read DELETE entries present in ``target_snap`` but not in
    ``base_snap`` — the concurrent row-level deletes a rewrite job must
    conflict-check before committing (its outputs carry a HIGHER sequence
    number, which would silently void any delete landed mid-rewrite).
    Same shard-diff pricing as :func:`snapshot_file_delta`."""
    base_m = set(base_snap.delete_manifests) if base_snap else set()
    tgt_m = set(target_snap.delete_manifests) if target_snap else set()
    base_paths = {
        e.path for m in sorted(base_m - tgt_m) for e in table._read_manifest(m)
    }
    return [
        e
        for m in sorted(tgt_m - base_m)
        for e in table._read_manifest(m)
        if e.path not in base_paths
    ]


class Table:
    """A snapshot-isolated, manifest-tracked parquet table."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        metadata: dict,
        version: int,
        io: FileIO | None = None,
    ):
        self.spark = spark
        self.root = os.path.abspath(root)
        self.metadata = metadata
        self.version = version
        self.io: FileIO = io or LocalFileIO()
        self._manifest_cache: dict[str, list[DataFile]] = {}

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType = SEQUENCES_SCHEMA,
        partition_col: str = "source",
        stats_columns: list[str] | None = None,
        io: FileIO | None = None,
        row_lineage: bool = False,
    ) -> Table:
        io = io or LocalFileIO()
        root = os.path.abspath(root)
        for sub in ("metadata", "manifests", "data", "jobs"):
            io.ensure_prefix(os.path.join(root, sub))
        transform = parse_partition_spec(partition_col)
        stats_cols = list(stats_columns or STATS_COLUMNS)
        if transform is not None:
            if transform["source"] not in {f.name for f in schema.fields}:
                raise KeyError(
                    f"bucket source column {transform['source']!r} not in schema"
                )
            # the bucket id is a real (system) column: appended to the
            # schema, stamped at write time, footer-stats-tracked so
            # partition purity and pruning work like any identity column
            if BUCKET_COL not in {f.name for f in schema.fields}:
                schema = T.StructType(
                    list(schema.fields)
                    + [T.StructField(BUCKET_COL, T.IntegerType())]
                )
            if BUCKET_COL not in stats_cols:
                stats_cols.append(BUCKET_COL)
            partition_col = BUCKET_COL
        metadata = {
            "format_version": 1,
            "table_uuid": uuid.uuid4().hex,
            "location": root,
            "schemas": {"0": schema.json()},
            "current_schema_id": 0,
            "partition_col": partition_col,
            "stats_columns": stats_cols,
            "current_snapshot_id": None,
            "snapshots": [],
            "last_updated_ms": int(time.time() * 1000),
        }
        if transform is not None:
            metadata["partition_transform"] = transform
        if row_lineage:
            metadata["row_lineage"] = True
            metadata["next_row_id"] = 0
        io.put_json(os.path.join(root, "metadata", "v1.json"), metadata)
        io.put_text(os.path.join(root, "VERSION"), "1")
        return cls(spark, root, metadata, 1, io=io)

    @classmethod
    def load(cls, spark: SparkSession, root: str, io: FileIO | None = None) -> Table:
        io = io or LocalFileIO()
        root = os.path.abspath(root)
        version = int(io.get_text(os.path.join(root, "VERSION")).strip())
        # Heal an orphaned claim: a committer that died after claiming
        # v{N+1}.json but before flipping VERSION would otherwise wedge the
        # table forever (every future commit loads N, fails to claim the
        # existing v{N+1}.json, and CommitConflict retries re-read the same
        # stale pointer). The claim object is complete before it becomes
        # visible — adopting it loses nothing; repairing the pointer is
        # idempotent if the original committer races us.
        healed = version
        while io.exists(os.path.join(root, "metadata", f"v{healed + 1}.json")):
            healed += 1
        if healed != version:
            io.put_text(os.path.join(root, "VERSION"), str(healed))
            version = healed
        metadata = io.get_json(os.path.join(root, "metadata", f"v{version}.json"))
        return cls(spark, root, metadata, version, io=io)

    def refresh(self) -> Table:
        t = Table.load(self.spark, self.root, io=self.io)
        self.metadata, self.version = t.metadata, t.version
        self._manifest_cache.clear()
        return self

    # ------------------------------------------------------------- accessors
    @property
    def current_snapshot_id(self) -> int | None:
        return self.metadata["current_snapshot_id"]

    @property
    def partition_col(self) -> str:
        return self.metadata["partition_col"]

    @property
    def partition_transform(self) -> dict | None:
        """``{"type": "bucket", "n": N, "source": col}`` when the table
        was created with a ``bucket(N,col)`` spec, else None."""
        return self.metadata.get("partition_transform")

    def schema(self, schema_id: int | None = None) -> T.StructType:
        sid = self.metadata["current_schema_id"] if schema_id is None else schema_id
        return T.StructType.fromJson(
            json.loads(self.metadata["schemas"][str(sid)])
        )

    def snapshots(self) -> list[Snapshot]:
        return [Snapshot.from_dict(d) for d in self.metadata["snapshots"]]

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id
        if sid is None:
            return None
        for d in self.metadata["snapshots"]:
            if d["snapshot_id"] == sid:
                return Snapshot.from_dict(d)
        raise KeyError(f"snapshot {sid} not found (expired?)")

    def snapshot_as_of(self, ts_ms: int) -> Snapshot | None:
        """Time travel: the latest snapshot committed at or before
        ``ts_ms`` (Iceberg's SYSTEM_TIME AS OF). None when the table had
        no snapshot yet; raises KeyError only via the caller's scan if
        the snapshot was expired meanwhile."""
        best: Snapshot | None = None
        # append-ordered list + '>=' so several commits in the same
        # millisecond resolve to the LATEST one (Iceberg semantics)
        for d in self.metadata["snapshots"]:
            if d["timestamp_ms"] <= ts_ms and (
                best is None or d["timestamp_ms"] >= best.timestamp_ms
            ):
                best = Snapshot.from_dict(d)
        return best

    def _persist_mutation(self, mutate) -> int:
        """Apply ``mutate()`` to self.metadata and persist, with
        in-memory ROLLBACK on CommitConflict — a caller that catches
        the conflict to retry (the documented pattern) must see the
        pre-mutation state, exactly as commit() guarantees. The backup
        is captured BEFORE the mutation runs — backing up after (the
        naive shape) silently keeps the phantom edit."""
        backup = json.dumps(self.metadata)
        mutate()
        try:
            return self.rewrite_metadata()
        except CommitConflict:
            self.metadata = json.loads(backup)
            raise

    # ------------------------------------------------------- refs / rollback
    @property
    def refs(self) -> dict[str, dict]:
        """Named refs (Iceberg tags/branches): name -> {snapshot_id, type}."""
        return dict(self.metadata.get("refs", {}))

    @property
    def properties(self) -> dict[str, str]:
        """Table properties (Iceberg TBLPROPERTIES analog): free-form
        string config carried in table metadata, versioned like any
        other metadata change. Namespaced keys configure engine
        behavior — ``maintenance.*`` seeds the autopilot policy
        (olake_spark.operators.autopilot.policy_from_table)."""
        return dict(self.metadata.get("properties", {}))

    def set_properties(self, props: dict[str, str | None]) -> int:
        """ALTER TABLE SET/UNSET TBLPROPERTIES — metadata-only commit:
        no data or manifest file is touched, and the change rides the
        same optimistic version claim as every other commit (a racing
        writer gets CommitConflict, not a lost property). A ``None``
        value unsets the key; a no-op change commits nothing and
        returns the current snapshot id."""
        from olake_spark.plans.retry import retry_on_backoff

        def attempt() -> int:
            # re-merge from fresh metadata each attempt: a concurrent
            # commit (append, maintenance) between load and set must
            # cost a retry, never the property change or theirs
            self.refresh()
            merged = dict(self.metadata.get("properties", {}))
            changed = []
            for k, v in props.items():
                if v is None:
                    if merged.pop(k, None) is not None:
                        changed.append(f"unset:{k}")
                elif merged.get(k) != str(v):
                    merged[k] = str(v)
                    changed.append(f"set:{k}")
            if not changed:
                return self.current_snapshot_id
            return self.commit(
                "properties",
                metadata_extra={"properties": merged},
                summary_extra={"properties": ",".join(sorted(changed))},
            )

        return retry_on_backoff(
            attempt, base_sleep_s=0.05, retry_on=(CommitConflict,)
        )

    @property
    def row_lineage(self) -> bool:
        """True when the table tracks Iceberg-v3-style row lineage
        (``Table.create(row_lineage=True)`` or `enable_row_lineage`)."""
        return bool(self.metadata.get("row_lineage"))

    def enable_row_lineage(self) -> int | None:
        """Turn row-lineage tracking on for an existing table.

        Backfills ``first_row_id`` over every live data file in
        (sequence_number, path) order — deterministic, so two racers
        assign identical ids — via one metadata-only manifest rewrite
        (O(live files) driver work, no data touched; the one-time cost
        of the v3 upgrade, as in Iceberg). Returns the new snapshot id,
        or None for an empty table (flag-only). Idempotent."""
        if self.row_lineage:
            return None
        snap = self.snapshot()
        if snap is None:
            self._persist_mutation(
                lambda: self.metadata.update(row_lineage=True, next_row_id=0)
            )
            return None
        entries = sorted(
            self.files(snap.snapshot_id),
            key=lambda f: (f.sequence_number, f.path),
        )
        rid = 0
        for e in entries:
            e.first_row_id = rid
            rid += e.record_count
        new_manifests = [
            self._write_manifest(entries[i : i + MANIFEST_MAX_ENTRIES])
            for i in range(0, len(entries), MANIFEST_MAX_ENTRIES)
        ]
        return self.replace_manifests(
            new_manifests,
            operation="enable-row-lineage",
            summary_extra={"backfilled-files": len(entries)},
            metadata_extra={"row_lineage": True, "next_row_id": rid},
        )

    def set_ref(
        self, name: str, snapshot_id: int | None = None, ref_type: str = "tag"
    ) -> None:
        """Create or move a named ref (default: the current snapshot).
        Tagged snapshots are protected from expire_snapshots until the
        ref is removed — the Iceberg tag/branch retention contract.

        Branch vs tag: a ``tag`` is immovable (a pinned restore point);
        a ``branch`` head ADVANCES when a commit lands on top of it —
        commit() moves every branch ref whose head equals the parent
        snapshot to the new snapshot, so ``scan(ref=branch)`` tracks
        the line of development while ``scan(ref=tag)`` stays pinned."""
        if ref_type not in ("tag", "branch"):
            raise ValueError(f"ref_type must be 'tag' or 'branch', got {ref_type!r}")
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id
        if sid is None:
            raise ValueError("table has no snapshot to reference")
        self.snapshot(sid)  # raises KeyError if expired/unknown

        def _mut():
            self.metadata.setdefault("refs", {})[name] = {
                "snapshot_id": sid,
                "type": ref_type,
            }

        self._persist_mutation(_mut)

    def remove_ref(self, name: str) -> None:
        if name not in self.metadata.get("refs", {}):
            raise KeyError(f"ref {name!r} not found")
        self._persist_mutation(lambda: self.metadata["refs"].pop(name))

    def prune_files(
        self,
        files: list[DataFile],
        sources: list[str] | None = None,
        ranges: dict[str, tuple] | None = None,
    ) -> list[DataFile]:
        """Driver-side file pruning with the SAME predicates as the
        Catalyst-side ``manifest_df.prune_files_df`` — the one place the
        local semantics live (Table.scan and scoped compaction both call
        this; the distributed planners call prune_files_df):

        - ``sources``: identity-partition prune only when the file's
          spec col IS "source" (post-evolution files may partition by a
          different column; legacy entries resolve to the FIRST spec);
          otherwise min/max stats prune exactly.
        - ``ranges``: {column: (lo, hi)} closed-interval min/max overlap
          prune; files without stats for a column are kept."""
        out = files
        if sources is not None:
            out = [
                f
                for f in out
                if (
                    pv in sources
                    if (pv := self.partition_value(f, "source")) is not None
                    else any(f.may_contain("source", s) for s in sources)
                )
            ]
        for col, (lo, hi) in (ranges or {}).items():
            out = [f for f in out if f.overlaps(col, lo, hi)]
        return out

    def partition_value(self, f: DataFile, col: str) -> str | None:
        """``f.partition`` when the file's partition spec column is
        ``col``, else None. Files from manifests predating spec
        recording (spec_col=None) were written under the table's FIRST
        spec — resolving them to the current partition_col would
        misattribute their value after an evolve_partition()."""
        sc = f.spec_col or self.metadata.get(
            "partition_spec_log", [self.partition_col]
        )[0]
        return f.partition if sc == col else None

    def evolve_partition(self, new_col: str) -> None:
        """Identity-partition spec evolution (Iceberg partition evolution):
        NEW writes detect partition purity on ``new_col``; existing files
        keep their old spec untouched — no rewrite — and scans still
        prune them exactly through per-file min/max stats. The spec
        history is recorded in ``partition_spec_log``. ``new_col`` is
        added to stats_columns if absent — purity detection reads the
        per-file min/max of the spec column, so without stats the
        evolution would be silently inert."""
        if new_col not in {f.name for f in self.schema().fields}:
            raise KeyError(f"column {new_col!r} not in current schema")
        def _mut():
            cols = self.metadata.setdefault(
                "stats_columns", list(STATS_COLUMNS)
            )
            if new_col not in cols:
                cols.append(new_col)
            log = self.metadata.setdefault(
                "partition_spec_log", [self.metadata["partition_col"]]
            )
            log.append(new_col)
            self.metadata["partition_col"] = new_col

        self._persist_mutation(_mut)

    # ---------------------------------------------------------- schema DDL
    def _all_field_ids(self) -> tuple[dict[int, dict[str, int]], int]:
        """Per-schema ``name -> field id`` maps (Iceberg field IDs) plus
        the next free id. Maps persisted by a DDL commit are used as-is.

        Schemas WITHOUT a persisted map derive ids lazily, under two
        regimes:
        - no DDL ever ran (no ``field_ids`` in metadata): a name, once
          seen, keeps its id in every later schema it appears in —
          bit-identical to the name-matched coercion those tables were
          written under;
        - DDL ran (the DDL commit persisted a map for every schema that
          existed, so an unpersisted schema is strictly NEWER): inherit
          by name from the IMMEDIATELY PREVIOUS schema only, fresh ids
          otherwise. Inheriting from the cumulative history here would
          hand a drift re-add of a renamed-away or dropped NAME the old
          field id — silently remapping or resurrecting old data.
        Fresh ids always start at ``last_field_id``: an id retired by
        drop_column must never be reissued to a different name, or old
        files would leak their dropped column into it."""
        # memo per (version, schema count): scan calls this once per
        # (schema_id, delete-bucket) group and parsing every schema's
        # JSON each time is avoidable driver work on DDL-heavy tables
        key = (self.version, len(self.metadata["schemas"]))
        cached = getattr(self, "_field_id_memo", None)
        if cached is not None and cached[0] == key:
            return cached[1], cached[2]
        persisted = {
            int(s): m
            for s, m in self.metadata.get("field_ids", {}).items()
        }
        out: dict[int, dict[str, int]] = {}
        cum: dict[str, int] = {}
        prev: dict[str, int] = {}
        has_ddl = bool(persisted)
        nxt = self.metadata.get("last_field_id", 0)
        for sid in sorted(int(s) for s in self.metadata["schemas"]):
            if sid in persisted:
                ids = dict(persisted[sid])
            else:
                base = prev if has_ddl else cum
                ids = {}
                for f in self.schema(sid).fields:
                    if f.name in base:
                        ids[f.name] = base[f.name]
                    else:
                        ids[f.name] = nxt
                        nxt += 1
            cum.update(ids)
            prev = ids
            nxt = max(nxt, max(ids.values(), default=-1) + 1)
            out[sid] = ids
        self._field_id_memo = (key, out, nxt)
        return out, nxt

    def _field_ids(self, schema_id: int) -> dict[str, int]:
        return self._all_field_ids()[0][schema_id]

    def _ddl_guard(self, name: str, op: str) -> None:
        from olake_spark.schema import (
            CDC_DELETED_AT,
            OLAKE_ID,
            OLAKE_INSERT_TIME,
        )

        if name in {OLAKE_ID, OLAKE_INSERT_TIME, CDC_DELETED_AT, BUCKET_COL}:
            raise ValueError(f"cannot {op} system column {name!r}")
        spec_log = self.metadata.get(
            "partition_spec_log", [self.partition_col]
        )
        tr = self.partition_transform
        if name in spec_log or (tr is not None and name == tr["source"]):
            raise ValueError(
                f"cannot {op} {name!r}: it is (or was) a partition spec "
                "column — file routing and purity pruning key on it; "
                "evolve the partition spec first"
            )
        if name in self.metadata.get("stats_columns", STATS_COLUMNS):
            raise ValueError(
                f"cannot {op} {name!r}: manifest min/max pruning keys on "
                "it (stats_columns); renames would silently disable "
                "file skipping for existing files"
            )

    def _commit_schema_change(
        self, new_fields: list[T.StructField], new_ids: dict[str, int],
        nxt: int, op: str,
    ) -> int:
        all_ids, _ = self._all_field_ids()
        new_sid = self.metadata["current_schema_id"] + 1
        # persist EVERY schema's map: once any DDL lands, later lazy
        # derivation would otherwise re-number around the DDL's choices
        field_ids = {str(s): m for s, m in all_ids.items()}
        field_ids[str(new_sid)] = new_ids
        return self.commit(
            "schema-change",
            new_schema=T.StructType(new_fields),
            metadata_extra={
                "field_ids": field_ids,
                "last_field_id": nxt,
            },
            summary_extra={"ddl": op},
        )

    def add_column(self, name: str, dtype: str | T.DataType) -> int:
        """ALTER TABLE ADD COLUMN — metadata-only (Iceberg UpdateSchema.
        addColumn): no data file is touched; existing files read back
        NULL for the new column, snapshots pinned before the DDL don't
        see it at all. A name that was dropped earlier gets a FRESH
        field id, so old data never resurrects under the new column."""
        dtype = _parse_type(dtype)
        cur = self.schema()
        if name in {f.name for f in cur.fields}:
            raise ValueError(f"column {name!r} already exists")
        # the rename guard's asymmetry would otherwise let a SYSTEM name
        # the schema happens to lack (e.g. _olake_bucket on an unbucketed
        # table) in as a user column — permanently trapped afterwards
        self._ddl_guard(name, "add")
        _, nxt = self._all_field_ids()
        ids = dict(self._field_ids(self.metadata["current_schema_id"]))
        ids[name] = nxt
        return self._commit_schema_change(
            list(cur.fields) + [T.StructField(name, dtype, True)],
            ids, nxt + 1, f"add:{name}",
        )

    def rename_column(self, old: str, new: str) -> int:
        """ALTER TABLE RENAME COLUMN — metadata-only: the field keeps
        its id, so every existing file's column (written under the old
        name) reads back under the new name with zero rewrite; a
        snapshot pinned before the DDL still scans the old name.
        Partition-spec, stats(pruning) and system columns are refused —
        their machinery keys on physical names."""
        cur = self.schema()
        names = {f.name for f in cur.fields}
        if old not in names:
            raise KeyError(f"column {old!r} not in current schema")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        self._ddl_guard(old, "rename")
        self._ddl_guard(new, "rename to")
        ids = dict(self._field_ids(self.metadata["current_schema_id"]))
        _, nxt = self._all_field_ids()
        ids[new] = ids.pop(old)
        fields = [
            T.StructField(new, f.dataType, f.nullable)
            if f.name == old
            else f
            for f in cur.fields
        ]
        return self._commit_schema_change(
            fields, ids, nxt, f"rename:{old}->{new}"
        )

    def drop_column(self, name: str) -> int:
        """ALTER TABLE DROP COLUMN — metadata-only: data files keep the
        physical column (storage is reclaimed as compaction naturally
        rewrites them); scans project it away by field id, and a later
        ``add_column`` of the same name is a NEW field that reads NULL
        from old files instead of resurrecting dropped values."""
        cur = self.schema()
        if name not in {f.name for f in cur.fields}:
            raise KeyError(f"column {name!r} not in current schema")
        self._ddl_guard(name, "drop")
        ids = dict(self._field_ids(self.metadata["current_schema_id"]))
        _, nxt = self._all_field_ids()
        del ids[name]
        return self._commit_schema_change(
            [f for f in cur.fields if f.name != name],
            ids, nxt, f"drop:{name}",
        )

    # widenings that are exact for every representable value — the same
    # set Iceberg's UpdateSchema allows (minus decimal, unsupported here)
    _SAFE_PROMOTIONS = {
        ("int", "bigint"),
        ("smallint", "int"),
        ("smallint", "bigint"),
        ("tinyint", "smallint"),
        ("tinyint", "int"),
        ("tinyint", "bigint"),
        ("float", "double"),
    }

    def update_column_type(self, name: str, dtype: str | T.DataType) -> int:
        """ALTER TABLE ALTER COLUMN TYPE — metadata-only, restricted to
        SAFE widenings (int->long, float->double, ...): the field keeps
        its id, old files read back casted (the scan's per-file coercion
        already casts write-time types to the pinned schema), new writes
        must carry the widened type. Narrowing or cross-family casts are
        refused — they'd silently lose data on read."""
        dtype = _parse_type(dtype)
        cur = self.schema()
        field = next((f for f in cur.fields if f.name == name), None)
        if field is None:
            raise KeyError(f"column {name!r} not in current schema")
        self._ddl_guard(name, "retype")
        old_s, new_s = field.dataType.simpleString(), dtype.simpleString()
        if old_s == new_s:
            raise ValueError(f"column {name!r} is already {new_s}")
        if (old_s, new_s) not in self._SAFE_PROMOTIONS:
            raise ValueError(
                f"cannot change {name!r} from {old_s} to {new_s}: only "
                "safe widenings are allowed "
                f"({sorted(self._SAFE_PROMOTIONS)})"
            )
        ids = dict(self._field_ids(self.metadata["current_schema_id"]))
        _, nxt = self._all_field_ids()
        fields = [
            T.StructField(name, dtype, f.nullable) if f.name == name else f
            for f in cur.fields
        ]
        return self._commit_schema_change(
            fields, ids, nxt, f"retype:{name}:{old_s}->{new_s}"
        )

    def evolution_projection(
        self, from_sid: int, to_sid: int
    ) -> dict[str, str] | None:
        """``target_name -> source_name`` for fields of ``to_sid`` whose
        field id exists in ``from_sid``; None when the mapping is pure
        name-identity (the common no-DDL case — callers skip the extra
        projection and keep today's plan shape)."""
        if from_sid == to_sid:
            return None
        all_ids, _ = self._all_field_ids()
        src_ids, dst_ids = all_ids[from_sid], all_ids[to_sid]
        src_by_fid = {fid: n for n, fid in src_ids.items()}
        mapping = {}
        identity = True
        for dst, fid in dst_ids.items():
            src = src_by_fid.get(fid)
            if src is not None:
                mapping[dst] = src
                if src != dst:
                    identity = False
            elif dst in src_ids:
                # same NAME, different field id (drop + re-add): the
                # source column must NOT leak through name matching
                identity = False
        return None if identity else mapping

    def rollback_to(self, snapshot_id: int) -> None:
        """Point the table back at an ancestor snapshot (Iceberg
        rollback_to_snapshot). Metadata-only — no snapshot is created and
        the rolled-over snapshots stay in the log for time travel until
        expired. The next commit() allocates a fresh (max+1) id, so the
        abandoned lineage is never overwritten.

        Expired intermediates: expire_snapshots may have dropped
        snapshots BETWEEN the current one and a tag-pinned restore
        point, breaking the parent chain. The walk treats a missing
        parent as a gap and still accepts the target when it is
        REF-PINNED (named in table.refs) and its id precedes everything
        walked — a tagged restore point stays rollbackable after
        routine expiry. An unpinned target past a gap, or a target on
        an abandoned branch (known, but not an ancestor), is refused:
        once the chain is broken, an id-ordering heuristic alone cannot
        distinguish an expired ancestor from an abandoned sibling, and
        only the ref pin certifies intent. Use set_current_snapshot for
        unrestricted repointing."""
        target = self.snapshot(snapshot_id)  # KeyError if unknown
        cur = self.snapshot()
        found = gap = False
        min_walked = None
        seen: set[int] = set()
        while cur is not None and cur.snapshot_id not in seen:
            if cur.snapshot_id == target.snapshot_id:
                found = True
                break
            seen.add(cur.snapshot_id)
            min_walked = cur.snapshot_id
            if cur.parent_id is None:
                cur = None
                break
            try:
                cur = self.snapshot(cur.parent_id)
            except KeyError:
                gap = True
                cur = None
        pinned = any(
            r["snapshot_id"] == target.snapshot_id
            for r in self.metadata.get("refs", {}).values()
        )
        if not found and not (
            gap
            and pinned
            and min_walked is not None
            and target.snapshot_id < min_walked
        ):
            raise ValueError(
                f"snapshot {snapshot_id} is not an ancestor of the current "
                "snapshot (use set_current_snapshot to repoint explicitly)"
            )
        self._persist_mutation(
            lambda: self.metadata.__setitem__(
                "current_snapshot_id", snapshot_id
            )
        )

    def set_current_snapshot(self, snapshot_id: int) -> None:
        """Repoint the table at ANY retained snapshot, ancestor or not
        (Iceberg set_current_snapshot) — e.g. to resurrect an abandoned
        branch after a rollback."""
        self.snapshot(snapshot_id)  # KeyError if unknown
        self._persist_mutation(
            lambda: self.metadata.__setitem__(
                "current_snapshot_id", snapshot_id
            )
        )

    def _read_manifest(self, rel: str) -> list[DataFile]:
        if rel not in self._manifest_cache:
            self._manifest_cache[rel] = [
                DataFile.from_dict(d)
                for d in self.io.get_json(os.path.join(self.root, rel))
            ]
        return self._manifest_cache[rel]

    def files(self, snapshot_id: int | None = None) -> list[DataFile]:
        snap = self.snapshot(snapshot_id)
        if snap is None:
            return []
        out: list[DataFile] = []
        for m in snap.manifests:
            out.extend(self._read_manifest(m))
        return out

    def delete_files(self, snapshot_id: int | None = None) -> list[DataFile]:
        """Merge-on-read DELETE file entries of one snapshot. Driver-side
        by design: delete-file count is bounded by the maintenance
        cadence (materialize_deletes folds them back into data files),
        not by table size."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            return []
        out: list[DataFile] = []
        for m in snap.delete_manifests:
            out.extend(self._read_manifest(m))
        return out

    def abs_path(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    # ------------------------------------------------------------------ scan
    def scan(
        self,
        snapshot_id: int | None = None,
        sources: list[str] | None = None,
        doc_id_range: tuple[str, str] | None = None,
        n_tok_range: tuple[int, int] | None = None,
        eq: dict[str, Any] | None = None,
        files: list[DataFile] | None = None,
        ref: str | None = None,
        distributed_planning: bool | None = None,
        apply_deletes: bool = True,
        with_position: bool = False,
        with_lineage: bool = False,
    ) -> DataFrame:
        """Snapshot-pinned read with manifest-level file pruning.

        Pruning here skips whole files via manifest min/max (the analog of
        Iceberg manifest filtering); Catalyst/parquet then push the same
        predicates down to row groups within the surviving files.
        ``ref`` reads a named tag/branch (mutually exclusive with
        ``snapshot_id``).

        ``distributed_planning``: None (default) auto-delegates to
        table/manifest_df.scan_planned when the snapshot has >=
        SCAN_DISTRIBUTED_MIN_SHARDS manifest shards (and no explicit
        ``files`` list) — manifest parsing and pruning then run as a
        Spark job and the driver touches only the survivors.

        ``apply_deletes``: merge-on-read DELETE files of the snapshot are
        applied by default — equality deletes as broadcast anti-joins per
        sequence-number bucket (a delete applies only to data files with
        a strictly smaller sequence number), positional deletes as one
        (file_path, pos) anti-join over parquet ``_metadata``. Pass False
        only to inspect raw pre-delete file contents (or when scanning
        uncommitted output files, whose unset sequence number would
        spuriously attract every equality delete).

        ``with_position``: append ``_file`` (table-relative source file
        path) and ``_pos`` (row ordinal within that file, parquet
        ``_metadata.row_index``) columns — the coordinates a positional
        delete file records (operators/deletes.delete_where).

        ``with_lineage``: append the row-lineage columns ``_row_id`` and
        ``_last_updated_sequence_number`` (Iceberg v3). Values come from
        the file's materialized lineage columns where present (rewrite
        outputs), else are synthesized as ``first_row_id + row_position``
        / the file's sequence number — one broadcast O(files) map join,
        no extra data read. Requires a lineage-enabled table
        (``row_lineage=True`` at create, or ``enable_row_lineage()``).

        ``eq``: {column: value} point-lookup predicate. Prunes files by
        min/max stats AND — when ``build_bloom_blobs`` registered blobs
        covering the column (table/blooms.py) — by per-file blooms, the
        pruning min/max cannot do on columns the table is not clustered
        on. Applied only during planning (``files is None``: an explicit
        file list was already planned); re-applied as an exact row
        filter either way.
        """
        if with_lineage and not self.row_lineage:
            raise ValueError(
                "with_lineage=True on a table without row lineage; create "
                "with row_lineage=True or call enable_row_lineage() first"
            )
        if ref is not None:
            if snapshot_id is not None:
                raise ValueError("pass either snapshot_id or ref, not both")
            try:
                snapshot_id = self.metadata["refs"][ref]["snapshot_id"]
            except KeyError:
                raise KeyError(f"ref {ref!r} not found") from None
        snap = self.snapshot(snapshot_id)
        if files is None and snap is not None and self.spark is not None:
            use_dist = distributed_planning
            if use_dist is None:
                use_dist = len(snap.manifests) >= SCAN_DISTRIBUTED_MIN_SHARDS
            if use_dist:
                from olake_spark.table.manifest_df import scan_planned

                return scan_planned(
                    self,
                    snapshot_id=snap.snapshot_id,
                    sources=sources,
                    doc_id_range=doc_id_range,
                    n_tok_range=n_tok_range,
                    eq=eq,
                    apply_deletes=apply_deletes,
                    with_position=with_position,
                    with_lineage=with_lineage,
                )
        schema = self.schema(snap.schema_id if snap else None)
        target_sid = snap.schema_id if snap else self.metadata["current_schema_id"]
        cand = files if files is not None else self.files(snapshot_id)
        ranges = {}
        if doc_id_range is not None:
            ranges["doc_id"] = doc_id_range
        if n_tok_range is not None:
            ranges["n_tok"] = n_tok_range
        for c, v in (eq or {}).items():
            ranges.setdefault(c, (v, v))  # point probe = degenerate range
        cand = self.prune_files(cand, sources=sources, ranges=ranges)
        if eq and files is None and cand and self.metadata.get("bloom_statistics"):
            from olake_spark.table.blooms import bloom_prune

            cand = bloom_prune(self, cand, eq)
        if not cand:
            extra_fields = []
            if with_lineage:
                extra_fields += [
                    T.StructField(ROW_ID, T.LongType()),
                    T.StructField(LAST_UPDATED_SEQ, T.LongType()),
                ]
            if with_position:
                extra_fields += [
                    T.StructField("_file", T.StringType()),
                    T.StructField("_pos", T.LongType()),
                ]
            if extra_fields:
                schema = T.StructType(list(schema.fields) + extra_fields)
            return self.spark.createDataFrame([], schema)

        # merge-on-read deletes pinned to the SAME snapshot (old readers
        # see old delete files — snapshot isolation holds for row-level
        # deletes too). Equality deletes may be pruned by doc_id only:
        # the equality key is derived from doc_id, so a delete row for
        # any in-range data row is itself in range; scan predicates on
        # other columns must NOT prune delete files (an update may have
        # moved the row across sources).
        dels = (
            self.delete_files(snap.snapshot_id)
            if (apply_deletes and snap is not None)
            else []
        )
        if doc_id_range is not None:
            dels = [
                d
                for d in dels
                if d.content != CONTENT_EQ_DELETES
                or d.overlaps("doc_id", *doc_id_range)
            ]
        eq_dels = [d for d in dels if d.content == CONTENT_EQ_DELETES]
        pos_dels = [d for d in dels if d.content == CONTENT_POS_DELETES]
        dv_dels = [d for d in dels if d.content == CONTENT_DV]
        eq_seqs = sorted({d.sequence_number for d in eq_dels})
        need_meta = (
            bool(pos_dels) or bool(dv_dels) or with_position or with_lineage
        )

        # group files by (schema written under, equality-delete bucket):
        # files in bucket b share the exact applicable delete-file
        # suffix eq_seqs[b:], so one broadcast anti-join per bucket
        # applies the right deletes to every file — never a per-row
        # sequence-number lookup against an O(files) map. Bucket count
        # is bounded by the number of MoR commits since the last
        # materialize_deletes, not by table size.
        import bisect

        by_group: dict[tuple[int, int, bool], list[DataFile]] = {}
        for f in cand:
            b = bisect.bisect_right(eq_seqs, f.sequence_number)
            # lineage-materialized files read two extra physical columns,
            # so they need their own scan branch (ignored entirely when
            # the caller didn't ask for lineage)
            lin = bool(with_lineage and f.lineage_cols)
            by_group.setdefault((f.schema_id, b, lin), []).append(f)

        def _eq_keys_df(ds: list[DataFile]) -> DataFrame:
            r = self.spark.read.schema("_olake_id string").parquet(
                *[self.abs_path(d.path) for d in ds]
            )
            # broadcast unless the delete set outgrew the session's
            # broadcast ceiling (steady-state delete volume is
            # maintenance-bounded; cap shared with merge's key joins)
            from olake_spark.session import broadcast_cap_bytes

            if sum(d.file_size_bytes for d in ds) <= broadcast_cap_bytes(
                self.spark
            ):
                r = F.broadcast(r)
            return r

        parts = []
        for (sid, b, lin), fs in sorted(by_group.items()):
            read_schema = self.schema(sid)
            if lin:
                read_schema = T.StructType(
                    list(read_schema.fields)
                    + [
                        T.StructField(ROW_ID, T.LongType()),
                        T.StructField(LAST_UPDATED_SEQ, T.LongType()),
                    ]
                )
            part = self.spark.read.schema(read_schema).parquet(
                *[self.abs_path(f.path) for f in fs]
            )
            if need_meta:
                part = part.select(
                    "*",
                    F.col("_metadata.file_path").alias("_sg_fp"),
                    F.col("_metadata.row_index").alias("_sg_pos"),
                )
            if sid != target_sid:
                from olake_spark.functions.reformat import coerce_to_schema

                extras = ["_sg_fp", "_sg_pos"] if need_meta else []
                if lin:
                    extras = extras + [ROW_ID, LAST_UPDATED_SEQ]
                extras = extras or None
                mapping = self.evolution_projection(sid, target_sid)
                if mapping is not None:
                    # field-id resolution (schema DDL): renamed columns
                    # read under their current name, dropped+re-added
                    # names do NOT resurrect old values
                    part = project_by_field_id(part, mapping, extras)
                part = coerce_to_schema(part, schema, extra_cols=extras)
            if with_lineage and not lin:
                # uniform shape across branches: unmaterialized files
                # contribute NULLs, resolved below from first_row_id
                part = part.withColumn(
                    ROW_ID, F.lit(None).cast("long")
                ).withColumn(LAST_UPDATED_SEQ, F.lit(None).cast("long"))
            app = (
                [d for d in eq_dels if d.sequence_number >= eq_seqs[b]]
                if b < len(eq_seqs)
                else []
            )
            if app:
                part = part.join(_eq_keys_df(app), "_olake_id", "left_anti")
            parts.append(part)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)

        rel_path = F.expr(
            "substring(regexp_replace(_sg_fp, '^file:/*', '/'), "
            f"{len(self.root) + 2})"
        )
        if pos_dels:
            pos_df = self.spark.read.schema("file_path string, pos long").parquet(
                *[self.abs_path(d.path) for d in pos_dels]
            ).withColumnsRenamed({"file_path": "_sg_rel", "pos": "_sg_pos"})
            from olake_spark.session import broadcast_cap_bytes

            if sum(d.file_size_bytes for d in pos_dels) <= broadcast_cap_bytes(
                self.spark
            ):
                pos_df = F.broadcast(pos_df)
            df = (
                df.withColumn("_sg_rel", rel_path)
                .join(pos_df, ["_sg_rel", "_sg_pos"], "left_anti")
                .drop("_sg_rel")
            )
        if dv_dels:
            # deletion vectors: ONE row per covered data file (a packed
            # position bitmap), applied as an O(files) left join + a
            # constant-time bit test per row — the scale path for heavy
            # delete volume (10^9 deleted positions are ~16 MB of words,
            # not 10^9 anti-join rows)
            dv_df = self.spark.read.schema(
                "file_path string, dv array<bigint>, n_pos long"
            ).parquet(*[self.abs_path(d.path) for d in dv_dels]).select(
                F.col("file_path").alias("_sg_rel"), "dv"
            )
            from olake_spark.session import broadcast_cap_bytes

            if sum(d.file_size_bytes for d in dv_dels) <= broadcast_cap_bytes(
                self.spark
            ):
                dv_df = F.broadcast(dv_df)
            widx = F.shiftright(F.col("_sg_pos"), 6).cast("int") + 1
            # CaseWhen guards element_at past the bitmap tail (positions
            # appended after the DV build have no word — kept, and ANSI
            # mode would otherwise raise)
            word = F.when(
                widx <= F.size("dv"), F.element_at(F.col("dv"), widx)
            ).otherwise(F.lit(0).cast("long"))
            # call_function: the PySpark shiftleft wrapper wants a
            # literal bit count; the SQL function takes any expression
            bit = F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("_sg_pos") % 64).cast("int")
            )
            deleted = F.col("dv").isNotNull() & (word.bitwiseAND(bit) != 0)
            df = (
                df.withColumn("_sg_rel", rel_path)
                .join(dv_df, "_sg_rel", "left")
                .filter(~deleted)
                .drop("_sg_rel", "dv")
            )
        if with_lineage:
            # resolve synthesized lineage: one tiny broadcast map of
            # (file -> first_row_id, sequence_number) — O(candidate
            # files), the same cardinality the planner already holds.
            # NULL materialized values fall back to synthesis per the v3
            # rule; files predating lineage enablement (first_row_id
            # None) resolve to NULL ids, surfacing the missing backfill
            # instead of inventing ids.
            lmap = self.spark.createDataFrame(
                [
                    (f.path, f.first_row_id, f.sequence_number)
                    for f in cand
                ],
                "_sg_rel string, _sg_frid long, _sg_seq long",
            )
            df = (
                df.withColumn("_sg_rel", rel_path)
                .join(F.broadcast(lmap), "_sg_rel", "left")
                .withColumn(
                    ROW_ID,
                    F.coalesce(
                        F.col(ROW_ID), F.col("_sg_frid") + F.col("_sg_pos")
                    ),
                )
                .withColumn(
                    LAST_UPDATED_SEQ,
                    F.coalesce(F.col(LAST_UPDATED_SEQ), F.col("_sg_seq")),
                )
                .drop("_sg_rel", "_sg_frid", "_sg_seq")
            )
        if with_position:
            df = (
                df.withColumn("_file", rel_path)
                .withColumnRenamed("_sg_pos", "_pos")
                .drop("_sg_fp")
            )
        elif need_meta:
            df = df.drop("_sg_fp", "_sg_pos")
        # re-apply the prune predicates as row filters so results are exact
        if sources is not None:
            df = df.filter(F.col("source").isin(sources))
        if doc_id_range is not None:
            df = df.filter(F.col("doc_id").between(*doc_id_range))
        if n_tok_range is not None:
            df = df.filter(F.col("n_tok").between(*n_tok_range))
        for c, v in (eq or {}).items():
            df = df.filter(F.col(c) == F.lit(v))
        return df

    # ----------------------------------------------------------------- write
    def write_data_files(
        self,
        df: DataFrame,
        max_records_per_file: int | None = None,
    ) -> list[DataFile]:
        """Write ``df`` (already partitioned/sorted as the caller wants —
        one task produces one file) into an immutable commit directory and
        return stats-annotated DataFile entries. Does NOT commit.

        A frame carrying the row-lineage columns (a rewrite of a
        ``scan(with_lineage=True)`` read) materializes them into the
        files and the returned entries are flagged ``lineage_cols`` so
        later scans read them back."""
        lineage = ROW_ID in df.columns
        if lineage and LAST_UPDATED_SEQ not in df.columns:
            raise ValueError(
                f"frame has {ROW_ID} but not {LAST_UPDATED_SEQ}; "
                "materialize both lineage columns or neither"
            )
        if lineage and not self.row_lineage:
            raise ValueError(
                "frame carries row-lineage columns but the table does not "
                "track row lineage"
            )
        commit_dir = f"data/{uuid.uuid4().hex[:16]}"
        out_dir = self.abs_path(commit_dir)
        writer = df.write.mode("errorifexists")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
        writer.parquet(out_dir)
        paths = [
            os.path.join(out_dir, name)
            for name in self.io.list(out_dir)
            if name.endswith(".parquet")
        ]
        stats = collect_file_stats(
            self.spark, paths, self.metadata.get("stats_columns", STATS_COLUMNS)
        )
        # GC zero-record files instead of registering them — mirrors the
        # reference's empty-file cleanup (writers/parquet/parquet.go:223-226)
        for s in stats:
            if s["record_count"] == 0:
                self.io.delete(s["path"])
        return self._entries_from_stats(stats, lineage_cols=lineage)

    def _entries_from_stats(
        self, stats: list[dict], lineage_cols: bool = False
    ) -> list[DataFile]:
        """Stats dicts (collect_file_stats) -> manifest entries under the
        CURRENT spec/schema: identity-partition purity from the spec
        column's min/max, non-string values rendered as strings
        (manifests type `partition` as string everywhere — JSON shards
        and manifest_df's entries frame)."""
        out = []
        pc = self.partition_col
        for s in stats:
            if s["record_count"] == 0:
                continue
            st = s["stats"]
            src = st.get(pc, {})
            partition = (
                src.get("min") if src and src.get("min") == src.get("max") else None
            )
            if partition is not None and not isinstance(partition, str):
                partition = str(partition)
            out.append(
                DataFile(
                    path=os.path.relpath(s["path"], self.root),
                    record_count=s["record_count"],
                    file_size_bytes=s["file_size_bytes"],
                    partition=partition,
                    stats=st,
                    schema_id=self.metadata["current_schema_id"],
                    spec_col=pc,
                    lineage_cols=lineage_cols,
                )
            )
        return out

    def write_delete_files(
        self,
        df: DataFrame,
        content: str,
        stats_cols: list[str] | None = None,
    ) -> list[DataFile]:
        """Write a merge-on-read DELETE payload (equality keys or
        (file_path, pos) rows) into an immutable commit directory under
        data/ — orphan GC's parquet sweep then covers uncommitted delete
        files for free. Returns entries marked with ``content``; does
        NOT commit (pass as ``commit(added_deletes=...)``)."""
        if content not in (CONTENT_EQ_DELETES, CONTENT_POS_DELETES, CONTENT_DV):
            raise ValueError(f"unknown delete content kind {content!r}")
        if stats_cols is None:
            stats_cols = (
                ["doc_id", "_olake_id"]
                if content == CONTENT_EQ_DELETES
                else ["file_path"]
            )
        commit_dir = f"data/{uuid.uuid4().hex[:16]}"
        out_dir = self.abs_path(commit_dir)
        df.write.mode("errorifexists").parquet(out_dir)
        paths = [
            os.path.join(out_dir, name)
            for name in self.io.list(out_dir)
            if name.endswith(".parquet")
        ]
        stats = collect_file_stats(self.spark, paths, stats_cols)
        for s in stats:
            if s["record_count"] == 0:
                self.io.delete(s["path"])
        return [
            DataFile(
                path=os.path.relpath(s["path"], self.root),
                record_count=s["record_count"],
                file_size_bytes=s["file_size_bytes"],
                stats=s["stats"],
                content=content,
            )
            for s in stats
            if s["record_count"] > 0
        ]

    # ---------------------------------------------------------------- commit
    def commit(
        self,
        operation: str,
        added: list[DataFile] | None = None,
        removed_paths: set[str] | None = None,
        new_schema: T.StructType | None = None,
        summary_extra: dict | None = None,
        branch: str | None = None,
        added_deletes: list[DataFile] | None = None,
        removed_delete_paths: set[str] | None = None,
        metadata_extra: dict | None = None,
    ) -> int:
        """Create snapshot N+1 = parent snapshot ± files, atomically.

        Untouched manifests are referenced as-is; manifests containing a
        removed file are rewritten without it; added files go into fresh
        manifests of <= MANIFEST_MAX_ENTRIES entries.

        ``branch``: commit on top of that branch's HEAD instead of the
        current snapshot — the Iceberg write-audit-publish shape: stage
        writes on an audit branch (readers of the table see nothing),
        validate via ``scan(ref=branch)``, then ``fast_forward(branch)``
        to publish. The branch ref advances; current_snapshot_id does
        NOT move. expire_snapshots pins the branch's whole parent
        lineage down to the current snapshot, so staged intermediates
        survive routine expiry until the branch ref is removed.

        ``added_deletes`` / ``removed_delete_paths``: merge-on-read
        DELETE files (Iceberg v2) tracked in separate delete manifests
        with the same carry-over/rewrite rules as data manifests. Every
        added entry (data and delete) gets ``sequence_number`` = the new
        snapshot id — monotone in commit order, the ordinal that decides
        which deletes apply to which data files at scan time."""
        added = added or []
        removed_paths = removed_paths or set()
        added_deletes = added_deletes or []
        removed_delete_paths = removed_delete_paths or set()
        # optimistic concurrency: fail if someone advanced VERSION
        disk_version = int(
            self.io.get_text(os.path.join(self.root, "VERSION")).strip()
        )
        if disk_version != self.version:
            raise CommitConflict(
                f"table at version {disk_version}, loaded at {self.version}"
            )

        if branch is not None:
            ref = self.metadata.get("refs", {}).get(branch)
            if ref is None or ref.get("type") != "branch":
                raise KeyError(f"branch {branch!r} not found")
            parent = self.snapshot(ref["snapshot_id"])
        else:
            parent = self.snapshot()

        # max+1, NOT parent+1: after rollback_to() the parent may be an
        # old snapshot while higher ids still exist in the log — new ids
        # must stay unique (Iceberg uses random longs for the same reason)
        all_ids = [d["snapshot_id"] for d in self.metadata["snapshots"]]
        snap_id = (max(all_ids) + 1) if all_ids else 1
        # sequence numbers assigned at commit, before manifests are
        # written — a retry after a lost commit race re-enters here and
        # re-stamps against the fresh snap_id
        for e in added:
            e.sequence_number = snap_id
        for e in added_deletes:
            e.sequence_number = snap_id
        # row lineage (Iceberg v3): every new data file claims a block of
        # ``record_count`` fresh row ids from the table's next-row-id
        # counter — pure metadata, assigned at commit like sequence
        # numbers (and like them re-stamped on a conflict retry, when the
        # refreshed metadata carries the concurrent winner's counter).
        # Blocks are claimed even for files whose rows all carry
        # materialized ids (rewrites): id waste is bounded and the rule
        # stays O(1) per file, exactly the spec's trade.
        next_rid = None
        if self.metadata.get("row_lineage"):
            next_rid = int(self.metadata.get("next_row_id", 0))
            for e in added:
                if e.content == CONTENT_DATA:
                    e.first_row_id = next_rid
                    next_rid += e.record_count

        new_manifests: list[str] = []
        removed_rows = removed_files = removed_bytes = 0
        if parent is not None:
            for m in parent.manifests:
                entries = self._read_manifest(m)
                hit = [e for e in entries if e.path in removed_paths]
                if not hit:
                    new_manifests.append(m)
                    continue
                removed_rows += sum(e.record_count for e in hit)
                removed_files += len(hit)
                removed_bytes += sum(e.file_size_bytes for e in hit)
                survivors = [e for e in entries if e.path not in removed_paths]
                if survivors:
                    new_manifests.append(self._write_manifest(survivors))

        for i in range(0, len(added), MANIFEST_MAX_ENTRIES):
            new_manifests.append(
                self._write_manifest(added[i : i + MANIFEST_MAX_ENTRIES])
            )

        # delete manifests: identical carry-over/rewrite discipline
        new_delete_manifests: list[str] = []
        if parent is not None:
            for m in parent.delete_manifests:
                entries = self._read_manifest(m)
                survivors = [
                    e for e in entries if e.path not in removed_delete_paths
                ]
                if len(survivors) == len(entries):
                    new_delete_manifests.append(m)
                elif survivors:
                    new_delete_manifests.append(self._write_manifest(survivors))
        for i in range(0, len(added_deletes), MANIFEST_MAX_ENTRIES):
            new_delete_manifests.append(
                self._write_manifest(added_deletes[i : i + MANIFEST_MAX_ENTRIES])
            )
        # in-memory mutations below must roll back if the version claim
        # loses a concurrent-commit race, so a retry sees clean state
        metadata_backup = json.dumps(self.metadata)
        if metadata_extra:
            self.metadata.update(metadata_extra)
        if next_rid is not None:
            self.metadata["next_row_id"] = next_rid
        schema_id = self.metadata["current_schema_id"]
        if new_schema is not None:
            schema_id += 1
            self.metadata["schemas"][str(schema_id)] = new_schema.json()
            self.metadata["current_schema_id"] = schema_id

        # totals as PARENT-SUMMARY DELTAS — O(churn), never an O(table)
        # re-walk of every manifest per commit (removed_* were tallied
        # from only the touched shards above). Tables whose parent
        # predates total-bytes in summaries fall back to the full walk
        # once; their next commit is delta-priced again.
        pt = parent.summary if parent is not None else {}
        if parent is None or all(
            k in pt for k in ("total-rows", "total-files", "total-bytes")
        ):
            total_rows = (
                pt.get("total-rows", 0)
                + sum(f.record_count for f in added)
                - removed_rows
            )
            total_files = pt.get("total-files", 0) + len(added) - removed_files
            total_bytes = (
                pt.get("total-bytes", 0)
                + sum(f.file_size_bytes for f in added)
                - removed_bytes
            )
        else:
            total_rows = total_files = total_bytes = 0
            for m in new_manifests:
                for e in self._read_manifest(m):
                    total_rows += e.record_count
                    total_files += 1
                    total_bytes += e.file_size_bytes
        summary = {
            "added-files": len(added),
            "removed-files": len(removed_paths),
            "added-rows": sum(f.record_count for f in added),
            "removed-rows": removed_rows,
            "total-files": total_files,
            "total-rows": total_rows,
            "total-bytes": total_bytes,
            **(summary_extra or {}),
        }
        if added_deletes or removed_delete_paths or (
            parent is not None and parent.delete_manifests
        ):
            summary["added-delete-files"] = len(added_deletes)
            summary["removed-delete-files"] = len(removed_delete_paths)
            summary["total-delete-files"] = sum(
                len(self._read_manifest(m)) for m in new_delete_manifests
            )
        snap = Snapshot(
            snapshot_id=snap_id,
            parent_id=parent.snapshot_id if parent else None,
            timestamp_ms=int(time.time() * 1000),
            operation=operation,
            manifests=new_manifests,
            summary=summary,
            schema_id=schema_id,
            delete_manifests=new_delete_manifests,
        )
        self.metadata["snapshots"].append(snap.to_dict())
        if branch is None:
            self.metadata["current_snapshot_id"] = snap_id
            # a MAIN commit advances branch heads that tracked the parent
            # (tags stay put) — the main-following contract
            if parent is not None:
                for ref in self.metadata.get("refs", {}).values():
                    if (
                        ref.get("type") == "branch"
                        and ref["snapshot_id"] == parent.snapshot_id
                    ):
                        ref["snapshot_id"] = snap_id
        else:
            # an explicit branch commit advances ONLY the named branch —
            # a sibling WAP branch staged from the same base must NOT be
            # dragged onto this branch's unaudited snapshot
            self.metadata["refs"][branch]["snapshot_id"] = snap_id
        self.metadata["last_updated_ms"] = int(time.time() * 1000)

        new_version = self.version + 1
        try:
            self._claim_version(new_version)
        except CommitConflict:
            self.metadata = json.loads(metadata_backup)
            raise
        self.io.put_text(os.path.join(self.root, "VERSION"), str(new_version))
        self.version = new_version
        return snap_id

    def replace_manifests(
        self,
        new_manifests: list[str],
        operation: str = "rewrite-manifests",
        summary_extra: dict | None = None,
        metadata_extra: dict | None = None,
    ) -> int:
        """Metadata-only commit: snapshot N+1 tracks the SAME file set
        through a new manifest-shard layout (Iceberg's rewriteManifests).
        The version claim makes it safe against concurrent data commits:
        if anyone added/removed files after this table was loaded, the
        claim fails with CommitConflict and the caller re-plans against
        the fresh state — the new shards are then unreferenced and the
        caller deletes them. Totals carry over from the parent summary
        (the file set is unchanged by contract)."""
        disk_version = int(
            self.io.get_text(os.path.join(self.root, "VERSION")).strip()
        )
        if disk_version != self.version:
            raise CommitConflict(
                f"table at version {disk_version}, loaded at {self.version}"
            )
        parent = self.snapshot()
        if parent is None:
            raise ValueError("cannot rewrite manifests of an empty table")
        all_ids = [d["snapshot_id"] for d in self.metadata["snapshots"]]
        snap_id = max(all_ids) + 1
        summary = dict(parent.summary)
        summary.update(
            {
                "added-files": 0,
                "removed-files": 0,
                "added-rows": 0,
                "removed-rows": 0,
                "rewritten-manifests": len(parent.manifests),
                "new-manifests": len(new_manifests),
                **(summary_extra or {}),
            }
        )
        snap = Snapshot(
            snapshot_id=snap_id,
            parent_id=parent.snapshot_id,
            timestamp_ms=int(time.time() * 1000),
            operation=operation,
            manifests=list(new_manifests),
            summary=summary,
            schema_id=parent.schema_id,
            delete_manifests=list(parent.delete_manifests),
        )
        metadata_backup = json.dumps(self.metadata)
        if metadata_extra:
            self.metadata.update(metadata_extra)
        self.metadata["snapshots"].append(snap.to_dict())
        self.metadata["current_snapshot_id"] = snap_id
        for ref in self.metadata.get("refs", {}).values():
            if (
                ref.get("type") == "branch"
                and ref["snapshot_id"] == parent.snapshot_id
            ):
                ref["snapshot_id"] = snap_id
        self.metadata["last_updated_ms"] = int(time.time() * 1000)
        new_version = self.version + 1
        try:
            self._claim_version(new_version)
        except CommitConflict:
            self.metadata = json.loads(metadata_backup)
            raise
        self.io.put_text(os.path.join(self.root, "VERSION"), str(new_version))
        self.version = new_version
        return snap_id

    def _claim_version(self, new_version: int) -> None:
        """Conditional-create metadata v<N+1> — exactly ONE writer can
        claim a given version (the commit-conflict primitive: hard-link
        locally, If-None-Match conditional PUT on an object store). A
        plain overwrite-publish would let two committers who both
        observed version N both 'succeed' and lose one commit."""
        try:
            self.io.create_json(
                os.path.join(self.root, "metadata", f"v{new_version}.json"),
                self.metadata,
            )
        except FileExistsError:
            raise CommitConflict(
                f"metadata version already claimed: v{new_version}"
            ) from None

    def rewrite_metadata(self) -> int:
        """Persist in-place metadata edits (e.g. snapshot-log pruning by
        expiry) as a new metadata version WITHOUT creating a snapshot."""
        disk_version = int(
            self.io.get_text(os.path.join(self.root, "VERSION")).strip()
        )
        if disk_version != self.version:
            raise CommitConflict(
                f"table at version {disk_version}, loaded at {self.version}"
            )
        self.metadata["last_updated_ms"] = int(time.time() * 1000)
        new_version = self.version + 1
        self._claim_version(new_version)
        self.io.put_text(os.path.join(self.root, "VERSION"), str(new_version))
        self.version = new_version
        return new_version

    def _write_manifest(self, entries: list[DataFile]) -> str:
        rel = f"manifests/manifest-{uuid.uuid4().hex[:16]}.json"
        self.io.put_json(
            os.path.join(self.root, rel), [e.to_dict() for e in entries]
        )
        self._manifest_cache[rel] = list(entries)
        return rel

    # ------------------------------------------------------------ convenience
    def _complete_system_columns(self, df: DataFrame) -> DataFrame:
        """Inject any system column the TABLE schema declares but the
        incoming frame lacks. Without this, appending a bare payload
        frame wrote files whose ``_olake_id`` reads back NULL — and a
        later MERGE silently matched nothing against them."""
        from olake_spark.schema import (
            CDC_DELETED_AT,
            OLAKE_ID,
            OLAKE_INSERT_TIME,
            olake_id_expr,
        )

        table_cols = {f.name for f in self.schema().fields}
        out = df
        if OLAKE_ID in table_cols and OLAKE_ID not in df.columns:
            if "doc_id" not in df.columns:
                raise ValueError(
                    f"frame lacks {OLAKE_ID} and has no doc_id to derive "
                    "it from; inject system columns explicitly"
                )
            out = out.withColumn(OLAKE_ID, olake_id_expr("doc_id"))
        if OLAKE_INSERT_TIME in table_cols and OLAKE_INSERT_TIME not in out.columns:
            out = out.withColumn(
                OLAKE_INSERT_TIME,
                (F.unix_micros(F.current_timestamp()) / 1000).cast("long"),
            )
        if CDC_DELETED_AT in table_cols and CDC_DELETED_AT not in out.columns:
            out = out.withColumn(
                CDC_DELETED_AT, F.lit(None).cast("timestamp")
            )
        tr = self.partition_transform
        if (
            tr is not None
            and BUCKET_COL in table_cols
            and BUCKET_COL not in out.columns
        ):
            if tr["source"] not in out.columns:
                raise ValueError(
                    f"bucket source column {tr['source']!r} missing from "
                    "the frame; cannot derive the bucket id"
                )
            out = out.withColumn(
                BUCKET_COL, bucket_value_expr(tr["source"], tr["n"])
            )
        return out

    _MAX_IDENTITY_PARTITIONS = 4096

    def _distribute(self, df: DataFrame, mode: str | None) -> DataFrame:
        """Pre-write distribution (Iceberg write.distribution-mode):

        - None: caller's layout, written as-is.
        - 'partition': route every row of one identity-partition value
          to one task (exact bin routing, single shuffle) so ALL output
          files are partition-pure and identity pruning applies to every
          scan. Value cardinality is collected driver-side and must stay
          <= _MAX_IDENTITY_PARTITIONS — identity partitions are
          low-cardinality by design; date-derived high-cardinality
          routing belongs to partition_regex. A hot value is one task
          (use max_records_per_file to split its files); salting hot
          partitions across tasks would break file purity.

        The planning pass (distinct partition values) evaluates the
        input an extra time — persist an expensive upstream frame
        before a distributed write. The partition column must already
        be present in the caller's frame: a system column stamped at
        write time (current_timestamp-derived) takes different values
        in the planning pass and the write pass, which would silently
        collapse the routing, so that case is rejected.
        """
        if mode is None:
            return df
        if mode != "partition":
            raise ValueError(f"unknown distribution mode {mode!r}")
        pc = self.partition_col
        from olake_spark.functions.partitioning import exact_range_partition

        # boundaries are the SPARK string rendering of the values,
        # sorted lexicographically — bin_expr compares the string-cast
        # key byte-wise, so a native-order sort of numeric values
        # (e.g. [2, 10]) would be unsorted under string comparison and
        # collapse distinct values into one bin
        key = F.col(pc).cast("string")
        tr = self.partition_transform
        if tr is not None and pc == BUCKET_COL:
            # bucket domain is closed [0, n): route exactly with ZERO
            # planning scan (the identity path below pays a distinct
            # job to learn its values; buckets are known a priori).
            # Lexicographic order of the rendered ids is fine — bin
            # routing only needs boundaries sorted in the key's own
            # comparison order, which string-cast keys satisfy.
            vals = sorted(str(i) for i in range(tr["n"]))
        else:
            vals = sorted(
                r[0] for r in df.select(key.alias("_k")).distinct().collect()
                if r[0] is not None
            )
        if len(vals) > self._MAX_IDENTITY_PARTITIONS:
            raise ValueError(
                f"{len(vals)} distinct {pc!r} values exceeds "
                f"{self._MAX_IDENTITY_PARTITIONS}; use partition_regex "
                "path routing for high-cardinality partitioning"
            )
        # NULLs get their own bin BELOW every real value. '' is the
        # lexicographic minimum, so no bare sentinel can sort under a
        # genuine empty-string value — instead every real key gets a
        # \x01 prefix (order-preserving under a common prefix) and NULL
        # routes as \x00, strictly below all of them
        routed = F.when(key.isNull(), F.lit("\x00")).otherwise(
            F.concat(F.lit("\x01"), key)
        )
        return exact_range_partition(
            df, routed, ["\x01" + v for v in vals], [pc]
        )

    def append(
        self,
        df: DataFrame,
        max_records_per_file: int | None = None,
        distribute: str | None = None,
        branch: str | None = None,
    ) -> int:
        self._check_distribute_input(df, distribute)
        files = self.write_data_files(
            self._distribute(
                self.align_to_schema(self._complete_system_columns(df)),
                distribute,
            ),
            max_records_per_file,
        )
        return self.commit("append", added=files, branch=branch)

    def align_to_schema(self, df: DataFrame) -> DataFrame:
        """Refuse frames whose columns don't match the CURRENT schema —
        the file is stamped with the current schema_id, so a stale-named
        frame (e.g. built before a rename_column) would claim one schema
        while physically holding another, and every read of it would
        silently null-fill the mismatched columns. Matching frames are
        re-ordered to schema order so files stay uniform on disk."""
        want = [f.name for f in self.schema().fields]
        got = df.columns
        missing = [c for c in want if c not in got]
        extra = [c for c in got if c not in want]
        if missing or extra:
            raise ValueError(
                f"frame columns do not match the table schema: "
                f"missing {missing}, unexpected {extra} (table columns: "
                f"{want}); after a rename_column, rename the frame's "
                "columns too — after add_column/drop_column, add or drop "
                "them in the frame"
            )
        types = {f.name: f.dataType.simpleString() for f in self.schema().fields}
        for f in df.schema.fields:
            if f.dataType.simpleString() != types[f.name]:
                raise ValueError(
                    f"frame column {f.name!r} is "
                    f"{f.dataType.simpleString()} but the table schema "
                    f"says {types[f.name]}"
                )
        return df.select(*want)

    def fast_forward(self, branch: str) -> int:
        """Publish a branch: move current to the branch HEAD, allowed
        only when current is an ancestor of it (a true fast-forward —
        no published history is abandoned). The write-audit-publish
        'publish' step; use rollback_to/set_current_snapshot for
        non-fast-forward repointing.

        The ancestry walk is STRICT — no expired-gap heuristic: an
        id-ordering rule could bless a non-ancestor sibling and
        silently abandon published rows. It doesn't need one, because
        expire_snapshots pins every branch's parent LINEAGE down to the
        current snapshot (operators/expire.py), so the head -> current
        chain of a publishable branch cannot break."""
        ref = self.metadata.get("refs", {}).get(branch)
        if ref is None or ref.get("type") != "branch":
            raise KeyError(f"branch {branch!r} not found")
        head = ref["snapshot_id"]
        cur_id = self.current_snapshot_id
        node = self.snapshot(head)
        found = False
        seen: set[int] = set()
        while node is not None and node.snapshot_id not in seen:
            if node.snapshot_id == cur_id:
                found = True
                break
            seen.add(node.snapshot_id)
            if node.parent_id is None:
                break
            try:
                node = self.snapshot(node.parent_id)
            except KeyError:
                break
        if cur_id is not None and not found:
            raise ValueError(
                f"current snapshot {cur_id} is not an ancestor of branch "
                f"{branch!r} head {head}; not a fast-forward"
            )
        self._persist_mutation(
            lambda: self.metadata.__setitem__("current_snapshot_id", head)
        )
        return head

    def _is_ancestor_of_current(self, snapshot_id: int) -> bool:
        node = self.snapshot()
        seen: set[int] = set()
        while node is not None and node.snapshot_id not in seen:
            if node.snapshot_id == snapshot_id:
                return True
            seen.add(node.snapshot_id)
            if node.parent_id is None:
                return False
            try:
                node = self.snapshot(node.parent_id)
            except KeyError:
                return False
        return False

    def cherry_pick(self, snapshot_id: int) -> int:
        """Replay a staged APPEND snapshot's added files onto the
        CURRENT snapshot as a fresh commit (Iceberg cherrypickSnapshot)
        — the write-audit-publish tool when ``fast_forward`` is
        impossible because main advanced after the audit branch was
        staged.

        Only pure appends are cherry-pickable: a snapshot that removed
        files or touched delete files was planned against ITS parent's
        state, and replaying the removal onto a diverged current could
        drop rows a later commit still references (Iceberg carries the
        same restriction). The added entries are copied and re-stamped
        with the new commit's sequence number, so equality deletes that
        landed meanwhile correctly do NOT apply to the replayed rows.

        Double-publish protection: refused when the target is already
        an ancestor of current, or when any of its added file PATHS is
        still referenced by the current snapshot (exact while the files
        live; a cherry-pick of rows that were later compacted away is
        indistinguishable from a fresh append and is the caller's
        responsibility, as with Iceberg's wap.id dedupe). The path
        check is O(batch) via the distributed entries frame past
        SCAN_DISTRIBUTED_MIN_SHARDS, a driver file walk below it."""
        snap = self.snapshot(snapshot_id)
        parent = (
            self.snapshot(snap.parent_id)
            if snap.parent_id is not None
            else None
        )
        added, removed = snapshot_file_delta(self, parent, snap)
        true_added = [e for p, e in added.items() if p not in removed]
        true_removed = [p for p in removed if p not in added]
        if snap.operation != "append" or true_removed:
            raise ValueError(
                f"snapshot {snapshot_id} ({snap.operation}) is not a pure "
                "append; only append snapshots can be cherry-picked"
            )
        parent_dm = set(parent.delete_manifests) if parent else set()
        if set(snap.delete_manifests) != parent_dm:
            raise ValueError(
                f"snapshot {snapshot_id} changed delete files; not "
                "cherry-pickable"
            )
        if self._is_ancestor_of_current(snapshot_id):
            raise ValueError(
                f"snapshot {snapshot_id} is already an ancestor of the "
                "current snapshot"
            )
        cur = self.snapshot()
        if cur is not None and true_added:
            batch_paths = {e.path for e in true_added}
            if (
                len(cur.manifests) >= SCAN_DISTRIBUTED_MIN_SHARDS
                and self.spark is not None
            ):
                from olake_spark.table.manifest_df import (
                    entries_from_manifests,
                )

                dup = (
                    entries_from_manifests(self, cur.manifests)
                    .where(F.col("path").isin(sorted(batch_paths)))
                    .limit(1)
                    .count()
                    > 0
                )
            else:
                dup = any(f.path in batch_paths for f in self.files())
            if dup:
                raise ValueError(
                    f"snapshot {snapshot_id} was already cherry-picked "
                    "onto this lineage (its files are still referenced)"
                )
        # deep-copy: commit() stamps sequence numbers on added entries,
        # and these objects are shared with the manifest cache
        entries = [DataFile.from_dict(e.to_dict()) for e in true_added]
        return self.commit(
            "cherrypick",
            added=entries,
            summary_extra={"cherry-picked-from": snapshot_id},
        )

    def add_files(self, paths: list[str]) -> int:
        """Register EXISTING parquet files as table data WITHOUT
        rewriting them (Iceberg's add_files import) — e.g. the output
        of a plain sync-writer run or a bulk copy landed next to the
        table.

        Files must already live under the table root: manifest paths
        are root-relative and the expire/orphan-GC machinery owns
        everything it references, so an outside path would either be
        unexpressible or deleted by a later expiry the table never
        should have owned. Column names must match the current schema
        exactly — a missing column would read back as NULL and silently
        corrupt system columns (``_olake_id``) that merges key on.
        Footer stats are collected and identity/bucket purity detected
        exactly as for engine-written files; zero-record files are
        skipped but NOT deleted (they are not ours until registered)."""
        if not paths:
            raise ValueError("no files to add")
        abs_paths = list(
            dict.fromkeys(os.path.abspath(p) for p in paths)
        )  # dedupe (overlapping CLI globs) or one path registers twice
        for ap in abs_paths:
            if not ap.startswith(self.root + os.sep):
                raise ValueError(
                    f"{ap!r} is outside the table root {self.root!r}; "
                    "copy it under the table before importing"
                )
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        want_fields = {f.name: f.dataType for f in self.schema().fields}
        for ap in abs_paths:
            file_schema = from_arrow_schema(
                pq.ParquetFile(ap).schema_arrow
            )
            got_fields = {f.name: f.dataType for f in file_schema.fields}
            if set(got_fields) != set(want_fields):
                raise ValueError(
                    f"{ap}: column names {sorted(got_fields)} do not "
                    f"match the table schema {sorted(want_fields)}"
                )
            # types too: a mismatched physical type passes the name
            # check but breaks (or silently nulls) every later scan,
            # which reads with the TABLE schema pinned
            for name, want_t in want_fields.items():
                got_t = got_fields[name]
                if got_t.simpleString() != want_t.simpleString():
                    raise ValueError(
                        f"{ap}: column {name!r} is {got_t.simpleString()}"
                        f" but the table schema says "
                        f"{want_t.simpleString()}"
                    )
        rels = {os.path.relpath(ap, self.root) for ap in abs_paths}
        already = rels & {f.path for f in self.files()}
        if already:
            raise ValueError(
                f"already registered: {sorted(already)[:5]}"
            )
        stats = collect_file_stats(
            self.spark, abs_paths,
            self.metadata.get("stats_columns", STATS_COLUMNS),
        )
        entries = self._entries_from_stats(stats)
        if not entries:
            raise ValueError("all candidate files are empty")
        return self.commit(
            "add-files",
            added=entries,
            summary_extra={"imported-files": len(entries)},
        )

    def _check_distribute_input(self, df: DataFrame, distribute: str | None) -> None:
        if distribute is None:
            return
        tr = self.partition_transform
        if tr is not None:
            # the bucket id is hash-derived from the source column —
            # deterministic across planning and write passes, so only
            # the SOURCE needs to be present
            if tr["source"] not in df.columns:
                raise ValueError(
                    f"distribute={distribute!r} on a bucket table requires "
                    f"source column {tr['source']!r} in the input frame"
                )
            return
        if self.partition_col not in df.columns:
            raise ValueError(
                f"distribute={distribute!r} requires partition column "
                f"{self.partition_col!r} in the input frame — an "
                "auto-injected system column is stamped at write time "
                "and takes different values in the planning pass and "
                "the write pass"
            )

    def overwrite(
        self,
        df: DataFrame,
        max_records_per_file: int | None = None,
        distribute: str | None = None,
    ) -> int:
        """Replace the table's entire contents with ``df`` in ONE atomic
        snapshot (full-refresh semantics: the reference re-syncs a stream
        from scratch rather than appending a second copy). Readers pinned
        to older snapshots still see the prior files until expiry."""
        self._check_distribute_input(df, distribute)
        files = self.write_data_files(
            self._distribute(
                self.align_to_schema(self._complete_system_columns(df)),
                distribute,
            ),
            max_records_per_file,
        )
        current = {f.path for f in self.files()}
        return self.commit(
            "overwrite",
            added=files,
            removed_paths=current,
            # full-refresh drops merge-on-read delete files with the data
            # they applied to
            removed_delete_paths={d.path for d in self.delete_files()},
        )

    def _summary_total(self, key: str, snapshot_id: int | None) -> int | None:
        snap = self.snapshot(snapshot_id)
        if snap is None:
            return 0
        v = snap.summary.get(key)
        return int(v) if v is not None else None

    def total_bytes(self, snapshot_id: int | None = None) -> int:
        """Table size from the snapshot SUMMARY (O(1), recorded at
        commit); falls back to a manifest sum for snapshots written
        before summaries carried total-bytes."""
        v = self._summary_total("total-bytes", snapshot_id)
        if v is None:
            v = sum(f.file_size_bytes for f in self.files(snapshot_id))
        return v

    def total_rows(self, snapshot_id: int | None = None) -> int:
        v = self._summary_total("total-rows", snapshot_id)
        if v is None:
            v = sum(f.record_count for f in self.files(snapshot_id))
        return v

    def total_files(self, snapshot_id: int | None = None) -> int:
        v = self._summary_total("total-files", snapshot_id)
        if v is None:
            v = len(self.files(snapshot_id))
        return v
