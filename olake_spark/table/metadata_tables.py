"""Queryable metadata tables (Iceberg's ``table$snapshots`` family).

The reference exposes sync state only through its stats file
(/root/reference/utils/telemetry.go and the per-stream ``stats.json``);
an Iceberg-shaped table layer owes users the standard inspection
surface instead: ``snapshots``, ``history``, ``refs``, ``files``,
``delete_files``, ``manifests``, and ``partitions`` as DataFrames that
compose with the rest of the SQL surface (join the files table against
a query plan, chart snapshot growth, audit branch heads...).

Two layers:

- Pure-Python row builders (``*_rows``) over a loaded :class:`Table` —
  no SparkSession needed, picklable inputs, so the ``olake`` Python
  data source (sources/datasource.py) reuses them verbatim inside
  executor-side ``read()``.
- :func:`metadata_df` — the DataFrame entry point. Every kind is
  O(snapshots)/O(refs)/O(shards) driver work EXCEPT ``files`` /
  ``delete_files`` / ``partitions``, which route through the
  distributed manifest parse (`manifest_df.manifest_entries_df`) so a
  10^6-file table never materializes its file list on the driver:
  ``files`` stays a lazy frame, ``partitions`` is a groupBy over it.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.table.format import Snapshot, Table

METADATA_KINDS = (
    "snapshots",
    "history",
    "refs",
    "files",
    "delete_files",
    "manifests",
    "partitions",
    "schemas",
)

SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("committed_at", T.TimestampType()),
        T.StructField("operation", T.StringType()),
        T.StructField("schema_id", T.IntegerType()),
        T.StructField("manifest_count", T.IntegerType()),
        T.StructField("delete_manifest_count", T.IntegerType()),
        T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
    ]
)

HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("made_current_at", T.TimestampType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("is_current_ancestor", T.BooleanType()),
    ]
)

REFS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
    ]
)

FILES_SCHEMA = T.StructType(
    [
        T.StructField("content", T.StringType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("file_size_in_bytes", T.LongType()),
        T.StructField("partition", T.StringType()),
        T.StructField("spec_col", T.StringType()),
        T.StructField("schema_id", T.IntegerType()),
        T.StructField("sequence_number", T.LongType()),
        T.StructField("lower_bounds", T.MapType(T.StringType(), T.StringType())),
        T.StructField("upper_bounds", T.MapType(T.StringType(), T.StringType())),
        T.StructField("null_counts", T.MapType(T.StringType(), T.LongType())),
        T.StructField("first_row_id", T.LongType()),
        T.StructField("lineage_cols", T.BooleanType()),
    ]
)

MANIFESTS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("kind", T.StringType()),  # data | delete
        T.StructField("length", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
    ]
)

PARTITIONS_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.StringType()),
        T.StructField("spec_col", T.StringType()),
        T.StructField("file_count", T.LongType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("total_size_in_bytes", T.LongType()),
    ]
)


def _ts(ms: int) -> datetime.datetime:
    return datetime.datetime.fromtimestamp(ms / 1000.0)


def snapshot_rows(table: Table) -> list[tuple]:
    return [
        (
            s.snapshot_id,
            s.parent_id,
            _ts(s.timestamp_ms),
            s.operation,
            s.schema_id,
            len(s.manifests),
            len(s.delete_manifests),
            {k: str(v) for k, v in (s.summary or {}).items()},
        )
        for s in table.snapshots()
    ]


def history_rows(table: Table) -> list[tuple]:
    """Snapshot log with Iceberg's ``is_current_ancestor`` flag: True on
    the parent chain of the current snapshot (rollback leaves abandoned
    lines with False — exactly how you spot them)."""
    ancestors: set[int] = set()
    sid = table.current_snapshot_id
    by_id = {s.snapshot_id: s for s in table.snapshots()}
    while sid is not None and sid in by_id:
        ancestors.add(sid)
        sid = by_id[sid].parent_id
    return [
        (
            _ts(s.timestamp_ms),
            s.snapshot_id,
            s.parent_id,
            s.snapshot_id in ancestors,
        )
        for s in table.snapshots()
    ]


def refs_rows(table: Table) -> list[tuple]:
    out = [
        (name, r.get("type", "tag"), r["snapshot_id"])
        for name, r in sorted(table.refs.items())
    ]
    cur = table.current_snapshot_id
    if cur is not None:
        out.append(("main", "branch", cur))
    return out


SCHEMAS_SCHEMA = T.StructType(
    [
        T.StructField("schema_id", T.IntegerType()),
        T.StructField("is_current", T.BooleanType()),
        T.StructField("field_id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
    ]
)


def schemas_rows(table: Table) -> list[tuple]:
    """One row per (schema version, field) with the field id — the DDL
    audit surface: renames show as the same field_id under a new name,
    drop+re-add as two distinct ids sharing a name across versions."""
    cur = table.metadata["current_schema_id"]
    out = []
    for s in sorted(int(k) for k in table.metadata["schemas"]):
        ids = table._field_ids(s)
        for f in table.schema(s).fields:
            out.append(
                (s, s == cur, ids[f.name], f.name, f.dataType.simpleString())
            )
    return out


def manifests_rows(table: Table, snapshot_id: int | None = None) -> list[tuple]:
    snap = table.snapshot(snapshot_id)
    if snap is None:
        return []
    out = []
    for kind, rels in (("data", snap.manifests), ("delete", snap.delete_manifests)):
        for rel in rels:
            out.append(
                (rel, kind, table.io.size(table.abs_path(rel)), snap.snapshot_id)
            )
    return out


def file_entry_row(d: dict, content_default: str = "data") -> tuple:
    """FILES_SCHEMA row from one raw manifest-entry dict (the JSON shard
    element) — shared by the driver path and the data source's
    executor-side shard parse."""
    stats = d.get("stats", {}) or {}
    return (
        d.get("content", content_default),
        d["path"],
        d["record_count"],
        d["file_size_bytes"],
        d.get("partition"),
        d.get("spec_col"),
        d.get("schema_id", 0),
        d.get("sequence_number", 0),
        {c: str(b["min"]) for c, b in stats.items() if b.get("min") is not None},
        {c: str(b["max"]) for c, b in stats.items() if b.get("max") is not None},
        {
            c: int(b["null_count"])
            for c, b in stats.items()
            if b.get("null_count") is not None
        },
        d.get("first_row_id"),
        bool(d.get("lineage_cols", False)),
    )


def files_rows(
    table: Table, manifests: list[str], content_default: str = "data"
) -> list[tuple]:
    out = []
    for rel in manifests:
        for d in table.io.get_json(os.path.join(table.root, rel)):
            out.append(file_entry_row(d, content_default))
    return out


def _entries_to_files_df(entries: DataFrame, content_default: str) -> DataFrame:
    """FILES_SCHEMA projection of a manifest_df entries frame; the stats
    JSON string becomes typed maps without leaving Catalyst."""
    bounds = F.from_json(
        "stats", "map<string, struct<min string, max string, null_count long>>"
    )
    return entries.select(
        # pre-upgrade manifest caches lack the content column (NULL)
        F.coalesce(F.col("content"), F.lit(content_default)).alias("content"),
        F.col("path").alias("file_path"),
        "record_count",
        F.col("file_size_bytes").alias("file_size_in_bytes"),
        "partition",
        "spec_col",
        "schema_id",
        "sequence_number",
        F.map_filter(
            F.transform_values(bounds, lambda _, v: v["min"]),
            lambda _, v: v.isNotNull(),
        ).alias("lower_bounds"),
        F.map_filter(
            F.transform_values(bounds, lambda _, v: v["max"]),
            lambda _, v: v.isNotNull(),
        ).alias("upper_bounds"),
        F.map_filter(
            F.transform_values(bounds, lambda _, v: v["null_count"]),
            lambda _, v: v.isNotNull(),
        ).alias("null_counts"),
        "first_row_id",
        F.coalesce(F.col("lineage_cols"), F.lit(False)).alias("lineage_cols"),
    )


def metadata_df(
    table: Table, kind: str, snapshot_id: int | None = None
) -> DataFrame:
    """One metadata table as a DataFrame. ``snapshot_id`` pins the
    file-level kinds (files/delete_files/manifests/partitions) to an old
    snapshot — time travel applies to metadata reads too."""
    spark = table.spark
    if spark is None:
        raise ValueError("metadata_df needs a Table loaded with a SparkSession")
    if kind == "snapshots":
        return spark.createDataFrame(snapshot_rows(table), SNAPSHOTS_SCHEMA)
    if kind == "history":
        return spark.createDataFrame(history_rows(table), HISTORY_SCHEMA)
    if kind == "refs":
        return spark.createDataFrame(refs_rows(table), REFS_SCHEMA)
    if kind == "schemas":
        return spark.createDataFrame(schemas_rows(table), SCHEMAS_SCHEMA)
    if kind == "manifests":
        return spark.createDataFrame(
            manifests_rows(table, snapshot_id), MANIFESTS_SCHEMA
        )
    if kind in ("files", "delete_files", "partitions"):
        from olake_spark.table.manifest_df import entries_from_manifests

        snap = table.snapshot(snapshot_id)
        if snap is None:
            base = spark.createDataFrame([], FILES_SCHEMA)
        else:
            rels = (
                snap.delete_manifests if kind == "delete_files" else snap.manifests
            )
            base = _entries_to_files_df(entries_from_manifests(table, rels), "data")
        if kind != "partitions":
            return base
        return (
            base.groupBy("partition", "spec_col")
            .agg(
                F.count("*").alias("file_count"),
                F.sum("record_count").alias("record_count"),
                F.sum("file_size_in_bytes").alias("total_size_in_bytes"),
            )
        )
    raise ValueError(f"unknown metadata kind {kind!r}; one of {METADATA_KINDS}")
