"""Distributed manifest planning for million-file tables.

``Table.load`` is O(snapshots) — it parses only ``metadata/v<N>.json``.
But ``Table.files()`` and the python prune inside ``Table.scan`` parse
every manifest shard ON THE DRIVER and materialize one object per data
file — O(table) work that at 10^6 files (~100 TB at 128 MB/file) costs
minutes of driver JSON time per planning pass. Iceberg's answer is Avro
manifests + distributed planning; this module is the same idea over the
engine's JSON/parquet manifests:

- :func:`manifest_entries_df` — one row per data file, parsed from the
  snapshot's manifest shards by EXECUTORS (``mapInPandas`` over the
  shard list; the driver touches only the O(shards) shard names, never
  the entries). Per-column stats stay a JSON string and are extracted
  per-predicate with ``get_json_object`` — no typed-map schema to keep
  in sync with stats_columns.
- :func:`write_manifest_cache` — a parquet rendition of one snapshot's
  entries, pointer-published: builders write into a unique
  ``<root>/manifest_cache/data-<uuid>`` directory and claim the
  per-snapshot pointer ``<root>/manifest_cache/<snapshot_id>.json``
  with a conditional create (exactly one build publishes; losers adopt
  the winner). Snapshots are immutable so the cache never invalidates.
  Repeated planning reads the columnar cache (footer-pruned to the
  predicate columns) instead of re-parsing JSON.
- :func:`prune_files_df` — the exact predicates of ``Table.scan``
  (identity-partition + min/max stats) as Catalyst filters over the
  entries frame.
- :func:`scan_planned` — distributed prune, collect ONLY the surviving
  (path, schema_id) rows, delegate to ``Table.scan(files=...)``. Driver
  memory and time are O(survivors), not O(table).

Parity contract (tests/test_manifest_df.py): for every predicate
combination, ``prune_files_df`` keeps exactly the paths the driver-side
``Table.scan`` prune keeps, and ``scan_planned`` returns the same rows
as ``Table.scan``.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olake_spark.table.format import DataFile, Table

ENTRY_SCHEMA = (
    "manifest string, path string, record_count long, "
    "file_size_bytes long, partition string, schema_id int, "
    "spec_col string, stats string, sequence_number long, "
    "content string, first_row_id long, lineage_cols boolean"
)


def _cache_pointer(table: Table, snapshot_id: int) -> str:
    return os.path.join(table.root, "manifest_cache", f"{snapshot_id}.json")


def _resolve_cache_dir(table: Table, snapshot_id: int) -> str | None:
    """Directory of a PUBLISHED cache for this snapshot, else None.
    Publication is pointer-based: writers build into a unique dir and
    claim the per-snapshot pointer with a conditional create, so two
    concurrent cache builds can never interleave parts into one
    directory (mode('overwrite') into a shared path would, especially
    with committer v2's task-side file placement)."""
    ptr = _cache_pointer(table, snapshot_id)
    try:
        d = os.path.join(table.root, table.io.get_json(ptr)["dir"])
    except (OSError, json.JSONDecodeError, KeyError):
        # pointer absent, mid-GC, or malformed — fall back to shard
        # parsing rather than crash the default scan path
        return None
    if table.io.exists(os.path.join(d, "_SUCCESS")):
        return d
    return None


def manifest_entries_df(
    table: Table,
    snapshot_id: int | None = None,
    use_cache: bool = True,
    shards_per_task: int = 8,
) -> DataFrame:
    """All data-file entries of one snapshot as a DataFrame.

    Reads the parquet cache when one exists for the snapshot, else
    parses the JSON shards in executors — one ``mapInPandas`` task per
    ``shards_per_task`` shards (a shard holds up to MANIFEST_MAX_ENTRIES
    entries, so the default batches ~40k entries per task)."""
    snap = table.snapshot(snapshot_id)
    spark = table.spark
    if snap is None:
        return spark.createDataFrame([], ENTRY_SCHEMA)
    if use_cache:
        cdir = _resolve_cache_dir(table, snap.snapshot_id)
        if cdir is not None:
            return spark.read.schema(ENTRY_SCHEMA).parquet(cdir)
    return entries_from_manifests(table, snap.manifests, shards_per_task)


def entries_from_manifests(
    table: Table, manifests: list[str], shards_per_task: int = 8
) -> DataFrame:
    """Entries frame for an arbitrary manifest-shard list (e.g. the
    union of every surviving snapshot's shards for orphan GC)."""
    spark = table.spark
    shards = [(m, table.abs_path(m)) for m in manifests]
    if not shards:
        return spark.createDataFrame([], ENTRY_SCHEMA)
    n_tasks = max(1, (len(shards) + shards_per_task - 1) // shards_per_task)
    shard_df = spark.createDataFrame(
        shards, "manifest string, abs_path string"
    ).repartition(n_tasks)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "manifest", "path", "record_count", "file_size_bytes",
            "partition", "schema_id", "spec_col", "stats",
            "sequence_number", "content", "first_row_id", "lineage_cols",
        ]
        for pdf in batches:
            rows = []
            for rel, absp in zip(pdf["manifest"], pdf["abs_path"]):
                with open(absp) as f:
                    for d in json.load(f):
                        rows.append(
                            (
                                rel,
                                d["path"],
                                d["record_count"],
                                d["file_size_bytes"],
                                d.get("partition"),
                                d.get("schema_id", 0),
                                d.get("spec_col"),
                                json.dumps(d.get("stats", {})),
                                d.get("sequence_number", 0),
                                d.get("content", "data"),
                                d.get("first_row_id"),
                                bool(d.get("lineage_cols", False)),
                            )
                        )
            yield pd.DataFrame(rows, columns=cols)

    return shard_df.mapInPandas(_parse, ENTRY_SCHEMA)


def write_manifest_cache(table: Table, snapshot_id: int | None = None) -> str:
    """Materialize one snapshot's entries as parquet for repeated
    planning. Distributed write; returns the cache directory. Safe to
    call concurrently: each writer builds into its OWN uuid directory,
    then claims the per-snapshot pointer with a conditional create —
    exactly one build publishes, losers delete their directory and
    adopt the winner's. (A shared overwrite target would let two
    concurrent builds interleave part files, silently doubling every
    scan of a >=64-shard table forever.)"""
    import uuid

    snap = table.snapshot(snapshot_id)
    if snap is None:
        raise ValueError("table has no snapshot to cache")
    existing = _resolve_cache_dir(table, snap.snapshot_id)
    if existing is not None:
        return existing
    rel = os.path.join("manifest_cache", f"data-{uuid.uuid4().hex[:16]}")
    cdir = os.path.join(table.root, rel)
    manifest_entries_df(table, snap.snapshot_id, use_cache=False).write.mode(
        "errorifexists"
    ).parquet(cdir)
    try:
        table.io.create_json(_cache_pointer(table, snap.snapshot_id), {"dir": rel})
    except FileExistsError:
        table.io.delete_prefix(cdir)
        winner = _resolve_cache_dir(table, snap.snapshot_id)
        if winner is not None:
            return winner
        raise RuntimeError(
            "manifest-cache pointer exists but resolves to no published "
            "directory; delete the pointer to rebuild"
        ) from None
    return cdir


def _stat(col: str, bound: str) -> Column:
    return F.get_json_object(F.col("stats"), f"$.{col}.{bound}")


def _overlap_pred(col: str, lo, hi) -> Column:
    """May-overlap predicate on one column's manifest min/max, NULL-safe
    (absent stats keep the file — same conservatism as
    DataFile.overlaps). Numeric bounds compare numerically; strings
    byte-wise, matching the python path's native-type compare."""
    mn, mx = _stat(col, "min"), _stat(col, "max")
    if isinstance(lo, bool) or not isinstance(lo, (int, float)):
        lo_l, hi_l = F.lit(lo), F.lit(hi)
    else:
        mn, mx = mn.cast("double"), mx.cast("double")
        lo_l, hi_l = F.lit(float(lo)), F.lit(float(hi))
    return mn.isNull() | ~((mx < lo_l) | (mn > hi_l))


def prune_files_df(
    entries: DataFrame,
    sources: list[str] | None = None,
    ranges: dict[str, tuple] | None = None,
    first_spec_col: str = "source",
) -> DataFrame:
    """Filter a manifest-entries frame with the SAME predicates as
    ``Table.scan``:

    - ``sources``: identity-partition prune when the file's spec column
      is ``source`` (legacy ``spec_col=None`` entries resolve to
      ``first_spec_col`` — the table's FIRST spec, mirroring
      ``Table.partition_value``), else min/max stats prune.
    - ``ranges``: {column: (lo, hi)} min/max overlap prune per column.
    """
    out = entries
    if sources is not None:
        spec = F.coalesce(F.col("spec_col"), F.lit(first_spec_col))
        identity = (spec == "source") & F.col("partition").isNotNull()
        stats_keep = F.lit(False)
        for s in sources:
            mn, mx = _stat("source", "min"), _stat("source", "max")
            stats_keep = stats_keep | mn.isNull() | (
                (mn <= F.lit(s)) & (F.lit(s) <= mx)
            )
        out = out.filter(
            F.when(identity, F.col("partition").isin(sources)).otherwise(
                stats_keep
            )
        )
    for col, (lo, hi) in (ranges or {}).items():
        out = out.filter(_overlap_pred(col, lo, hi))
    return out


def scan_planned(
    table: Table,
    snapshot_id: int | None = None,
    sources: list[str] | None = None,
    doc_id_range: tuple[str, str] | None = None,
    n_tok_range: tuple[int, int] | None = None,
    eq: dict | None = None,
    apply_deletes: bool = True,
    with_position: bool = False,
    with_lineage: bool = False,
) -> DataFrame:
    """``Table.scan`` with DISTRIBUTED file planning: manifest parsing
    and pruning run as a Spark job and only the surviving entries reach
    the driver. Row-level re-filters are applied by the delegated
    ``scan`` exactly as on the driver path. ``eq`` point probes compose
    min/max pruning with the bloom-blob anti-join (table/blooms.py) —
    still one Spark plan, nothing blob-sized reaches the driver."""
    snap = table.snapshot(snapshot_id)
    if snap is None:
        return table.scan(snapshot_id=snapshot_id)
    entries = manifest_entries_df(table, snap.snapshot_id)
    ranges: dict[str, tuple] = {}
    if doc_id_range is not None:
        ranges["doc_id"] = doc_id_range
    if n_tok_range is not None:
        ranges["n_tok"] = n_tok_range
    for c, v in (eq or {}).items():
        ranges.setdefault(c, (v, v))
    first_spec = table.metadata.get(
        "partition_spec_log", [table.partition_col]
    )[0]
    surv = prune_files_df(
        entries, sources=sources, ranges=ranges, first_spec_col=first_spec
    )
    if eq and table.metadata.get("bloom_statistics"):
        from olake_spark.table.blooms import bloom_prune_df

        surv = bloom_prune_df(table, surv, eq)
    rows = surv.select(
        "path", "record_count", "file_size_bytes", "schema_id",
        "sequence_number", "first_row_id", "lineage_cols",
    ).collect()
    files = [
        DataFile(
            path=r.path,
            record_count=r.record_count,
            file_size_bytes=r.file_size_bytes,
            schema_id=r.schema_id,
            # sequence numbers must survive the round-trip: the delegated
            # scan buckets files by seq to decide which equality-delete
            # files apply to them
            sequence_number=r.sequence_number or 0,  # pre-MoR caches: null
            # lineage fields likewise: losing lineage_cols would make the
            # scan synthesize ids a rewrite already re-positioned
            first_row_id=r.first_row_id,
            lineage_cols=bool(r.lineage_cols),
        )
        for r in rows
    ]
    # stats are intentionally absent on the reconstructed entries: the
    # distributed pass already pruned, and scan's re-prune is
    # conservative (keeps) without stats; the row filters stay exact
    return table.scan(
        snapshot_id=snap.snapshot_id,
        sources=sources,
        doc_id_range=doc_id_range,
        n_tok_range=n_tok_range,
        eq=eq,
        files=files,
        apply_deletes=apply_deletes,
        with_position=with_position,
        with_lineage=with_lineage,
    )
