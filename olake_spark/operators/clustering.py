"""Z-order / Hilbert clustering rewrite (SURVEY.md P3).

Generalizes the reference's key-ordered chunk locality
(/root/reference/drivers/mongodb/internal/backfill.go:61-64) to
multi-dimensional curve clustering, which Catalyst has no native syntax
for. The curve key is computed by a vectorized Arrow/pandas UDF
(olake_spark/functions/zorder.py) — the *only* Python compute in the hot
path, per input_hint. The rewrite is ONE exchange with the child
evaluated exactly once: range boundaries come from a *narrow* sample
(key columns only — parquet column pruning skips the token arrays),
then rows are routed to exact output bins via a salt-mapped hash
repartition (functions/partitioning.py) and sorted within partitions.
This avoids both repartitionByRange's double evaluation of the UDF+scan
and the round-1 full-row persist() that serialized the pipeline when
inputs were many small files.

Column→curve-space mapping is planned from manifest stats (numeric
min/max aggregated across files — zero scans), mirroring how the
reference derives chunk bounds from server statistics.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from olake_spark.functions.partitioning import exact_range_partition
from olake_spark.functions.zorder import ClusterCol, make_cluster_key_udf
from olake_spark.operators.compaction import (
    DEFAULT_TARGET_FILE_BYTES,
    _job_id,
    commit_rewrite,
    scope_key,
)
from olake_spark.plans.ledger import Ledger
from olake_spark.table.format import (
    SCAN_DISTRIBUTED_MIN_SHARDS as _SPEC_DISTRIBUTED_MIN_SHARDS,
)
from olake_spark.table.format import DataFile, Table

CKEY = "_ckey"
# boundary-sample size: enough keys for stable per-bin quantiles, bounded
# so driver memory stays small at any group size
_SAMPLE_MAX = 100_000
_SAMPLE_FILES = 8


def _sample_boundaries(
    table: Table,
    gfiles: list[DataFile],
    specs,
    curve: str,
    in_cols: list[str],
    n_bins: int,
):
    """Range boundaries for n_bins from a driver-side pyarrow sample.

    Launching a Spark job just to sample boundaries costs 1-3 s of
    scheduling per group REGARDLESS of cluster size — pure fixed cost
    that flattens scaling efficiency. Instead the driver reads the key
    columns (column-pruned parquet, token arrays untouched) of a few
    evenly-spaced input files directly with pyarrow (~MBs) and quantiles
    their curve keys; the full-width data is read exactly once, by the
    main rewrite pass. Falls back to a Spark sample when files are not
    driver-readable (non-local filesystem).
    """
    if n_bins <= 1:
        return []
    from olake_spark.functions.zorder import curve_keys_np

    picks = gfiles
    if len(gfiles) > _SAMPLE_FILES:
        step = len(gfiles) / _SAMPLE_FILES
        picks = [gfiles[int(i * step)] for i in range(_SAMPLE_FILES)]
    try:
        import pyarrow.parquet as pq

        frames = [
            pq.read_table(table.abs_path(f.path), columns=in_cols).to_pandas()
            for f in picks
        ]
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames)
    except Exception:  # noqa: BLE001 — ArrowInvalid/OSError/missing column:
        # any driver-side read failure (non-local filesystem, older file
        # schema) degrades to the equivalent distributed narrow scan
        pdf = (
            table.scan(files=picks)
            .select(*in_cols)
            .toPandas()
        )
    if len(pdf) > _SAMPLE_MAX:
        pdf = pdf.sample(n=_SAMPLE_MAX, random_state=42)
    if pdf.empty:
        return []
    keys = np.sort(curve_keys_np([pdf[c] for c in in_cols], specs, curve))
    bounds = {
        int(keys[min(len(keys) - 1, (i * len(keys)) // n_bins)])
        for i in range(1, n_bins)
    }
    return sorted(bounds)


@dataclass
class ClusterResult:
    job_id: str
    snapshot_id: int | None
    curve: str
    input_files: int = 0
    output_files: int = 0
    bytes_in: int = 0
    rows: int = 0
    skipped: bool = False
    details: dict = field(default_factory=dict)


def _cluster_specs_distributed(table: Table, snap) -> "list[ClusterCol]":
    """Category set + n_tok bounds via one Catalyst aggregation over
    the entries frame; the driver receives only the distinct source
    values (bounded by category cardinality) and two longs."""
    from pyspark.sql import functions as F

    from olake_spark.functions.zorder import integer_span_bits
    from olake_spark.table.manifest_df import manifest_entries_df

    first_spec = table.metadata.get(
        "partition_spec_log", [table.partition_col]
    )[0]
    ent = manifest_entries_df(table, snap.snapshot_id)
    spec = F.coalesce(F.col("spec_col"), F.lit(first_spec))
    pv = F.when(spec == F.lit("source"), F.col("partition"))
    smin = F.get_json_object("stats", "$.source.min")
    smax = F.get_json_object("stats", "$.source.max")
    nmin = F.get_json_object("stats", "$.n_tok.min").cast("long")
    nmax = F.get_json_object("stats", "$.n_tok.max").cast("long")
    # ONE aggregation job: collect_set over the (bounded-cardinality)
    # category values + the n_tok bounds together — a second pass would
    # re-parse every manifest shard
    b = ent.select(
        F.explode(F.array(pv, smin, smax)).alias("_c"),
        nmin.alias("_lo"),
        nmax.alias("_hi"),
    ).agg(
        F.collect_set("_c").alias("cats"),
        F.min("_lo").alias("lo"),
        F.max("_hi").alias("hi"),
    ).first()
    cats = sorted(c for c in (b.cats or []) if c is not None)
    n_lo = b.lo if b.lo is not None else 0
    n_hi = b.hi if b.hi is not None else 1
    return [
        ClusterCol("source", "categorical", categories=cats),
        ClusterCol(
            "n_tok", "numeric", lo=int(n_lo), hi=int(n_hi),
            bits=integer_span_bits(int(n_lo), int(n_hi)),
        ),
        ClusterCol("doc_id", "hash"),
    ]


def default_cluster_specs(table: Table, snapshot_id: int | None = None) -> list[ClusterCol]:
    """Build curve-column specs from manifest stats (no data scan).

    (source categorical-rank, n_tok min/max-scaled, doc_id hashed) —
    source first so curve locality groups hot sources, n_tok so
    length-bucketed training reads prune well.

    On many-shard tables the global category set and n_tok bounds come
    from ONE aggregation over the manifest-entries frame — an
    INCREMENTAL cluster pass must not parse every manifest on the
    driver just to derive spec bounds."""
    snap = table.snapshot(snapshot_id)
    if (
        snap is not None
        and table.spark is not None
        and len(snap.manifests) >= _SPEC_DISTRIBUTED_MIN_SHARDS
    ):
        return _cluster_specs_distributed(table, snap)
    files = table.files(snapshot_id)
    cats = sorted(
        # spec-aware: only partition values recorded under a "source"
        # spec are source categories (post-evolution files may carry a
        # different column's value in f.partition)
        {
            pv
            for f in files
            if (pv := table.partition_value(f, "source")) is not None
        }
        | {
            s["min"]
            for f in files
            if (s := f.stats.get("source")) and s.get("min") is not None
        }
        | {
            s["max"]
            for f in files
            if (s := f.stats.get("source")) and s.get("max") is not None
        }
    )
    n_lo = min(
        (f.stats["n_tok"]["min"] for f in files if "n_tok" in f.stats), default=0
    )
    n_hi = max(
        (f.stats["n_tok"]["max"] for f in files if "n_tok" in f.stats), default=1
    )
    from olake_spark.functions.zorder import integer_span_bits

    return [
        ClusterCol("source", "categorical", categories=cats),
        # n_tok is integer-valued: pin its key width to the span so the
        # variable interleave doesn't spend levels on empty resolution
        ClusterCol(
            "n_tok", "numeric", lo=n_lo, hi=n_hi,
            bits=integer_span_bits(n_lo, n_hi),
        ),
        ClusterCol("doc_id", "hash"),
    ]


def cluster(
    table: Table,
    curve: str = "zorder",
    specs: list[ClusterCol] | None = None,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    snapshot_id: int | None = None,
    job_id: str | None = None,
    max_group_bytes: int | None = None,
    scope: str = "global",
    since_snapshot_id: int | None = None,
    sources: list[str] | None = None,
    where: dict[str, tuple] | None = None,
) -> ClusterResult:
    """Rewrite the snapshot clustered by a space-filling curve.

    scope='global' curves over (source, n_tok, doc_id) across the whole
    table; scope='per-source' groups files by identity partition and
    curves over (n_tok, doc_id) *within* each source — the
    partition-scoped sort Iceberg applies when reads always carry the
    partition filter (source is constant inside a group, so spending
    curve bits on it would waste locality).

    ``since_snapshot_id``: INCREMENTAL clustering — only files added to
    the table after that snapshot are rewritten (manifest diff, metadata
    only); files that survived from it are already curve-sorted by the
    previous pass and keep their paths. At 100 TB this turns steady-state
    maintenance from O(table) into O(churn) per cycle. The result is
    per-file locality, not a global re-sort — identical to Iceberg's
    rewrite_data_files with a file filter.

    ``sources`` / ``where`` scope the rewrite exactly like
    ``compact(sources=, where=)``: candidates are pruned by partition
    value / min-max stats before grouping (``Table.prune_files``), so
    the hot partition re-clusters on its own cadence. Composes with
    ``since_snapshot_id`` (scope the churn, not just the table).

    Resumable: the input file set is split into ledger groups by
    cumulative bytes (per-source scope groups by partition first); each
    group is clustered and written independently — same contract as
    Iceberg's sort-order rewrite with multiple file groups.
    """
    if scope not in ("global", "per-source"):
        raise ValueError(f"unknown scope: {scope}")
    table.refresh()
    snap = table.snapshot(snapshot_id)
    if snap is None:
        return ClusterResult(job_id="none", snapshot_id=None, curve=curve, skipped=True)
    if max_group_bytes is None:
        max_group_bytes = 256 * target_file_bytes

    if specs is None:
        specs = default_cluster_specs(table, snap.snapshot_id)
        if scope == "per-source":
            specs = [s for s in specs if s.name != "source"]
    spec_sig = "|".join(f"{s.name}:{s.kind}" for s in specs)
    jid = job_id or _job_id(
        "cluster",
        snap.snapshot_id,
        f"{curve}:{spec_sig}:{target_file_bytes}:{scope}:{since_snapshot_id}"
        + scope_key(sources, where),
    )
    ledger = Ledger.for_job(table.root, jid)
    if ledger.committed_snapshot_id is not None:
        t = ledger.totals()
        return ClusterResult(
            job_id=jid,
            snapshot_id=ledger.committed_snapshot_id,
            curve=curve,
            bytes_in=t["bytes_in"],
            rows=t["rows"],
            skipped=True,
        )

    if since_snapshot_id is not None:
        # incremental selection via the manifest SHARD diff — O(churn)
        # manifest reads instead of parsing and diffing two full
        # O(table) file lists (table/format.snapshot_file_delta).
        # Raises KeyError if the base snapshot was expired — caller
        # falls back to a full pass.
        from olake_spark.table.format import snapshot_file_delta

        cur_only, base_only = snapshot_file_delta(
            table, table.snapshot(since_snapshot_id), snap
        )
        files = sorted(
            (e for p, e in cur_only.items() if p not in base_only),
            key=lambda f: f.path,
        )
    else:
        files = sorted(table.files(snap.snapshot_id), key=lambda f: f.path)
    if sources is not None or where:
        files = table.prune_files(files, sources=sources, ranges=where)
    if not files:
        return ClusterResult(job_id=jid, snapshot_id=None, curve=curve, skipped=True)

    # split the file list into byte-bounded resumable groups; per-source
    # scope partitions the list by identity partition first (mixed files
    # form their own group and still get curve-sorted together)
    if scope == "per-source":
        by_part: dict[str, list[DataFile]] = {}
        for f in files:
            by_part.setdefault(
                table.partition_value(f, "source") or "__mixed__", []
            ).append(f)
        file_runs = [by_part[k] for k in sorted(by_part)]
    else:
        file_runs = [files]
    groups: list[list[DataFile]] = []
    for run in file_runs:
        groups.append([])
        acc = 0
        for f in run:
            if acc + f.file_size_bytes > max_group_bytes and groups[-1]:
                groups.append([])
                acc = 0
            groups[-1].append(f)
            acc += f.file_size_bytes
    keyed = []
    for g in groups:
        key = hashlib.md5("|".join(f.path for f in g).encode()).hexdigest()[:12]
        keyed.append((f"g-{key}", g))
    by_path = {f.path: f for f in files}
    for key, g in keyed:
        ledger.plan(key, [f.path for f in g])
    # a resumed job must not commit references to outputs a GC or crash
    # removed — re-pend any done group whose output files vanished
    ledger.reset_missing_outputs(table.root)

    key_udf, in_cols = make_cluster_key_udf(specs, curve=curve)
    spark = table.spark
    cores = spark.sparkContext.defaultParallelism
    for key in sorted(ledger.pending_keys()):
        gfiles = [by_path[p] for p in ledger.entry(key)["inputs"]]
        gbytes = sum(f.file_size_bytes for f in gfiles)
        grows = sum(f.record_count for f in gfiles)
        n_bins = max(1, math.ceil(gbytes / target_file_bytes))
        boundaries = _sample_boundaries(
            table, gfiles, specs, curve, in_cols, n_bins
        )
        # force the main scan to >= 2x cores map tasks regardless of how
        # input file sizes pack (post-compaction small files otherwise
        # coalesce into a handful of scan partitions and the full-width
        # UDF stage runs serial)
        mpb = min(128 << 20, max(1 << 20, gbytes // max(2 * cores, n_bins) + 1))
        old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        old_open = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
        spark.conf.set("spark.sql.files.openCostInBytes", str(min(131072, mpb)))
        try:
            # lineage tables materialize resolved row ids through the
            # rewrite (positions change; synthesis would re-number)
            df = table.scan(
                snapshot_id=snap.snapshot_id, files=gfiles,
                with_lineage=table.row_lineage,
            )
            keyed = df.withColumn(CKEY, key_udf(*[F.col(c) for c in in_cols]))
            clustered = exact_range_partition(
                keyed, F.col(CKEY), boundaries, [CKEY]
            ).drop(CKEY)
            outputs = table.write_data_files(clustered)
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
            spark.conf.set("spark.sql.files.openCostInBytes", old_open)
        ledger.mark_done(
            key,
            [o.to_dict() for o in outputs],
            {"rows": grows, "bytes_in": gbytes, "files_out": len(outputs)},
        )

    new_snap = commit_rewrite(
        table, ledger, jid, f"cluster-{curve}",
        planned_snapshot_id=snap.snapshot_id,
    )
    t = ledger.totals()
    return ClusterResult(
        job_id=jid,
        snapshot_id=new_snap,
        curve=curve,
        input_files=len(ledger.all_inputs()),
        output_files=len(ledger.all_outputs()),
        bytes_in=t["bytes_in"],
        rows=t["rows"],
    )
