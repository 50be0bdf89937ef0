"""Bin-pack compaction of small files (SURVEY.md P2).

Spark-first re-expression of the reference's chunked rewrite pipeline
(chunk planners at /root/reference/drivers/postgres/internal/backfill.go:102-192
and /root/reference/drivers/mongodb/internal/backfill.go:126-217; sorted
chunk locality at backfill.go:61-64):

- *planning* uses manifest metadata only (file sizes), never a scan —
  the analog of the reference's reltuples/relpages/splitVector planning;
- *execution* is one ``repartitionByRange(bins, source, doc_id)`` +
  ``sortWithinPartitions`` per task group: the range exchange samples
  boundaries, so a Zipf-hot ``source`` is split across exactly as many
  output files as its bytes require — skew handling falls out of the
  composite (source, doc_id) range key, no manual salting needed, and
  output files end up source-pure and doc_id-clustered (good min/max
  stats for later pruning and MERGE candidate selection);
- *resumability* is the lineage ledger: groups of sources are planned
  as pending before any read, flipped to done per group, and the table
  commit (remove inputs, add outputs) happens once at the end
  (chunk-state semantics of /root/reference/types/state.go:94-149).

At 100 TB: task-group size bounds the blast radius of a retry; within a
group the shuffle is one range exchange whose reduce tasks write
target-size files — AQE handles stragglers, and file count scales with
data, not with executor count.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

from pyspark.sql import functions as F

from olake_spark.functions.partitioning import (
    composite_key_expr,
    exact_range_partition,
    sample_file_boundaries,
    string_key_cols,
)
from olake_spark.plans.ledger import Ledger
from olake_spark.table.format import (
    SCAN_DISTRIBUTED_MIN_SHARDS as _DISTRIBUTED_PLANNING_MIN_SHARDS,
)
from olake_spark.table.format import DataFile, Table

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024
_MIXED = "__mixed__"

def scope_key(
    sources: list[str] | None, where: dict[str, tuple] | None
) -> str:
    """Job-id suffix for a (sources, where) rewrite scope, shared by
    compact() and cluster() so both encode scopes identically in the
    resume ledger. None vs [] must hash differently: 'no source filter'
    and 'compact zero sources' are distinct jobs."""
    if sources is None and not where:
        return ""
    src_key = "None" if sources is None else str(sorted(sources))
    return f":{src_key}:{sorted((where or {}).items())}"


def _small_files_distributed(
    table: Table,
    snap,
    small_bytes: int,
    sources: list[str] | None = None,
    where: dict[str, tuple] | None = None,
) -> list[DataFile]:
    """Small-file candidates via the manifest-entries frame: shards parse
    in executors, the size and predicate filters run in Catalyst, and the
    driver collects only the files compaction will actually rewrite."""
    import json as _json

    from pyspark.sql import functions as F

    from olake_spark.table.manifest_df import (
        manifest_entries_df,
        prune_files_df,
    )

    ent = manifest_entries_df(table, snap.snapshot_id)
    if sources is not None or where:
        first_spec = table.metadata.get(
            "partition_spec_log", [table.partition_col]
        )[0]
        ent = prune_files_df(
            ent, sources=sources, ranges=where, first_spec_col=first_spec
        )
    rows = ent.filter(F.col("file_size_bytes") < small_bytes).collect()
    return sorted(
        (
            DataFile(
                path=r.path,
                record_count=r.record_count,
                file_size_bytes=r.file_size_bytes,
                partition=r.partition,
                stats=_json.loads(r.stats),
                schema_id=r.schema_id,
                spec_col=r.spec_col,
                # an unset sequence number (0) would spuriously attract
                # EVERY equality delete in the rewrite scan and silently
                # drop upserted rows from the committed output
                sequence_number=r.sequence_number or 0,
                content=r.content or "data",
                first_row_id=r.first_row_id,
                lineage_cols=bool(r.lineage_cols),
            )
            for r in rows
        ),
        key=lambda f: f.path,
    )


@dataclass
class CompactionResult:
    job_id: str
    snapshot_id: int | None  # new snapshot (None if nothing to do)
    groups: int = 0
    input_files: int = 0
    output_files: int = 0
    bytes_in: int = 0
    rows: int = 0
    skipped: bool = False
    details: dict = field(default_factory=dict)


def _job_id(kind: str, snapshot_id: int, params: str) -> str:
    h = hashlib.md5(params.encode()).hexdigest()[:10]
    return f"{kind}-s{snapshot_id}-{h}"


def commit_rewrite(
    table: Table,
    ledger: Ledger,
    jid: str,
    kind: str,
    planned_snapshot_id: int | None = None,
) -> int:
    """Commit a rewrite job's ledger (remove inputs, add outputs), retrying
    CommitConflict with refresh-and-revalidate between attempts.

    A concurrent committer (e.g. an append landing between our refresh and
    commit) bumps the metadata version; the conflict is retryable because
    each attempt re-checks every input file is still live — a concurrent
    REWRITE of our inputs is NOT retryable and raises. Bounded backoff
    mirrors the reference (/root/reference/drivers/base/utils.go:9-22).

    With ``planned_snapshot_id`` the liveness check is O(concurrent
    churn), never O(table): inputs were drawn from the planned snapshot,
    so if the pointer is unmoved they are live by construction, and
    otherwise (manifests being immutable and carried over untouched) an
    input vanished iff its path is in the planned-only shards' entries
    but not the current-only ones — only CHANGED shards are read. A
    resumed job whose planning snapshot has expired falls back to the
    full file-list check."""
    from olake_spark.plans.retry import retry_on_backoff
    from olake_spark.table.format import CommitConflict

    added = [DataFile.from_dict(d) for d in ledger.all_outputs()]
    removed = set(ledger.all_inputs())

    def _missing_paths() -> set[str]:
        if table.current_snapshot_id == planned_snapshot_id:
            return set()
        planned = None
        if planned_snapshot_id is not None:
            try:
                planned = table.snapshot(planned_snapshot_id)
            except KeyError:
                planned = None
        if planned is None:
            return removed - {f.path for f in table.files()}
        from olake_spark.table.format import snapshot_file_delta

        new_entries, dropped = snapshot_file_delta(
            table, planned, table.snapshot()
        )
        return (removed & set(dropped)) - set(new_entries)

    def _delete_conflicts() -> list[str]:
        """Merge-on-read delete files landed since planning whose doc_id
        range overlaps an OUTPUT file: our outputs carry a higher
        sequence number, which would silently void those row-level
        deletes for every rewritten row — not retryable, the rewrite
        must rerun against the new delete set. Checking against outputs
        (not inputs) is exact: only rows that survived into an output
        can resurrect. A planning snapshot that expired mid-job falls
        back to checking EVERY live delete file (rare; false positives
        just force a recompute)."""
        if not added or table.current_snapshot_id == planned_snapshot_id:
            return []
        cur = table.snapshot()
        planned = None
        if planned_snapshot_id is not None:
            try:
                planned = table.snapshot(planned_snapshot_id)
            except KeyError:
                planned = None
        from olake_spark.table.format import new_delete_entries_since

        if planned is None:
            new_dels = table.delete_files(cur.snapshot_id if cur else None)
        else:
            new_dels = new_delete_entries_since(table, planned, cur)
        out = []
        for d in new_dels:
            st = d.stats.get("doc_id")
            if not st or st.get("min") is None:
                out.append(d.path)
            elif any(
                f.overlaps("doc_id", st["min"], st["max"]) for f in added
            ):
                out.append(d.path)
        return out

    def attempt() -> int:
        table.refresh()
        missing = _missing_paths()
        if missing:
            raise RuntimeError(
                f"{kind} inputs vanished from current snapshot: {sorted(missing)[:3]}..."
            )
        del_conf = _delete_conflicts()
        if del_conf:
            raise RuntimeError(
                f"row-level deletes landed on {kind} outputs' key range "
                f"concurrently; recompute ({del_conf[:3]}...)"
            )
        return table.commit(
            "replace",
            added=added,
            removed_paths=removed,
            summary_extra={"job-id": jid, "kind": kind},
        )

    new_snap = retry_on_backoff(
        attempt, attempts=4, base_sleep_s=0.2, retry_on=(CommitConflict,)
    )
    ledger.mark_committed(new_snap)
    return new_snap


def plan_groups(
    files: list[DataFile],
    small_file_bytes: int,
    min_group_files: int,
    max_group_bytes: int,
) -> list[tuple[str, list[DataFile]]]:
    """Group small files into resumable task groups.

    Files are bucketed by identity partition (mixed files together),
    partitions needing work are packed into groups of at most
    ``max_group_bytes`` — a greedy first-fit-decreasing bin pack over
    manifest metadata only. The bucket key is (spec_col, value) so that
    after a partition spec evolution, same-string values recorded under
    different spec columns never co-group (locality only — correctness
    does not depend on the grouping).
    """
    by_part: dict[str, list[DataFile]] = {}
    for f in files:
        if f.file_size_bytes < small_file_bytes:
            key = (
                f"{f.spec_col or ''}={f.partition}"
                if f.partition is not None
                else _MIXED
            )
            by_part.setdefault(key, []).append(f)
    work = {
        p: fs
        for p, fs in by_part.items()
        if len(fs) >= min_group_files or p == _MIXED
    }
    # pack partitions (descending bytes) into groups
    parts = sorted(
        work.items(), key=lambda kv: -sum(f.file_size_bytes for f in kv[1])
    )
    groups: list[list[tuple[str, list[DataFile]]]] = []
    sizes: list[int] = []
    for p, fs in parts:
        b = sum(f.file_size_bytes for f in fs)
        placed = False
        for i in range(len(groups)):
            if sizes[i] + b <= max_group_bytes:
                groups[i].append((p, fs))
                sizes[i] += b
                placed = True
                break
        if not placed:
            groups.append([(p, fs)])
            sizes.append(b)
    out = []
    for g in groups:
        names = sorted(p for p, _ in g)
        key = hashlib.md5("|".join(names).encode()).hexdigest()[:12]
        out.append((f"g-{key}", [f for _, fs in g for f in fs]))
    return sorted(out)


def compact(
    table: Table,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_file_ratio: float = 0.75,
    min_group_files: int = 2,
    max_group_bytes: int | None = None,
    snapshot_id: int | None = None,
    job_id: str | None = None,
    mode: str = "binpack",
    distributed_planning: bool | None = None,
    sources: list[str] | None = None,
    where: dict[str, tuple] | None = None,
) -> CompactionResult:
    """Rewrite small files into ~``target_file_bytes`` files.

    ``sources`` / ``where`` scope the rewrite (Iceberg's
    rewrite_data_files filter): only candidate files whose partition
    value or min/max stats overlap survive planning — at fleet scale you
    compact the hot partition on its ingest cadence, not the whole
    table. ``where`` maps a stats column to a closed ``(lo, hi)`` range;
    files without stats for the column are conservatively kept. Exact
    row-level scoping is unnecessary: compaction rewrites whole files,
    so a file straddling the boundary is simply rewritten whole.

    mode='binpack' (default, matches Iceberg rewrite_data_files binpack):
    ZERO-shuffle — the parquet scan itself packs small files into
    ~target-size partitions (spark.sql.files.maxPartitionBytes) and each
    scan partition is written straight out as one file. One decode+encode
    pass over the data, no exchange, no sort. File-level source/doc_id
    locality is whatever the inputs had.

    mode='sort': additionally clusters output by (source, doc_id) via a
    sampled range exchange — 2 reads + a shuffle; use when downstream
    scans need tight min/max stats and the clustering job isn't run.

    Idempotently resumable: re-invoking with the same (snapshot, params)
    reuses the ledger; finished groups are never re-executed.
    """
    if mode not in ("binpack", "sort"):
        raise ValueError(f"unknown compaction mode: {mode}")
    table.refresh()
    snap = table.snapshot(snapshot_id)
    if snap is None:
        return CompactionResult(job_id="none", snapshot_id=None, skipped=True)
    if max_group_bytes is None:
        max_group_bytes = 64 * target_file_bytes

    scope = scope_key(sources, where)
    jid = job_id or _job_id(
        "compact",
        snap.snapshot_id,
        f"{target_file_bytes}:{small_file_ratio}:{min_group_files}"
        f":{max_group_bytes}:{mode}{scope}",
    )
    ledger = Ledger.for_job(table.root, jid)
    if ledger.committed_snapshot_id is not None:
        t = ledger.totals()
        return CompactionResult(
            job_id=jid,
            snapshot_id=ledger.committed_snapshot_id,
            groups=t["groups"],
            bytes_in=t["bytes_in"],
            rows=t["rows"],
            skipped=True,
        )

    small_bytes = int(target_file_bytes * small_file_ratio)
    # planning only consumes SMALL files (plan_groups filters on size) —
    # on many-shard tables push that filter into the manifest-entries
    # frame so the driver collects O(small files), not O(table)
    use_dist = distributed_planning
    if use_dist is None:
        use_dist = len(snap.manifests) >= _DISTRIBUTED_PLANNING_MIN_SHARDS
    if use_dist:
        files = _small_files_distributed(
            table, snap, small_bytes, sources=sources, where=where
        )
    else:
        files = table.prune_files(
            table.files(snap.snapshot_id), sources=sources, ranges=where
        )
    groups = plan_groups(files, small_bytes, min_group_files, max_group_bytes)
    if not groups:
        return CompactionResult(job_id=jid, snapshot_id=None, skipped=True)

    by_path = {f.path: f for f in files}
    for key, gfiles in groups:
        ledger.plan(key, [f.path for f in gfiles])
    # a resumed job must not commit references to outputs a GC or crash
    # removed — re-pend any done group whose output files vanished
    ledger.reset_missing_outputs(table.root)

    spark = table.spark
    for key in sorted(ledger.pending_keys()):
        gfiles = [by_path[p] for p in ledger.entry(key)["inputs"]]
        gbytes = sum(f.file_size_bytes for f in gfiles)
        grows = sum(f.record_count for f in gfiles)
        if mode == "binpack":
            # scan-level packing: small files coalesce into ~target-size
            # read partitions; write is narrow (partition -> one file)
            old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
            old_open = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
            old_minp = spark.conf.get("spark.sql.files.minPartitionNum", None)
            try:
                spark.conf.set(
                    "spark.sql.files.maxPartitionBytes", str(target_file_bytes)
                )
                spark.conf.set("spark.sql.files.openCostInBytes", "131072")
                # Spark sizes splits as min(maxPartitionBytes,
                # max(openCost, totalBytes / minPartitionNum)) with
                # minPartitionNum defaulting to defaultParallelism — a
                # group smaller than cores x target would be split
                # per-core and UNDER-packed (8 tiny files in, 8 tiny
                # files out). Compaction wants ~target-size outputs;
                # parallelism comes from many concurrent groups.
                spark.conf.set("spark.sql.files.minPartitionNum", "1")
                # lineage tables carry resolved _row_id /
                # _last_updated_sequence_number through the rewrite as
                # materialized columns — row positions change, so the
                # synthesized form would silently re-number every row
                out = table.scan(
                    snapshot_id=snap.snapshot_id, files=gfiles,
                    with_lineage=table.row_lineage,
                )
                outputs = table.write_data_files(out)
            finally:
                spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
                spark.conf.set("spark.sql.files.openCostInBytes", old_open)
                if old_minp is None:
                    spark.conf.unset("spark.sql.files.minPartitionNum")
                else:
                    spark.conf.set("spark.sql.files.minPartitionNum", old_minp)
        else:
            n_bins = max(1, math.ceil(gbytes / target_file_bytes))
            df = table.scan(
                snapshot_id=snap.snapshot_id, files=gfiles,
                with_lineage=table.row_lineage,
            )
            # boundaries from a driver-side pyarrow key sample so the
            # range exchange never pays repartitionByRange's sampling
            # pass — which would SCAN THE GROUP TWICE (2x read I/O on a
            # rewrite). String keys require the schema check; non-string
            # key tables fall back to the sampling pass.
            schema = table.schema(snap.schema_id if snap else None)
            str_keys = string_key_cols(schema, ["source", "doc_id"])
            bnds = (
                sample_file_boundaries(
                    table, gfiles, ["source", "doc_id"], n_bins
                )
                if str_keys
                else None
            )
            if bnds is not None:
                out = exact_range_partition(
                    df,
                    composite_key_expr(["source", "doc_id"]),
                    bnds,
                    ["source", "doc_id"],
                )
            else:
                out = df.repartitionByRange(
                    n_bins, F.col("source"), F.col("doc_id")
                ).sortWithinPartitions("source", "doc_id")
            outputs = table.write_data_files(out)
        ledger.mark_done(
            key,
            [o.to_dict() for o in outputs],
            {"rows": grows, "bytes_in": gbytes, "files_out": len(outputs)},
        )

    new_snap = commit_rewrite(
        table, ledger, jid, "compaction", planned_snapshot_id=snap.snapshot_id
    )
    t = ledger.totals()
    return CompactionResult(
        job_id=jid,
        snapshot_id=new_snap,
        groups=t["groups"],
        input_files=len(ledger.all_inputs()),
        output_files=len(ledger.all_outputs()),
        bytes_in=t["bytes_in"],
        rows=t["rows"],
    )
