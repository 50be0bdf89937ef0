"""Snapshot expiry + orphan-file cleanup (SURVEY.md P4).

Analog of the reference's empty-file GC and state-reset semantics
(/root/reference/writers/parquet/parquet.go:223-226,
/root/reference/types/state.go:169-185): old snapshots are dropped from
the metadata log, then any data/manifest file referenced by *no*
surviving snapshot is deleted. Failed/killed maintenance attempts leave
unreferenced files in their commit dirs; this is the path that reclaims
them, so cleanup is safe-by-construction (a file is only deleted when
no snapshot can reach it).

All work is metadata + filesystem listing on the driver; at real scale
the listing would be a distributed `spark.read.format("binaryFile")`
sweep — the referenced-set math is identical.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


def _uncommitted_job_outputs(table_root: str, io) -> set[str]:
    """Output paths recorded in jobs/*/ledger.json with no committed
    snapshot yet — these belong to interrupted-but-resumable maintenance
    runs and must survive orphan cleanup. Unreadable ledgers are skipped
    (their outputs then age out under ``orphan_grace_ms``)."""
    out: set[str] = set()
    jobs_root = os.path.join(table_root, "jobs")
    for jid in io.list(jobs_root):
        lp = os.path.join(jobs_root, jid, "ledger.json")
        try:
            state = io.get_json(lp)
        except (OSError, json.JSONDecodeError):
            continue
        if state.get("committed_snapshot_id") is not None:
            continue
        for e in state.get("entries", {}).values():
            for o in e.get("outputs", []):
                out.add(o["path"])
    return out


def _orphans_distributed(
    table,
    live_manifests: list[str],
    job_outputs: set[str],
    data_root: str,
    now_ms: float,
    orphan_grace_ms: int,
) -> list[str]:
    """Orphan discovery as ONE Spark job: binaryFile listing of the data
    directory (path + mtime, content never read) left-anti-joined with
    the live set parsed from every surviving manifest shard in
    executors. Returns table-relative orphan paths — O(orphans) driver
    memory at any table size."""
    from pyspark.sql import functions as F

    from olake_spark.table.manifest_df import entries_from_manifests

    spark = table.spark
    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .load(data_root)
        .select(
            F.regexp_replace("path", "^file:/*", "/").alias("_abs"),
            (F.unix_micros("modificationTime") / 1000).alias("_mtime_ms"),
        )
        .withColumn(
            "path",
            F.expr(
                f"substring(_abs, {len(table.root) + 2})"
            ),  # strip '<root>/'
        )
    )
    live = entries_from_manifests(table, live_manifests).select("path")
    if job_outputs:
        live = live.unionByName(
            spark.createDataFrame([(p,) for p in sorted(job_outputs)], "path string")
        )
    orphans = (
        listing.join(live, "path", "left_anti")
        .filter(F.lit(now_ms) - F.col("_mtime_ms") >= orphan_grace_ms)
        .select("path")
        .collect()
    )
    return sorted(r.path for r in orphans)


#: unpointed manifest-cache build dirs younger than this are assumed to
#: be in-flight write_manifest_cache runs and survive GC
_CACHE_BUILD_GRACE_MS = 60 * 60 * 1000


def protected_changelog_snapshots(table) -> set[int]:
    """Changelog consumers' acked cursor (``jobs/changelog-cursor.json``,
    written by the CLI changelog verb after a successful export).
    Expiry must never drop the cursor snapshot — ``changes_since``
    resumes from it — so both the expire verb and the autopilot pass
    this set as ``protect_snapshot_ids``."""
    import os as _os

    out: set[int] = set()
    path = _os.path.join(table.root, "jobs", "changelog-cursor.json")
    try:
        if table.io.exists(path):
            sid = table.io.get_json(path).get("snapshot_id")
            if sid is not None:
                out.add(int(sid))
    except (OSError, ValueError, TypeError, AttributeError):
        pass
    return out


@dataclass
class ExpireResult:
    expired_snapshots: list[int] = field(default_factory=list)
    deleted_data_files: int = 0
    deleted_manifests: int = 0
    deleted_metadata_versions: int = 0
    kept_snapshots: list[int] = field(default_factory=list)


def expire_snapshots(
    table,
    keep_last: int = 2,
    older_than_ms: int | None = None,
    clean_orphans: bool = True,
    orphan_grace_ms: int = 0,
    abandoned_job_ms: int | None = None,
    protect_snapshot_ids: set[int] | None = None,
    distributed_orphan_scan: bool | None = None,
) -> ExpireResult:
    """Drop expired snapshots and delete unreferenced files.

    Keeps the ``keep_last`` most recent snapshots plus anything newer
    than ``older_than_ms``; the current snapshot is always kept.
    ``orphan_grace_ms`` protects files younger than the grace period
    (an in-flight job's not-yet-committed outputs).

    ``protect_snapshot_ids`` pins snapshots (and everything NEWER — a
    changelog diff scans files added after the cursor too) regardless of
    age: pass each changelog consumer's acked cursor so expiry never
    breaks an in-flight CDC-out tail.

    ``abandoned_job_ms``: uncommitted job ledgers protect their outputs
    from orphan GC (the resume contract) — but a job nobody will ever
    resume would pin its outputs forever. Ledgers whose file hasn't been
    touched for this long are deleted first; their outputs then age out
    as ordinary orphans. None (default) = never expire ledgers.

    ``distributed_orphan_scan``: None (default) auto-enables when any
    surviving snapshot has >= 64 manifest shards. On: the live set
    comes from the manifest-entries frame (executor-side parse of the
    UNION of all surviving shards), the data directory is listed by
    Spark's binaryFile reader, and orphans are found with one left-anti
    join — O(orphans) driver work instead of a driver walk over every
    data file plus a driver parse of every manifest. Deletions still go
    through table.io on the driver (bounded by orphan count).
    """
    table.refresh()
    res = ExpireResult()
    snaps = table.snapshots()
    if not snaps:
        return res
    current_id = table.current_snapshot_id
    keep: list = []
    drop: list = []
    min_protected = min(protect_snapshot_ids) if protect_snapshot_ids else None
    # named refs pin their exact snapshot until removed; BRANCH refs
    # additionally pin their whole parent lineage down to the current
    # snapshot (or the chain end) — fast_forward certifies a publish by
    # walking head -> current, and an expired intermediate would either
    # wedge valid publishes or force an unsound id-ordering heuristic
    # that can silently abandon published history. Lineages are bounded
    # by branch length (WAP branches are short-lived by design).
    ref_ids: set = set()
    by_id = {s.snapshot_id: s for s in snaps}
    for r in table.metadata.get("refs", {}).values():
        ref_ids.add(r["snapshot_id"])
        if r.get("type") == "branch":
            node = by_id.get(r["snapshot_id"])
            walked: set = set()
            while (
                node is not None
                and node.snapshot_id not in walked
                and node.snapshot_id != current_id
            ):
                walked.add(node.snapshot_id)
                ref_ids.add(node.snapshot_id)
                node = (
                    by_id.get(node.parent_id)
                    if node.parent_id is not None
                    else None
                )
    for i, s in enumerate(snaps):
        is_recent = i >= len(snaps) - keep_last
        is_young = older_than_ms is not None and s.timestamp_ms >= older_than_ms
        is_pinned = min_protected is not None and s.snapshot_id >= min_protected
        is_ref = s.snapshot_id in ref_ids
        if s.snapshot_id == current_id or is_recent or is_young or is_pinned or is_ref:
            keep.append(s)
        else:
            drop.append(s)
    if not drop and not clean_orphans:
        res.kept_snapshots = [s.snapshot_id for s in keep]
        return res

    if drop:
        table.metadata["snapshots"] = [s.to_dict() for s in keep]
        table.rewrite_metadata()
    res.expired_snapshots = [s.snapshot_id for s in drop]
    res.kept_snapshots = [s.snapshot_id for s in keep]

    io = table.io
    if abandoned_job_ms is not None:
        now_ms = time.time() * 1000
        jobs_root = os.path.join(table.root, "jobs")
        for jid in io.list(jobs_root):
            lp = os.path.join(jobs_root, jid, "ledger.json")
            try:
                committed = io.get_json(lp).get("committed_snapshot_id")
                age = now_ms - io.mtime_ms(lp)
            except (OSError, json.JSONDecodeError):
                continue
            if committed is None and age > abandoned_job_ms:
                io.delete_prefix(os.path.join(jobs_root, jid))

    if clean_orphans:
        now_ms = time.time() * 1000
        live_manifests: set[str] = set()
        for s in table.snapshots():
            live_manifests.update(s.manifests)
            # merge-on-read DELETE manifests are live metadata and their
            # parquet delete files live data, with the same rules
            live_manifests.update(s.delete_manifests)
        # outputs of in-flight (uncommitted) maintenance jobs are live:
        # a resumed job will commit them — GC'ing them here would let the
        # resume path commit references to deleted files
        job_outputs = _uncommitted_job_outputs(table.root, io)
        data_root = os.path.join(table.root, "data")
        from olake_spark.table.format import SCAN_DISTRIBUTED_MIN_SHARDS

        use_dist = distributed_orphan_scan
        if use_dist is None:
            use_dist = any(
                len(s.manifests) >= SCAN_DISTRIBUTED_MIN_SHARDS
                for s in table.snapshots()
            )
        if use_dist and table.spark is not None:
            orphans = _orphans_distributed(
                table, sorted(live_manifests), job_outputs, data_root,
                now_ms, orphan_grace_ms,
            )
            touched_dirs = set()
            for rel in orphans:
                io.delete(os.path.join(table.root, rel))
                touched_dirs.add(os.path.dirname(os.path.join(table.root, rel)))
                res.deleted_data_files += 1
            for d in sorted(touched_dirs, reverse=True):
                if d != data_root:
                    io.delete_empty_prefix(d)
        else:
            live_data: set[str] = set(job_outputs)
            for m in live_manifests:
                for f in table._read_manifest(m):
                    live_data.add(f.path)
            for dirpath, names in io.walk(data_root):
                for name in names:
                    p = os.path.join(dirpath, name)
                    rel = os.path.relpath(p, table.root)
                    if rel in live_data or not name.endswith(".parquet"):
                        continue
                    if now_ms - io.mtime_ms(p) < orphan_grace_ms:
                        continue
                    io.delete(p)
                    res.deleted_data_files += 1
                if dirpath != data_root:
                    io.delete_empty_prefix(dirpath)
        man_root = os.path.join(table.root, "manifests")
        for name in io.list(man_root):
            rel = os.path.join("manifests", name)
            if rel not in live_manifests:
                io.delete(os.path.join(table.root, rel))
                table._manifest_cache.pop(rel, None)
                res.deleted_manifests += 1
        # parquet manifest caches (table/manifest_df.write_manifest_cache)
        # are pointer-published per snapshot id — pointers of expired
        # snapshots and data dirs no live pointer references are
        # garbage. An UNPOINTED data dir younger than the build grace is
        # an in-flight write_manifest_cache whose pointer claim hasn't
        # landed yet; deleting it would let the builder publish a
        # pointer to a vanished directory and wedge the cache for a
        # live snapshot.
        cache_root = os.path.join(table.root, "manifest_cache")
        live_sids = {s.snapshot_id for s in table.snapshots()}
        names = io.list(cache_root)  # ONE listing serves the whole GC
        protected_dirs: set[str] = set()
        dead_pointers: set[str] = set()
        dead_dirs: set[str] = set()
        skip_dir_gc = False
        for name in names:
            if not name.endswith(".json"):
                continue
            sid_str = name[:-5]
            is_live = sid_str.isdigit() and int(sid_str) in live_sids
            try:
                ref_dir = os.path.basename(
                    io.get_json(os.path.join(cache_root, name))[
                        "dir"
                    ].rstrip("/")
                )
            except (OSError, json.JSONDecodeError, KeyError):
                ref_dir = None
            if is_live:
                if ref_dir is not None:
                    protected_dirs.add(ref_dir)
                else:
                    # a LIVE pointer we could not read (transient store
                    # error, or mid-create on the emulated store): its
                    # dir is unidentifiable, so deleting ANY dir this
                    # run could orphan it — skip dir GC entirely,
                    # pointer GC below is still exact
                    skip_dir_gc = True
            else:
                dead_pointers.add(name)
                if ref_dir is not None:
                    dead_dirs.add(ref_dir)
        for name in dead_pointers:
            io.delete(os.path.join(cache_root, name))
        if not skip_dir_gc:
            for name in names:
                if name.endswith(".json") or name in protected_dirs:
                    continue
                p = os.path.join(cache_root, name)
                if name in dead_dirs:
                    io.delete_prefix(p)  # referenced only by dead pointers
                else:
                    # unpointed build dir: grace-protect in-flight builds
                    try:
                        young = (
                            now_ms - io.mtime_ms(p) < _CACHE_BUILD_GRACE_MS
                        )
                    except OSError:
                        young = True  # vanished mid-GC: nothing to do
                    if not young:
                        io.delete_prefix(p)
        # metadata versions older than the previous one are unreachable
        meta_root = os.path.join(table.root, "metadata")
        for name in io.list(meta_root):
            if not name.startswith("v") or not name.endswith(".json"):
                continue
            try:
                v = int(name[1:-5])
            except ValueError:
                continue
            if v < table.version - 1:
                io.delete(os.path.join(meta_root, name))
                res.deleted_metadata_versions += 1
    return res
