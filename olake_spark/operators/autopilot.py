"""Policy-driven table maintenance: inspect → plan → execute.

The reference runs one verb per invocation (`/root/reference/main.go`
dispatches a single sync/discover command per process); keeping a fleet
of tokenized-sequence tables healthy additionally needs something that
*decides* which rewrite each table is due for. ``auto_maintain`` is that
decision loop as a library call / CLI verb:

1. ``inspect_health`` — a METADATA-ONLY health report. Everything comes
   from snapshot summaries (O(1)), the snapshot list (O(history)), and
   manifest entries (O(files), via the distributed entries frame past
   ``SCAN_DISTRIBUTED_MIN_SHARDS`` shards). No data file is ever opened,
   so the steady-state "is this table fine?" probe costs the same on a
   100 TB table as on a test fixture.
2. ``plan_actions`` — a deterministic, explainable plan: each action
   carries the policy threshold it tripped. ``dry_run=True`` returns the
   plan without touching the table.
3. ``auto_maintain`` — executes the plan in dependency order:

   materialize_deletes → compact | cluster → rewrite_manifests →
   remove_dangling_deletes → expire_snapshots

   Delete debt folds first so the rewrite pass reads clean rows; a
   planned cluster SUPERSEDES compaction (a curve rewrite already packs
   to target size — binpacking the same files first would rewrite the
   data twice); manifests reshard after the file set settles; snapshot
   expiry runs last so it can trim the history the earlier actions just
   grew. Every underlying op keeps its own ledger/idempotence semantics,
   so a killed auto_maintain resumes exactly like a killed single op.

A second ``auto_maintain`` on a healthy table plans nothing — the loop
is a fixed point, safe to run on a cron cadence.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import functions as F

from olake_spark.table.format import (
    MANIFEST_MAX_ENTRIES,
    SCAN_DISTRIBUTED_MIN_SHARDS,
    CommitConflict,
    Snapshot,
    Table,
)
from olake_spark.operators.compaction import DEFAULT_TARGET_FILE_BYTES


@dataclass
class MaintenancePolicy:
    """Thresholds the planner checks. Defaults suit an hourly cadence on
    an append-heavy CDC-synced table; tighten for latency-sensitive
    readers, loosen for cold archives."""

    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES
    small_file_ratio: float = 0.75  # "small" = below this × target
    min_small_files: int = 4  # compact when at least this many small files
    max_delete_files: int = 8  # materialize when MoR read tax exceeds
    max_delete_ratio: float = 0.10  # … or deleted rows / table rows exceeds
    max_manifest_shards: int = 8  # reshard manifests beyond this
    manifest_target_entries: int = MANIFEST_MAX_ENTRIES
    max_snapshots: int = 20  # expire history beyond this
    expire_keep_last: int = 5
    cluster_curve: str | None = None  # opt-in: 'zorder' | 'hilbert'
    cluster_scope: str = "global"
    recluster_churn: float = 0.25  # recluster when appended rows / total ≥
    bloom_columns: list[str] | None = None  # opt-in point-lookup pruning


@dataclass
class TableHealth:
    """Metadata-only snapshot of table state (no data scan)."""

    snapshot_id: int | None = None
    total_files: int = 0
    total_rows: int = 0
    total_bytes: int = 0
    small_files: int = 0
    small_file_bytes: int = 0
    manifest_shards: int = 0
    snapshot_count: int = 0
    delete_file_count: int = 0
    delete_rows: int = 0
    rows_since_cluster: int = 0
    last_cluster_kind: str | None = None
    last_cluster_snapshot_id: int | None = None
    history_truncated: bool = False
    protect_snapshots: list[int] = field(default_factory=list)

    def to_dict(self) -> dict:
        return dict(self.__dict__)  # protect_snapshots stays a list


@dataclass
class PlannedAction:
    op: str
    reason: str
    kwargs: dict = field(default_factory=dict)


@dataclass
class ActionResult:
    op: str
    reason: str
    snapshot_id: int | None = None
    skipped: bool = False
    details: dict = field(default_factory=dict)


@dataclass
class AutoMaintainResult:
    health: TableHealth
    planned: list[PlannedAction]
    executed: list[ActionResult] = field(default_factory=list)
    dry_run: bool = False
    passes: int = 0
    converged: bool = False

    def to_dict(self) -> dict:
        return {
            "health": self.health.to_dict(),
            "planned": [
                {"op": a.op, "reason": a.reason, "kwargs": a.kwargs}
                for a in self.planned
            ],
            "executed": [
                {"op": r.op, "reason": r.reason, "snapshot_id": r.snapshot_id,
                 "skipped": r.skipped, "details": r.details}
                for r in self.executed
            ],
            "dry_run": self.dry_run,
            "passes": self.passes,
            "converged": self.converged,
        }


_PROP_FIELDS = {
    "maintenance.target-file-bytes": ("target_file_bytes", int),
    "maintenance.small-file-ratio": ("small_file_ratio", float),
    "maintenance.min-small-files": ("min_small_files", int),
    "maintenance.max-delete-files": ("max_delete_files", int),
    "maintenance.max-delete-ratio": ("max_delete_ratio", float),
    "maintenance.max-manifest-shards": ("max_manifest_shards", int),
    "maintenance.manifest-target-entries": ("manifest_target_entries", int),
    "maintenance.max-snapshots": ("max_snapshots", int),
    "maintenance.expire-keep-last": ("expire_keep_last", int),
    "maintenance.cluster-curve": ("cluster_curve", str),
    "maintenance.cluster-scope": ("cluster_scope", str),
    "maintenance.recluster-churn": ("recluster_churn", float),
    "maintenance.bloom-columns": (
        "bloom_columns",
        lambda v: sorted(c.strip() for c in v.split(",") if c.strip()),
    ),
}


def policy_from_table(
    table: Table, overrides: dict | None = None
) -> MaintenancePolicy:
    """Policy seeded from the table's own ``maintenance.*`` properties
    (``table.set_properties``), so each table in a fleet carries its
    maintenance contract with it — the caller's ``overrides`` (e.g. CLI
    flags) beat properties, properties beat defaults."""
    kw: dict = {}
    props = table.properties
    for prop, (field_name, cast) in _PROP_FIELDS.items():
        if prop in props:
            try:
                kw[field_name] = cast(props[prop])
            except ValueError as e:
                raise ValueError(
                    f"bad table property {prop}={props[prop]!r}: {e}"
                ) from e
    kw.update(overrides or {})
    return MaintenancePolicy(**kw)


# rewrite kinds that move bytes WITHOUT adding data — their summary
# added-rows is rewritten rows, not churn, and must not trigger a
# recluster of bytes a maintenance pass just touched
_LAYOUT_KINDS = {
    "compaction",
    "materialize-deletes",
    "remove-dangling-deletes",
    "write-deletion-vectors",
    "rewrite-position-deletes",
}


def _last_cluster(
    table: Table, snap: Snapshot
) -> tuple[Snapshot | None, int, bool]:
    """Walk the parent chain from ``snap`` to the most recent curve
    rewrite; returns (anchor | None, churn rows since, truncated). Pure
    snapshot-summary arithmetic — O(history), no manifest reads.

    Churn counts NET new rows (added − removed, floored at 0) and skips
    layout-only rewrite commits entirely, so compaction/materialize
    passes never inflate it. ``truncated=True`` means the walk hit
    expired history before finding a curve commit — the table may well
    have been clustered once, we just can't see it; callers must not
    read that as "never clustered"."""
    by_id = {s.snapshot_id: s for s in table.snapshots()}
    cur: Snapshot | None = snap
    rows_since = 0
    while cur is not None:
        kind = cur.summary.get("kind")
        if isinstance(kind, str) and kind.startswith("cluster-"):
            return cur, rows_since, False
        if not (isinstance(kind, str) and kind in _LAYOUT_KINDS):
            added = int(cur.summary.get("added-rows", 0) or 0)
            removed = int(cur.summary.get("removed-rows", 0) or 0)
            rows_since += max(added - removed, 0)
        if cur.parent_id is None:
            return None, rows_since, False
        nxt = by_id.get(cur.parent_id)
        if nxt is None:  # parent expired: history ends mid-chain
            return None, rows_since, True
        cur = nxt
    return None, rows_since, False


def inspect_health(
    table: Table, policy: MaintenancePolicy | None = None
) -> TableHealth:
    policy = policy or MaintenancePolicy()
    table.refresh()
    snap = table.snapshot()
    if snap is None:
        return TableHealth(snapshot_count=len(table.snapshots()))

    h = TableHealth(
        snapshot_id=snap.snapshot_id,
        total_files=int(snap.summary.get("total-files", 0) or 0),
        total_rows=int(snap.summary.get("total-rows", 0) or 0),
        total_bytes=int(snap.summary.get("total-bytes", 0) or 0),
        manifest_shards=len(snap.manifests),
        snapshot_count=len(table.snapshots()),
    )

    small_bytes = int(policy.target_file_bytes * policy.small_file_ratio)
    if (
        len(snap.manifests) >= SCAN_DISTRIBUTED_MIN_SHARDS
        and table.spark is not None
    ):
        # big metadata plane: aggregate the entries frame, never the
        # driver — same seam scan planning uses past 64 shards
        from olake_spark.table.manifest_df import entries_from_manifests

        row = (
            entries_from_manifests(table, snap.manifests)
            .agg(
                F.sum(
                    F.when(F.col("file_size_bytes") < small_bytes, 1)
                    .otherwise(0)
                ).alias("small"),
                F.sum(
                    F.when(
                        F.col("file_size_bytes") < small_bytes,
                        F.col("file_size_bytes"),
                    ).otherwise(0)
                ).alias("small_bytes"),
            )
            .first()
        )
        h.small_files = int(row["small"] or 0)
        h.small_file_bytes = int(row["small_bytes"] or 0)
    else:
        for f in table.files():
            if f.file_size_bytes < small_bytes:
                h.small_files += 1
                h.small_file_bytes += f.file_size_bytes

    # delete debt: bounded by maintenance cadence, driver-side by design
    dels = table.delete_files()
    h.delete_file_count = len(dels)
    h.delete_rows = sum(d.record_count for d in dels)

    last, rows_since, truncated = _last_cluster(table, snap)
    h.rows_since_cluster = rows_since
    h.history_truncated = truncated
    if last is not None:
        h.last_cluster_kind = last.summary.get("kind")
        h.last_cluster_snapshot_id = last.snapshot_id

    # snapshots routine expiry must never drop (CDC-out consumer cursors)
    from olake_spark.operators.expire import protected_changelog_snapshots

    h.protect_snapshots = sorted(protected_changelog_snapshots(table))
    return h


def plan_actions(
    health: TableHealth, policy: MaintenancePolicy | None = None
) -> list[PlannedAction]:
    policy = policy or MaintenancePolicy()
    plan: list[PlannedAction] = []
    if health.snapshot_id is None:
        return plan

    materializing = health.delete_file_count >= policy.max_delete_files or (
        health.total_rows > 0
        and health.delete_rows / health.total_rows > policy.max_delete_ratio
    )
    if materializing:
        plan.append(PlannedAction(
            "materialize_deletes",
            f"{health.delete_file_count} delete files / "
            f"{health.delete_rows} deleted rows exceed policy "
            f"(max_delete_files={policy.max_delete_files}, "
            f"max_delete_ratio={policy.max_delete_ratio})",
            {"target_file_bytes": policy.target_file_bytes},
        ))

    churned = (
        health.total_rows > 0
        and health.rows_since_cluster / health.total_rows
        >= policy.recluster_churn
    )
    never = (
        health.last_cluster_snapshot_id is None
        and not health.history_truncated
    )
    # truncated history means "clustered at some expired point, maybe":
    # recluster only on the surviving churn, never on the blind spot —
    # otherwise every run after expiry trims the anchor would plan a
    # full O(table) rewrite
    clustering = policy.cluster_curve is not None and (never or churned)
    if clustering:
        if never:
            why = "never clustered"
        elif health.last_cluster_snapshot_id is not None:
            why = (f"{health.rows_since_cluster} rows appended since "
                   f"snapshot {health.last_cluster_snapshot_id} "
                   f"(churn ≥ {policy.recluster_churn:.0%})")
        else:
            why = (f"{health.rows_since_cluster} rows appended across "
                   "surviving history (last curve commit expired; "
                   f"churn ≥ {policy.recluster_churn:.0%})")
        plan.append(PlannedAction(
            "cluster",
            f"{why}; curve={policy.cluster_curve}",
            {
                "curve": policy.cluster_curve,
                "scope": policy.cluster_scope,
                "target_file_bytes": policy.target_file_bytes,
                # incremental from the last curve commit when one exists
                "since_snapshot_id": health.last_cluster_snapshot_id,
            },
        ))
    elif health.small_files >= policy.min_small_files:
        # a planned cluster already rewrites to target size — binpacking
        # first would rewrite the same bytes twice
        plan.append(PlannedAction(
            "compact",
            f"{health.small_files} files under "
            f"{int(policy.target_file_bytes * policy.small_file_ratio)} B "
            f"(min_small_files={policy.min_small_files})",
            {"target_file_bytes": policy.target_file_bytes,
             "small_file_ratio": policy.small_file_ratio},
        ))

    ideal_shards = max(
        1, math.ceil(max(health.total_files, 1) / policy.manifest_target_entries)
    )
    if health.manifest_shards > max(policy.max_manifest_shards, ideal_shards):
        plan.append(PlannedAction(
            "rewrite_manifests",
            f"{health.manifest_shards} manifest shards for "
            f"{health.total_files} files "
            f"(max_manifest_shards={policy.max_manifest_shards})",
            {"target_entries": policy.manifest_target_entries},
        ))

    rewriting = any(a.op in ("compact", "cluster") for a in plan)
    if health.delete_file_count > 0 and not materializing and rewriting:
        # only the rewrites THIS plan performs can strand delete files;
        # steady-state delete debt below the materialize threshold is
        # healthy and must not keep the plan non-empty forever
        plan.append(PlannedAction(
            "remove_dangling_deletes",
            f"{health.delete_file_count} delete files live through a "
            "planned rewrite; dropping any left with no live target",
        ))

    if policy.bloom_columns and (materializing or rewriting):
        # rewrites replace file paths, stranding their bloom coverage
        # (blob rows key on path; outputs are unpruned until the next
        # build) — an incremental refresh is O(rewritten files)
        plan.append(PlannedAction(
            "refresh_blooms",
            "a planned rewrite replaces data-file paths; restoring "
            f"bloom coverage on {policy.bloom_columns}",
            {"columns": list(policy.bloom_columns)},
        ))

    # every action above commits a snapshot — count them in
    expected = health.snapshot_count + len(plan)
    if expected > policy.max_snapshots:
        kwargs: dict = {"keep_last": policy.expire_keep_last}
        if health.protect_snapshots:
            # CDC-out consumers' acked cursors (and everything newer)
            # survive routine expiry — same contract as the expire verb
            kwargs["protect_snapshot_ids"] = list(health.protect_snapshots)
        plan.append(PlannedAction(
            "expire_snapshots",
            f"{health.snapshot_count} snapshots (+{len(plan)} planned) "
            f"exceed max_snapshots={policy.max_snapshots}"
            + (f"; protecting changelog cursors "
               f"{health.protect_snapshots}"
               if health.protect_snapshots else ""),
            kwargs,
        ))
    return plan


def auto_maintain(
    table: Table,
    policy: MaintenancePolicy | None = None,
    dry_run: bool = False,
    max_passes: int = 1,
) -> AutoMaintainResult:
    """One call = up to ``max_passes`` inspect→plan→execute cycles.

    A single pass can leave residual work at the margins (binpack writes
    one file per scan partition, so a pass over thousands of tiny files
    can itself emit a handful of small tails); each extra pass strictly
    shrinks the plan, and the loop stops early when a re-inspection
    plans nothing (``converged=True``) or when a pass makes no progress
    (every action skipped — nothing left that the ops consider worth
    rewriting). ``max_passes=1`` is the cron-cadence mode; pass a larger
    value for run-to-convergence maintenance windows.

    With ``policy=None`` the policy comes from the table's own
    ``maintenance.*`` properties (``policy_from_table``)."""
    policy = policy or policy_from_table(table)
    health = inspect_health(table, policy)
    planned = plan_actions(health, policy)
    out = AutoMaintainResult(health=health, planned=planned, dry_run=dry_run)
    if dry_run:
        return out

    plan = planned
    for pass_no in range(max_passes):
        if not plan:
            break
        progressed, aborted = _run_pass(table, plan, pass_no, out)
        out.passes = pass_no + 1
        if not progressed and not aborted:
            break
        plan = plan_actions(inspect_health(table, policy), policy)
    out.converged = not plan
    if out.executed:
        _journal(table, out)
    return out


def _journal(table: Table, out: AutoMaintainResult) -> None:
    """Audit trail for fleet operators: every auto_maintain run that
    executed work drops one JSON file under ``jobs/autopilot/`` (one
    file per run — append-only by construction, so concurrent runs and
    retries never clobber each other; healthy no-op probes write
    nothing). Best-effort: a journal write failure never fails the
    maintenance that already committed."""
    import json
    import os
    import time

    try:
        prefix = os.path.join(table.root, "jobs", "autopilot")
        table.io.ensure_prefix(prefix)
        name = f"run-{int(time.time() * 1000)}-{os.getpid()}.json"
        table.io.put_json(
            os.path.join(prefix, name),
            {"ts_ms": int(time.time() * 1000), **out.to_dict()},
        )
    except OSError:
        pass


def maintenance_history(table: Table, limit: int = 50) -> list[dict]:
    """The table's auto-maintenance journal, newest first (bounded by
    ``limit``). Each entry is one executed auto_maintain run:
    health snapshot, plan with reasons, per-action results, passes,
    convergence."""
    import os

    prefix = os.path.join(table.root, "jobs", "autopilot")
    try:
        names = sorted(table.io.list(prefix), reverse=True)[:limit]
    except OSError:
        return []
    out = []
    for n in names:
        try:
            out.append(table.io.get_json(os.path.join(prefix, n)))
        except (OSError, ValueError):
            continue
    return out


def _run_pass(
    table: Table,
    plan: list[PlannedAction],
    pass_no: int,
    out: AutoMaintainResult,
) -> bool:
    progressed = False
    aborted = False
    results: list[ActionResult] = []
    for action in plan:
        table.refresh()
        try:
            if action.op == "materialize_deletes":
                from olake_spark.operators.deletes import materialize_deletes

                r = materialize_deletes(table, **action.kwargs)
                results.append(ActionResult(
                    action.op, action.reason, snapshot_id=r.snapshot_id,
                    skipped=r.snapshot_id is None,
                    details={"rewritten_files": r.rewritten_files,
                             "removed_delete_files": r.removed_delete_files},
                ))
            elif action.op == "cluster":
                from olake_spark.operators.clustering import cluster

                kwargs = dict(action.kwargs)
                fallback = False
                if kwargs.get("since_snapshot_id") is None:
                    r = cluster(table, **kwargs)
                else:
                    try:
                        r = cluster(table, **kwargs)
                    except KeyError:
                        # incremental base expired between plan and execute
                        # → full pass (only this narrow case is retried; a
                        # KeyError from a full pass is a genuine bug and
                        # propagates)
                        kwargs.pop("since_snapshot_id", None)
                        fallback = True
                        r = cluster(table, **kwargs)
                details = {"input_files": r.input_files,
                           "output_files": r.output_files, "rows": r.rows}
                if fallback:
                    details["fallback"] = "full pass (incremental base expired)"
                results.append(ActionResult(
                    action.op, action.reason, snapshot_id=r.snapshot_id,
                    skipped=r.skipped, details=details,
                ))
            elif action.op == "compact":
                from olake_spark.operators.compaction import compact

                r = compact(table, **action.kwargs)
                results.append(ActionResult(
                    action.op, action.reason, snapshot_id=r.snapshot_id,
                    skipped=r.skipped,
                    details={"input_files": r.input_files,
                             "output_files": r.output_files, "rows": r.rows},
                ))
            elif action.op == "rewrite_manifests":
                from olake_spark.operators.manifests import rewrite_manifests

                r = rewrite_manifests(table, **action.kwargs)
                results.append(ActionResult(
                    action.op, action.reason, snapshot_id=r.snapshot_id,
                    skipped=r.skipped,
                    details={"shards_before": r.old_shards,
                             "shards_after": r.new_shards},
                ))
            elif action.op == "refresh_blooms":
                from olake_spark.table.blooms import build_bloom_blobs

                entry = build_bloom_blobs(
                    table, columns=action.kwargs["columns"], incremental=True
                )
                results.append(ActionResult(
                    action.op, action.reason,
                    snapshot_id=table.current_snapshot_id,
                    details={"datasets": len(entry.get("paths", []))},
                ))
            elif action.op == "remove_dangling_deletes":
                from olake_spark.operators.deletes import remove_dangling_deletes

                n = remove_dangling_deletes(table)
                table.refresh()
                results.append(ActionResult(
                    action.op, action.reason,
                    snapshot_id=table.current_snapshot_id if n else None,
                    skipped=n == 0, details={"removed_delete_files": n},
                ))
            elif action.op == "expire_snapshots":
                from olake_spark.operators.expire import expire_snapshots

                r = expire_snapshots(table, **action.kwargs)
                results.append(ActionResult(
                    action.op, action.reason,
                    skipped=not r.expired_snapshots,
                    details={"expired": len(r.expired_snapshots),
                             "deleted_data_files": r.deleted_data_files,
                             "deleted_manifests": r.deleted_manifests},
                ))
            else:  # pragma: no cover - planner/executor share the op set
                raise ValueError(f"unknown planned op: {action.op}")
        except (CommitConflict, RuntimeError) as e:
            # concurrent interference: another maintainer's commit made
            # this action's plan stale (retries exhausted, or a rewrite
            # validation abort whose documented contract is "rerun
            # against the new snapshot"). Stop the pass — the remaining
            # actions share the stale premises — and let the pass loop
            # re-inspect and re-plan from fresh metadata.
            results.append(ActionResult(
                action.op, action.reason, skipped=True,
                details={"aborted": f"{type(e).__name__}: {e}"},
            ))
            aborted = True
            break
    for res in results:
        res.details["pass"] = pass_no
        progressed = progressed or not res.skipped
    out.executed.extend(results)
    return progressed, aborted
