"""Table integrity checker — the lakehouse ``fsck``.

The reference trusts its destination blindly (writers report per-stream
counts into ``stats.json`` and nothing re-validates them,
/root/reference/utils/telemetry.go); a table format owes users a
verifier: after an incident (partial GC, manual file surgery, object-
store eventual-consistency weirdness) ``verify_table`` answers "is this
snapshot internally consistent, and is every byte it references really
there?" without mutating anything.

Checks, grouped by cost:

metadata-only (always):
- every manifest shard the snapshot references exists and parses;
- no duplicate file path across entries;
- entry sequence numbers are positive and <= the snapshot id;
- entry schema ids resolve against the metadata's schema registry;
- snapshot summary totals (total-rows/files/bytes) match the entry sums;
- named refs point at known snapshots;
- row lineage (when the table tracks it): every data file carries a
  ``first_row_id``, blocks are pairwise disjoint, and the table's
  ``next_row_id`` clears the highest block.

file-level (existence + size; DISTRIBUTED past
``SCAN_DISTRIBUTED_MIN_SHARDS`` manifest shards — a 10^6-file table
stats files from executors, the driver sees only failures):
- every data/delete file exists with exactly the recorded byte size.

footer-level (opt-in ``check_footers=True``, one pyarrow footer read
per file, distributed the same way):
- parquet footer row count matches the entry's ``record_count``.

deep (opt-in ``check_references=True``, one narrow distributed read
over positional-delete/DV files):
- referenced data-file paths are live in the same snapshot (dangling
  references are WARNINGS — harmless to scans, and
  ``remove_dangling_deletes`` cleans them on cadence).

Returns an :class:`FsckReport`; nothing raises on a finding — CI gates
on ``report.ok``, incident response reads ``report.errors``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from olake_spark.table.format import (
    CONTENT_DATA,
    CONTENT_DV,
    CONTENT_EQ_DELETES,
    CONTENT_POS_DELETES,
    SCAN_DISTRIBUTED_MIN_SHARDS,
    Table,
)

_MAX_FINDINGS = 50  # per category; keeps a badly broken table's report bounded


@dataclass
class FsckReport:
    snapshot_id: int | None
    data_files: int = 0
    delete_files: int = 0
    checked_bytes: int = 0
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    checks: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.errors

    def _err(self, msg: str) -> None:
        if len(self.errors) < _MAX_FINDINGS:
            self.errors.append(msg)

    def _warn(self, msg: str) -> None:
        if len(self.warnings) < _MAX_FINDINGS:
            self.warnings.append(msg)


def _check_files_distributed(
    table: Table, entries, report: FsckReport, check_footers: bool
) -> None:
    """Existence/size(/footer) checks as a Spark job over the entries
    frame — O(failures) rows reach the driver."""
    import pandas as pd

    root = table.root
    out_schema = "path string, problem string"

    def probe(batches):
        for b in batches:
            rows = []
            for path, size, rc in zip(
                b["path"], b["file_size_bytes"], b["record_count"]
            ):
                absp = os.path.join(root, path)
                try:
                    st = os.stat(absp)
                except OSError:
                    rows.append((path, "missing"))
                    continue
                if st.st_size != size:
                    rows.append(
                        (path, f"size {st.st_size} != manifest {size}")
                    )
                    continue
                if check_footers:
                    try:
                        import pyarrow.parquet as pq

                        n = pq.ParquetFile(absp).metadata.num_rows
                    except Exception as e:  # noqa: BLE001 — corrupt footer
                        rows.append((path, f"unreadable footer: {e}"))
                        continue
                    if n != rc:
                        rows.append(
                            (path, f"footer rows {n} != manifest {rc}")
                        )
            yield pd.DataFrame(rows, columns=["path", "problem"])

    bad = entries.select(
        "path", "file_size_bytes", "record_count"
    ).mapInPandas(probe, out_schema).collect()
    for r in bad:
        report._err(f"{r.path}: {r.problem}")


def verify_table(
    table: Table,
    snapshot_id: int | None = None,
    check_footers: bool = False,
    check_references: bool = False,
    distributed: bool | None = None,
) -> FsckReport:
    """Validate one snapshot's internal consistency (default: current).
    Read-only. See the module docstring for the check inventory."""
    table.refresh()
    snap = table.snapshot(snapshot_id)
    report = FsckReport(snapshot_id=snap.snapshot_id if snap else None)
    if snap is None:
        report.checks.append("empty-table")
        return report

    # -- manifests parse; entries load (driver: the shard count of ONE
    # snapshot is bounded by rewrite_manifests cadence, and fsck wants
    # the parse errors individually anyway)
    entries = []
    for m in list(snap.manifests) + list(snap.delete_manifests):
        try:
            entries.extend(table._read_manifest(m))
        except Exception as e:  # noqa: BLE001 — missing/corrupt shard
            report._err(f"manifest {m}: unreadable ({e})")
    report.checks.append("manifests-parse")

    data = [e for e in entries if e.content == CONTENT_DATA]
    dels = [e for e in entries if e.content != CONTENT_DATA]
    report.data_files = len(data)
    report.delete_files = len(dels)
    report.checked_bytes = sum(e.file_size_bytes for e in entries)

    # -- entry-level invariants
    seen: set[str] = set()
    for e in entries:
        if e.path in seen:
            report._err(f"duplicate manifest entry for {e.path}")
        seen.add(e.path)
        if e.sequence_number > snap.snapshot_id or e.sequence_number < 0:
            report._err(
                f"{e.path}: sequence_number {e.sequence_number} outside "
                f"[0, {snap.snapshot_id}]"
            )
        elif e.sequence_number == 0:
            # pre-MoR manifests predate sequence stamping — legal, but
            # equality deletes would all apply to such a file
            report._warn(f"{e.path}: unstamped sequence_number (0)")
        if str(e.schema_id) not in table.metadata["schemas"]:
            report._err(f"{e.path}: unknown schema_id {e.schema_id}")
    report.checks.append("entry-invariants")

    # -- summary totals
    s = snap.summary
    want = {
        "total-rows": sum(e.record_count for e in data),
        "total-files": len(data),
        "total-bytes": sum(e.file_size_bytes for e in data),
    }
    for k, v in want.items():
        if k in s and s[k] != v:
            report._err(f"summary {k}={s[k]} but entries sum to {v}")
    report.checks.append("summary-totals")

    # -- refs
    for name, ref in table.metadata.get("refs", {}).items():
        try:
            table.snapshot(ref["snapshot_id"])
        except KeyError:
            report._err(
                f"ref {name!r} points at unknown snapshot "
                f"{ref['snapshot_id']}"
            )
    report.checks.append("refs-resolve")

    # -- row lineage invariants
    if table.row_lineage:
        next_rid = int(table.metadata.get("next_row_id", 0))
        blocks = []
        for e in data:
            if e.first_row_id is None:
                report._err(f"{e.path}: lineage enabled but no first_row_id")
                continue
            blocks.append((e.first_row_id, e.first_row_id + e.record_count, e.path))
        blocks.sort()
        for (a_lo, a_hi, a_p), (b_lo, _b_hi, b_p) in zip(blocks, blocks[1:]):
            if b_lo < a_hi:
                report._err(
                    f"row-id blocks overlap: {a_p} [{a_lo},{a_hi}) and "
                    f"{b_p} starting {b_lo}"
                )
        if blocks and blocks[-1][1] > next_rid:
            report._err(
                f"next_row_id {next_rid} below highest assigned block end "
                f"{blocks[-1][1]} ({blocks[-1][2]})"
            )
        report.checks.append("row-lineage")

    # -- file existence / size / footers
    use_dist = distributed
    if use_dist is None:
        use_dist = len(snap.manifests) >= SCAN_DISTRIBUTED_MIN_SHARDS
    if use_dist and table.spark is not None:
        from olake_spark.table.manifest_df import entries_from_manifests

        frame = entries_from_manifests(
            table, list(snap.manifests) + list(snap.delete_manifests)
        )
        _check_files_distributed(table, frame, report, check_footers)
    else:
        for e in entries:
            absp = table.abs_path(e.path)
            try:
                size = os.stat(absp).st_size
            except OSError:
                report._err(f"{e.path}: missing")
                continue
            if size != e.file_size_bytes:
                report._err(
                    f"{e.path}: size {size} != manifest {e.file_size_bytes}"
                )
                continue
            if check_footers:
                try:
                    import pyarrow.parquet as pq

                    n = pq.ParquetFile(absp).metadata.num_rows
                except Exception as exc:  # noqa: BLE001
                    report._err(f"{e.path}: unreadable footer: {exc}")
                    continue
                if n != e.record_count:
                    report._err(
                        f"{e.path}: footer rows {n} != manifest "
                        f"{e.record_count}"
                    )
    report.checks.append(
        "file-footers" if check_footers else "file-existence"
    )

    # -- positional/DV references live (deep, opt-in)
    pos = [
        d
        for d in dels
        if d.content in (CONTENT_POS_DELETES, CONTENT_DV)
        and os.path.exists(table.abs_path(d.path))
    ]
    if check_references and pos and table.spark is not None:
        live = {e.path for e in data}
        refs = {
            r.file_path
            for r in table.spark.read.schema("file_path string")
            .parquet(*[table.abs_path(d.path) for d in pos])
            .distinct()
            .collect()
        }
        for p in sorted(refs - live):
            report._warn(
                f"positional delete references non-live data file {p} "
                "(dangling; remove_dangling_deletes cleans it)"
            )
        report.checks.append("delete-references")
    # eq-delete content kinds recognized (future formats would land here)
    for d in dels:
        if d.content not in (
            CONTENT_EQ_DELETES, CONTENT_POS_DELETES, CONTENT_DV
        ):
            report._err(f"{d.path}: unknown delete content {d.content!r}")
    return report
