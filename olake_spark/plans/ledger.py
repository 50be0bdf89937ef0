"""Per-partition lineage ledger — the resumability store (SURVEY.md P6).

Spark replays tasks within a job, but a *killed driver* loses everything;
the reference solves this with a chunk set persisted to its state file
before any read and removed per completed chunk
(/root/reference/types/state.go:94-149,
/root/reference/drivers/postgres/internal/backfill.go:66-77). The ledger
is our equivalent: a maintenance job plans its task groups (group ->
input files) into the ledger as ``pending`` *before* executing; each
finished group flips to ``done`` with its output files + rows/bytes
metrics; a restarted job skips ``done`` groups and re-runs ``pending``
ones idempotently (outputs go to fresh immutable commit dirs, so a
half-written attempt leaves only orphan files that snapshot expiry GCs —
never duplicate references). The final table commit happens once, after
all groups are done, and is recorded in the ledger
(ack-after-commit ordering, /root/reference/drivers/postgres/internal/cdc.go:102-120).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

PENDING = "pending"
DONE = "done"


def _atomic_write(path: str, obj: Any) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


class Ledger:
    """Checkpointed state of one maintenance job."""

    def __init__(self, path: str, job_id: str):
        self.path = path
        if os.path.exists(path):
            with open(path) as f:
                self.state = json.load(f)
            if self.state["job_id"] != job_id:
                raise ValueError(
                    f"ledger at {path} belongs to job {self.state['job_id']}"
                )
        else:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            self.state = {
                "job_id": job_id,
                "created_ms": int(time.time() * 1000),
                "committed_snapshot_id": None,
                "entries": {},
            }
            self._flush()

    @classmethod
    def for_job(cls, table_root: str, job_id: str) -> Ledger:
        return cls(os.path.join(table_root, "jobs", job_id, "ledger.json"), job_id)

    def _flush(self) -> None:
        _atomic_write(self.path, self.state)

    # ------------------------------------------------------------------ plan
    def plan(self, key: str, inputs: list[str], payload: dict | None = None) -> None:
        """Register a task group as pending (no-op if already planned —
        a resumed job re-plans deterministically and must not reset
        finished groups)."""
        if key in self.state["entries"]:
            return
        self.state["entries"][key] = {
            "status": PENDING,
            "inputs": inputs,
            "outputs": [],
            "metrics": {},
            "payload": payload or {},
        }
        self._flush()

    def entry(self, key: str) -> dict | None:
        return self.state["entries"].get(key)

    def is_done(self, key: str) -> bool:
        e = self.entry(key)
        return bool(e and e["status"] == DONE)

    def pending_keys(self) -> list[str]:
        return [k for k, e in self.state["entries"].items() if e["status"] == PENDING]

    def done_keys(self) -> list[str]:
        return [k for k, e in self.state["entries"].items() if e["status"] == DONE]

    # -------------------------------------------------------------- complete
    def mark_done(
        self, key: str, outputs: list[dict], metrics: dict | None = None
    ) -> None:
        e = self.state["entries"][key]
        e["status"] = DONE
        e["outputs"] = outputs
        e["metrics"] = metrics or {}
        e["finished_ms"] = int(time.time() * 1000)
        self._flush()

    def mark_committed(self, snapshot_id: int) -> None:
        self.state["committed_snapshot_id"] = snapshot_id
        self._flush()

    def reset(self, key: str) -> None:
        """Flip a done group back to pending (outputs were lost)."""
        e = self.state["entries"][key]
        e["status"] = PENDING
        e["outputs"] = []
        e["metrics"] = {}
        e.pop("finished_ms", None)
        self._flush()

    def reset_missing_outputs(self, table_root: str) -> list[str]:
        """Re-pend every done group with a vanished output file.

        A done-but-uncommitted group's outputs can be lost to an aggressive
        orphan GC or manual deletion; committing ledger.all_outputs()
        without this check would produce a snapshot referencing deleted
        data files (silent corruption). Re-running the group is safe:
        outputs go to a fresh immutable commit dir.
        """
        reset = []
        for key in self.done_keys():
            outs = self.state["entries"][key]["outputs"]
            if any(
                not os.path.exists(os.path.join(table_root, o["path"]))
                for o in outs
            ):
                self.reset(key)
                reset.append(key)
        return reset


    @property
    def committed_snapshot_id(self) -> int | None:
        return self.state["committed_snapshot_id"]

    def all_outputs(self) -> list[dict]:
        return [o for e in self.state["entries"].values() for o in e["outputs"]]

    def all_inputs(self) -> list[str]:
        return [p for e in self.state["entries"].values() for p in e["inputs"]]

    def totals(self) -> dict:
        rows = sum(e["metrics"].get("rows", 0) for e in self.state["entries"].values())
        bts = sum(e["metrics"].get("bytes_in", 0) for e in self.state["entries"].values())
        return {"rows": rows, "bytes_in": bts, "groups": len(self.state["entries"])}
