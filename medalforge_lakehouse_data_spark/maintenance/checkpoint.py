"""Per-partition lineage checkpoint ledger for resumable maintenance.

Semantics grafted from the reference's run logger + checkpoint isolation
(reference: monitoring/azure_table_runs.py:116-135,271-337 — idempotent
upsert keyed PartitionKey/RowKey; bronze/orchestrator.py:80-83 —
checkpoint dirs isolated per reprocess label).

A job writes one JSON record per work unit (partition/file-group):
status, rows/bytes metrics, timestamps. Records are atomic-rename
files keyed by unit id, so a killed run resumes by skipping completed
units; combined with Table commit_keys the resume produces no
duplicate commits (north_rule resumability gate).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Iterator


class JobCheckpoint:
    def __init__(self, root: str, job_id: str):
        self.job_id = job_id
        self.dir = os.path.join(root, job_id)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, unit_id: str) -> str:
        safe = unit_id.replace(os.sep, "_").replace("=", "_")
        return os.path.join(self.dir, f"{safe}.json")

    def is_done(self, unit_id: str) -> bool:
        p = self._path(unit_id)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                return json.load(f).get("status") == "done"
        except (json.JSONDecodeError, OSError):
            return False

    def record(self, unit_id: str) -> dict | None:
        p = self._path(unit_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def mark(self, unit_id: str, status: str, **metrics: Any) -> None:
        """Idempotent upsert of a unit record (atomic rename)."""
        payload = {
            "job_id": self.job_id,
            "unit_id": unit_id,
            "status": status,
            "ts_ms": int(time.time() * 1000),
            **metrics,
        }
        p = self._path(unit_id)
        tmp = f"{p}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)

    def mark_done(self, unit_id: str, **metrics: Any) -> None:
        self.mark(unit_id, "done", **metrics)

    def records(self) -> Iterator[dict]:
        for fn in sorted(os.listdir(self.dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.dir, fn)) as f:
                    try:
                        yield json.load(f)
                    except json.JSONDecodeError:
                        continue

    def summary(self) -> dict:
        done = rows = nbytes = files = 0
        total = 0
        for r in self.records():
            total += 1
            if r.get("status") == "done":
                done += 1
                rows += r.get("rows", 0)
                nbytes += r.get("bytes", 0)
                files += r.get("files", 0)
        return {
            "job_id": self.job_id,
            "units_total": total,
            "units_done": done,
            "rows": rows,
            "bytes": nbytes,
            "files": files,
        }
