"""Pipeline run logger — local ledger with idempotent upsert.

Semantic port of the reference's Azure Table run logger (reference:
monitoring/azure_table_runs.py): entity keyed (PartitionKey =
env|pipeline|schema|yyyymmdd, RowKey = run_id), context-manager usage
(enter=running, exit=succeeded/failed with duration + metrics),
no-op-without-config soft dependency. Here the sink is a local JSON
ledger (one atomic file per run record)."""

from __future__ import annotations

import datetime as _dt
import json
import os
import time
import traceback
import uuid
from typing import Any


class PipelineRunLogger:
    def __init__(
        self,
        ledger_root: str | None,
        env: str = "dev",
        pipeline: str = "pipeline",
        schema: str = "default",
        run_id: str | None = None,
    ):
        self.enabled = bool(ledger_root)
        self.ledger_root = ledger_root
        self.env = env
        self.pipeline = pipeline
        self.schema = schema
        self.run_id = run_id or uuid.uuid4().hex
        self.metrics: dict[str, Any] = {}
        self._t0: float | None = None

    @property
    def partition_key(self) -> str:
        day = _dt.datetime.now(_dt.timezone.utc).strftime("%Y%m%d")
        return f"{self.env}|{self.pipeline}|{self.schema}|{day}"

    def _write(self, status: str, error: str | None = None) -> None:
        if not self.enabled:
            return
        rec = {
            "partition_key": self.partition_key,
            "row_key": self.run_id,
            "status": status,
            "ts_ms": int(time.time() * 1000),
            "duration_ms": int((time.monotonic() - self._t0) * 1000) if self._t0 else None,
            "metrics": self.metrics,
            "error": error,
        }
        d = os.path.join(self.ledger_root, self.partition_key.replace("|", "_"))
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{self.run_id}.json")
        tmp = f"{p}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, p)  # idempotent upsert by (partition_key, run_id)

    def add_metrics(self, **kv: Any) -> None:
        self.metrics.update(kv)

    def __enter__(self) -> "PipelineRunLogger":
        self._t0 = time.monotonic()
        self._write("running")
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self._write("succeeded")
        else:
            self._write("failed", error="".join(traceback.format_exception_only(exc_type, exc)).strip())
        return False

    @staticmethod
    def read_all(ledger_root: str) -> list[dict]:
        out = []
        for dirpath, _d, files in os.walk(ledger_root):
            for fn in files:
                if fn.endswith(".json"):
                    with open(os.path.join(dirpath, fn)) as f:
                        out.append(json.load(f))
        return out
