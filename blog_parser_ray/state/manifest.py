"""Checkpoint manifest (S5, SURVEY.md §3.3/§4.4).

One JSONL line per COMMITTED partition: partition id, input fragment, row
count, per-sink counts, token count, bytes, attempt, stage wall time. The
commit protocol (writer side in stages/sink.py) is:

1. task writes every sink file of its partition under ``_tmp/{pid}/``
2. task atomically renames each into ``sinks/{sink}/part-{pid:06d}.parquet``
3. the DRIVER, streaming lineage rows as tasks finish, appends the manifest
   line and fsyncs

A crash between (2) and (3) re-runs the partition on resume; the re-run
renames over its own files (idempotent, no double-write) — the documented
crash-window analysis of SURVEY.md §3.3. Ray task retries are safe for the
same reason.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterable


class Manifest:
    def __init__(self, out_dir: str) -> None:
        self.dir = os.path.join(out_dir, "_manifest")
        self.path = os.path.join(self.dir, "manifest.jsonl")
        os.makedirs(self.dir, exist_ok=True)

    def committed(self) -> dict[int, dict[str, Any]]:
        """partition_id → record for every committed partition (last wins)."""
        out: dict[int, dict[str, Any]] = {}
        if not os.path.exists(self.path):
            return out
        with open(self.path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn final line from a crash — partition re-runs
                out[int(rec["partition_id"])] = rec
        return out

    def append(self, record: dict[str, Any]) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def append_many(self, records: Iterable[dict[str, Any]]) -> None:
        records = list(records)
        if not records:
            return
        with open(self.path, "a", encoding="utf-8") as f:
            for rec in records:
                f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())
