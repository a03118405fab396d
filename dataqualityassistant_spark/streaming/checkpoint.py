"""Per-partition checkpoint watermarks for idempotent batch resume.

The reference has no streaming and no resume (its hot path is a synchronous
request handler, app/main.py:358-411). The north rule's "resumable from
checkpoint with per-partition watermarks" is a *batch* idempotency feature:
the pipeline processes the input in bucket waves; after each wave's output
commit, a watermark record (bucket ids, row counts, max warc_ts) is
persisted here. A re-run of the same run_id skips completed buckets, and
dynamic partition overwrite makes re-processing a half-written wave
idempotent (the wave's output partitions are atomically replaced, never
appended twice).

Records are driver-side JSON (metadata-scale — thousands of buckets, not
rows), written via tempfile + rename so a crash mid-write never yields a
readable-but-partial record. On a real cluster this directory lives on the
shared filesystem / object store next to the output table (or is replaced
by Iceberg snapshot metadata).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root

    def _run_dir(self, run_id: str) -> str:
        return os.path.join(self.root, run_id)

    def completed_buckets(self, run_id: str) -> set[int]:
        done: set[int] = set()
        for rec in self.records(run_id):
            done.update(rec["buckets"])
        return done

    def records(self, run_id: str) -> list[dict[str, Any]]:
        d = self._run_dir(run_id)
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out.append(json.load(f))
        return out

    def mark_completed(self, run_id: str, wave: int, buckets: list[int],
                       stats: dict[str, Any] | None = None) -> None:
        d = self._run_dir(run_id)
        os.makedirs(d, exist_ok=True)
        rec = {"run_id": run_id, "wave": wave, "buckets": sorted(int(b) for b in buckets)}
        if stats:
            rec.update(stats)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, os.path.join(d, f"wave-{wave:05d}.json"))
