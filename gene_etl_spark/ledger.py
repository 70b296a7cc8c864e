"""Offset-range checkpoint ledger.

One JSON file per committed batch, atomically created (tmp + os.link),
named ``{end_lsn:020d}-{batch_id}.json`` so a directory listing is the
recovery log. The lake table's snapshot chain is the source of truth;
the ledger is its queryable cache — on resume both are consulted and
reconciled (SURVEY.md §7.4 "exactly-once across ledger + lake").

Reference analogue: gzip-JSON checkpoints (etl/persist.py:339-383) +
the ETLProcessLog run table (models.py:183-198).
"""

from __future__ import annotations

import json
import os
import time
import uuid


class Ledger:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def entries(self) -> list[dict]:
        """All entries, oldest-lsn first. Incrementally cached: entry
        files are immutable once linked and the directory only grows, so
        each call re-LISTS the directory (cross-process freshness, one
        syscall) but only OPENS files it hasn't seen — per-batch fencing
        cost stays O(new batches), not O(run lifetime)."""
        cache: dict[str, dict] = self.__dict__.setdefault("_entry_cache", {})
        names = {fn for fn in os.listdir(self.path) if fn.endswith(".json")}
        for fn in names:
            if fn not in cache:
                with open(os.path.join(self.path, fn)) as f:
                    cache[fn] = json.load(f)
        for fn in list(cache):
            if fn not in names:  # defensive: entries are never removed
                del cache[fn]
        return [cache[fn] for fn in sorted(cache)]

    def committed(self) -> list[dict]:
        return [e for e in self.entries() if e.get("status") == "committed"]

    def max_committed_end_lsn(self) -> int:
        c = self.committed()
        return max((e["end_lsn"] for e in c), default=0)

    def is_committed(self, start_lsn: int, end_lsn: int) -> bool:
        return any(
            e["start_lsn"] == start_lsn and e["end_lsn"] == end_lsn
            for e in self.committed()
        )

    def record(
        self,
        *,
        batch_id: str,
        start_lsn: int,
        end_lsn: int,
        status: str,
        config_hash: str | None = None,
        snapshot_version: int | None = None,
        extra: dict | None = None,
    ) -> dict:
        entry = {
            "batch_id": batch_id,
            "start_lsn": int(start_lsn),
            "end_lsn": int(end_lsn),
            "status": status,
            "config_hash": config_hash,
            "snapshot_version": snapshot_version,
            "committed_at_ms": int(time.time() * 1000),
        }
        if extra:
            entry.update(extra)
        final = os.path.join(self.path, f"{end_lsn:020d}-{batch_id}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
        finally:
            os.unlink(tmp)
        return entry

    def resume_lsn(self, lake_table=None) -> int:
        """Reconciled resume point: max committed end_lsn over ledger ∪
        lake snapshot properties (a crash between lake commit and ledger
        write must not re-apply the batch — the snapshot chain wins)."""
        lsn = self.max_committed_end_lsn()
        if lake_table is not None:
            lake_lsn = lake_table.max_committed_end_lsn()
            if lake_lsn is not None:
                lsn = max(lsn, lake_lsn)
        return lsn
