"""Offset-range checkpoint ledger.

One JSON file per committed batch, atomically created (tmp + os.link),
named ``{end_lsn:020d}-{batch_id}.json`` so a directory listing is the
recovery log. The lake table's snapshot chain is the source of truth;
the ledger is its queryable cache — on resume both are consulted and
reconciled (SURVEY.md §7.4 "exactly-once across ledger + lake").

Segments (round 6): one JSON per batch is the write path, but at 10^5+
batches a fresh resume would open 10^5 files. ``compact()`` folds every
entry — loose files and prior segments — into ONE immutable
``seg-*.json`` with the same tmp+link atomicity, then removes the
folded sources; a crash between the segment link and the source unlink
leaves duplicates that ``entries()`` dedups by batch_id, and the next
compact sweeps them. Resume over an N-batch compacted ledger therefore
reads O(1) files. ``compact_if_needed`` uses a doubling trigger
(loose > max(min_loose, compacted/4)) so total rewrite work stays
amortized O(1) per entry across unbounded ingest.

Reference analogue: gzip-JSON checkpoints (etl/persist.py:339-383) +
the ETLProcessLog run table (models.py:183-198).
"""

from __future__ import annotations

import json
import os
import time
import uuid

_SEG_PREFIX = "seg-"


class Ledger:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    # ------------------------------------------------------------------ #
    def _names(self) -> set[str]:
        return {fn for fn in os.listdir(self.path) if fn.endswith(".json")}

    def entries(self) -> list[dict]:
        """All entries, oldest-lsn first. Incrementally cached: entry and
        segment files are immutable once linked, so each call re-LISTS
        the directory (cross-process freshness, one syscall) but only
        OPENS files it hasn't seen — per-batch fencing cost stays O(new
        batches), not O(run lifetime). Duplicates across a segment and
        its not-yet-removed sources (crash window) dedup by batch_id."""
        cache: dict[str, list[dict]] = self.__dict__.setdefault("_entry_cache", {})
        names = self._names()
        for fn in names:
            if fn not in cache:
                with open(os.path.join(self.path, fn)) as f:
                    payload = json.load(f)
                if fn.startswith(_SEG_PREFIX):
                    cache[fn] = list(payload["entries"])
                else:
                    cache[fn] = [payload]
        for fn in list(cache):
            if fn not in names:  # compaction removed the folded sources
                del cache[fn]
        seen: dict[str, dict] = {}
        for fn in sorted(cache):
            for e in cache[fn]:
                seen.setdefault(e["batch_id"], e)
        return sorted(
            seen.values(), key=lambda e: (e["end_lsn"], e.get("batch_id") or "")
        )

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
        self._atomic_write(final, entry)
        return entry

    def _atomic_write(self, final: str, payload) -> None:
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------------------ #
    # segment compaction
    # ------------------------------------------------------------------ #
    def _loose_and_segments(self) -> tuple[list[str], list[str]]:
        names = self._names()
        segs = sorted(n for n in names if n.startswith(_SEG_PREFIX))
        loose = sorted(n for n in names if not n.startswith(_SEG_PREFIX))
        return loose, segs

    def compact(self) -> dict:
        """Fold every entry (loose files + prior segments) into one new
        immutable segment, then remove the folded sources. The segment
        links BEFORE any source is unlinked, so a crash at any point
        leaves a ledger whose ``entries()`` view is unchanged (dedup by
        batch_id); leftover sources are swept by the next compact."""
        loose, segs = self._loose_and_segments()
        entries = self.entries()  # deduped view over exactly those files
        if not loose and len(segs) <= 1:
            return {"folded": 0, "segments_removed": 0, "entries": len(entries)}
        max_end = max((e["end_lsn"] for e in entries), default=0)
        seg_name = f"{_SEG_PREFIX}{max_end:020d}-{uuid.uuid4().hex[:8]}.json"
        self._atomic_write(
            os.path.join(self.path, seg_name), {"entries": entries}
        )
        for fn in loose + segs:
            try:
                os.unlink(os.path.join(self.path, fn))
            except FileNotFoundError:
                pass
        return {
            "folded": len(loose),
            "segments_removed": len(segs),
            "entries": len(entries),
            "segment": seg_name,
        }

    def compact_if_needed(self, min_loose: int = 64) -> dict | None:
        """Doubling trigger: compact when the loose-file count exceeds
        max(min_loose, compacted_count / 4). Each entry is rewritten
        O(log n) times over the ledger's lifetime — amortized O(1)
        per-batch cost for the runner loop that calls this every batch."""
        loose, segs = self._loose_and_segments()
        if not loose:
            return None
        self.entries()  # populate the segment cache incrementally
        cache = self.__dict__.get("_entry_cache") or {}
        compacted = sum(len(cache.get(s, [])) for s in segs)
        if len(loose) > max(min_loose, compacted // 4):
            return self.compact()
        return None

    # ------------------------------------------------------------------ #
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
