"""Write-audit-publish (WAP) for LakeTable — the Iceberg audit-branch
workflow, jar-free.

``merge(..., stage_id=...)`` runs a full merge but parks the resulting
snapshot under ``_manifests/staged/{stage_id}.json`` instead of linking
it into the version chain: the batch's REAL data files exist and are
queryable (``read_staged``), but no reader of the table sees them. An
audit job then either ``publish_staged`` (atomically links the snapshot,
rebasing onto any commits that landed since staging — MoR appends always
rebase, CoW refuses on bucket overlap, exactly the live-commit rules) or
``abandon_staged`` (drops the staged manifest; vacuum reclaims its data
files and pieces past the grace window).

This complements the runner's ``pre_commit_gate`` (which aborts on
slice-level metrics BEFORE any file is written): WAP is for audits that
need to query the merged result itself — row-level diffs, referential
checks against other tables, human sign-off — with quarantine-by-default
semantics for bad batches. Reference analogue: the validation-log gate
(reference etl/validate.py) that marks a run bad before exposure.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from gene_etl_spark.lake.table import STAGED_DIR, CommitConflict, LakeTable


def _staged_path(table: LakeTable, stage_id: str) -> str:
    return os.path.join(table.path, STAGED_DIR, f"{stage_id}.json")


def _load_staged_raw(table: LakeTable, stage_id: str) -> dict:
    p = _staged_path(table, stage_id)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no staged snapshot '{stage_id}' at {table.path}")
    with open(p) as f:
        return json.load(f)


def list_staged(table: LakeTable) -> dict[str, dict]:
    """stage_id -> {batch_id, operation, touched_buckets, committed_at_ms}
    for every unpublished staged snapshot."""
    sdir = os.path.join(table.path, STAGED_DIR)
    out: dict[str, dict] = {}
    if not os.path.isdir(sdir):
        return out
    for fn in sorted(os.listdir(sdir)):
        if not fn.endswith(".json") or ".tmp-" in fn:
            continue
        with open(os.path.join(sdir, fn)) as f:
            raw = json.load(f)
        st = raw.get("staged", {}) or {}
        out[st.get("stage_id") or fn[: -len(".json")]] = {
            "batch_id": (raw.get("properties") or {}).get("batch_id"),
            "operation": (raw.get("summary") or {}).get("operation"),
            "touched_buckets": st.get("touched_buckets", []),
            "append_only": st.get("append_only", False),
            "parent": raw.get("parent"),
            "committed_at_ms": raw.get("committed_at_ms"),
        }
    return out


def read_staged(
    table: LakeTable, stage_id: str, buckets: list[int] | None = None
) -> DataFrame:
    """Audit scan: the table AS IT WOULD BE after publishing this staged
    snapshot (MoR deltas resolve exactly as a live read would). Never
    visible through ``table.read()``. Pass the merge's touched buckets
    to keep the audit's cost ∝ the batch."""
    return table.read(
        buckets=buckets, manifest=table._inflate(_load_staged_raw(table, stage_id))
    )


def publish_staged(table: LakeTable, stage_id: str) -> dict:
    """Atomically link a staged snapshot into the version chain.

    The staged manifest kept its stage-time parent, so the normal
    optimistic-concurrency path applies verbatim: if nothing committed
    since staging, the link lands as-is; otherwise ``commit_with_rebase``
    re-layers it onto the winners (safe for MoR appends and disjoint CoW
    buckets, refused on CoW bucket overlap or a duplicate batch_id — the
    same rules as a live commit race). On success the staged file is
    removed; its data files and pieces are now pinned by the published
    snapshot."""
    raw = _load_staged_raw(table, stage_id)
    st = raw.get("staged", {}) or {}
    batch_id = (raw.get("properties") or {}).get("batch_id")
    if batch_id and batch_id in table.committed_batches():
        raise CommitConflict(
            f"batch {batch_id} is already committed — refusing to publish"
            f" staged snapshot '{stage_id}' twice"
        )
    manifest = dict(table._inflate(raw))
    manifest.pop("staged", None)
    committed = table.commit_with_rebase(
        manifest,
        st.get("touched_buckets", []),
        append_only=bool(st.get("append_only")),
    )
    os.unlink(_staged_path(table, stage_id))
    return {
        "published": stage_id,
        "snapshot_version": committed["version"],
        "batch_id": batch_id,
    }


def abandon_staged(table: LakeTable, stage_id: str) -> dict:
    """Drop a staged snapshot without publishing. Its data files and
    pieces lose their pin and are reclaimed by the next vacuum past the
    grace window; the table itself never saw the batch."""
    _load_staged_raw(table, stage_id)  # raise cleanly if absent
    os.unlink(_staged_path(table, stage_id))
    return {"abandoned": stage_id}


def audit_and_publish(
    table: LakeTable,
    stage_id: str,
    *,
    validator,
    key_cols,
    batch_id: str,
    merge_mode: str,
    deletes: int,
    touched_buckets,
    auditors: dict | None = None,
) -> dict:
    """Audit a staged snapshot over its REAL merged files, then publish
    atomically; a failed audit abandons the stage (quarantine — the lake,
    ledger, and every reader never saw the batch) and re-raises.

    Shared by the batch runner and the streaming epoch path so both
    ingest surfaces enforce identical mode-aware built-ins: key
    uniqueness only on CoW (a MoR staged read resolves through a key
    groupBy and is unique by construction) and a row floor of
    parent-touched-bucket rows minus this batch's deletes in both modes
    (catches resolution bugs that drop whole groups). Cost ∝ the batch:
    both scans are pruned to the merge's touched buckets."""
    staged = read_staged(table, stage_id, buckets=touched_buckets)
    parent_n = table.read(buckets=touched_buckets).count()
    try:
        validator.audit_staged(
            staged,
            list(key_cols),
            batch_id,
            auditors=auditors,
            check_uniqueness=merge_mode == "cow",
            min_rows=parent_n - deletes,
        )
    except Exception:
        abandon_staged(table, stage_id)
        raise
    return publish_staged(table, stage_id)


def sweep_stages(table: LakeTable, prefix: str = "wap-") -> list[str]:
    """Abandon every staged snapshot in the ingest-owned namespace
    (default ``wap-{start}-{end}``, the runner/stream auto-stage ids).

    A crash between stage and publish leaves an orphan; the per-batch
    abandon only reclaims a replay of the SAME lsn slice, so if batch
    boundaries changed (new slice width, re-planned resume) the orphan
    would pin its data files and pieces in vacuum forever — and remain
    accidentally publishable. The caller is the single writer per
    ledger, so any namespaced stage present at ingest start is dead by
    construction. User-created stages (custom ids) are left alone."""
    swept: list[str] = []
    for stage_id in list(list_staged(table)):
        if stage_id.startswith(prefix):
            try:
                abandon_staged(table, stage_id)
                swept.append(stage_id)
            except FileNotFoundError:
                pass
    return swept
