"""Continuous rollup: an incrementally maintained aggregate table over
a LakeTable, driven by the change feed.

The Spark-first analogue of a hypertable continuous aggregate /
materialized view with incremental refresh: the rollup is ITSELF a
LakeTable keyed by the group columns, and each ``refresh()``

1. reads the base table's change rows since the last refreshed
   snapshot version (``read_changes`` with UP preimages, so an update
   that MOVES a row between groups dirties both the old and the new
   group);
2. derives the DIRTY GROUP set (distinct group tuples across
   pre/post/delete rows) — cost ∝ the change volume, never the table;
3. recomputes exactly those groups from the current base state
   (broadcast semijoin prune) and MERGEs them into the rollup table —
   groups that became empty get tombstones;
4. fences itself through the same machinery as the CDC ingest: the
   rollup commit's ``(start_lsn, end_lsn]`` range is the BASE VERSION
   range it covered, and ``batch_id = rollup-v{a}-v{b}``, so a crashed
   or replayed refresh is skipped and ``last_refreshed_version()`` is
   recovered from the rollup's own snapshot chain (no side state).

Cost model at 100 TB, stated precisely: the change-feed read is ∝ the
refreshed commits' write footprint (MoR deltas verbatim; CoW diffs over
touched buckets); the recompute is ONE pass over the base with the
semijoin filter applied at the scan — rows outside dirty groups are
discarded before any shuffle — so the aggregation shuffle, the rollup
MERGE, and the rewrite volume are all ∝ the dirty groups, not the
rollup; the base scan itself prunes to the dirty buckets whenever the
leading group column is the bucketing key (``_prune_buckets``), and
otherwise remains full-width, as in any materialized-view refresh
whose groups don't align with the physical layout. A full rebuild is
just ``refresh()`` from version 0.

Reference contact: the reference maintains per-cohort summary views
recomputed wholesale (models.py:268-283); the incremental form is the
scale path this engine adds.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gene_etl_spark.lake.changes import read_changes
from gene_etl_spark.lake.table import LakeTable


class ContinuousRollup:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        base: LakeTable,
        group_cols: list[str],
        agg_exprs: list[Column],
        num_buckets: int = 16,
        derived: dict[str, Column] | None = None,
    ):
        """``agg_exprs`` are aliased aggregate Columns applied as
        ``base.groupBy(group_cols).agg(*agg_exprs)``; the rollup table's
        schema is derived from that plan once at creation.

        ``derived`` maps group-column names to expressions computed from
        the base payload — the hypertable time-bucket shape, e.g.
        ``{"day": F.date_trunc("day", "ts")}`` with ``group_cols=["day",
        "role"]``. Derived groups work on the change feed too: UP/D rows
        carry full payload, so a row moving between time buckets dirties
        both buckets."""
        self.spark = spark
        self.path = path
        self.base = base
        self.group_cols = list(group_cols)
        self.agg_exprs = list(agg_exprs)
        self.derived = dict(derived or {})
        if LakeTable.exists(path):
            self.table = LakeTable.load(spark, path)
        else:
            schema = (
                self._with_derived(base.read())
                .groupBy(*self.group_cols)
                .agg(*self.agg_exprs)
                .schema
            )
            self.table = LakeTable.create(
                spark, path, schema, key_cols=self.group_cols, num_buckets=num_buckets
            )

    def _with_derived(self, df: DataFrame) -> DataFrame:
        for name, expr in self.derived.items():
            df = df.withColumn(name, expr)
        return df

    def _prune_buckets(self, dirty: DataFrame) -> list[int] | None:
        """When the leading group column IS the base's bucketing key,
        every row of a dirty group lives in that group value's bucket —
        so the recompute scan prunes to the dirty buckets (≤ num_buckets
        ints collected, never the group values themselves). Groups that
        don't align with the physical layout scan full-width, like any
        materialized-view refresh."""
        g0 = self.group_cols[0]
        if g0 != self.base.key_cols[0] or g0 in self.derived:
            return None
        return sorted(
            r[0]
            for r in dirty.select(self.base.bucket_expr(g0).alias("b"))
            .distinct()
            .collect()
        )

    # ------------------------------------------------------------------ #
    def last_refreshed_version(self) -> int:
        """Highest base snapshot version folded into the rollup,
        recovered from the rollup's own snapshot chain (end_lsn of its
        commits IS the base version — no side checkpoint to lose)."""
        v = self.table.max_committed_end_lsn()
        return int(v) if v is not None else 0

    def read(self) -> DataFrame:
        return self.table.read()

    # ------------------------------------------------------------------ #
    def refresh(self) -> dict:
        """Fold all base commits since the last refresh into the rollup.
        Returns a summary; a no-op when the base hasn't moved. If the
        change feed is broken — the last refreshed snapshot expired past
        the base's retention window (the clear ``read_changes`` error) —
        falls back to a FULL rebuild: every current group recomputed,
        plus tombstones for rollup groups that no longer exist; same
        fencing, one commit, correct from any staleness."""
        # the base (and the rollup) may have been advanced by OTHER
        # LakeTable instances — a streaming job's foreachBatch, another
        # scheduled refresh — so drop the cached manifests and PIN this
        # refresh to one base snapshot: the version recorded and the
        # state scanned must be the same manifest even if the base
        # advances mid-refresh (a later refresh folds the newer commits)
        self.base._manifest_cache = None
        self.table._manifest_cache = None
        base_manifest = self.base.manifest
        last = self.last_refreshed_version()
        cur = base_manifest["version"]
        if cur <= last:
            return {"refreshed": False, "from_version": last, "to_version": last}
        batch_id = f"rollup-v{last}-v{cur}"
        if batch_id in self.table.committed_batches():
            return {"refreshed": False, "from_version": last, "to_version": cur}

        try:
            changes = self._with_derived(
                read_changes(self.base, last, cur, include_preimages=True)
            )
            dirty = changes.select(*self.group_cols).distinct()
            full_rebuild = False
        except ValueError:
            dirty = None
            full_rebuild = True
        state = None
        if full_rebuild:
            # broken manifest chain (snapshots expired past retention):
            # re-baseline — dirty set = current groups ∪ rollup groups
            state = self._with_derived(self.base.read(manifest=base_manifest))
            dirty = (
                state.select(*self.group_cols)
                .distinct()
                .unionByName(self.table.read().select(*self.group_cols))
                .distinct()
            )
        # the dirty set feeds three consumers (bucket pruning, the
        # semijoin's broadcast, the tombstone anti-join): materialize it
        # once — BEFORE the pruning collect, which is the first action
        # that would otherwise re-derive the change-feed plan — and
        # guarantee release on ANY failure from here on (an unpersist
        # tied only to the merge would leak the cache if plan
        # construction itself raised)
        dirty = dirty.persist()
        try:
            return self._refresh_merge(
                dirty, full_rebuild, base_manifest, batch_id, last, cur,
                state=state,
            )
        finally:
            dirty.unpersist()

    def _refresh_merge(
        self,
        dirty: DataFrame,
        full_rebuild: bool,
        base_manifest: dict,
        batch_id: str,
        last: int,
        cur: int,
        state: DataFrame | None,
    ) -> dict:
        if state is None:
            state = self._with_derived(
                self.base.read(
                    buckets=self._prune_buckets(dirty), manifest=base_manifest
                )
            )
        fresh = (
            state.join(F.broadcast(dirty), self.group_cols, "leftsemi")
            .groupBy(*self.group_cols)
            .agg(*self.agg_exprs)
        )
        # groups whose last member vanished need tombstones
        gone = dirty.join(
            fresh.select(*self.group_cols), self.group_cols, "leftanti"
        )
        # tombstone template mirrors the aggregate plan's own columns —
        # NOT the table schema, which also carries the evolved constant
        # ts guard column (the merge null-fills any column a slice lacks)
        agg_fields = [
            f for f in fresh.schema.fields if f.name not in self.group_cols
        ]
        upserts = fresh.select(
            "*",
            F.lit("U").alias("op"),
        )
        deletes = gone.select(
            *self.group_cols,
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in agg_fields],
            F.lit("D").alias("op"),
        )
        updates = (
            upserts.unionByName(deletes)
            # lsn-space of the rollup = base snapshot versions: monotone,
            # so the merge's (lsn, ts) guard gives cross-refresh LWW for
            # free; the constant ts never decides (lsn already differs)
            .withColumn("lsn", F.lit(int(cur)).cast("long"))
            .withColumn(
                "ts",
                F.lit(_dt.datetime(2020, 1, 1)).cast("timestamp"),
            )
        )
        try:
            result = self.table.merge(
                updates,
                batch_id=batch_id,
                start_lsn=last,
                end_lsn=cur,
            )
        except Exception as e:  # double-fired scheduler: lose the race cleanly
            from gene_etl_spark.lake.table import CommitConflict

            if isinstance(e, CommitConflict) and (
                batch_id in self.table.committed_batches()
                or self.last_refreshed_version() > last
            ):
                # the same refresh (or a newer one) already committed —
                # a scheduled job double-fire is a no-op, not a failure
                return {"refreshed": False, "from_version": last, "to_version": cur}
            raise
        return {
            "refreshed": True,
            "full_rebuild": full_rebuild,
            "from_version": last,
            "to_version": cur,
            "dirty_groups": result.inserts + result.updates + result.deletes + result.noops,
            "snapshot_version": result.snapshot_version,
        }
