"""Continuous rollup (incrementally maintained aggregate over the
change feed) + CDF update preimages.

The consumer contract under test: after any sequence of base commits,
``refresh()`` makes the rollup equal a full groupBy recompute of the
base state — including updates that MOVE rows between groups (needs
preimages) and deletes that empty a group (needs tombstones) — at
cost ∝ the change volume, and replayed refreshes are fenced no-ops.
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.changes import CHANGE_OP_COL, read_changes
from gene_etl_spark.lake.rollup import ContinuousRollup
from gene_etl_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _upd(spark, rows):
    return spark.createDataFrame(
        [
            (lsn, op, conv, turn, grp, float(val), dt.datetime(2024, 1, 1, 0, 0, lsn % 60))
            for (lsn, op, conv, turn, grp, val) in rows
        ],
        "lsn long, op string, conv_id string, turn_idx int, grp string,"
        " val double, ts timestamp",
    )


def _rollup_state(rollup):
    return {
        r.grp: (r.n_rows, round(r.sum_val, 6))
        for r in rollup.read().select("grp", "n_rows", "sum_val").collect()
    }


def _recomputed(table):
    return {
        r.grp: (r.n_rows, round(r.sum_val, 6))
        for r in table.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("val").alias("sum_val"),
        )
        .collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_rollup_tracks_base_through_moves_and_deletes(spark, workdir, mode):
    t = LakeTable.create(
        spark, f"{workdir}/lake_{mode}", SCHEMA, ["conv_id", "turn_idx"], 8
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").alias("sum_val"),
    ]
    roll = ContinuousRollup(
        spark, f"{workdir}/rollup_{mode}", t, ["grp"], aggs, num_buckets=4
    )

    # batch 1: three groups
    t.merge(
        _upd(
            spark,
            [
                (1, "I", "c0", 0, "a", 1.0),
                (2, "I", "c0", 1, "a", 2.0),
                (3, "I", "c1", 0, "b", 10.0),
                (4, "I", "c2", 0, "c", 5.0),
            ],
        ),
        batch_id="b1",
        mode=mode,
    )
    s = roll.refresh()
    assert s["refreshed"]
    assert _rollup_state(roll) == _recomputed(t) == {
        "a": (2, 3.0),
        "b": (1, 10.0),
        "c": (1, 5.0),
    }

    # batch 2: move (c0,1) from group a -> b (old group must shrink:
    # only the UP preimage can dirty group a), delete the sole c row
    # (group c must get a tombstone), and update a value in place
    t.merge(
        _upd(
            spark,
            [
                (5, "U", "c0", 1, "b", 2.5),
                (6, "D", "c2", 0, "c", 0.0),
                (7, "U", "c1", 0, "b", 11.0),
            ],
        ),
        batch_id="b2",
        mode=mode,
    )
    s = roll.refresh()
    assert s["refreshed"]
    expect = {"a": (1, 1.0), "b": (2, 13.5)}
    assert _recomputed(t) == expect
    assert _rollup_state(roll) == expect  # group c gone, group a shrunk

    # idempotence: base unchanged -> fenced no-op, state stable
    s = roll.refresh()
    assert not s["refreshed"]
    assert _rollup_state(roll) == expect

    # a reopened rollup recovers its watermark from its snapshot chain
    roll2 = ContinuousRollup(
        spark, f"{workdir}/rollup_{mode}", t, ["grp"], aggs, num_buckets=4
    )
    assert roll2.last_refreshed_version() == t.version
    assert not roll2.refresh()["refreshed"]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_cdf_preimages_carry_old_rows(spark, workdir, mode):
    t = LakeTable.create(
        spark, f"{workdir}/lake_{mode}", SCHEMA, ["conv_id", "turn_idx"], 8
    )
    t.merge(
        _upd(spark, [(1, "I", "c0", 0, "a", 1.0), (2, "I", "c1", 0, "b", 2.0)]),
        batch_id="b1",
        mode=mode,
    )
    v1 = t.version
    t.merge(
        _upd(spark, [(3, "U", "c0", 0, "z", 9.0), (4, "D", "c1", 0, "b", 0.0)]),
        batch_id="b2",
        mode=mode,
    )

    rows = read_changes(t, v1, include_preimages=True).collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r[CHANGE_OP_COL], []).append(r)
    # postimage of the update
    assert [(r.conv_id, r.grp, r.val) for r in by_op["U"]] == [("c0", "z", 9.0)]
    # preimages: the OLD row of every key that existed before (the
    # updated c0 AND the deleted c1 — both had parent state)
    pre = sorted((r.conv_id, r.grp, r.val) for r in by_op["UP"])
    assert pre == [("c0", "a", 1.0), ("c1", "b", 2.0)]
    # the default feed (no preimages) is unchanged: no UP rows
    assert not [
        r
        for r in read_changes(t, v1).collect()
        if r[CHANGE_OP_COL] == "UP"
    ]


def test_rollup_full_rebuild_on_broken_chain(spark, workdir):
    """When the change feed can't cover (last, cur] — snapshots expired
    past retention — refresh() re-baselines with a full rebuild: every
    current group recomputed AND stale rollup groups tombstoned."""
    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").alias("sum_val"),
    ]
    roll = ContinuousRollup(spark, f"{workdir}/rollup", t, ["grp"], aggs, num_buckets=4)

    t.merge(
        _upd(spark, [(1, "I", "c0", 0, "x", 1.0), (2, "I", "c1", 0, "y", 2.0)]),
        batch_id="b1",
    )
    roll.refresh()
    assert _rollup_state(roll) == {"x": (1, 1.0), "y": (1, 2.0)}

    # two more commits; the middle manifest then disappears (expiry)
    t.merge(_upd(spark, [(3, "D", "c0", 0, "x", 0.0)]), batch_id="b2")
    t.merge(_upd(spark, [(4, "I", "c2", 0, "z", 7.0)]), batch_id="b3")
    os.remove(os.path.join(t.path, "_manifests", "v2.json"))
    t2 = LakeTable.load(spark, t.path)
    roll2 = ContinuousRollup(spark, f"{workdir}/rollup", t2, ["grp"], aggs, num_buckets=4)

    s = roll2.refresh()
    assert s["refreshed"] and s["full_rebuild"]
    # group x vanished while the feed was broken -> tombstoned; z appears
    assert _rollup_state(roll2) == _recomputed(t2) == {"y": (1, 2.0), "z": (1, 7.0)}


def test_rollup_randomized_batches_track_recompute(spark, workdir):
    """Seeded random op soup (inserts/updates/moves/deletes across
    batches) — after every refresh the rollup equals a full groupBy
    recompute. The LWW/merge machinery is property-tested elsewhere;
    this pins the incremental dirty-group algebra."""
    import random

    rng = random.Random(20260816)
    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").alias("sum_val"),
    ]
    roll = ContinuousRollup(spark, f"{workdir}/rollup", t, ["grp"], aggs, num_buckets=4)
    groups = ["g0", "g1", "g2", "g3"]
    live: set[tuple[str, int]] = set()
    lsn = 0
    for batch in range(4):
        rows = []
        for _ in range(30):
            lsn += 1
            key = (f"c{rng.randrange(12)}", rng.randrange(3))
            if key in live and rng.random() < 0.25:
                rows.append((lsn, "D", key[0], key[1], rng.choice(groups), 0.0))
                live.discard(key)
            else:
                rows.append(
                    (lsn, "U", key[0], key[1], rng.choice(groups), rng.randrange(100))
                )
                live.add(key)
        t.merge(_upd(spark, rows), batch_id=f"rb{batch}", mode=rng.choice(["cow", "mor"]))
        roll.refresh()
        assert _rollup_state(roll) == _recomputed(t), f"diverged at batch {batch}"


def test_rollup_survives_base_and_own_compaction(spark, workdir):
    """The rollup is an ordinary LakeTable: compacting either the MoR
    base or the rollup itself must not disturb state or later
    refreshes (compaction commits emit no change rows)."""
    from gene_etl_spark.lake.maintenance import compact

    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").alias("sum_val"),
    ]
    roll = ContinuousRollup(spark, f"{workdir}/rollup", t, ["grp"], aggs, num_buckets=4)
    t.merge(
        _upd(spark, [(1, "I", "c0", 0, "a", 1.0), (2, "I", "c1", 0, "b", 2.0)]),
        batch_id="b1",
        mode="mor",
    )
    roll.refresh()
    compact(t, max_files_per_bucket=1)  # folds MoR deltas; no logical change
    s = roll.refresh()
    # compaction produced a new base snapshot but zero change rows: the
    # refresh commits an empty dirty set (or no-ops) without disturbance
    assert _rollup_state(roll) == _recomputed(t) == {"a": (1, 1.0), "b": (1, 2.0)}
    t.merge(_upd(spark, [(3, "U", "c0", 0, "b", 4.0)]), batch_id="b2", mode="mor")
    roll.refresh()
    assert _rollup_state(roll) == _recomputed(t) == {"b": (2, 6.0)}


def test_key_aligned_rollup_prunes_recompute_scan(spark, workdir):
    """When the leading group column IS the bucketing key, the dirty-
    group recompute scan prunes to the dirty groups' buckets — verified
    via the pruned bucket list AND correctness of the refreshed state."""
    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").alias("sum_val"),
    ]
    roll = ContinuousRollup(
        spark, f"{workdir}/rollup", t, ["conv_id"], aggs, num_buckets=4
    )
    # seed many conversations, then touch exactly one
    t.merge(
        _upd(spark, [(i + 1, "I", f"c{i}", 0, "g", float(i)) for i in range(24)]),
        batch_id="b1",
    )
    roll.refresh()
    t.merge(_upd(spark, [(100, "U", "c3", 0, "g", 99.0)]), batch_id="b2")

    from gene_etl_spark.lake.changes import read_changes

    dirty = read_changes(t, roll.last_refreshed_version(), include_preimages=True).select(
        "conv_id"
    )
    pruned = roll._prune_buckets(dirty.distinct())
    all_buckets = sorted(int(b) for b in t.manifest["files"] if t.manifest["files"][b])
    assert pruned is not None and len(pruned) < len(all_buckets)

    roll.refresh()
    assert _rollup_state_by(roll, "conv_id")["c3"] == (1, 99.0)
    assert _rollup_state_by(roll, "conv_id") == {
        r.conv_id: (r.n_rows, round(r.sum_val, 6))
        for r in t.read()
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("val").alias("sum_val"),
        )
        .collect()
    }
    # a non-key-aligned rollup never prunes
    roll_g = ContinuousRollup(
        spark, f"{workdir}/rollup_g", t, ["grp"], aggs, num_buckets=4
    )
    assert roll_g._prune_buckets(t.read().select("grp").distinct()) is None


def _rollup_state_by(rollup, key):
    return {
        r[key]: (r.n_rows, round(r.sum_val, 6))
        for r in rollup.read().select(key, "n_rows", "sum_val").collect()
    }


def test_time_bucket_rollup_with_derived_group(spark, workdir):
    """Hypertable shape: group by a DERIVED time bucket
    (date_trunc(day, ts)) — an update that moves a row to another day
    must shrink the old day's bucket (preimage-driven) and grow the
    new one."""

    def upd(rows):
        return spark.createDataFrame(
            [
                (lsn, op, conv, turn, "g", float(val), ts)
                for (lsn, op, conv, turn, val, ts) in rows
            ],
            "lsn long, op string, conv_id string, turn_idx int, grp string,"
            " val double, ts timestamp",
        )

    d1, d2 = dt.datetime(2024, 1, 1, 9), dt.datetime(2024, 1, 2, 9)
    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    roll = ContinuousRollup(
        spark,
        f"{workdir}/rollup",
        t,
        ["day"],
        [F.count(F.lit(1)).cast("long").alias("n_rows")],
        num_buckets=4,
        derived={"day": F.date_trunc("day", "ts")},
    )
    t.merge(
        upd([(1, "I", "c0", 0, 1.0, d1), (2, "I", "c1", 0, 2.0, d1), (3, "I", "c2", 0, 3.0, d2)]),
        batch_id="b1",
    )
    roll.refresh()
    state = {r.day.day: r.n_rows for r in roll.read().collect()}
    assert state == {1: 2, 2: 1}

    # move c0 from day 1 to day 2
    t.merge(upd([(4, "U", "c0", 0, 1.0, d2)]), batch_id="b2")
    roll.refresh()
    state = {r.day.day: r.n_rows for r in roll.read().collect()}
    assert state == {1: 1, 2: 2}


def test_rollup_e2e_matches_duckdb_oracle(spark, workdir):
    """Drive the real CDC engine slice by slice, refreshing the rollup
    after every batch; the final rollup must equal a DuckDB full
    recompute over the raw change log."""
    import duckdb

    from gene_etl_spark.config import IngestConfig
    from gene_etl_spark.runner import CdcIngestRunner
    from gene_etl_spark.sources.simulate import generate_change_stream

    generate_change_stream(
        os.path.join(workdir, "events"),
        n_convs=25,
        max_turns=10,
        n_events=2000,
        seed=21,
        n_tranches=3,
        evolve_at_frac=0.0,
    )
    cfg = IngestConfig(
        lake_path=os.path.join(workdir, "lake"),
        events_path=os.path.join(workdir, "events"),
        ledger_path=os.path.join(workdir, "ledger"),
        metrics_path=os.path.join(workdir, "metrics"),
        validation_path=os.path.join(workdir, "validation"),
        num_buckets=8,
        slice_lsn_width=500,
    )
    runner = CdcIngestRunner(spark, cfg)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    ]
    roll = ContinuousRollup(
        spark, os.path.join(workdir, "rollup"), runner.table, ["role"], aggs,
        num_buckets=4,
    )
    plan = runner.source.plan_batches(0, cfg.slice_lsn_width)
    for lo, hi in plan:
        runner.apply_batch(lo, hi)
        roll.refresh()  # incremental: folds exactly this batch's groups

    got = {
        r.role: (r.n_turns, r.total_chars)
        for r in roll.read().select("role", "n_turns", "total_chars").collect()
    }
    exp = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(
            f"""
            with e as (select * from read_parquet(
                '{cfg.events_path}/*.parquet', union_by_name=true)),
            r as (select *, row_number() over (partition by conv_id, turn_idx
                                               order by lsn desc, ts desc) rn
                  from e)
            select role, count(*)::BIGINT, sum(length(text))::BIGINT
            from r where rn = 1 and op <> 'D' group by 1
            """
        ).fetchall()
    }
    assert got == exp


def test_sql_view_surface(spark, workdir):
    """The reference's read models are SQL views; here the lake, its
    rollups, and the candidate pipelines register as temp views that
    plain spark.sql can join and filter."""
    from gene_etl_spark.views import register_lake_views, register_read_models

    t = LakeTable.create(spark, f"{workdir}/wh/transcripts", SCHEMA,
                         ["conv_id", "turn_idx"], 8)
    t.merge(
        _upd(spark, [(1, "I", "c0", 0, "a", 1.0), (2, "I", "c1", 0, "b", 2.0)]),
        batch_id="b1",
    )
    roll = ContinuousRollup(
        spark, f"{workdir}/wh/rollup_by_grp", t, ["grp"],
        [F.count(F.lit(1)).cast("long").alias("n_rows"),
         F.sum("val").alias("sum_val")], num_buckets=4,
    )
    roll.refresh()

    names = register_lake_views(spark, f"{workdir}/wh")
    assert names == ["transcripts", "rollup_by_grp"]
    row = spark.sql(
        """SELECT t.grp, r.n_rows, COUNT(*) AS n
           FROM transcripts t JOIN rollup_by_grp r ON t.grp = r.grp
           WHERE r.n_rows = 1 GROUP BY 1, 2 ORDER BY 1"""
    ).collect()
    assert [(x.grp, x.n_rows, x.n) for x in row] == [("a", 1, 1), ("b", 1, 1)]

    views = register_read_models(spark, "/root/testdata/sf0.001")
    top = spark.sql(
        "SELECT candidate_rank, significance_category FROM vw_pairs_candidate_q "
        "ORDER BY candidate_rank LIMIT 3"
    ).collect()
    assert [x.candidate_rank for x in top] == [1, 2, 3]
    assert set(views) == {"vw_pairs_candidate", "vw_pairs_candidate_q"}


def test_rollup_concurrent_refresh_loses_cleanly(spark, workdir):
    """A double-fired scheduled refresh: the loser detects the winner's
    commit (same fenced batch_id) and reports a no-op instead of
    raising — rollup state stays correct."""
    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").alias("sum_val"),
    ]
    t.merge(
        _upd(spark, [(1, "I", "c0", 0, "a", 1.0), (2, "I", "c1", 0, "b", 2.0)]),
        batch_id="b1",
    )
    roll_a = ContinuousRollup(spark, f"{workdir}/rollup", t, ["grp"], aggs, num_buckets=4)
    roll_b = ContinuousRollup(spark, f"{workdir}/rollup", t, ["grp"], aggs, num_buckets=4)

    orig = roll_a.table._write_manifest
    fired = {"x": False}

    def racy(manifest, **kwargs):
        if not fired["x"]:
            fired["x"] = True
            roll_b.refresh()  # the winner lands the same rollup-v0-v1
        return orig(manifest, **kwargs)

    roll_a.table._write_manifest = racy
    s = roll_a.refresh()
    assert not s["refreshed"]  # lost the race -> clean no-op
    assert _rollup_state(roll_b) == {"a": (1, 1.0), "b": (1, 2.0)}


def test_streaming_maintained_rollup(spark, workdir):
    """rollups= in ingest_stream: each committed epoch folds into the
    aggregate — a streaming materialized view. Final rollup equals the
    batch recompute, and multiple epochs produced multiple fenced
    rollup commits."""
    from gene_etl_spark.config import IngestConfig
    from gene_etl_spark.sources.simulate import generate_change_stream
    from gene_etl_spark.streaming.stream import ingest_stream

    generate_change_stream(
        os.path.join(workdir, "events"),
        n_convs=20,
        max_turns=8,
        n_events=1200,
        seed=17,
        n_tranches=4,
        evolve_at_frac=0.0,
    )
    cfg = IngestConfig(
        lake_path=os.path.join(workdir, "lake"),
        events_path=os.path.join(workdir, "events"),
        ledger_path=os.path.join(workdir, "ledger"),
        metrics_path=os.path.join(workdir, "metrics"),
        validation_path=os.path.join(workdir, "validation"),
        num_buckets=8,
    )
    # the rollup's base handle is a DIFFERENT LakeTable instance than
    # the stream's writer — refresh() must see the new snapshots anyway
    base = LakeTable.create(
        spark,
        cfg.lake_path,
        T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("role", T.StringType()),
                T.StructField("text", T.StringType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
    )
    roll = ContinuousRollup(
        spark,
        os.path.join(workdir, "rollup"),
        base,
        ["role"],
        [F.count(F.lit(1)).cast("long").alias("n_turns")],
        num_buckets=4,
    )
    summary = ingest_stream(
        spark,
        cfg,
        os.path.join(workdir, "ckpt"),
        max_files_per_trigger=2,
        rollups=[roll],
    )
    assert summary["epochs"] >= 2
    final = LakeTable.load(spark, cfg.lake_path)
    expect = {
        r.role: r.n_turns
        for r in final.read()
        .groupBy("role")
        .agg(F.count(F.lit(1)).cast("long").alias("n_turns"))
        .collect()
    }
    got = {r.role: r.n_turns for r in roll.read().collect()}
    assert got == expect
    # one fenced rollup commit per applied epoch
    assert len(roll.table.committed_batches()) == summary["epochs"]


# two-tier test policy (round 7): this module is in the smoke tier
pytestmark = pytest.mark.smoke
