"""Randomized maintenance-op soak: the lake must stay oracle-exact
under ANY interleaving of the operational surface.

A seeded random walk over merge (CoW and MoR, inserts/updates/deletes),
compact (one-file, sized+sorted, and z-order clustered), rollback (to
random live versions), tag/drop-tag, expire_snapshots, zero-grace
vacuum, and
rebucket — after EVERY op the table read must equal a pure-python LWW
model, and rollback targets replay the model state recorded when that
snapshot committed. This is the interaction test for the round-5
operational features: any pair of ops that corrupts manifests, loses a
delta fold, breaks a retention pin, or mis-fences shows up as a state
divergence within a few steps of the pair.

Default length keeps the suite fast; crank SOAK_OPS for a long run
(e.g. SOAK_OPS=150 python -m pytest tests/test_soak_maintenance.py).
"""

import datetime as dt
import os
import random

import pytest
from pyspark.sql import types as T

from gene_etl_spark.lake import maintenance as mt
from gene_etl_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
KEYS = [(f"c{i}", j) for i in range(10) for j in range(3)]


def _upd(spark, rows):
    return spark.createDataFrame(
        [
            (lsn, op, c, t, x, dt.datetime(2024, 1, 1, 0, 0, lsn % 60))
            for (lsn, op, c, t, x) in rows
        ],
        "lsn long, op string, conv_id string, turn_idx int, text string,"
        " ts timestamp",
    )


def _upd_evolved(spark, rows):
    """Same events plus an additive ``tool`` column (schema evolution)."""
    return spark.createDataFrame(
        [
            (lsn, op, c, t, x, tool, dt.datetime(2024, 1, 1, 0, 0, lsn % 60))
            for (lsn, op, c, t, x, tool) in rows
        ],
        "lsn long, op string, conv_id string, turn_idx int, text string,"
        " tool string, ts timestamp",
    )


def _state_of(df):
    if "tool" in df.columns:
        return {
            (r.conv_id, r.turn_idx): (r.text, r.tool)
            for r in df.select("conv_id", "turn_idx", "text", "tool").collect()
        }
    return {
        (r.conv_id, r.turn_idx): (r.text, None)
        for r in df.select("conv_id", "turn_idx", "text").collect()
    }


def _read_state(table):
    return _state_of(table.read())


@pytest.mark.parametrize("seed", [101, 202])
def test_random_maintenance_walk_stays_oracle_exact(spark, workdir, seed):
    rng = random.Random(seed)
    n_ops = int(os.environ.get("SOAK_OPS", "18"))
    t = LakeTable.create(
        spark, f"{workdir}/lake_{seed}", SCHEMA, ["conv_id", "turn_idx"], 4
    )
    lsn = 0
    batch = 0
    model: dict = {}
    model_by_version = {t.version: dict(model)}
    live_tags: set[str] = set()
    history = []  # (op name, detail) for the failure message

    for step in range(n_ops):
        op = rng.choices(
            ["merge", "compact", "rollback", "tag", "expire", "vacuum",
             "rebucket", "wap"],
            weights=[8, 2, 2, 2, 1, 1, 1, 2],
        )[0]
        try:
            if op == "merge":
                # after the midpoint the stream evolves: some batches
                # carry an additive `tool` column; a NARROW batch after
                # evolution is legal too (missing columns null-fill), and
                # its full-row LWW replace nulls the key's tool — the
                # model mirrors both, so evolution × rollback × compact
                # interplay is all under the walk
                evolved_batch = step >= n_ops // 2 and rng.random() < 0.6
                rows = []
                for _ in range(rng.randint(1, 8)):
                    lsn += 1
                    c, ti = rng.choice(KEYS)
                    if (c, ti) in model and rng.random() < 0.3:
                        rows.append((lsn, "D", c, ti, None, None))
                        model.pop((c, ti), None)
                    else:
                        txt = f"v{lsn}"
                        tool = f"t{lsn}" if evolved_batch else None
                        kind = "U" if (c, ti) in model else "I"
                        rows.append((lsn, kind, c, ti, txt, tool))
                        model[(c, ti)] = (txt, tool)
                # the model applies in list order; LWW by lsn agrees
                # because lsn increases within the batch. MERGE INPUT
                # CONTRACT: one row per key (the runner LWW-dedups every
                # slice before merging) — keep the last event per key,
                # which is exactly what lww_dedup would pick here.
                last = {}
                for r in rows:
                    last[(r[2], r[3])] = r
                deduped = sorted(last.values())
                batch += 1
                mode = rng.choice(["cow", "mor"])
                df = (
                    _upd_evolved(spark, deduped)
                    if evolved_batch
                    else _upd(spark, [r[:5] for r in deduped])
                )
                t.merge(
                    df, batch_id=f"b{batch}", mode=mode,
                    start_lsn=rows[0][0] - 1, end_lsn=lsn,
                )
                history.append(
                    (f"merge[{mode}{'+ev' if evolved_batch else ''}]",
                     f"n={len(rows)}")
                )
            elif op == "compact":
                draw = rng.random()
                if draw < 0.4:
                    out = mt.compact(t)
                elif draw < 0.7:
                    out = mt.compact(
                        t, target_file_size_bytes=16 * 1024,
                        sort_cols=["conv_id", "turn_idx"],
                    )
                else:
                    out = mt.compact(
                        t, target_file_size_bytes=16 * 1024,
                        sort_cols=["turn_idx", "ts"], cluster="zorder",
                    )
                history.append(("compact", str(out.get("compacted_buckets"))))
            elif op == "rollback":
                live = [
                    v for v in model_by_version
                    if os.path.exists(t._manifest_path(v))
                ]
                target = rng.choice(live)
                try:
                    out = mt.rollback(t, version=target)
                except ValueError as e:
                    assert "across a rebucket" in str(e)
                    history.append(("rollback-refused", str(target)))
                    continue
                model = dict(model_by_version[target])
                history.append(("rollback", f"->v{target}"))
            elif op == "tag":
                name = f"tag{step}"
                mt.tag(t, name)
                live_tags.add(name)
                if len(live_tags) > 2:  # bound pins so expiry has teeth
                    victim = sorted(live_tags)[0]
                    mt.drop_tag(t, victim)
                    live_tags.discard(victim)
                history.append(("tag", name))
            elif op == "expire":
                mt.expire_snapshots(t, keep_last=rng.randint(0, 3))
                history.append(("expire", ""))
            elif op == "vacuum":
                mt.vacuum(t, older_than_sec=0)
                history.append(("vacuum", ""))
            elif op == "rebucket":
                new_n = 8 if t.num_buckets == 4 else 4
                mt.rebucket(t, new_n)
                history.append(("rebucket", str(new_n)))
            elif op == "wap":
                # stage a batch, optionally vacuum while staged (pins
                # must hold), then publish (model applies) or abandon
                # (model unchanged, stage reclaimed)
                from gene_etl_spark.lake import wap

                rows = []
                staged_model = dict(model)
                for _ in range(rng.randint(1, 5)):
                    lsn += 1
                    c, ti = rng.choice(KEYS)
                    if (c, ti) in staged_model and rng.random() < 0.3:
                        rows.append((lsn, "D", c, ti, None, None))
                        staged_model.pop((c, ti), None)
                    else:
                        txt = f"v{lsn}"
                        rows.append((
                            lsn,
                            "U" if (c, ti) in staged_model else "I",
                            c, ti, txt, None,
                        ))
                        staged_model[(c, ti)] = (txt, None)
                last = {}
                for r in rows:
                    last[(r[2], r[3])] = r
                batch += 1
                sid = f"soak-stage-{batch}"
                t.merge(
                    _upd(spark, [r[:5] for r in sorted(last.values())]),
                    batch_id=f"b{batch}", mode=rng.choice(["cow", "mor"]),
                    start_lsn=rows[0][0] - 1, end_lsn=lsn, stage_id=sid,
                )
                # invisible while staged
                assert _read_state(t) == model
                if rng.random() < 0.5:
                    mt.vacuum(t, older_than_sec=0)  # staged bytes pinned
                if rng.random() < 0.5:
                    wap.publish_staged(t, sid)
                    model = staged_model
                    history.append(("wap-publish", f"n={len(rows)}"))
                else:
                    wap.abandon_staged(t, sid)
                    history.append(("wap-abandon", f"n={len(rows)}"))
                assert wap.list_staged(t) == {}
        except Exception:
            raise AssertionError(f"step {step} {op} blew up; history={history}")

        model_by_version[t.version] = dict(model)
        got = _read_state(t)
        assert got == model, (
            f"divergence after step {step} ({op}); history={history};"
            f" extra={set(got) - set(model)} missing={set(model) - set(got)}"
        )

    # end state: tagged snapshots still read after a final purge
    mt.expire_snapshots(t, keep_last=0)
    mt.vacuum(t, older_than_sec=0)
    assert _read_state(t) == model
    for name in live_tags:
        v = mt.list_tags(t)[name]["version"]
        tagged = _state_of(mt.read_tag(t, name))
        assert tagged == model_by_version[v], f"tag {name} state diverged"
