"""Seeded predicate fuzz for ``read(where=...)`` file skipping.

The pruning layer's contract: for ANY ``where`` conjunction, the pruned
read returns exactly the rows a full-scan filter would — skipping is
invisible to results. The unit tests pin chosen layouts; this fuzz
sweeps ~120 random predicates (every op incl. is_null/not_null,
conjunctions, out-of-range and boundary constants) against an
INDEPENDENT python-side oracle over the same rows, across the table
states that move stats around: freshly merged CoW, MoR delta-carrying,
z-order compacted, and rolled back. A pruning bug that only fires on an
odd bounds/op combination shows up here as a row diff.
"""

import datetime as dt
import random

import pytest
from pyspark.sql import types as T

from gene_etl_spark.lake import maintenance as mt
from gene_etl_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("part", T.IntegerType()),
        T.StructField("score", T.LongType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("tag", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

OPS = ("=", "<", "<=", ">", ">=", "in", "between", "is_null", "not_null")
# doc_id = key col -> file_stats path; tag -> string col_stats path
COLS = ("score", "weight", "doc_id", "tag")
TAGS = [f"t{chr(97 + i)}{i:02d}" for i in range(24)]


def _rows(rng, n, null_rate):
    out = []
    for i in range(n):
        score = None if rng.random() < null_rate else rng.randrange(-500, 5000)
        weight = None if rng.random() < null_rate else round(rng.uniform(-2, 2), 3)
        tag = None if rng.random() < null_rate else rng.choice(TAGS)
        out.append(
            (f"doc-{i:04d}", i % 7, score, weight, tag, dt.datetime(2026, 1, 1))
        )
    return out


def _merge(tbl, spark, rows, bid, lsn0, op="I", mode="cow"):
    upd = spark.createDataFrame(
        [r + (lsn0 + i, op) for i, r in enumerate(rows)],
        "doc_id string, part int, score long, weight double, tag string,"
        " ts timestamp, _lsn long, _op string",
    )
    return tbl.merge(
        upd, batch_id=bid, op_col="_op", lsn_col="_lsn",
        start_lsn=lsn0, end_lsn=lsn0 + len(rows), mode=mode,
    )


def _rand_where(rng):
    conj = []
    for _ in range(rng.choice([1, 1, 1, 2])):
        col = rng.choice(COLS)
        op = rng.choice(OPS)
        if col == "tag":
            pick = lambda: rng.choice(TAGS + ["s00", "zz", "ta05"])
            if op in ("is_null", "not_null"):
                val = None
            elif op == "in":
                val = [pick() for _ in range(3)]
            elif op == "between":
                a, b = pick(), pick()
                val = tuple(sorted((a, b)))
            else:
                val = pick()
        elif col == "doc_id":
            # string domain incl. non-existent + boundary values
            v = f"doc-{rng.randrange(-3, 1203):04d}"
            if op in ("is_null", "not_null"):
                val = None
            elif op == "in":
                val = [f"doc-{rng.randrange(-3, 1203):04d}" for _ in range(3)]
            elif op == "between":
                w = f"doc-{rng.randrange(-3, 1203):04d}"
                val = tuple(sorted((v, w)))
            else:
                val = v
        else:
            lo = -600 if col == "score" else -2.5
            hi = 5200 if col == "score" else 2.5
            pick = (
                (lambda: rng.randrange(int(lo), int(hi)))
                if col == "score"
                else (lambda: round(rng.uniform(lo, hi), 3))
            )
            if op in ("is_null", "not_null"):
                val = None
            elif op == "in":
                val = [pick() for _ in range(4)]
            elif op == "between":
                a, b = pick(), pick()
                val = (min(a, b), max(a, b))
            else:
                val = pick()
        conj.append((col, op, val))
    return conj


def _oracle_match(row, conj):
    # independent python evaluation with SQL null semantics
    for col, op, val in conj:
        x = row[col]
        if op == "is_null":
            ok = x is None
        elif op == "not_null":
            ok = x is not None
        elif x is None:
            ok = False  # every comparison is null-rejecting
        elif op == "=":
            ok = x == val
        elif op == "<":
            ok = x < val
        elif op == "<=":
            ok = x <= val
        elif op == ">":
            ok = x > val
        elif op == ">=":
            ok = x >= val
        elif op == "in":
            ok = x in val
        else:
            ok = val[0] <= x <= val[1]
        if not ok:
            return False
    return True


def _check(tbl, truth, rng, n_preds, tag, version=None):
    # version=N fuzzes the TIME-TRAVEL read path against a frozen truth
    manifest = None if version is None else tbl._read_manifest(version)
    n_files_total = None
    for i in range(n_preds):
        conj = _rand_where(rng)
        df = (
            tbl.read(where=conj)
            if manifest is None
            else tbl.read(manifest=manifest, where=conj)
        )
        got = sorted(
            (r["doc_id"], r["score"], r["weight"]) for r in df.collect()
        )
        want = sorted(
            (r["doc_id"], r["score"], r["weight"])
            for r in truth.values()
            if _oracle_match(r, conj)
        )
        assert got == want, (tag, i, conj)
        rep = tbl.prune_report(conj, manifest=manifest)
        total = (
            rep["kept_files"] + rep["skipped_files"]
            + rep["unprunable_dirty_files"]
        )
        if n_files_total is None:
            n_files_total = total
        assert total == n_files_total, (tag, i, conj, rep)


@pytest.mark.parametrize("seed", [11, 47])
def test_where_fuzz_across_table_states(spark, tmp_path, seed):
    rng = random.Random(seed)
    tbl = LakeTable.create(
        spark, str(tmp_path / f"lake{seed}"), SCHEMA, ["doc_id"], 8,
        stats_cols=["score", "weight", "tag"],
    )
    rows = _rows(rng, 300, null_rate=0.15)
    truth = {
        r[0]: {"doc_id": r[0], "part": r[1], "score": r[2], "weight": r[3],
               "tag": r[4]}
        for r in rows
    }
    _merge(tbl, spark, rows, "seed", 1)
    _check(tbl, truth, rng, 30, "cow")

    # MoR deltas over some buckets: updates move values INTO/OUT OF
    # ranges and flip nulls; dirty buckets must read fully
    upd = [
        (d, truth[d]["part"],
         None if rng.random() < 0.3 else rng.randrange(-500, 5000),
         rng.uniform(-2, 2) if rng.random() < 0.5 else None,
         rng.choice(TAGS) if rng.random() < 0.5 else None,
         dt.datetime(2026, 1, 2))
        for d in rng.sample(sorted(truth), 60)
    ]
    _merge(tbl, spark, upd, "mor", 1000, op="U", mode="mor")
    for r in upd:
        truth[r[0]] = {"doc_id": r[0], "part": r[1], "score": r[2],
                       "weight": r[3], "tag": r[4]}
    v_mor = tbl.version
    truth_at_mor = {k: dict(v) for k, v in truth.items()}
    _check(tbl, truth, rng, 30, "mor")

    # z-order compaction folds the deltas and re-slices stats
    mt.compact(
        tbl, target_file_size_bytes=4096,
        sort_cols=["tag", "score", "weight"], cluster="zorder",
    )
    _check(tbl, truth, rng, 30, "zorder")
    # time-travel fuzz: the historical manifest's own stats prune the
    # same way a live read would have at that version
    _check(tbl, truth_at_mor, rng, 15, "travel", version=v_mor)

    # rollback restores pre-compaction content; stats must follow
    mt.rollback(tbl, v_mor)
    _check(tbl, truth, rng, 30, "rollback")
