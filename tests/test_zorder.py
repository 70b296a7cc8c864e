"""Z-order clustered compaction (``compact(cluster="zorder")``).

The 100 TB property: lexicographic ``sort_cols`` only makes the LEADING
column's per-file bounds selective — with many files per bucket, a
``read(where=...)`` predicate on the second clustered column keeps every
file. Z-order (bit-interleaved quantile ranks) slices files into
near-square hyperrectangles, so data skipping prunes on ANY clustered
column. These tests pin, on the same 64×64 uniform grid:

- a strip predicate on EITHER dimension skips >= half the z-ordered
  files while the lexicographic twin keeps all of them for the second
  dimension,
- content parity: pruned reads equal the full-scan filter, compaction
  preserves rows, point lookups stay correct (multi-file, no longer
  single-file — the documented trade),
- NULLs rank into the low corner and survive the rewrite,
- validation: zorder without sort_cols / < 2 cols / unorderable types /
  unknown cluster mode all refuse.
"""

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake import maintenance as mt
from gene_etl_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("cell_id", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

GRID = 64  # rows = GRID*GRID + 1 NULL-y row


def _seed(spark, path):
    tbl = LakeTable.create(
        spark, path, SCHEMA, ["cell_id"], 1, stats_cols=["x", "y"]
    )
    rows = [
        (x * GRID + y, x, y, dt.datetime(2026, 1, 1), i + 1, "I")
        for i, (x, y) in enumerate(
            (x, y) for x in range(GRID) for y in range(GRID)
        )
    ]
    rows.append((GRID * GRID, 3, None, dt.datetime(2026, 1, 1), len(rows) + 1, "I"))
    upd = spark.createDataFrame(
        rows,
        "cell_id long, x long, y long, ts timestamp, _lsn long, _op string",
    )
    tbl.merge(
        upd,
        batch_id="seed",
        op_col="_op",
        lsn_col="_lsn",
        start_lsn=1,
        end_lsn=len(rows) + 1,
    )
    return tbl


def _sixteenth_target(path):
    in_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                           recursive=True)
    )
    return max(1, -(-in_bytes // 16))


def _compact(tbl, cluster):
    mt.compact(
        tbl,
        sort_cols=["x", "y"],
        target_file_size_bytes=_sixteenth_target(tbl.path),
        cluster=cluster,
    )


Y_STRIP = [("y", "between", (0, 7))]
X_STRIP = [("x", "between", (56, 63))]


def test_zorder_prunes_every_clustered_dimension(spark, tmp_path):
    tbl = _seed(spark, str(tmp_path / "z"))
    _compact(tbl, "zorder")
    total = tbl.prune_report([("x", ">=", 0)])
    n_files = total["kept_files"] + total["skipped_files"]
    assert n_files >= 8  # the sized rewrite actually split the bucket
    # layout lineage recorded on the commit (sort-order metadata)
    assert tbl.manifest["summary"]["clustering"] == {
        "cols": ["x", "y"], "mode": "zorder",
    }
    for strip in (Y_STRIP, X_STRIP):
        rep = tbl.prune_report(strip)
        assert rep["kept_files"] + rep["skipped_files"] == n_files
        assert rep["kept_files"] <= n_files // 2, (strip, rep)
        assert tbl.read(where=strip).count() == 8 * GRID


def test_lex_twin_cannot_prune_the_second_dimension(spark, tmp_path):
    tbl = _seed(spark, str(tmp_path / "lex"))
    _compact(tbl, "lex")
    total = tbl.prune_report([("x", ">=", 0)])
    n_files = total["kept_files"] + total["skipped_files"]
    assert n_files >= 8
    # leading column prunes, trailing column keeps every file
    assert tbl.prune_report(X_STRIP)["kept_files"] <= n_files // 2
    assert tbl.prune_report(Y_STRIP)["kept_files"] == n_files
    assert tbl.read(where=Y_STRIP).count() == 8 * GRID


def test_zorder_content_parity_and_lookup(spark, tmp_path):
    tbl = _seed(spark, str(tmp_path / "zp"))
    before = {
        (r["cell_id"], r["x"], r["y"]) for r in tbl.read().collect()
    }
    _compact(tbl, "zorder")
    after = {(r["cell_id"], r["x"], r["y"]) for r in tbl.read().collect()}
    assert after == before and len(after) == GRID * GRID + 1
    # NULL-y row ranks into the low corner and survives
    assert tbl.read().where(F.col("y").isNull()).count() == 1
    got = tbl.lookup(1234).collect()
    assert [(r["x"], r["y"]) for r in got] == [(1234 // GRID, 1234 % GRID)]


def test_rebucket_clusters_in_the_same_pass(spark, tmp_path):
    # spec evolution + z-order layout in ONE rewrite: the 1->4 rebucket
    # slices each new bucket by the Morton key, so both dimensions
    # prune immediately — no follow-up compact needed
    tbl = _seed(spark, str(tmp_path / "rz"))
    mt.rebucket(
        tbl, 4,
        target_file_size_bytes=_sixteenth_target(tbl.path),
        sort_cols=["x", "y"], cluster="zorder",
    )
    assert tbl.num_buckets == 4
    total = tbl.prune_report([("x", ">=", 0)])
    n_files = total["kept_files"] + total["skipped_files"]
    assert n_files >= 8
    for strip in (Y_STRIP, X_STRIP):
        rep = tbl.prune_report(strip)
        assert rep["kept_files"] < n_files, (strip, rep)
        assert tbl.read(where=strip).count() == 8 * GRID
    # content + lookup correctness under the new spec
    assert tbl.read().count() == GRID * GRID + 1
    got = tbl.lookup(1234).collect()
    assert [(r["x"], r["y"]) for r in got] == [(1234 // GRID, 1234 % GRID)]
    with pytest.raises(ValueError, match="requires sort_cols"):
        mt.rebucket(tbl, 8, cluster="zorder")


def test_zorder_string_dimension(spark, tmp_path):
    # strings rank via the order-preserving prefix encoding: clustering
    # on (s, y) must make BOTH the string and the numeric bounds
    # selective; correctness never depends on the encoding (bounds are
    # real values, predicate re-applied as residual)
    sch = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("s", T.StringType()),
            T.StructField("y", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tbl = LakeTable.create(
        spark, str(tmp_path / "zs"), sch, ["k"], 1, stats_cols=["s", "y"]
    )
    letters = "abcdefghijklmnop"
    rows = [
        (f"{ch}{j:03d}", f"{ch}-name", j, dt.datetime(2026, 1, 1), i + 1, "I")
        for i, (ch, j) in enumerate(
            (ch, j) for ch in letters for j in range(64)
        )
    ]
    upd = spark.createDataFrame(
        rows, "k string, s string, y long, ts timestamp, _lsn long, _op string"
    )
    tbl.merge(upd, batch_id="seed", op_col="_op", lsn_col="_lsn",
              start_lsn=1, end_lsn=len(rows) + 1)
    mt.compact(
        tbl, target_file_size_bytes=_sixteenth_target(tbl.path),
        sort_cols=["s", "y"], cluster="zorder",
    )
    total = tbl.prune_report([("y", ">=", 0)])
    n_files = total["kept_files"] + total["skipped_files"]
    assert n_files >= 8
    for strip, n_rows in (
        ([("s", "between", ("a", "b~"))], 2 * 64),  # letters a, b
        ([("y", "between", (0, 7))], 8 * len(letters)),
    ):
        rep = tbl.prune_report(strip)
        assert 0 < rep["kept_files"] <= n_files // 2, (strip, rep)
        assert tbl.read(where=strip).count() == n_rows


def test_zorder_validation(spark, tmp_path):
    tbl = _seed(spark, str(tmp_path / "v"))
    with pytest.raises(ValueError, match="requires sort_cols"):
        mt.compact(tbl, cluster="zorder")
    with pytest.raises(ValueError, match="lex' or 'zorder"):
        mt.compact(tbl, sort_cols=["x", "y"], cluster="hilbert")
    with pytest.raises(ValueError, match=">= 2 cluster columns"):
        mt.compact(tbl, sort_cols=["x"], cluster="zorder")
    df = tbl.read().withColumn("arr", F.array(F.col("x")))
    with pytest.raises(ValueError, match="unorderable"):
        mt.zorder_expr(df, ["x", "arr"])
    with pytest.raises(ValueError, match="exceed a long"):
        mt.zorder_expr(df, ["x", "y"], bits_per_dim=31)
