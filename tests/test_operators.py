"""Operator unit tests (mirrors the reference's test strategy,
SURVEY.md §5): LWW semantics, salted-vs-plain equivalence under skew,
kernel p-values, plan-shape assertions."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gene_etl_spark.operators.dedup import lww_dedup, lww_dedup_agg
from gene_etl_spark.operators.stats import corr_p_value, t_sf_two_sided


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (lsn, op, conv, turn, f"t{lsn}", dt.datetime(2024, 1, 1, 0, 0, sec))
            for (lsn, op, conv, turn, sec) in rows
        ],
        "lsn long, op string, conv_id string, turn_idx int, text string, ts timestamp",
    )


def test_lww_picks_max_lsn_then_ts(spark):
    df = _events(
        spark,
        [
            (1, "I", "c1", 0, 1),
            (5, "U", "c1", 0, 2),  # winner by lsn
            (3, "U", "c1", 0, 9),
            (7, "U", "c2", 0, 1),
            (7, "U", "c2", 0, 5),  # same lsn: ts breaks the tie
        ],
    )
    out = {(r.conv_id, r.turn_idx): r for r in lww_dedup(df).collect()}
    assert out[("c1", 0)].lsn == 5
    assert out[("c2", 0)].ts.second == 5


@pytest.mark.parametrize("salts", [1, 4, 16])
def test_salted_dedup_equals_plain(spark, salts):
    """Skew test: one key holding most rows resolves identically no
    matter the salt fan-out."""
    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
        F.when(F.col("id") % 10 < 7, "hot").otherwise(
            F.concat(F.lit("c"), (F.col("id") % 97).cast("string"))
        ).alias("conv_id"),
        (F.col("id") % 5).cast("int").alias("turn_idx"),
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("text"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    plain = {
        (r.conv_id, r.turn_idx): r.lsn for r in lww_dedup(df, num_salts=1).collect()
    }
    salted = {
        (r.conv_id, r.turn_idx): r.lsn
        for r in lww_dedup(df, num_salts=salts).collect()
    }
    assert plain == salted
    # the max_by hash-agg strategy (engine default) agrees exactly
    agg = {
        (r.conv_id, r.turn_idx): r.lsn for r in lww_dedup_agg(df).collect()
    }
    assert plain == agg
    # the hot key really is hot (~70% of rows) and still resolves to one row
    assert sum(1 for k in plain if k[0] == "hot") == 5


def test_t_sf_matches_reference_values():
    # reference points verified against Simpson integration of the t pdf
    # (agree to <1e-12; scipy unavailable in this container)
    cases = [
        ((2.0, 10), 0.07338803),
        ((2.68, 28), 0.01219293),
        ((0.5, 5), 0.63829887),
        ((4.0, 100), 0.00012152),
    ]
    for (t, df), expected in cases:
        assert abs(t_sf_two_sided(t, df) - expected) < 5e-7


def test_corr_p_value_bounds():
    assert corr_p_value(0.999999999, 50) < 1e-12
    assert 0.9 < corr_p_value(0.01, 20) <= 1.0
    assert corr_p_value(1.0, 10) == 0.0


def test_plan_shapes(spark):
    """The plans we designed for are the plans we get: pushdown on the
    whitelist scan, broadcast joins on dims."""
    from gene_etl_spark.plans import (
        broadcast_join_count,
        has_pushed_filters,
        scan_columns,
    )
    from gene_etl_spark.queries.relational import q_dim_join, q_scan_whitelist

    sf = "/root/testdata/sf0.001"
    scan = q_scan_whitelist(spark, sf)
    assert has_pushed_filters(scan)
    # column pruning: only the selected columns reach the reader
    assert set(scan_columns(scan)) == {"p_partkey", "p_brand", "p_type", "p_size"}

    assert broadcast_join_count(q_dim_join(spark, sf)) == 2


def test_slice_read_pushes_lsn_bounds(spark, tmp_path):
    """The binlog slice predicate must reach the Parquet scan (row-group
    pruning) — the property that lets the same code tail a 10^10-event
    log without scanning it."""
    from gene_etl_spark.plans import formatted_plan, has_pushed_filters
    from gene_etl_spark.sources.binlog import BinlogSource
    from gene_etl_spark.sources.simulate import generate_change_stream

    generate_change_stream(
        str(tmp_path / "ev"), n_convs=10, max_turns=5, n_events=500,
        seed=2, n_tranches=2, evolve_at_frac=0.0,
    )
    src = BinlogSource(spark, str(tmp_path / "ev"))
    sl = src.read_slice(100, 200)
    assert has_pushed_filters(sl)
    plan = formatted_plan(sl)
    assert "lsn" in plan.split("PushedFilters", 1)[1][:200]
