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


def test_kendall_tau_matches_reference_values():
    """scipy.stats.kendalltau parity points (scipy unavailable in this
    container; expected values are scipy's published doc example plus
    hand-checked exact cases)."""
    import numpy as np

    from gene_etl_spark.operators.stats import kendall_tau_b

    tau, p = kendall_tau_b(
        np.array([12.0, 2.0, 1.0, 12.0, 2.0]), np.array([1.0, 4.0, 7.0, 1.0, 0.0])
    )
    assert abs(tau - (-0.47140452079103173)) < 1e-12
    assert abs(p - 0.2827454599327748) < 1e-10
    tau, _ = kendall_tau_b(np.arange(8.0), np.arange(8.0)[::-1])
    assert tau == -1.0
    tau, _ = kendall_tau_b(np.arange(8.0), np.arange(8.0))
    assert tau == 1.0


def test_similarity_plans_have_no_cartesian(spark):
    """The near-pair family must plan hash equi-joins (banded/bucketed),
    never a cartesian or nested-loop — the 100 TB shape."""
    from gene_etl_spark.plans import formatted_plan
    from gene_etl_spark.queries.textops import (
        q_dedup_minhash_lsh,
        q_embedding_lsh_pairs,
        q_simhash_near_pairs,
    )

    sf = "/root/testdata/sf0.001"
    for q in (q_simhash_near_pairs, q_embedding_lsh_pairs, q_dedup_minhash_lsh):
        plan = formatted_plan(q(spark, sf))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__


def test_doc_winnow_plans_single_shuffle_free_pass(spark):
    """Per-doc fingerprints are already unique (array_distinct before
    the explode), so the winnow query must plan ZERO exchanges — the
    round-2 trailing distinct() cost a full extra shuffle for nothing."""
    from gene_etl_spark.plans import formatted_plan
    from gene_etl_spark.queries.textops import q_doc_winnow

    plan = formatted_plan(q_doc_winnow(spark, "/root/testdata/sf0.001"))
    # the one allowed Exchange is the small-scan RoundRobin fan-out (a
    # no-op at corpus scale); the distinct's hash-partitioned Exchange +
    # HashAggregate pair must be gone
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan


def test_corpus_pipeline_lsh_has_no_dupe_set_distinct(spark):
    """Anti-join semantics ignore right-side duplicates: the dupe-id set
    feeding the leftanti join must NOT be distinct-aggregated first (a
    wasted shuffle at corpus scale). The pipeline's only aggregations
    are the LSH signature agg, the shingle df-cap agg, and the final
    per-language rollup."""
    from gene_etl_spark.plans import formatted_plan
    from gene_etl_spark.queries.textops import q_corpus_pipeline_lsh

    plan = formatted_plan(q_corpus_pipeline_lsh(spark, "/root/testdata/sf0.001"))
    # a distinct on (doc_id) right before the anti join would show up as
    # a keys=[doc_id]-only HashAggregate with no aggregate functions
    import re

    distincts = [
        m
        for m in re.finditer(r"HashAggregate\(keys=\[doc_id[^]]*\], functions=\[\]", plan)
    ]
    assert not distincts, plan[:2000]


def test_rank_page_uses_take_ordered(spark):
    """Pagination must prefix the rank window with a top-N
    (TakeOrderedAndProject: per-partition heaps) instead of sorting the
    whole table through one task."""
    from gene_etl_spark.plans import formatted_plan
    from gene_etl_spark.queries.relational import q_rank_page

    plan = formatted_plan(q_rank_page(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan


def test_shingle_df_cap_bounds_hot_shingle(spark, tmp_path):
    """Skew guard: a shingle present in every document is dropped before
    pair enumeration, so one ubiquitous bigram cannot contribute C(n,2)
    join rows."""
    from gene_etl_spark.queries.common import SHINGLE_DF_CAP
    from gene_etl_spark.queries.textops import capped_shingles, doc_shingles

    n = SHINGLE_DF_CAP + 70
    rows = [(i, "en", f"common token filler{i} tail{i}") for i in range(n)]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    # the hot shingle really is ubiquitous pre-cap...
    raw_max = (
        doc_shingles(spark, str(tmp_path))
        .groupBy("sh")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert raw_max == n
    # ...and gone post-cap: per-shingle df (== pair-join fan-out driver)
    # is bounded by the cap
    capped_max = (
        capped_shingles(spark, str(tmp_path))
        .groupBy("shh")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert capped_max is not None and capped_max <= SHINGLE_DF_CAP


def test_winnow_shared_substring_guarantee(spark, tmp_path):
    """The winnowing invariant: any two docs sharing a substring of
    length >= k + w - 1 share at least one fingerprint; unrelated text
    shares none."""
    from gene_etl_spark.queries.textops import q_doc_winnow

    common = "the quick brown fox jumps over the lazy dog"
    rows = [
        (0, "en", "aaaa xxxx " + common + " bbbb"),
        (1, "en", "cccc yyyy zzzz " + common + " dddd eeee"),
        (2, "en", "completely unrelated words with nothing in overlap here"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    fps: dict[int, set] = {}
    for r in q_doc_winnow(spark, str(tmp_path)).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[0] & fps[1], "shared substring must share a fingerprint"
    assert not (fps[0] & fps[2])
    assert not (fps[1] & fps[2])


def test_export_paged_respects_page_size(spark, tmp_path):
    """S7 export sink: no output file exceeds the page-row cap and the
    round-trip preserves every row (reference pages exports at 100k
    rows/file, etl/io.py:289-335)."""
    import glob

    import pyarrow.parquet as pq

    from gene_etl_spark.queries.relational3 import export_paged

    df = spark.range(5000).select(F.col("id"), (F.col("id") % 7).alias("v"))
    out = str(tmp_path / "export")
    export_paged(df, out, page_rows=1000)
    files = glob.glob(out + "/*.parquet")
    assert files
    assert all(pq.ParquetFile(f).metadata.num_rows <= 1000 for f in files)
    assert spark.read.parquet(out).count() == 5000


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


def test_merged_queries_plan_shapes(spark):
    """Round-3 merged queries keep the plans their twins had:
    corr_methods' two rank windows and the final agg all share ONE
    l_returnflag exchange; the recency rollup takes TakeOrdered over
    the aggregate (no global sort)."""
    from gene_etl_spark.plans import formatted_plan
    from gene_etl_spark.queries.relational import q_corr_methods
    from gene_etl_spark.queries.relational2 import q_recent_daily_rollup

    sf = "/root/testdata/sf0.001"
    plan = formatted_plan(q_corr_methods(spark, sf))
    assert plan.count("Exchange (") == 1
    plan = formatted_plan(q_recent_daily_rollup(spark, sf))
    assert "TakeOrderedAndProject" in plan


def test_candidate_view_q_plan_is_cohort_partitioned(spark):
    """The composed q-value pipeline must never run a whole-table
    single-partition window: the BH windows partition by cohort, and
    the only unpartitioned window is the final rank over the
    TakeOrdered candidate prefix."""
    from gene_etl_spark.plans import formatted_plan
    from gene_etl_spark.queries.relational3 import q_candidate_view_q

    plan = formatted_plan(q_candidate_view_q(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(cohort" in plan  # BH runs per cohort


# two-tier test policy (round 7): this module is in the smoke tier
pytestmark = pytest.mark.smoke
