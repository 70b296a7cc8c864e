"""Sequence packing: every document lands in exactly one bin, no bin
exceeds the window, oversized docs are isolated and flagged, the
layout is deterministic, and fill rates are FFD-tight."""

import pytest
from pyspark.sql import functions as F

from gene_etl_spark.operators.packing import pack_sequences
from gene_etl_spark.queries.textops import docs_norm, tokens_col

SF_DIR = "/root/testdata/sf0.01"
WINDOW = 128


@pytest.fixture()
def corpus(spark):
    d = docs_norm(spark, SF_DIR).select(
        "doc_id", F.size(tokens_col()).cast("long").alias("n_tokens")
    )
    return d.persist()


def test_packing_partitions_the_corpus(spark, corpus):
    packed = pack_sequences(corpus, WINDOW, num_groups=8).persist()
    n_docs = corpus.count()
    assert packed.count() == n_docs  # every doc exactly once...
    assert packed.select("doc_id").distinct().count() == n_docs
    # ...token totals conserved
    assert (
        packed.agg(F.sum("n_tokens")).collect()[0][0]
        == corpus.agg(F.sum("n_tokens")).collect()[0][0]
    )
    # no bin over the window (oversized bins excepted, each solo+flagged)
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tot"),
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("oversize").cast("int")).alias("over"),
    )
    bad = per_bin.where((F.col("tot") > WINDOW) & (F.col("over") == 0)).count()
    assert bad == 0
    solo = per_bin.where(F.col("over") == 1)
    assert solo.where(F.col("n") != 1).count() == 0
    # bin_fill column agrees with the recomputed totals
    mismatch = (
        packed.groupBy("bin_id", "bin_fill")
        .agg(F.sum("n_tokens").alias("tot"))
        .where(F.col("tot") != F.col("bin_fill"))
        .count()
    )
    assert mismatch == 0
    packed.unpersist()


def test_packing_is_deterministic_and_reasonably_tight(spark, corpus):
    a = {
        (r.bin_id, r.doc_id)
        for r in pack_sequences(corpus, WINDOW, num_groups=8).collect()
    }
    b = {
        (r.bin_id, r.doc_id)
        for r in pack_sequences(corpus.repartition(13), WINDOW, num_groups=8).collect()
    }
    assert a == b  # layout independent of physical partitioning
    # FFD fill rate: total tokens / (bins * window) should be high for
    # ~50-token docs in a 128 window (>= 2 docs/bin almost everywhere)
    packed = pack_sequences(corpus, WINDOW, num_groups=8)
    n_bins = packed.select("bin_id").distinct().count()
    total = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert total / (n_bins * WINDOW) > 0.75


def test_packing_flags_oversized_docs(spark):
    rows = [(1, 10), (2, 500), (3, 60), (4, 70), (5, 120)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, 128, num_groups=2).collect()
    by_doc = {r.doc_id: r for r in packed}
    assert by_doc[2].oversize and by_doc[2].bin_fill == 500
    assert not by_doc[1].oversize
    # the oversized doc shares its bin with nobody
    bins = {}
    for r in packed:
        bins.setdefault(r.bin_id, []).append(r.doc_id)
    assert bins[by_doc[2].bin_id] == [2]
