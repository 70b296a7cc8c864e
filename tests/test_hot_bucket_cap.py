"""Hot-bucket cap for LSH band joins (round-4 verdict item 2): a viral
duplicate cluster — 10³ copies of one document on a NON-deduped corpus
— must not turn a band bucket into a quadratic join key. Over the cap,
buckets emit a star on their smallest doc id (linear, connectivity
preserved); under the cap the plans are row-identical to the uncapped
ones, which the driver's hash gates pin every round."""

import os

import pytest
from pyspark.sql import types as T

from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
from gene_etl_spark.lake.table import LakeTable
from gene_etl_spark.queries.textops import (
    lsh_hot_bucket_stats,
    q_dedup_minhash_lsh,
)

VOCAB = [f"w{i:02d}" for i in range(97)]
VIRAL_N = 1000
# disjoint token set from VOCAB so no organic doc shares its buckets
VIRAL_TEXT = " ".join(f"viral{k}" for k in range(20))


def _near_text(i: int, n: int = 25) -> str:
    # adjacent ids share a long window → organic near-dups, tiny buckets
    return " ".join(VOCAB[(i * 3 + k) % 97] for k in range(n))


def _doc_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )


def _viral_rows():
    rows = [(i, "en", VIRAL_TEXT) for i in range(VIRAL_N)]
    rows += [(5000 + i, "en", _near_text(i)) for i in range(20)]
    return rows


def test_candidate_pairs_viral_cluster_is_linear(spark, workdir):
    base = LakeTable.create(
        spark, os.path.join(workdir, "docs"), _doc_schema(),
        key_cols=["doc_id"], num_buckets=4,
    )
    rows = _viral_rows()
    df = spark.createDataFrame(
        [(d, la, t, "U", j + 1, None) for j, (d, la, t) in enumerate(rows)],
        T.StructType(
            list(_doc_schema().fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    base.merge(df, batch_id="seed", start_lsn=0, end_lsn=len(rows))
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    idx.refresh()

    stats = idx.hot_bucket_stats()  # default cap (256) binds at 1000
    assert stats["max_multiplicity"] == VIRAL_N
    assert stats["n_capped_buckets"] >= 1

    pairs = idx.candidate_pairs().collect()
    # linear, not C(1000,2) = 499500
    assert len(pairs) < VIRAL_N + 200
    viral = [p for p in pairs if p.doc_b < 5000]
    # the star: every viral copy links to doc 0, flagged exact
    assert {p.doc_a for p in viral} == {0}
    assert len(viral) == VIRAL_N - 1 and all(p.exact for p in viral)
    # the organic near-dups still pair normally
    assert any(p.doc_a >= 5000 and not p.exact for p in pairs)


def test_candidate_pairs_unchanged_when_cap_does_not_bind(spark, workdir):
    base = LakeTable.create(
        spark, os.path.join(workdir, "docs"), _doc_schema(),
        key_cols=["doc_id"], num_buckets=4,
    )
    rows = [(i, "en", _near_text(i)) for i in range(20)]
    df = spark.createDataFrame(
        [(d, la, t, "U", j + 1, None) for j, (d, la, t) in enumerate(rows)],
        T.StructType(
            list(_doc_schema().fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    base.merge(df, batch_id="seed", start_lsn=0, end_lsn=len(rows))
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    idx.refresh()
    capped = {tuple(r) for r in idx.candidate_pairs().collect()}
    uncapped = {tuple(r) for r in idx.candidate_pairs(band_cap=10**9).collect()}
    assert capped == uncapped and len(capped) > 0
    assert idx.hot_bucket_stats()["n_capped_buckets"] == 0


def test_lsh_query_viral_cluster_is_linear(spark, tmp_path):
    sf_dir = str(tmp_path)
    spark.createDataFrame(_viral_rows(), _doc_schema()).write.parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    stats = lsh_hot_bucket_stats(spark, sf_dir, band_cap=64)
    assert stats["max_multiplicity"] == VIRAL_N
    # identical docs share every band bucket → all 4 bands capped
    assert stats["n_capped_buckets"] == 4

    pairs = q_dedup_minhash_lsh(spark, sf_dir, band_cap=64).collect()
    assert len(pairs) < VIRAL_N + 200
    viral = [p for p in pairs if p.doc_b < 5000]
    assert {p.doc_a for p in viral} == {0} and len(viral) == VIRAL_N - 1
    # each pair exactly once (the star/anti-join dedup)
    keys = [(p.doc_a, p.doc_b) for p in pairs]
    assert len(keys) == len(set(keys))


def test_lsh_query_unchanged_when_cap_does_not_bind(spark):
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    capped = {
        (r.doc_a, r.doc_b) for r in q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in q_dedup_minhash_lsh(spark, sf_dir, band_cap=10**9).collect()
    }
    assert capped == uncapped and len(capped) > 0


def test_custom_cap_does_not_touch_the_shared_cache(spark):
    """A non-default band_cap must neither evict the warmed default-cap
    result (corpus_pipeline_lsh / bench warmup depend on it) nor leave
    an untracked persisted DataFrame behind."""
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    from gene_etl_spark.queries.textops import _LSH_PAIRS_CACHE

    default = q_dedup_minhash_lsh(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    assert _LSH_PAIRS_CACHE.get(key) is default

    custom = q_dedup_minhash_lsh(spark, sf_dir, band_cap=10**9)
    assert _LSH_PAIRS_CACHE.get(key) is default  # not evicted
    lvl = custom.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)  # not persisted → no leak
    assert custom.count() > 0
