"""Composed corpus-construction pipeline: stages actually bite, counts
are monotone, and the packed output is an exact partition of the kept
set."""

import pandas as pd
from pyspark.sql import functions as F

from gene_etl_spark.pipeline import build_corpus

SF_DIR = "/root/testdata/sf0.01"


def test_build_corpus_end_to_end(spark):
    eval_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1],
                # 12 words copied verbatim from no real doc: decontamination
                # must pass everything through (no false removals)
                "text": [" ".join(f"nonexistentevalword{j}" for j in range(12))],
            }
        )
    )
    out = build_corpus(
        spark,
        SF_DIR,
        eval_set=eval_df,
        min_tokens=30,
        lang_fractions={"en": 1.0, "de": 0.5},
        default_fraction=0.75,
        window=128,
        seed=4,
    )
    s = out["stats"]
    # monotone non-increasing through the funnel, every stage present
    order = ["input", "quality_gated", "repetition_gated", "exact_deduped",
             "near_deduped", "decontaminated", "mixed"]
    vals = [s[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert s["input"] == 500
    assert s["near_deduped"] < s["quality_gated"]  # LSH removal bit
    assert s["decontaminated"] == s["near_deduped"]  # clean eval set
    assert s["mixed"] < s["near_deduped"]  # mixing gate bit

    kept_ids = {r.doc_id for r in out["kept"].select("doc_id").collect()}
    packed = out["packed"]
    packed_ids = [r.doc_id for r in packed.select("doc_id").collect()]
    assert sorted(packed_ids) == sorted(kept_ids)  # exact partition
    over = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("t"), F.max(F.col("oversize").cast("int")).alias("o"))
        .where((F.col("t") > 128) & (F.col("o") == 0))
        .count()
    )
    assert over == 0

    # determinism: the same inputs produce the same packed layout
    out2 = build_corpus(
        spark, SF_DIR, eval_set=eval_df, min_tokens=30,
        lang_fractions={"en": 1.0, "de": 0.5}, default_fraction=0.75,
        window=128, seed=4,
    )
    a = {(r.bin_id, r.doc_id) for r in packed.collect()}
    b = {(r.bin_id, r.doc_id) for r in out2["packed"].collect()}
    assert a == b


def test_build_corpus_decontamination_bites(spark):
    """Plant a verbatim leak from a real document into the eval set: the
    pipeline must drop that document."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    victim = docs.orderBy("doc_id").limit(1).collect()[0]
    leak_words = " ".join(victim.text.split()[:12]).lower()
    eval_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [leak_words]})
    )
    out = build_corpus(spark, SF_DIR, eval_set=eval_df, min_tokens=1, window=128)
    kept_ids = {r.doc_id for r in out["kept"].select("doc_id").collect()}
    assert victim.doc_id not in kept_ids
    assert out["stats"]["decontaminated"] < out["stats"]["near_deduped"]


def test_build_corpus_cluster_dedup_is_transitive_superset(spark):
    """near_dedup='clusters' (connected components over the LSH pair
    graph) drops at least everything the pairwise rule drops: every
    pair's larger id has a smaller neighbor, so it can never be its
    component's representative."""
    pairs_out = build_corpus(spark, SF_DIR, window=128)
    clus_out = build_corpus(spark, SF_DIR, near_dedup="clusters", window=128)
    kept_pairs = {r.doc_id for r in pairs_out["kept"].select("doc_id").collect()}
    kept_clus = {r.doc_id for r in clus_out["kept"].select("doc_id").collect()}
    assert kept_clus <= kept_pairs
    assert clus_out["stats"]["near_deduped"] <= pairs_out["stats"]["near_deduped"]
