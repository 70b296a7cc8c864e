"""End-to-end training-corpus construction: the whole LLM-data story
as ONE composed pipeline over the operator family —

    quality gate → repetition filter → exact dedup → MinHash-LSH
    near-dup removal → decontamination vs an eval set → stratified
    language mixing → sequence packing into context windows

Every stage is a DataFrame transform (the near-dup and decontamination
joins are banded/broadcast equi-joins; sampling is a row-local hash
gate; packing is group-local Arrow state), so the composition stays a
handful of Catalyst plans with no driver-side loops — the shape that
runs unchanged over a 100 TB corpus. Per-stage document counts are
returned as lineage (one count per stage boundary, the only actions
besides the final write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gene_etl_spark.functions import md5_long
from gene_etl_spark.operators.decontaminate import decontaminate
from gene_etl_spark.operators.packing import pack_sequences
from gene_etl_spark.operators.repetition import repetition_gate
from gene_etl_spark.operators.sampling import stratified_sample
from gene_etl_spark.queries.textops import (
    docs_norm,
    q_dedup_minhash_lsh,
    tokens_col,
)


def build_corpus(
    spark: SparkSession,
    sf_dir: str,
    *,
    eval_set: DataFrame | None = None,
    min_tokens: int = 30,
    repetition_filter: bool = True,
    lang_fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    window: int = 512,
    seed: int = 0,
) -> dict:
    """Returns {"packed": DataFrame(bin_id, doc_id, n_tokens, bin_fill,
    oversize), "kept": DataFrame(doc_id, lang, text, n_tokens),
    "stats": {stage: doc_count}}."""
    d = docs_norm(spark, sf_dir).withColumn(
        "n_tokens", F.size(tokens_col()).cast("long")
    )
    stats: dict[str, int] = {"input": d.count()}

    # 1. quality gate
    gated = d.where(F.col("n_tokens") >= min_tokens)
    stats["quality_gated"] = gated.count()

    # 1b. repetition filter (boilerplate/templated text)
    if repetition_filter:
        gated = repetition_gate(gated).drop(
            "dup_line_frac", "dup_line_char_frac", "top_bigram_share"
        )
        stats["repetition_gated"] = gated.count()

    # 2. exact dedup: keep the lowest doc_id per normalized fingerprint
    deduped = (
        gated.withColumn("_fp", md5_long("norm"))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_fp").orderBy("doc_id")),
        )
        .where(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )
    stats["exact_deduped"] = deduped.count()

    # 3. near-dup removal: drop the larger id of every LSH candidate pair
    near = q_dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    )
    kept = deduped.join(near, "doc_id", "leftanti")
    stats["near_deduped"] = kept.count()

    # 4. decontamination vs the eval set (verbatim n-gram leakage)
    if eval_set is not None:
        kept = decontaminate(kept, eval_set)
        stats["decontaminated"] = kept.count()

    # 5. stratified language mixing (deterministic key-hash gates)
    if lang_fractions is not None:
        kept = stratified_sample(
            kept, "lang", lang_fractions, "doc_id", seed=seed,
            default=default_fraction,
        )
        stats["mixed"] = kept.count()

    kept = kept.select("doc_id", "lang", "text", "n_tokens")

    # 6. pack into context windows
    packed = pack_sequences(kept, window, seed=seed)
    return {"packed": packed, "kept": kept, "stats": stats}
