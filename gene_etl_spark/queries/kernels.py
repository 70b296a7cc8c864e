"""Arrow-kernel (pandas UDF) queries + multimodal stub queries.

The kernel variants compute the same semantics as their relational
twins and are checked against the same kind of SQL oracle — evidence
that the applyInPandas path (SURVEY.md §2.11) is correct, not just
present. ``pairwise_corr_p`` additionally emits reference-parity
p-values (no SQL oracle exists for those — rows-only check; the rho/n
columns are covered by ``pairwise_corr_kernel``'s oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gene_etl_spark.operators.multimodal import decode_media, with_fake_payload
from gene_etl_spark.operators.stats import pairwise_corr_kernel, pairwise_corr_with_p

MIN_PAIR_N = 10


def _long_matrix(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy(
        F.col("l_returnflag").alias("cohort"),
        F.col("l_suppkey").alias("entity"),
        F.col("l_orderkey").alias("sample"),
    ).agg(F.sum("l_quantity").alias("v"))


def q_pairwise_corr_kernel(spark, sf_dir):
    return pairwise_corr_kernel(
        _long_matrix(spark, sf_dir),
        cohort_col="cohort",
        entity_col="entity",
        sample_col="sample",
        value_col="v",
        min_samples=MIN_PAIR_N,
        round_to=4,
    )


SQL_PAIRWISE_CORR_KERNEL = f"""
WITH m AS (
  SELECT l_returnflag AS cohort, l_suppkey AS entity, l_orderkey AS sample,
         SUM(l_quantity) AS v
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT a.cohort, a.entity AS entity_a, b.entity AS entity_b,
       ROUND(CORR(a.v, b.v), 4) AS rho,
       COUNT(*)::BIGINT AS n_samples
FROM m a JOIN m b
  ON a.cohort = b.cohort AND a.sample = b.sample AND a.entity < b.entity
GROUP BY 1, 2, 3
HAVING COUNT(*) >= {MIN_PAIR_N} AND CORR(a.v, b.v) IS NOT NULL
"""


def q_pairwise_corr_p(spark, sf_dir):
    """Reference-parity output (rho, n, p) per pair — p-values are not
    SQL-expressible, so this entry is rows-only checked."""
    return pairwise_corr_with_p(
        _long_matrix(spark, sf_dir),
        cohort_col="cohort",
        entity_col="entity",
        sample_col="sample",
        value_col="v",
        method="spearman",
        min_samples=MIN_PAIR_N,
    )


def q_pairwise_corr_kendall(spark, sf_dir):
    """method="kendall" through the same kernel (reference
    etl/correlate.py:124-129 selects kendalltau via config). tau-b and
    its asymptotic p come from the NumPy implementation in
    operators/stats.py (scipy absent); rows-only driver check — exact
    tau values are unit-tested against scipy reference points and the
    oracle-gated relational form (queries/relational3.py)."""
    return pairwise_corr_with_p(
        _long_matrix(spark, sf_dir),
        cohort_col="cohort",
        entity_col="entity",
        sample_col="sample",
        value_col="v",
        method="kendall",
        min_samples=MIN_PAIR_N,
    )


def q_multimodal_decode(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return decode_media(with_fake_payload(docs))


def _sql_multimodal() -> str:
    mean_terms = " + ".join(
        f"('0x' || substr(h, {2 * i + 1}, 2))::BIGINT" for i in range(16)
    )
    return f"""
WITH hashed AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT doc_id,
       ('0x' || substr(h, 1, 2))::INTEGER AS width,
       ('0x' || substr(h, 3, 2))::INTEGER AS height,
       16::BIGINT AS n_bytes,
       ROUND(({mean_terms}) / 16.0, 6) AS mean_byte
FROM hashed
"""


SQL_MULTIMODAL_DECODE = _sql_multimodal()


QUERIES = {
    "pairwise_corr_kernel": q_pairwise_corr_kernel,
    "pairwise_corr_p": q_pairwise_corr_p,
    "pairwise_corr_kendall": q_pairwise_corr_kendall,
    "multimodal_decode": q_multimodal_decode,
}

ORACLES = {
    "pairwise_corr_kernel": SQL_PAIRWISE_CORR_KERNEL,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    # pairwise_corr_p: rows-only (p-values not SQL-expressible)
}
