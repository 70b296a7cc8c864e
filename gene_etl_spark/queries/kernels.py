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

from gene_etl_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STEP,
    RESIZE_MAX_DIM,
    decode_audio_media,
    decode_media,
    resize_media,
    sample_frames,
    with_fake_payload,
)
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


def q_multimodal_resize(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return resize_media(with_fake_payload(docs))


SQL_MULTIMODAL_RESIZE = f"""
WITH dims AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 2))::INTEGER AS width,
         ('0x' || substr(md5(text), 3, 2))::INTEGER AS height
  FROM documents
)
SELECT doc_id, width, height,
       CASE WHEN GREATEST(width, height) <= {RESIZE_MAX_DIM} THEN width
            ELSE FLOOR(width * {RESIZE_MAX_DIM}.0 / GREATEST(width, height))::INTEGER
       END AS out_width,
       CASE WHEN GREATEST(width, height) <= {RESIZE_MAX_DIM} THEN height
            ELSE FLOOR(height * {RESIZE_MAX_DIM}.0 / GREATEST(width, height))::INTEGER
       END AS out_height,
       (CASE WHEN GREATEST(width, height) <= {RESIZE_MAX_DIM} THEN 1.0
             ELSE ROUND({RESIZE_MAX_DIM}.0 / GREATEST(width, height), 6)
        END)::DOUBLE AS scale
FROM dims
"""


def q_multimodal_frames(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_frames(with_fake_payload(docs))


def _sql_frames() -> str:
    # the fake payload is the 16-byte md5 digest: frame f covers bytes
    # [4f, 4f+4) = hex chars (8f+1 .. 8f+8); every FRAME_STEP-th frame kept
    n_frames = 16 // FRAME_BYTES
    idxs = ", ".join(str(i) for i in range(0, n_frames, FRAME_STEP))
    byte_terms = " + ".join(
        f"('0x' || substr(h, frame_idx * {2 * FRAME_BYTES} + {2 * j + 1}, 2))::BIGINT"
        for j in range(FRAME_BYTES)
    )
    return f"""
WITH hashed AS (SELECT doc_id, md5(text) AS h FROM documents),
frames AS (SELECT doc_id, h, unnest([{idxs}])::INTEGER AS frame_idx FROM hashed)
SELECT doc_id, frame_idx, ({byte_terms})::BIGINT AS frame_sum
FROM frames
"""


SQL_MULTIMODAL_FRAMES = _sql_frames()


def q_multimodal_audio(spark, sf_dir):
    """Audio feature extraction, ORACLE-GATED since round 6: payloads
    are real WAV bytes (deterministic trig-free integer waveform per
    doc, operators/multimodal.py synth_wav_payload), decoded by the
    real stdlib codec; sample counts / rate / duration / RMS are
    value-gated against a DuckDB twin that regenerates the identical
    samples with modular arithmetic."""
    from gene_etl_spark.operators.multimodal import synth_wav_payload

    # NOTE(r7): deliberately NOT fanned out — the chain is two
    # MapInPandas stages, so N partitions cost 2N Python round trips;
    # measured at sf0.1 a 32-way fan-out (0.7-2.4 s, high variance)
    # never beat the single-split plan (0.7-1.2 s), whose lone task
    # decodes the whole corpus in well under a second
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return decode_audio_media(synth_wav_payload(docs))


SQL_MULTIMODAL_AUDIO = """
WITH g AS (  -- max n = 1600 + 6*160 = 2560 samples
  SELECT i FROM generate_series(0, 2559) AS t(i)
), s AS (
  SELECT d.doc_id,
         ((d.doc_id * 131 + g.i * 7919) % 16384 - 8192) AS samp,
         (8000 + (d.doc_id % 3) * 4000) AS sr
  FROM documents d JOIN g ON g.i < 1600 + (d.doc_id % 7) * 160
)
SELECT doc_id,
       MAX(sr)::INT AS sample_rate,
       1::INT AS n_channels,
       COUNT(*)::BIGINT AS n_frames,
       ROUND(COUNT(*)::DOUBLE / MAX(sr), 6) AS duration_sec,
       ROUND(SQRT(AVG(POW(samp / 32768.0, 2))), 6) AS rms
FROM s GROUP BY doc_id
"""


QUERIES = {
    "pairwise_corr_kernel": q_pairwise_corr_kernel,
    "pairwise_corr_p": q_pairwise_corr_p,
    "pairwise_corr_kendall": q_pairwise_corr_kendall,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_audio": q_multimodal_audio,
}

ORACLES = {
    "pairwise_corr_kernel": SQL_PAIRWISE_CORR_KERNEL,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "multimodal_resize": SQL_MULTIMODAL_RESIZE,
    "multimodal_frames": SQL_MULTIMODAL_FRAMES,
    "multimodal_audio": SQL_MULTIMODAL_AUDIO,
    # pairwise_corr_p / pairwise_corr_kendall: rows-only (p-values and
    # tau-b are not SQL-expressible at full precision)
}
