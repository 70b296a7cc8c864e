"""Parity battery: Kendall tau (X1 completion), the candidate-view
composite read model, the fully composed corr -> p -> BH-FDR q ->
q-banded candidate pipeline (the reference's real read model,
models.py:241-266), and the explicit row-paged Parquet export sink (S7).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gene_etl_spark.queries.common import (
    CANDIDATE_MIN_ABS_RHO,
    CANDIDATE_TOPN,
    EXPORT_PAGE_ROWS,
)
from gene_etl_spark.queries.relational import MIN_PAIR_N, load, q_pairwise_corr


# --------------------------------------------------------------------- #
# X1 completion: Kendall tau-b (reference method="kendall",
# etl/correlate.py:124-129, config etl/config.py:46-51). Tau is
# inherently pairwise, so the exact relational form enumerates pairs —
# bounded to a deterministic per-group sample of KENDALL_SAMPLE rows
# (row_number by event_id) so the pair join is O(groups * K^2), never
# O(n^2) over the corpus. The unbounded exact kernel lives in
# operators/stats.py (per-cohort Arrow batches).
# --------------------------------------------------------------------- #
KENDALL_SAMPLE = 200


def q_corr_kendall(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "event_id", "value", "ts")
    w = Window.partitionBy("event_type").orderBy("event_id")
    s = ev.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= KENDALL_SAMPLE
    )
    a = s.select(
        F.col("event_type").alias("et"),
        F.col("rn").alias("ra"),
        F.col("value").alias("xa"),
        F.col("ts").alias("ya"),
    )
    b = s.select(
        F.col("event_type").alias("et"),
        F.col("rn").alias("rb"),
        F.col("value").alias("xb"),
        F.col("ts").alias("yb"),
    )
    pairs = a.join(b, "et").where(F.col("ra") < F.col("rb"))
    concordant = (
        (F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb"))
    ) | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb")))
    discordant = (
        (F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb"))
    ) | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb")))
    s_term = F.when(concordant, 1).when(discordant, -1).otherwise(0)
    agg = pairs.groupBy("et").agg(
        F.sum(s_term).cast("long").alias("s"),
        F.sum((F.col("xa") == F.col("xb")).cast("long")).alias("n1"),
        F.sum((F.col("ya") == F.col("yb")).cast("long")).alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    # tau-b: (C - D) / sqrt((n0 - ties_x)(n0 - ties_y))
    tau = F.col("s") / F.sqrt(
        ((F.col("n_pairs") - F.col("n1")) * (F.col("n_pairs") - F.col("n2"))).cast(
            "double"
        )
    )
    return agg.select(
        F.col("et").alias("event_type"),
        F.round(tau, 6).alias("tau_b"),
        F.col("n_pairs"),
    )


SQL_CORR_KENDALL = f"""
WITH s AS (
  SELECT event_type, value AS x, ts AS y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
), sm AS (SELECT * FROM s WHERE rn <= {KENDALL_SAMPLE}),
pairs AS (
  SELECT a.event_type,
         CASE WHEN (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y) THEN 1
              WHEN (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y) THEN -1
              ELSE 0 END AS st,
         CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
  FROM sm a JOIN sm b ON a.event_type = b.event_type AND a.rn < b.rn
)
SELECT event_type,
       ROUND(SUM(st)::DOUBLE
             / sqrt(((COUNT(*) - SUM(tx)) * (COUNT(*) - SUM(ty)))::DOUBLE),
             6) AS tau_b,
       COUNT(*)::BIGINT AS n_pairs
FROM pairs GROUP BY 1
"""


# --------------------------------------------------------------------- #
# Candidate-view composite read model: global rank + significance
# banding + two-alias dim decoration in ONE query, mirroring the
# reference's VW_GENE_PAIRS_CANDIDATE (models.py:241-266). The reference
# bands on q_value; q-values need scipy-side p-values, so the banding
# dimension is demonstrated on |rho| thresholds (the view's CASE shape
# and filter are identical). The rank window runs over a TakeOrdered
# prefix of CANDIDATE_TOPN rows — never a whole-table single-partition
# sort.
# --------------------------------------------------------------------- #
def q_candidate_view(spark, sf_dir):
    pairs = q_pairwise_corr(spark, sf_dir)
    cand = pairs.where(F.abs(F.col("rho")) >= CANDIDATE_MIN_ABS_RHO)
    top = cand.orderBy(F.desc("rho"), F.asc("supp_a"), F.asc("supp_b")).limit(
        CANDIDATE_TOPN
    )
    sup = load(spark, sf_dir, "supplier")
    s1 = sup.select(F.col("s_suppkey").alias("ka"), F.col("s_name").alias("supp_a_name"))
    s2 = sup.select(F.col("s_suppkey").alias("kb"), F.col("s_name").alias("supp_b_name"))
    w = Window.orderBy(F.desc("rho"), F.asc("supp_a"), F.asc("supp_b"))
    banding = (
        F.when(F.abs("rho") >= 0.5, "Highly Significant")
        .when(F.abs("rho") >= 0.25, "Significant")
        .when(F.abs("rho") >= CANDIDATE_MIN_ABS_RHO, "Marginally Significant")
        .otherwise("Not Significant")
    )
    return (
        top.join(F.broadcast(s1), F.col("supp_a") == F.col("ka"))
        .join(F.broadcast(s2), F.col("supp_b") == F.col("kb"))
        .withColumn("candidate_rank", F.row_number().over(w).cast("long"))
        .select(
            "candidate_rank",
            "supp_a_name",
            "supp_b_name",
            "rho",
            "n_samples",
            banding.alias("significance_category"),
        )
    )


SQL_CANDIDATE_VIEW = f"""
WITH m AS (
  SELECT l_suppkey, l_orderkey, SUM(l_quantity) AS v
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
         ROUND(CORR(a.v, b.v), 6) AS rho,
         COUNT(*)::BIGINT AS n_samples
  FROM m a JOIN m b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_PAIR_N}
), cand AS (
  SELECT * FROM c WHERE ABS(rho) >= {CANDIDATE_MIN_ABS_RHO}
  ORDER BY rho DESC, supp_a ASC, supp_b ASC
  LIMIT {CANDIDATE_TOPN}
)
SELECT ROW_NUMBER() OVER (ORDER BY rho DESC, supp_a ASC, supp_b ASC)::BIGINT
         AS candidate_rank,
       sa.s_name AS supp_a_name, sb.s_name AS supp_b_name,
       rho, n_samples,
       CASE WHEN ABS(rho) >= 0.5 THEN 'Highly Significant'
            WHEN ABS(rho) >= 0.25 THEN 'Significant'
            WHEN ABS(rho) >= {CANDIDATE_MIN_ABS_RHO} THEN 'Marginally Significant'
            ELSE 'Not Significant' END AS significance_category
FROM cand
JOIN supplier sa ON supp_a = sa.s_suppkey
JOIN supplier sb ON supp_b = sb.s_suppkey
"""


# --------------------------------------------------------------------- #
# The reference's REAL candidate pipeline, composed end-to-end: pairwise
# corr → per-pair p-value → per-cohort BH-FDR q → candidate view banded
# on q_value (models.py:241-266 VW_GENE_PAIRS_CANDIDATE +
# etl/correlate.py:149-189 per-cohort FDR). Cohort = supplier-a's
# nation (the analogue of the reference's per-illness FDR partitions),
# so every window below is cohort-partitioned — no single-partition
# global window at any scale; only the final rank runs global, over a
# TakeOrdered prefix of CANDIDATE_TOPN rows.
#
# The p-value is the REAL two-sided t-test p, computed cross-engine
# bitwise-identically with no transcendentals (round-4, closing the
# round-3 rational-surrogate deviation). Key identity: with
# t = rho·sqrt(df/(1-rho²)) and df = n-2, the t-CDF argument
# x = t/sqrt(df+t²) simplifies to exactly |rho| — so the EXACT
# closed-form t CDF for even df,
#   p = 1 - |rho|·Σ_{j=0}^{df/2-1} c_j (1-rho²)^j,
#   c_0 = 1, c_j = c_{j-1}·(2j-1)/(2j),
# is a pure +,·,/ recurrence in rho alone (IEEE-754 deterministic given
# identical evaluation order, which the Spark fold and the DuckDB
# list_reduce below state verbatim). Odd df takes the geometric mean of
# the adjacent even-df forms (sqrt is correctly rounded by IEEE-754, so
# still bitwise-reproducible): max abs error vs the exact betainc
# kernel ≤ 4.4e-4, even df exact to <1e-12 (tests/test_t_p_value.py) —
# so any p-ranking inversion vs the true t-test can occur only between
# pairs whose true p's differ by <9e-4, i.e. essential ties. The fold
# input is the 6-decimal-rounded rho (identical doubles cross-engine by
# construction) and integer n, hence identical bits out, hence a stable
# value hash. The exact betainc kernel remains the rows-only
# `pairwise_corr_p` entry (operators/stats.py:153). Banding thresholds
# are the reference's q cuts; on this null synthetic corpus BH
# correctly drives every q toward 1, so the band column honestly reads
# 'Not Significant' while rho/p/q carry full hash signal.
# --------------------------------------------------------------------- #
def t_p_expr(rho, n):
    """Two-sided Pearson-r t-test p as a Spark Column: exact even-df
    closed form via a sequential fold, geometric-mean interpolation for
    odd df. ``rho`` must be the decimal-rounded correlation (so both
    engines fold identical doubles); requires n ≥ 4 (the gated query
    guarantees n ≥ MIN_PAIR_N = 10)."""
    absr = F.abs(rho)
    y = F.lit(1.0) - rho * rho
    m = F.floor((n - F.lit(2)) / F.lit(2)).cast("int")
    odd = (n - F.lit(2)) % F.lit(2)

    def _step(acc, j):
        jd = j.cast("double")
        term = (
            acc["term"] * y * (F.lit(2.0) * jd - F.lit(1.0)) / (F.lit(2.0) * jd)
        )
        return F.struct(
            term.alias("term"),
            (acc["s"] + term).alias("s"),
            acc["s"].alias("sp"),
        )

    st = F.aggregate(
        F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
        F.struct(
            F.lit(1.0).alias("term"), F.lit(1.0).alias("s"), F.lit(0.0).alias("sp")
        ),
        _step,
    )
    p_hi = F.greatest(F.lit(1.0) - absr * st["sp"], F.lit(0.0))  # df = 2m
    p_lo = F.greatest(F.lit(1.0) - absr * st["s"], F.lit(0.0))  # df = 2m+2
    return F.when(odd == 0, p_hi).otherwise(F.sqrt(p_hi * p_lo))


def t_p_sql(rho: str, n: str) -> str:
    """The DuckDB twin of ``t_p_expr`` — the identical fold, operation
    for operation (list_reduce seeds the [term, s, sp] state as the
    list's first element), so p is bitwise-identical cross-engine."""
    m = f"CAST(FLOOR(({n} - 2) / 2) AS INT)"
    fold = f"""list_reduce(
      [[1.0, 1.0, 0.0]] || list_transform(range(1, GREATEST({m}, 1) + 1), j -> [j::DOUBLE, 0.0, 0.0]),
      (acc, x) -> [
        acc[1] * (1.0 - {rho} * {rho}) * (2.0 * x[1] - 1.0) / (2.0 * x[1]),
        acc[2] + acc[1] * (1.0 - {rho} * {rho}) * (2.0 * x[1] - 1.0) / (2.0 * x[1]),
        acc[2]
      ])"""
    return f"""CASE WHEN ({n} - 2) % 2 = 0
       THEN GREATEST(1.0 - ABS({rho}) * ({fold})[3], 0.0)
       ELSE SQRT(GREATEST(1.0 - ABS({rho}) * ({fold})[3], 0.0)
                 * GREATEST(1.0 - ABS({rho}) * ({fold})[2], 0.0))
       END"""
def q_candidate_view_q(spark, sf_dir):
    pairs = q_pairwise_corr(spark, sf_dir).where(F.col("rho").isNotNull())
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_a"), F.col("s_nationkey").alias("cohort")
    )
    nat = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cohort"), F.col("n_name").alias("cohort_nation")
    )
    p = t_p_expr(F.col("rho"), F.col("n_samples"))
    df = pairs.join(F.broadcast(sup), "supp_a").withColumn("p_value", p)
    grp = Window.partitionBy("cohort")
    n = F.count(F.lit(1)).over(grp)
    r = F.row_number().over(
        grp.orderBy(F.asc("p_value"), F.asc("supp_a"), F.asc("supp_b"))
    )
    df = df.withColumn("raw_q", F.col("p_value") * n / r)
    wsuf = grp.orderBy(
        F.desc("p_value"), F.desc("supp_a"), F.desc("supp_b")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = df.withColumn(
        "q_value", F.least(F.min("raw_q").over(wsuf), F.lit(1.0))
    )
    top = df.orderBy(
        F.asc("q_value"), F.asc("p_value"), F.asc("supp_a"), F.asc("supp_b")
    ).limit(CANDIDATE_TOPN)
    w = Window.orderBy(
        F.asc("q_value"), F.asc("p_value"), F.asc("supp_a"), F.asc("supp_b")
    )
    banding = (
        F.when(F.col("q_value") <= 0.01, "Highly Significant")
        .when(F.col("q_value") <= 0.05, "Significant")
        .when(F.col("q_value") <= 0.25, "Marginally Significant")
        .otherwise("Not Significant")
    )
    return (
        top.join(F.broadcast(nat), "cohort")
        .withColumn("candidate_rank", F.row_number().over(w).cast("long"))
        .select(
            "candidate_rank",
            "cohort_nation",
            "supp_a",
            "supp_b",
            "rho",
            F.round("p_value", 8).alias("p_value"),
            F.round("q_value", 8).alias("q_value"),
            banding.alias("significance_category"),
        )
    )


SQL_CANDIDATE_VIEW_Q = f"""
WITH m AS (
  SELECT l_suppkey, l_orderkey, SUM(l_quantity) AS v
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
         ROUND(CORR(a.v, b.v), 6) AS rho,
         COUNT(*)::BIGINT AS n_samples
  FROM m a JOIN m b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_PAIR_N}
), j AS (
  SELECT c.*, s.s_nationkey AS cohort,
         {t_p_sql("rho", "n_samples")} AS p_value
  FROM c JOIN supplier s ON c.supp_a = s.s_suppkey
  WHERE rho IS NOT NULL
), ranked AS (
  SELECT *,
         COUNT(*) OVER (PARTITION BY cohort) AS n,
         ROW_NUMBER() OVER (PARTITION BY cohort
                            ORDER BY p_value ASC, supp_a ASC, supp_b ASC) AS r
  FROM j
), qq AS (
  SELECT *, LEAST(MIN(p_value * n / r) OVER (
              PARTITION BY cohort ORDER BY p_value DESC, supp_a DESC, supp_b DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0) AS q_value
  FROM ranked
), cand AS (
  SELECT * FROM qq
  ORDER BY q_value ASC, p_value ASC, supp_a ASC, supp_b ASC
  LIMIT {CANDIDATE_TOPN}
)
SELECT ROW_NUMBER() OVER (ORDER BY q_value ASC, p_value ASC,
                          supp_a ASC, supp_b ASC)::BIGINT AS candidate_rank,
       n.n_name AS cohort_nation,
       supp_a, supp_b, rho,
       ROUND(p_value, 8) AS p_value,
       ROUND(q_value, 8) AS q_value,
       CASE WHEN q_value <= 0.01 THEN 'Highly Significant'
            WHEN q_value <= 0.05 THEN 'Significant'
            WHEN q_value <= 0.25 THEN 'Marginally Significant'
            ELSE 'Not Significant' END AS significance_category
FROM cand JOIN nation n ON cand.cohort = n.n_nationkey
"""


# --------------------------------------------------------------------- #
# S7: explicit Parquet export sink with row paging. The reference
# exports results in offset/limit pages of 100k rows, one Parquet file
# per page (etl/io.py:289-335); the distributed analogue is
# spark.sql.files.maxRecordsPerFile — every task splits its output at
# the page boundary, no single-writer bottleneck. The gated entry
# round-trips write -> read-back -> digest (values survive the sink);
# per-file page-size enforcement is asserted in tests.
# --------------------------------------------------------------------- #
def export_paged(df, out_dir: str, page_rows: int = EXPORT_PAGE_ROWS) -> None:
    """Write ``df`` as Parquet with at most ``page_rows`` rows per file."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", str(page_rows))
    try:
        df.write.mode("overwrite").parquet(out_dir)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", prev)


def q_export_pages(spark, sf_dir):
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="export_pages_")
    try:
        src = (
            load(spark, sf_dir, "orders")
            .where(F.col("o_orderstatus") == "F")
            .select(
                "o_orderkey",
                "o_custkey",
                F.round("o_totalprice", 2).alias("total_price"),
            )
        )
        export_paged(src, out_dir)
        back = spark.read.parquet(out_dir)
        digest = back.groupBy().agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("o_orderkey").cast("long").alias("n_keys"),
            F.round(F.sum("total_price"), 2).alias("sum_price"),
        )
        # the export dir is temporary: materialize the 1-row digest before
        # cleanup (driver-contract shim, same pattern as queries/cdc.py)
        pdf = digest.toPandas()
        return spark.createDataFrame(pdf, digest.schema)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_EXPORT_PAGES = """
SELECT COUNT(*)::BIGINT AS n_rows,
       COUNT(DISTINCT o_orderkey)::BIGINT AS n_keys,
       ROUND(SUM(ROUND(o_totalprice, 2)), 2) AS sum_price
FROM orders WHERE o_orderstatus = 'F'
"""


QUERIES = {
    "corr_kendall": q_corr_kendall,
    "candidate_view": q_candidate_view,
    "candidate_view_q": q_candidate_view_q,
    "export_pages": q_export_pages,
}

ORACLES = {
    "corr_kendall": SQL_CORR_KENDALL,
    "candidate_view": SQL_CANDIDATE_VIEW,
    "candidate_view_q": SQL_CANDIDATE_VIEW_Q,
    "export_pages": SQL_EXPORT_PAGES,
}
