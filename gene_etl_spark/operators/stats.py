"""Grouped statistical kernels over Arrow (pandas UDF path).

The reference computes per-cohort all-pairs correlations with a blocked
NumPy loop over a pivoted matrix (etl/correlate.py:66-113, pivot at
etl/correlate.py:241-247). Here the same kernel runs as
``groupBy(cohort).applyInPandas``: the pivot happens inside the Arrow
batch (never as a wide Spark schema), the pair loop is one vectorized
``DataFrame.corr`` call, and cohorts parallelize as partitions instead
of joblib threads (etl/correlate.py:272-279).

Pairwise-complete semantics: pandas ``corr`` uses pairwise-complete
observations, which equals the relational inner-join-per-pair form —
the two implementations (this kernel and queries/relational.py
q_pairwise_corr) are oracle-checked against the same SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("cohort", T.StringType()),
        T.StructField("entity_a", T.LongType()),
        T.StructField("entity_b", T.LongType()),
        T.StructField("rho", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def pairwise_corr_kernel(
    df: DataFrame,
    cohort_col: str,
    entity_col: str,
    sample_col: str,
    value_col: str,
    min_samples: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """All entity pairs' Pearson correlation within each cohort.

    Input: long-format (cohort, entity, sample, value); output: one row
    per (cohort, entity_a < entity_b) with rho and pairwise n.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        cohort = pdf[cohort_col].iloc[0]
        wide = pdf.pivot_table(
            index=sample_col, columns=entity_col, values=value_col, aggfunc="first"
        )
        entities = sorted(wide.columns)
        wide = wide[entities]
        corr = wide.corr(method="pearson", min_periods=1)
        present = wide.notna().astype(np.int64)
        n_mat = present.T.values @ present.values  # pairwise co-occurrence
        rows = []
        for i in range(len(entities)):
            for j in range(i + 1, len(entities)):
                n = int(n_mat[i, j])
                rho = corr.iat[i, j]
                if n >= min_samples and pd.notna(rho):
                    rows.append(
                        (cohort, int(entities[i]), int(entities[j]), round(float(rho), round_to), n)
                    )
        return pd.DataFrame(rows, columns=[f.name for f in PAIR_SCHEMA.fields])

    return df.groupBy(cohort_col).applyInPandas(kernel, PAIR_SCHEMA)


# --------------------------------------------------------------------- #
# p-values without scipy: two-sided t-test p for a Pearson/Spearman rho,
# via the regularized incomplete beta function (Lentz continued
# fraction) — the reference reports (rho, p, q) per pair
# (etl/correlate.py:124-143); scipy is unavailable in this container so
# the special function is implemented in NumPy.
# --------------------------------------------------------------------- #
def _betacf(a: float, b: float, x: float, max_iter: int = 200, eps: float = 3e-12) -> float:
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def _betainc_reg(a: float, b: float, x: float) -> float:
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf_two_sided(t: float, df: int) -> float:
    """Two-sided survival p-value of a t statistic (matches
    scipy.stats.t.sf(|t|, df) * 2 to ~1e-10)."""
    if df <= 0:
        return float("nan")
    x = df / (df + t * t)
    return _betainc_reg(df / 2.0, 0.5, x)


def corr_p_value(rho: float, n: int) -> float:
    """p-value for Pearson/Spearman rho under the t approximation the
    reference relies on (scipy pearsonr/spearmanr internals)."""
    if n < 3 or abs(rho) >= 1.0:
        return 0.0 if abs(rho) >= 1.0 else float("nan")
    t = abs(rho) * ((n - 2) / (1.0 - rho * rho)) ** 0.5
    return t_sf_two_sided(t, n - 2)


def kendall_tau_b(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Kendall tau-b + asymptotic two-sided p-value, NumPy only (the
    reference selects method="kendall" via scipy.stats.kendalltau,
    etl/correlate.py:124-129; scipy is unavailable here, so tau-b and
    the tie-corrected normal approximation of S's variance are computed
    directly — scipy's 'asymptotic' branch).

    Vectorized over the full sign matrix: fine for the per-cohort sample
    vectors this kernel sees (n up to a few thousand); the relational
    form (queries/relational3.py) bounds n explicitly instead.
    """
    import math

    n = len(x)
    if n < 2:
        return float("nan"), float("nan")
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, 1)
    sx, sy = dx[iu], dy[iu]
    s = float((sx * sy).sum())
    n0 = n * (n - 1) / 2.0
    ties_x = float((sx == 0).sum())
    ties_y = float((sy == 0).sum())
    denom = math.sqrt((n0 - ties_x) * (n0 - ties_y))
    if denom == 0.0:
        return float("nan"), float("nan")
    tau = s / denom

    def tie_terms(v):
        _, counts = np.unique(v, return_counts=True)
        t = counts[counts > 1].astype(float)
        return (
            float((t * (t - 1) * (2 * t + 5)).sum()),
            float((t * (t - 1) * (t - 2)).sum()),
            float((t * (t - 1)).sum()),
        )

    vx0, vx1, vx2 = tie_terms(x)
    vy0, vy1, vy2 = tie_terms(y)
    var_s = (n * (n - 1) * (2 * n + 5) - vx0 - vy0) / 18.0
    if n > 2:
        var_s += vx1 * vy1 / (9.0 * n * (n - 1) * (n - 2))
    var_s += vx2 * vy2 / (2.0 * n * (n - 1))
    if var_s <= 0.0:
        return tau, float("nan")
    z = s / math.sqrt(var_s)
    p = math.erfc(abs(z) / math.sqrt(2.0))
    return tau, p


PAIR_P_SCHEMA = T.StructType(
    list(PAIR_SCHEMA.fields) + [T.StructField("p_value", T.DoubleType())]
)


def pairwise_corr_with_p(
    df: DataFrame,
    cohort_col: str,
    entity_col: str,
    sample_col: str,
    value_col: str,
    method: str = "spearman",
    min_samples: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reference-parity kernel: per-cohort all-pairs rho + p-value
    (etl/correlate.py:91-143), vectorized per cohort in one Arrow batch.
    method is one of pearson | spearman | kendall (the reference's
    config-selectable set, etl/config.py:46-51); kendall uses the
    NumPy tau-b above since pandas delegates kendall to scipy."""
    if method not in ("pearson", "spearman", "kendall"):
        raise ValueError(f"unknown correlation method: {method}")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        cohort = pdf[cohort_col].iloc[0]
        wide = pdf.pivot_table(
            index=sample_col, columns=entity_col, values=value_col, aggfunc="first"
        )
        entities = sorted(wide.columns)
        wide = wide[entities]
        corr = (
            None
            if method == "kendall"
            else wide.corr(method=method, min_periods=1)
        )
        present = wide.notna()
        n_mat = present.T.values.astype(np.int64) @ present.values.astype(np.int64)
        vals = wide.values
        pres = present.values
        rows = []
        for i in range(len(entities)):
            for j in range(i + 1, len(entities)):
                n = int(n_mat[i, j])
                if n < min_samples:
                    continue
                if method == "kendall":
                    mask = pres[:, i] & pres[:, j]
                    rho, p = kendall_tau_b(vals[mask, i], vals[mask, j])
                else:
                    rho = corr.iat[i, j]
                    p = corr_p_value(float(rho), n) if pd.notna(rho) else float("nan")
                if pd.notna(rho):
                    rows.append(
                        (
                            cohort,
                            int(entities[i]),
                            int(entities[j]),
                            round(float(rho), round_to),
                            n,
                            round(float(p), 10) if pd.notna(p) else None,
                        )
                    )
        return pd.DataFrame(rows, columns=[f.name for f in PAIR_P_SCHEMA.fields])

    return df.groupBy(cohort_col).applyInPandas(kernel, PAIR_P_SCHEMA)
