"""Deterministic corpus sampling — the data-mixing step of a
training-data pipeline.

``df.sample()`` is non-reproducible at scale (it re-rolls per task
attempt / partitioning), so corpus mixes are built from KEY-HASH
Bernoulli gates instead: a row is kept iff
``hash(key, seed) mod 1e6 < fraction * 1e6``. Properties that matter
at 100 TB:

- deterministic across runs, partitionings, retries, and engines —
  the decision is a pure row-local expression, so it composes into any
  plan with zero shuffles and pushes down to the scan;
- key-coherent: the same key draws the same verdict everywhere, so a
  document is sampled in or out atomically across derived tables;
- independent seeds draw independent subsets (seed is hashed with the
  key), enabling held-out splits (seed=0 train gate, seed=1 eval gate).

``method="md5"`` (default) uses the repo's cross-engine md5-prefix
hash, so samples are value-verifiable against a DuckDB oracle;
``method="xxhash64"`` is the cheaper JVM-only variant for production
corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gene_etl_spark.functions import md5_long

SAMPLE_MOD = 1_000_000


def sample_hash(key_col: str, seed: int = 0, method: str = "md5") -> Column:
    """Uniform pseudo-random value in [0, SAMPLE_MOD) derived from
    (key, seed) only."""
    if method == "xxhash64":
        return F.pmod(F.xxhash64(F.col(key_col), F.lit(int(seed))), F.lit(SAMPLE_MOD))
    payload = F.concat_ws(
        "\x1f", F.col(key_col).cast("string"), F.lit(str(int(seed)))
    )
    return F.pmod(md5_long(payload), F.lit(SAMPLE_MOD))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: int = 0,
    method: str = "md5",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, decided per key."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = int(round(fraction * SAMPLE_MOD))
    return df.where(sample_hash(key_col, seed, method) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 0,
    default: float = 0.0,
    method: str = "md5",
) -> DataFrame:
    """Per-stratum deterministic fractions — the language/source mixing
    step (e.g. ``{"en": 0.5, "de": 1.0}``). Strata absent from
    ``fractions`` keep ``default``. One row-local CASE + hash compare:
    no shuffle, no sort, pushes to the scan."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    thr: Column | None = None
    for stratum, frac in sorted(fractions.items()):
        branch = F.lit(int(round(frac * SAMPLE_MOD)))
        thr = (
            F.when(F.col(strata_col) == stratum, branch)
            if thr is None
            else thr.when(F.col(strata_col) == stratum, branch)
        )
    thr = (
        thr.otherwise(F.lit(int(round(default * SAMPLE_MOD))))
        if thr is not None
        else F.lit(int(round(default * SAMPLE_MOD)))
    )
    return df.where(sample_hash(key_col, seed, method) < thr)
