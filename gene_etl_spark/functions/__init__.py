"""Shared column expressions.

Everything here is a JVM-side Spark column expression (whole-stage
codegen'd) — no Python UDFs. Where a deterministic cross-engine hash is
needed (so the DuckDB oracle can reproduce it bit-for-bit), we use the
first 15 hex digits of md5 cast to a 60-bit integer: both Spark
(`conv(substr(md5(x),1,15),16,10)`) and DuckDB
(`('0x'||substr(md5(x),1,15))::bigint`) compute the identical value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash reproducible in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def bucket_of(col: Column | str, num_buckets: int) -> Column:
    """Lake-table bucket id for a key column (Iceberg bucket-transform
    analogue). Uses xxhash64 (stable across Spark runs, seed=42)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(num_buckets)).cast("int")


def canonical_pair(a: Column | str, b: Column | str) -> tuple[Column, Column]:
    """Canonical intra-row ordering so pair keys satisfy a < b.

    Reference parity: gene_a_key < gene_b_key canonicalization
    (etl/persist.py:114-117, models.py:156).
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.least(ca, cb), F.greatest(ca, cb)


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty tokens stripped (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


def word_shingles(col: Column | str, k: int = 2) -> Column:
    """Distinct k-word shingles of a text column (array<string>).

    Built by zipping k shifted slices of the token array — pure column
    expressions, no UDF. A pure-Column helper cannot bind its token
    array to a named column, and ``element_at`` over the unbound
    ws_tokens expression inside a transform lambda would re-tokenize
    the document once per shingle position (no common-subexpression
    elimination inside lambdas); ``slice``/``zip_with`` evaluate their
    collection arguments exactly once per row instead.
    """
    toks = ws_tokens(col)
    n = F.size(toks)
    m = n - F.lit(k - 1)  # shingle count when n >= k
    acc = F.slice(toks, 1, m)
    for j in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, F.array_distinct(acc)).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array().cast("array<string>"))
    )


def norm_text(col: Column | str) -> Column:
    """Normalization used for exact/fingerprint dedup: lowercase, collapse
    whitespace, strip."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns, JVM-side via
    zip_with + aggregate (no UDF)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")))
    return dot / (na * nb)
