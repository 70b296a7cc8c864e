"""Repetition-based quality signals (the Gopher/MassiveText family of
heuristics): documents dominated by repeated lines or a few hot n-grams
are boilerplate/spam, and the signals are pure column expressions —
array ops over the split text, no UDF, no shuffle, scan-fused.

Signals per document:
- ``dup_line_frac``: fraction of lines that are duplicates of an
  earlier line (by count: 1 - distinct_lines / lines);
- ``dup_line_char_frac``: fraction of characters in duplicated lines —
  catches one huge repeated paragraph that line counts understate;
- ``top_bigram_share``: share of all word bigrams taken by the single
  most frequent bigram — a high share means templated text.

``repetition_signals`` adds the columns; ``repetition_gate`` filters
with the standard thresholds. Cross-engine verifiable: every signal has
a DuckDB twin in tests/test_repetition.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DUP_LINE_FRAC_MAX = 0.30
DUP_LINE_CHAR_FRAC_MAX = 0.30
TOP_BIGRAM_SHARE_MAX = 0.20


def _lines(text_col: Column) -> Column:
    return F.filter(F.split(text_col, "\n"), lambda l: F.trim(l) != "")


def repetition_signals(
    df: DataFrame, text_col: str = "text", tokens_col: Column | None = None
) -> DataFrame:
    """Adds dup_line_frac, dup_line_char_frac, top_bigram_share
    (rounded to 6). ``tokens_col`` defaults to whitespace tokens of the
    lowercased text."""
    text = F.col(text_col)
    # Bind the token array to a REAL COLUMN before anything indexes it:
    # there is no common-subexpression elimination inside a transform
    # lambda, so element_at over an unbound expression re-evaluates the
    # whole split(regexp_replace(lower(text))) chain once per element —
    # O(n_tokens · doc_len) per document (measured: the bigram signal
    # alone went 16 s → 1.4 s at sf0.1 once bound).
    toks_in = (
        tokens_col
        if tokens_col is not None
        else F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")
    )
    df = df.withColumn("_rep_toks", toks_in)
    lines = _lines(text)
    n_lines = F.size(lines)
    distinct_lines = F.array_distinct(lines)
    n_distinct = F.size(distinct_lines)
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - n_distinct) / n_lines
    ).otherwise(F.lit(0.0))

    total_chars = F.aggregate(
        lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    # characters belonging to lines that occur more than once, via the
    # same sort-and-run technique as top_bigram_share below (O(n log n)
    # per document; a distinct×filter scan would be O(lines²) and
    # line-heavy documents would dominate the stage): when a run reaches
    # its 2nd element both occurrences' chars become "duplicated", each
    # further occurrence adds its own.
    sorted_lines = F.array_sort(lines)
    lacc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("dupc")
    )

    def _lstep(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        add = (
            F.when(run == 2, F.length(x) * 2)
            .when(run > 2, F.length(x))
            .otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), (acc["dupc"] + add).alias("dupc")
        )

    dup_chars = F.aggregate(sorted_lines, lacc0, _lstep, lambda acc: acc["dupc"])
    dup_line_char_frac = F.when(
        total_chars > 0, dup_chars / total_chars
    ).otherwise(F.lit(0.0))

    toks = F.col("_rep_toks")
    n = F.size(toks)
    # guard: sequence(1, 0) is DESCENDING [1, 0] and element_at(_, 0)
    # always throws — a <=1-token document must yield an empty bigram
    # array, not a stage failure
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.concat(
                F.element_at(toks, i.cast("int")),
                F.lit(" "),
                F.element_at(toks, (i + F.lit(1)).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bigrams = F.size(bigrams)
    # most-frequent-bigram count WITHOUT the quadratic distinct×filter
    # scan: sort the bigram array and take the longest equal run — an
    # O(n log n) per-document expression that stays cheap on book-length
    # documents (the struct accumulator threads (prev, run, best))
    sorted_b = F.array_sort(bigrams)
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_count = F.aggregate(sorted_b, acc0, _step, lambda acc: acc["best"])
    top_share = F.when(
        n_bigrams > 0, top_count / n_bigrams
    ).otherwise(F.lit(0.0))

    return (
        df.withColumn("dup_line_frac", F.round(dup_line_frac, 6))
        .withColumn("dup_line_char_frac", F.round(dup_line_char_frac, 6))
        .withColumn("top_bigram_share", F.round(top_share, 6))
        .drop("_rep_toks")
    )


def repetition_gate(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_dup_line_frac: float = DUP_LINE_FRAC_MAX,
    max_dup_line_char_frac: float = DUP_LINE_CHAR_FRAC_MAX,
    max_top_bigram_share: float = TOP_BIGRAM_SHARE_MAX,
) -> DataFrame:
    """Drop repetition-dominated documents (standard thresholds)."""
    out = repetition_signals(df, text_col)
    return out.where(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("top_bigram_share") <= max_top_bigram_share)
    )
