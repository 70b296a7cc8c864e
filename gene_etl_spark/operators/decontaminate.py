"""Decontamination: find training documents that share long n-grams
with an evaluation set — the standard leakage check between a training
corpus and benchmark data.

Shape (the one that survives a 100 TB train corpus vs a tiny eval set):

1. hash every word n-gram of the EVAL set (small) and of the TRAIN
   corpus (large) — pure column expressions, explode is map-side;
2. equi-join on the 60-bit n-gram hash — the eval side is tiny, so the
   join broadcasts and the train corpus is never shuffled;
3. aggregate matches per (train_doc, eval_doc) pair and flag pairs with
   at least ``min_matches`` shared n-grams.

An n-gram length of 8-13 words is the usual contamination signal:
short enough to catch verbatim inclusions, long enough that accidental
collisions are negligible (and the hash join post-verifies nothing —
at 60 hash bits the false-positive rate over billions of n-grams is
~0, documented trade vs re-checking strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gene_etl_spark.functions import md5_long

NGRAM_WORDS = 8
MIN_MATCHES = 1


def _ngram_hashes(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gh): distinct 60-bit hashes of every n-word gram of the
    whitespace-normalized text."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    # bind the token array before indexing it: element_at inside the
    # gram lambda gets no common-subexpression elimination, so the
    # unbound split(regexp(...)) chain would be re-evaluated n times
    # per gram position — O(n · n_tokens · doc_len) per document
    b = docs.select(
        F.col(id_col).alias("id"), F.split(norm, " ").alias("_toks")
    )
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + F.lit(j)).cast("int")) for j in range(n)]
        ),
    )
    return (
        b.where(F.size(toks) >= n)
        .select("id", F.explode(F.array_distinct(grams)).alias("gram"))
        .select("id", md5_long("gram").alias("gh"))
    )


def find_contaminated(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = NGRAM_WORDS,
    min_matches: int = MIN_MATCHES,
) -> DataFrame:
    """(train_doc, eval_doc, n_shared_ngrams) for every contaminated
    pair. The eval side is broadcast; the train corpus streams through
    the join without a shuffle."""
    tg = _ngram_hashes(train, id_col, text_col, n).select(
        F.col("id").alias("train_doc"), "gh"
    )
    eg = _ngram_hashes(eval_set, id_col, text_col, n).select(
        F.col("id").alias("eval_doc"), "gh"
    )
    return (
        tg.join(F.broadcast(eg), "gh")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_ngrams"))
        .where(F.col("n_shared_ngrams") >= min_matches)
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = NGRAM_WORDS,
    min_matches: int = MIN_MATCHES,
) -> DataFrame:
    """The removal form: the training corpus minus contaminated
    documents (leftanti on the flagged ids)."""
    bad = find_contaminated(
        train,
        eval_set,
        id_col=id_col,
        text_col=text_col,
        n=n,
        min_matches=min_matches,
    ).select(F.col("train_doc").alias(id_col))
    return train.join(bad, id_col, "leftanti")
