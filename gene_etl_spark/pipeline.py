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
    near_dedup: str = "pairs",
    cluster_max_iters: int = 25,
    lang_fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    window: int = 512,
    seed: int = 0,
) -> dict:
    """Returns {"packed": DataFrame(bin_id, doc_id, n_tokens, bin_fill,
    oversize), "kept": DataFrame(doc_id, lang, text, n_tokens),
    "stats": {stage: doc_count}}.

    ``near_dedup``: 'pairs' drops the larger id of every LSH candidate
    pair (keeps every LOCAL minimum — for pairs (A,C),(B,C) both A and
    B survive although A~C~B chains them); 'clusters' runs connected
    components over the pair graph and keeps exactly one representative
    per duplicate cluster (operators/clusters.py) — the transitive
    semantics, a few extra distributed label-propagation rounds.
    The cluster representative (min id) always survives the exact-dedup
    stage: exact dedup keeps the lowest id per fingerprint, and an
    exact twin with a lower id would itself be in the cluster."""
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

    # 3. near-dup removal over the LSH candidate pairs
    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    if near_dedup == "clusters":
        from gene_etl_spark.operators.clusters import duplicate_representatives

        drop = (
            duplicate_representatives(pairs, max_iters=cluster_max_iters)
            .where(~F.col("is_representative"))
            .select(F.col("node").alias("doc_id"))
        )
    else:
        drop = pairs.select(F.col("doc_b").alias("doc_id"))
    kept = deduped.join(drop, "doc_id", "leftanti")
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


class ConversationDedupChain:
    """Near-duplicate CONVERSATION detection over a live CDC stream —
    the engine's layers composed into one incremental DAG:

        binlog → conv lake (MERGE)             [runner / stream]
               → per-conv document rollup      [ContinuousRollup:
                                                turns concatenated in
                                                turn order]
               → dedup sketch index            [CorpusDedupIndex over
                                                the ROLLUP's change
                                                feed — chained CDC,
                                                like the ANN centroid
                                                table]

    Each ``refresh()`` folds exactly the conversations the latest lake
    commits touched: the rollup recomputes only dirty conv groups, and
    the index re-sketches only the conv documents the rollup rewrote.
    A turn edit therefore costs two small fenced commits, never a
    corpus pass. ``candidate_pairs()`` reads near-dup conversation
    pairs straight off the maintained band table."""

    def __init__(self, spark: SparkSession, conv_table, path: str):
        from pyspark.sql import functions as F

        from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
        from gene_etl_spark.lake.rollup import ContinuousRollup

        conv_key = conv_table.key_cols[0]
        doc_text = F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda x: x["text"],
            ),
            " ",
        ).alias("text")
        self.rollup = ContinuousRollup(
            spark,
            path.rstrip("/") + "_docs",
            conv_table,
            group_cols=[conv_key],
            agg_exprs=[
                doc_text,
                F.count(F.lit(1)).cast("long").alias("n_turns"),
            ],
        )
        self.idx = CorpusDedupIndex(
            spark, path.rstrip("/") + "_dedup", self.rollup.table,
            text_col="text",
        )

    def refresh(self) -> dict:
        return {"rollup": self.rollup.refresh(), "index": self.idx.refresh()}

    def candidate_pairs(self):
        return self.idx.candidate_pairs()


def ingest_corpus_batch(
    spark: SparkSession,
    corpus,
    idx,
    batch: DataFrame,
    *,
    batch_id: str,
    lsn: int,
    min_tokens: int = 30,
    repetition_filter: bool = True,
    eval_set: DataFrame | None = None,
    eval_index=None,
    lang_fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    seed: int = 0,
) -> dict:
    """Incremental corpus construction: the per-batch form of
    ``build_corpus`` for a CDC-fed corpus, where re-running the batch
    pipeline over 10^10 accumulated documents per increment is not an
    option. Stages, all ∝ the batch (never the corpus):

    1. quality + repetition gates — row-local column expressions;
    2. within-batch exact dedup — lowest doc_id per fingerprint wins;
    3. within-batch near-dup removal — LSH band self-join over the
       batch's own sketch, larger id of each colliding pair dropped;
    4. cross-corpus dedup — ``CorpusDedupIndex.probe``: two equi-joins
       against the CDC-maintained sketch tables stand in for the full
       pipeline's corpus-wide LSH pass;
    5. optional decontamination vs ``eval_set`` (broadcast n-gram
       leakage check — the eval set is small at any corpus scale) and
       stratified language mixing (``lang_fractions``, row-local
       key-hash gates) — full ``build_corpus`` stage parity;
    6. MERGE survivors into the corpus LakeTable (fenced batch_id);
    7. ``idx.refresh()`` folds the new commit into the sketch tables,
       so the NEXT batch's probe sees this batch's documents.

    ``corpus``: a LakeTable keyed (doc_id) with (lang, text) payload;
    ``idx``: a CorpusDedupIndex over it. Returns stage counts plus the
    merge result; ``stats["corpus_deduped"]`` counts the batch AFTER
    cross-corpus dedup and the optional decontamination/mixing stages
    (one action per batch — the full per-stage funnel is
    ``build_corpus``'s lineage contract, not the hot ingest path's).
    """
    from pyspark.sql import functions as F

    from gene_etl_spark.lake.dedup_index import norm_expr, sketch_docs
    from gene_etl_spark.lake.table import CommitConflict

    # the lake only guards batch ids against CONCURRENT commits; a
    # sequential replay of an applied batch must be fenced here, like
    # the ingest runner fences its slices (callers wanting
    # skip-semantics check committed_batches first — streaming/corpus
    # does)
    if batch_id in corpus.committed_batches():
        raise CommitConflict(
            f"batch {batch_id!r} already committed to {corpus.path}"
        )
    stats: dict[str, int] = {"input": batch.count()}
    # norm_expr, not a re-declared twin: the token gate must count
    # tokens of the SAME normalization the index fingerprints/bands use
    d = batch.withColumn(
        "n_tokens", F.size(F.split(norm_expr("text"), " ")).cast("long")
    )
    gated = d.where(F.col("n_tokens") >= min_tokens)
    if repetition_filter:
        gated = repetition_gate(gated).drop(
            "dup_line_frac", "dup_line_char_frac", "top_bigram_share"
        )
    # `gated` feeds its count, the sketch pass, and the dedup joins;
    # `kept` (below) feeds a count and the merge — persist both so the
    # gate chain and the index-probe joins run once, not per consumer
    gated = gated.persist()
    stats["gated"] = gated.count()

    sk = sketch_docs(gated, "doc_id", "text").persist()
    kept_cache = None
    try:
        # within-batch exact: lowest doc_id per fingerprint
        fps = sk.where(F.col("band") == -1).select("doc_id", "fp")
        exact_keep = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        kept = gated.join(exact_keep.select("doc_id"), "doc_id", "leftsemi")

        # within-batch near: any shared band bucket drops the larger id
        bands = sk.where(F.col("band") >= 0)
        near_dupes = (
            bands.select("band", "bucket", F.col("doc_id").alias("doc_a"),
                         F.col("fp").alias("fp_a"))
            .join(
                bands.select("band", "bucket", F.col("doc_id").alias("doc_b"),
                             F.col("fp").alias("fp_b")),
                ["band", "bucket"],
            )
            .where((F.col("doc_a") < F.col("doc_b"))
                   & (F.col("fp_a") != F.col("fp_b")))
            .select(F.col("doc_b").alias("doc_id"))
        )
        kept = kept.join(near_dupes, "doc_id", "leftanti")
        stats["batch_deduped"] = kept.count()

        # cross-corpus: any probe match (exact or near) drops the doc
        matches = idx.probe(kept.select("doc_id", "text")).select("doc_id")
        kept = kept.join(matches, "doc_id", "leftanti")
        if eval_index is not None:
            # the CDC-maintained gram table (lake/eval_index.py): the
            # eval corpus is never re-sketched per batch — the join
            # side is a broadcast read of the tiny maintained table
            kept = eval_index.decontaminate(kept)
        elif eval_set is not None:
            kept = decontaminate(kept, eval_set)
        if lang_fractions is not None:
            kept = stratified_sample(
                kept, "lang", lang_fractions, "doc_id", seed=seed,
                default=default_fraction,
            )
        kept = kept_cache = kept.persist()
        stats["corpus_deduped"] = kept.count()

        result = corpus.merge(
            kept.select("doc_id", "lang", "text")
            .withColumn("op", F.lit("U"))
            .withColumn("lsn", F.lit(lsn).cast("long"))
            .withColumn("ts", F.lit(None).cast("timestamp")),
            batch_id=batch_id, start_lsn=lsn - 1, end_lsn=lsn,
        )
        idx.refresh()
        stats["merged"] = result.inserts + result.updates
        return {"stats": stats, "merge": result}
    finally:
        sk.unpersist()
        gated.unpersist()
        idx.release()
        if kept_cache is not None:
            kept_cache.unpersist()
