"""Streaming corpus construction: ``readStream`` over a documents
directory → ``foreachBatch`` running ``pipeline.ingest_corpus_batch``
per epoch — the training-data analogue of ``streaming/stream.py``'s
CDC ingest. Each epoch is quality-gated, deduped within itself, deduped
against the WHOLE accumulated corpus through the CDC-maintained
CorpusDedupIndex (probe cost ∝ the epoch), merged, and folded into the
index so the NEXT epoch sees it.

Exactly-once composes the same way as the CDC stream: Spark's
checkpoint tracks which files each epoch consumed, and every epoch's
MERGE is fenced by ``corpus-{checkpoint_fingerprint}-epoch-{id}`` in
the corpus table's snapshot chain — a replayed epoch (post-crash, same
checkpoint) skips both the merge and, because the index refresh is
fenced on the corpus version range, the index fold."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import SparkSession

from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
from gene_etl_spark.lake.table import LakeTable
from gene_etl_spark.pipeline import ingest_corpus_batch


def corpus_stream(
    spark: SparkSession,
    docs_path: str,
    corpus: LakeTable,
    idx: CorpusDedupIndex,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    min_tokens: int = 30,
    repetition_filter: bool = True,
    eval_set=None,
    eval_index=None,
    lang_fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    seed: int = 0,
    timeout_sec: float = 600.0,
) -> dict:
    """availableNow drain of ``docs_path`` (parquet files of
    (doc_id, lang, text)) into ``corpus`` + ``idx``. Returns per-epoch
    stats keyed by epoch id."""
    ckpt_fp = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode("utf-8")
    ).hexdigest()[:8]
    stats: dict[int, dict] = {}

    def handle(df, epoch_id: int) -> None:
        batch_id = f"corpus-{ckpt_fp}-epoch-{epoch_id}"
        if batch_id in corpus.committed_batches():
            # fenced: epoch replayed after a crash. The crash may have
            # landed BETWEEN the corpus merge and the index fold — fold
            # any pending corpus commits now (no-op when current) so
            # the next epoch never probes a stale index and re-admits
            # documents this epoch already committed.
            idx.refresh()
            return
        if not df.head(1):
            return
        corpus._manifest_cache = None
        r = ingest_corpus_batch(
            spark, corpus, idx, df,
            batch_id=batch_id,
            lsn=corpus.version + 1,
            min_tokens=min_tokens,
            repetition_filter=repetition_filter,
            eval_set=eval_set,
            eval_index=eval_index,
            lang_fractions=lang_fractions,
            default_fraction=default_fraction,
            seed=seed,
        )
        stats[int(epoch_id)] = r["stats"]

    reader = spark.readStream.schema(corpus.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    q = (
        reader.parquet(docs_path)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    # release() in finally: a handle() failure surfaces through
    # awaitTermination as StreamingQueryException, and the probe cache
    # must not leak across that. A timeout is surfaced as
    # drained=False — the checkpoint keeps the drain resumable, but a
    # silent partial return would read as a complete one.
    drained = True
    try:
        if not q.awaitTermination(timeout_sec):
            drained = False
            if q.isActive:
                q.stop()  # never leave a detached query mutating corpus/idx
    finally:
        idx.release()
    return {"epochs": stats, "drained": drained}
