"""CDC-maintained eval-set n-gram index: the decontamination join's
right side as a small LakeTable kept current from the eval corpus's
change feed — the dedup-index pattern at tiny scale (round-4 verdict
item 8).

``pipeline.ingest_corpus_batch`` previously re-sketched and re-broadcast
the whole eval set's n-grams on EVERY batch: harmless at benchmark
sizes, but a growing eval suite (thousands of benchmarks × versions)
re-pays the sketch per ingest batch forever. ``EvalNgramIndex`` keeps
one gram table — ``(gh, doc_key)``, the 60-bit hashes of every n-word
gram of each eval document — maintained exactly like the dedup index's
sketch tables:

- grams are pure functions of a document's OWN text (row-local), so
  ``refresh()`` reads the eval base's change feed WITH UP preimages,
  re-sketches only changed docs, tombstones every pre-state gram not
  re-asserted, and upserts the post-state grams (LWW over U∪D by
  ``(_commit_version, _lsn)``);
- fencing mirrors the family: ``batch_id = eval-v{a}-v{b}``,
  ``end_lsn`` = base version; a broken feed chain → full rebuild;
- a text→NULL update behaves as a delete (the sketch pass drops null
  text, so all prior grams tombstone).

``decontaminate()`` then joins a training batch's grams against a
broadcast of the maintained table — per-batch cost is the batch's own
gram pass plus a broadcast of an already-materialized tiny table; the
eval corpus is never re-read, let alone re-sketched.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.changes import CHANGE_OP_COL, read_changes
from gene_etl_spark.lake.table import CommitConflict, LakeTable
from gene_etl_spark.operators.decontaminate import (
    MIN_MATCHES,
    NGRAM_WORDS,
    _ngram_hashes,
)
from gene_etl_spark.operators.dedup import lww_dedup_agg


class EvalNgramIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        base: LakeTable,
        text_col: str = "text",
        doc_key: str | None = None,
        n: int = NGRAM_WORDS,
        num_buckets: int = 1,
    ):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.base = base
        self.text_col = text_col
        self.n = n
        if doc_key is None:
            key = list(base.key_cols)
            if len(key) != 1:
                raise ValueError(
                    "EvalNgramIndex needs doc_key= when the base key is composite"
                )
            doc_key = key[0]
        self.doc_key = doc_key
        # parameter pinning, the index-family contract: grams hashed with
        # a different n (or over a different column/key) would never match
        # the stored rows, so tombstoning silently misses and the table
        # mixes gram widths — refuse instead, like _dedup_meta/_ann_meta
        meta_path = os.path.join(self.path, "_eval_meta.json")
        params = {"text_col": text_col, "doc_key": doc_key, "n": n}
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                stored = json.load(fh)
            for name, given in params.items():
                if stored.get(name) != given:
                    raise ValueError(
                        f"eval index at {path} was built with {name}="
                        f"{stored.get(name)}; got {given} — refreshing "
                        "with different gram parameters would corrupt it"
                    )
        if LakeTable.exists(self.path):
            self.table = LakeTable.load(spark, self.path)
        else:
            key_type = next(
                f.dataType for f in base.schema.fields if f.name == doc_key
            )
            schema = T.StructType(
                [
                    T.StructField("gh", T.LongType(), False),
                    T.StructField(doc_key, key_type, False),
                ]
            )
            self.table = LakeTable.create(
                spark, self.path, schema,
                key_cols=["gh", doc_key], num_buckets=num_buckets,
            )
        if not os.path.exists(meta_path):
            with open(meta_path, "w") as fh:
                json.dump(params, fh)

    # ------------------------------------------------------------------ #
    def _grams(self, docs: DataFrame) -> DataFrame:
        """(gh, doc_key) — distinct n-gram hashes per doc; NULL text
        yields no rows (text→NULL update therefore behaves as a
        delete in refresh, like the dedup index's sketch pass)."""
        return _ngram_hashes(
            docs.where(F.col(self.text_col).isNotNull()),
            self.doc_key,
            self.text_col,
            self.n,
        ).select("gh", F.col("id").alias(self.doc_key))

    def last_indexed_version(self) -> int:
        v = self.table.max_committed_end_lsn()
        return int(v) if v is not None else 0

    def refresh(self) -> dict:
        self.base._manifest_cache = None
        self.table._manifest_cache = None
        bm = self.base.manifest
        last = self.last_indexed_version()
        cur = bm["version"]
        if cur <= last:
            return {"refreshed": False, "from_version": last, "to_version": last}
        batch_id = f"eval-v{last}-v{cur}"
        if batch_id in self.table.committed_batches():
            return {"refreshed": False, "from_version": last, "to_version": cur}

        dk, tc = self.doc_key, self.text_col
        try:
            # persisted: the feed has two independent consumers (post-state
            # grams and UP preimages) — same reason IvfVectorIndex.refresh
            # persists its feed
            ch = read_changes(
                self.base, last, cur, include_preimages=True
            ).persist()
            full_rebuild = False
        except ValueError:
            ch = None
            full_rebuild = True
        try:
            if full_rebuild:
                sk = self._grams(self.base.read(manifest=bm).select(dk, tc))
                gone = self.table.read().select("gh", dk).join(
                    sk, ["gh", dk], "leftanti"
                )
            else:
                post = ch.where(F.col(CHANGE_OP_COL).isin("U", "D")).select(
                    F.col(dk), F.col(tc), F.col(CHANGE_OP_COL),
                    "_commit_version", "_lsn",
                )
                latest = lww_dedup_agg(
                    post, key_cols=(dk,), order_cols=("_commit_version", "_lsn")
                )
                sk = self._grams(
                    latest.where(F.col(CHANGE_OP_COL) == "U").select(dk, tc)
                )
                pre = self._grams(
                    ch.where(F.col(CHANGE_OP_COL) == "UP").select(dk, tc)
                ).distinct()
                gone = pre.join(sk, ["gh", dk], "leftanti")
            updates = (
                sk.select("gh", dk, F.lit("U").alias("op"))
                .withColumn("lsn", F.lit(2 * cur + 1).cast("long"))
                .unionByName(
                    gone.select("gh", dk, F.lit("D").alias("op")).withColumn(
                        "lsn", F.lit(2 * cur).cast("long")
                    )
                )
                .withColumn("ts", F.lit(None).cast("timestamp"))
            )
            try:
                r = self.table.merge(
                    updates, batch_id=batch_id, start_lsn=last, end_lsn=cur
                )
            except CommitConflict:
                if batch_id in self.table.committed_batches():
                    return {
                        "refreshed": False,
                        "from_version": last,
                        "to_version": cur,
                    }
                raise
        finally:
            if ch is not None:
                ch.unpersist()
        return {
            "refreshed": True,
            "full_rebuild": full_rebuild,
            "from_version": last,
            "to_version": cur,
            "grams_changed": r.inserts + r.updates + r.deletes,
        }

    # ------------------------------------------------------------------ #
    def find_contaminated(
        self,
        train: DataFrame,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        min_matches: int = MIN_MATCHES,
    ) -> DataFrame:
        """(train_doc, eval_doc, n_shared_ngrams) against the MAINTAINED
        gram table — the eval corpus itself is never scanned here."""
        tg = _ngram_hashes(train, id_col, text_col, self.n).select(
            F.col("id").alias("train_doc"), "gh"
        )
        eg = self.table.read().select(
            "gh", F.col(self.doc_key).alias("eval_doc")
        )
        return (
            tg.join(F.broadcast(eg), "gh")
            .groupBy("train_doc", "eval_doc")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared_ngrams"))
            .where(F.col("n_shared_ngrams") >= min_matches)
        )

    def decontaminate(
        self,
        train: DataFrame,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        min_matches: int = MIN_MATCHES,
    ) -> DataFrame:
        bad = self.find_contaminated(
            train, id_col=id_col, text_col=text_col, min_matches=min_matches
        ).select(F.col("train_doc").alias(id_col))
        return train.join(bad, id_col, "leftanti")
