"""CDC-maintained corpus dedup index: incremental deduplication for a
documents LakeTable, the third leg of the engine's index family
(ContinuousRollup → aggregates, IvfVectorIndex → vectors, this →
near-dup sketches).

The corpus-level dedup queries (queries/textops.py) are full-corpus
passes: fine for a one-shot build, wrong for a CDC-fed corpus where
each slice touches a sliver of 10^10 documents. ``CorpusDedupIndex``
keeps two sketch tables current from the base's change feed, so
deduplicating NEW data against the WHOLE corpus is a probe —
equi-joins against bucketed index tables — whose cost is ∝ the batch,
never the corpus:

- **fingerprint table** keyed ``(fp, doc_key)``: md5 of the normalized
  text — exact-duplicate membership. Bucketed by ``fp``, so a probe
  batch's fingerprints join against a hash-bucketed table.
- **band table** keyed ``(band, bucket, doc_key)``: MinHash-LSH band
  buckets (same shingle→minhash→band constants as the corpus-level
  ``dedup_minhash_lsh`` query, queries/common.py), bucketed by
  ``bucket`` — near-duplicate candidates are docs sharing any band
  bucket, found by one equi-join.

Both sketches are pure functions of a document's OWN text — the same
row-locality that makes the ANN index's SRP cells exactly maintainable:
``refresh()`` reads the base's change feed WITH UP preimages, re-sketches
only the changed docs' old and new text, tombstones every pre-state slot
not re-asserted, and upserts the post-state slots (LWW over U∪D rows by
``(_commit_version, _lsn)`` so a key whose final op in the range is a
delete cannot resurrect through an earlier update). Fencing mirrors the
rollup/ANN chain (``batch_id = dedup-v{a}-v{b}``, ``end_lsn`` = base
version, recovered independently per sketch table — a crash between the
two merges replays only the missing one); a broken feed chain → full
rebuild, never silent staleness.

At 10^10 docs: refresh cost ∝ change volume (two small grouped sketch
jobs + two merges over the touched buckets); probe cost ∝ batch ×
collision density (the same banded-join bound the corpus-level LSH
relies on). No full-corpus pass anywhere after the initial build.

Reference parity: the reference has no incremental dedup — this is the
engine extending its CDC machinery over the training-data operator
family (SURVEY.md §2.11), not a ported feature.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.functions import md5_long
from gene_etl_spark.lake.changes import CHANGE_OP_COL, read_changes
from gene_etl_spark.lake.table import CommitConflict, LakeTable
from gene_etl_spark.operators.dedup import lww_dedup_agg
from gene_etl_spark.queries.common import (
    BAND_SIZE,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    NUM_HASHES,
    TOKEN_P,
)

NUM_BANDS = NUM_HASHES // BAND_SIZE


def norm_expr(text_col: str) -> Column:
    """Whitespace-collapsed lowercase text — identical to the corpus
    queries' ``docs_norm`` so index sketches and one-shot sketches
    agree byte-for-byte."""
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def fingerprint_expr(text_col: str) -> Column:
    return md5_long(norm_expr(text_col))


def sketch_docs(df: DataFrame, doc_key: str, text_col: str) -> DataFrame:
    """(doc_key, fp, n_tokens, band, bucket) — one row per LSH band per
    distinct (doc, text version), plus exactly one ``band = -1``
    fingerprint row per version (docs with <2 tokens yield ONLY the
    fingerprint row, mirroring the corpus-level LSH which never pairs
    them). The input may carry SEVERAL text versions of the same doc —
    the preimage path of an edit chain A→B→C — so the minhash aggregate
    groups by ``(doc_key, fp)``, never ``doc_key`` alone (which would
    min over the union of both versions' shingles and sketch a text
    that never existed). One grouped aggregation over distinct
    shingles; everything else is row-local.

    NULL text yields NO sketch rows (the schema allows it and standalone
    jobs run over arbitrary document tables): a null norm would produce
    null fp/bucket rows that violate the sketch tables' non-null keys
    and silently vanish from equi-join probes and tombstoning. Dropping
    them here makes a real-text→NULL update behave as a DELETE in
    ``refresh()`` — the preimage's slots are tombstoned and no new
    slots are asserted."""
    # bind norm → tokens as real columns before the shingle transform
    # indexes them: element_at inside a lambda gets no common-
    # subexpression elimination, so the unbound split(regexp(...))
    # chain would re-run once per shingle position
    bound = df.where(F.col(text_col).isNotNull()).select(
        F.col(doc_key), norm_expr(text_col).alias("_norm")
    ).select(
        doc_key,
        md5_long("_norm").alias("fp"),
        F.split("_norm", " ").alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), n - F.lit(1)),
        lambda i: F.concat(
            F.element_at(toks, i.cast("int")),
            F.lit(" "),
            F.element_at(toks, (i + F.lit(1)).cast("int")),
        ),
    )
    base = bound.select(
        F.col(doc_key),
        "fp",
        n.cast("long").alias("n_tokens"),
        F.when(n >= 2, F.array_distinct(sh)).otherwise(
            F.array().cast("array<string>")
        ).alias("_sh"),
    ).distinct()  # same (doc, fp) ⇒ same norm ⇒ identical row
    hs = F.pmod(md5_long("sh"), F.lit(TOKEN_P))
    sig = (
        base.select(doc_key, "fp", F.explode("_sh").alias("sh"))
        .groupBy(doc_key, "fp")
        .agg(
            *[
                F.min(
                    F.pmod(
                        F.lit(MINHASH_A[i]) * hs + F.lit(MINHASH_B[i]),
                        F.lit(MINHASH_P),
                    )
                )
                .cast("long")
                .alias(f"mh{i}")
                for i in range(NUM_HASHES)
            ]
        )
    )
    bucket_cols = []
    for band in range(NUM_BANDS):
        cols = [
            F.col(f"mh{i}").cast("string")
            for i in range(band * BAND_SIZE, (band + 1) * BAND_SIZE)
        ]
        bucket_cols.append(md5_long(F.concat_ws("_", *cols)))
    bands = sig.select(
        doc_key,
        "fp",
        F.lit(None).cast("long").alias("n_tokens"),
        F.posexplode(F.array(*bucket_cols)).alias("band", "bucket"),
    )
    fp_rows = base.select(
        doc_key,
        "fp",
        "n_tokens",
        F.lit(-1).cast("int").alias("band"),
        F.col("fp").alias("bucket"),
    )
    return fp_rows.unionByName(
        bands.select(doc_key, "fp", "n_tokens", "band", "bucket")
    )


class CorpusDedupIndex:
    """Two CDC-maintained sketch LakeTables + probe joins.

    ``doc_key`` defaults to the base's (single-column) key; the sketch
    parameters are pinned in a ``_dedup_meta.json`` sidecar at creation
    (a refresh under different constants would tombstone the wrong
    slots), mirroring the ANN index's quantizer pinning."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        base: LakeTable,
        text_col: str = "text",
        doc_key: str | None = None,
        num_buckets: int = 8,
    ):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.base = base
        self.text_col = text_col
        self._probe_sketch: DataFrame | None = None
        if doc_key is None:
            key = list(base.key_cols)
            if len(key) != 1:
                raise ValueError(
                    "CorpusDedupIndex needs doc_key= when the base key is composite"
                )
            doc_key = key[0]
        self.doc_key = doc_key

        meta_path = os.path.join(self.path + "_fp", "_dedup_meta.json")
        params = {
            "text_col": text_col,
            "doc_key": doc_key,
            "num_hashes": NUM_HASHES,
            "band_size": BAND_SIZE,
            "token_p": TOKEN_P,
            "minhash_p": MINHASH_P,
        }
        # Creation is two table creates + a sidecar write and a crash can
        # land between any of them, so init is IDEMPOTENT per piece:
        # whichever of {fps, meta, bands} exists is loaded/validated and
        # whichever is missing is (re)created — a half-initialized index
        # self-heals on the next open instead of failing LakeTable.load.
        # Order on a fresh create is fps → meta → bands, so the
        # parameter-pinning sidecar exists before the second table does.
        fp_exists = LakeTable.exists(self.path + "_fp")
        bands_exist = LakeTable.exists(self.path)
        # validate whenever the sidecar exists — NOT gated on fp_exists:
        # an index whose fps manifests were lost but whose meta/bands
        # survive must still refuse changed sketch constants rather than
        # silently recreate-and-mix
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                stored = json.load(fh)
            for name, given in params.items():
                if stored.get(name) != given:
                    raise ValueError(
                        f"index at {path} was built with {name}="
                        f"{stored.get(name)}; got {given} — refreshing "
                        "with different sketch parameters would corrupt it"
                    )
        key_type = next(
            f.dataType for f in base.schema.fields if f.name == doc_key
        )
        if fp_exists:
            self.fps = LakeTable.load(spark, self.path + "_fp")
        else:
            fp_schema = T.StructType(
                [
                    T.StructField("fp", T.LongType(), False),
                    T.StructField(doc_key, key_type, False),
                    T.StructField("n_tokens", T.LongType(), True),
                ]
            )
            self.fps = LakeTable.create(
                spark, self.path + "_fp", fp_schema,
                key_cols=["fp", doc_key], num_buckets=num_buckets,
            )
        if not os.path.exists(meta_path):
            with open(meta_path, "w") as fh:
                json.dump(params, fh)
        if bands_exist:
            self.bands = LakeTable.load(spark, self.path)
        else:
            band_schema = T.StructType(
                [
                    T.StructField("bucket", T.LongType(), False),
                    T.StructField("band", T.IntegerType(), False),
                    T.StructField(doc_key, key_type, False),
                    T.StructField("fp", T.LongType(), True),
                ]
            )
            self.bands = LakeTable.create(
                spark, self.path, band_schema,
                key_cols=["bucket", "band", doc_key], num_buckets=num_buckets,
            )

    # ------------------------------------------------------------------ #
    def last_indexed_version(self) -> int:
        """Min over both sketch tables — a crash between the two merges
        re-derives the same range and the completed table skips via its
        batch fence."""
        vs = [
            t.max_committed_end_lsn() for t in (self.bands, self.fps)
        ]
        return min(int(v) if v is not None else 0 for v in vs)

    def refresh(self) -> dict:
        self.base._manifest_cache = None
        self.bands._manifest_cache = None
        self.fps._manifest_cache = None
        bm = self.base.manifest
        last = self.last_indexed_version()
        cur = bm["version"]
        if cur <= last:
            return {"refreshed": False, "from_version": last, "to_version": last}
        batch_id = f"dedup-v{last}-v{cur}"

        dk, tc = self.doc_key, self.text_col
        ch = None
        try:
            ch = read_changes(
                self.base, last, cur, include_preimages=True
            ).persist()
            full_rebuild = False
        except ValueError:
            full_rebuild = True
        try:
            if full_rebuild:
                state = self.base.read(manifest=bm).select(dk, tc)
                sk = sketch_docs(state, dk, tc).persist()
                try:
                    gone = (
                        self._union_slots()
                        .join(
                            sk.select("bucket", "band", dk),
                            ["bucket", "band", dk],
                            "leftanti",
                        )
                    )
                    return self._apply(sk, gone, batch_id, last, cur, True)
                finally:
                    sk.unpersist()

            # newest post-state per doc across the range; final-D docs
            # must not resurrect through an earlier U (LWW over U∪D)
            post = ch.where(F.col(CHANGE_OP_COL).isin("U", "D")).select(
                F.col(dk), F.col(tc), F.col(CHANGE_OP_COL),
                "_commit_version", "_lsn",
            )
            latest = lww_dedup_agg(
                post, key_cols=(dk,), order_cols=("_commit_version", "_lsn")
            )
            ups = latest.where(F.col(CHANGE_OP_COL) == "U").select(dk, tc)
            sk = sketch_docs(ups, dk, tc).persist()
            try:
                # EVERY pre-state slot of a changed doc is a tombstone
                # candidate (updates AND deletes; an edit chain A→B→C
                # tombstones A's and B's slots)
                pre = ch.where(F.col(CHANGE_OP_COL) == "UP").select(dk, tc)
                pre_sk = sketch_docs(pre, dk, tc)
                # distinct: an edit chain's versions can share slots,
                # and merge input must be key-unique
                gone = pre_sk.select("bucket", "band", dk).distinct().join(
                    sk.select("bucket", "band", dk),
                    ["bucket", "band", dk],
                    "leftanti",
                )
                return self._apply(sk, gone, batch_id, last, cur, False)
            finally:
                sk.unpersist()
        finally:
            if ch is not None:
                ch.unpersist()

    def _union_slots(self) -> DataFrame:
        """All live slots across both tables in band-row shape (fp rows
        as band=-1/bucket=fp) — the full-rebuild tombstone candidates."""
        dk = self.doc_key
        return self.bands.read().select("bucket", "band", dk).unionByName(
            self.fps.read().select(
                F.col("fp").alias("bucket"), F.lit(-1).alias("band"), F.col(dk)
            )
        )

    def _apply(
        self, sk: DataFrame, gone: DataFrame, batch_id: str,
        last: int, cur: int, full_rebuild: bool,
    ) -> dict:
        """Merge upserts + tombstones into both sketch tables. LSN space
        doubles as a belt-and-suspenders order: tombstones at 2·cur,
        upserts at 2·cur+1 (both monotone in cur)."""
        dk = self.doc_key
        stats: dict[str, int] = {}
        for table, ups, dels in [
            (
                self.bands,
                sk.where(F.col("band") >= 0).select(
                    "bucket", "band", dk, "fp", F.lit("U").alias("op")
                ),
                gone.where(F.col("band") >= 0).select(
                    "bucket", "band", dk,
                    F.lit(None).cast("long").alias("fp"),
                    F.lit("D").alias("op"),
                ),
            ),
            (
                self.fps,
                sk.where(F.col("band") == -1).select(
                    "fp", dk, "n_tokens", F.lit("U").alias("op")
                ),
                gone.where(F.col("band") == -1).select(
                    F.col("bucket").alias("fp"), dk,
                    F.lit(None).cast("long").alias("n_tokens"),
                    F.lit("D").alias("op"),
                ),
            ),
        ]:
            if batch_id in table.committed_batches():
                continue
            updates = (
                ups.withColumn("lsn", F.lit(2 * cur + 1).cast("long"))
                .unionByName(
                    dels.withColumn("lsn", F.lit(2 * cur).cast("long"))
                )
                .withColumn("ts", F.lit(None).cast("timestamp"))
            )
            try:
                r = table.merge(
                    updates, batch_id=batch_id, start_lsn=last, end_lsn=cur
                )
            except CommitConflict:
                if batch_id in table.committed_batches():
                    continue
                raise
            stats[os.path.basename(table.path)] = (
                r.inserts + r.updates + r.deletes
            )
        return {
            "refreshed": True,
            "full_rebuild": full_rebuild,
            "from_version": last,
            "to_version": cur,
            "slots_changed": stats,
        }

    # ------------------------------------------------------------------ #
    def _probe_buckets(self, sk: DataFrame) -> tuple[list[int], list[int]]:
        """Lake buckets the probe sketch hashes into, for BOTH tables in
        ONE job — the dedup analogue of the ANN search's cell-bucket
        pruning. Both sketch tables are bucketed BY their join key
        (band bucket / fingerprint), so a small batch touches only its
        own slice of a 10^10-slot index instead of scanning it all. The
        collected set is distinct (table, lake-bucket) pairs — ≤
        2·num_buckets ints, never the key values themselves."""
        from gene_etl_spark.functions import bucket_of

        is_fp = F.col("band") == -1
        hits = sk.select(
            is_fp.alias("_fp"),
            F.when(is_fp, bucket_of(F.col("fp"), self.fps.num_buckets))
            .otherwise(bucket_of(F.col("bucket"), self.bands.num_buckets))
            .alias("_b"),
        ).distinct().collect()
        fp_b = sorted({r._b for r in hits if r._fp})
        band_b = sorted({r._b for r in hits if not r._fp})
        return band_b, fp_b

    @staticmethod
    def _pruned_read(table: LakeTable, buckets: list[int]) -> DataFrame:
        """A batch whose keys span every bucket reads the table
        unpruned — the shuffle join is the right plan there anyway."""
        if len(buckets) >= table.num_buckets:
            return table.read()
        return table.read(buckets=buckets)

    def probe(self, docs: DataFrame, exclude_self: bool = True) -> DataFrame:
        """Dedup an incoming batch against the WHOLE indexed corpus:
        returns one row per incoming doc that duplicates an indexed doc —
        ``(doc_key, match_kind, match_id)`` with ``match_kind`` 'exact'
        (identical normalized text) or 'near' (any shared LSH band
        bucket), ``match_id`` the smallest matching indexed doc. Cost:
        one sketch pass over the batch + two equi-joins against
        BUCKET-PRUNED sketch table scans (see ``_pruned_read``) — never
        a corpus scan. ``exclude_self`` ignores index entries for the
        probed doc ids themselves (re-probing already-ingested docs).

        Skew contract: join fan-out per probe doc is bounded by the
        slot multiplicity of its fingerprints / band buckets in the
        INDEX. A corpus maintained through the ingest-dedup flow
        (pipeline.ingest_corpus_batch) bounds that by construction —
        exact and near dups are dropped before they are ever indexed,
        so a viral duplicate contributes one representative, not a
        million slots. Probing against a NON-deduped corpus inherits
        the same hot-bucket behavior as any LSH candidate join.

        The batch sketch feeds four consumers (bucket discovery + join
        per table), so it is persisted; the previous probe's sketch is
        released at the next ``probe`` entry (an already-returned lazy
        plan simply recomputes if re-materialized later)."""
        dk = self.doc_key
        self.release()
        sk = self._probe_sketch = sketch_docs(docs, dk, self.text_col).persist()
        self_guard = (
            (F.col("i_doc") != F.col(dk)) if exclude_self else F.lit(True)
        )
        band_buckets, fp_buckets = self._probe_buckets(sk)
        exact = (
            sk.where(F.col("band") == -1)
            .select(dk, "fp")
            .join(
                self._pruned_read(self.fps, fp_buckets).select(
                    F.col("fp"), F.col(dk).alias("i_doc")
                ),
                "fp",
            )
            .where(self_guard)
            .groupBy(dk)
            .agg(F.min("i_doc").alias("match_id"))
            .select(dk, F.lit("exact").alias("match_kind"), "match_id")
        )
        near = (
            sk.where(F.col("band") >= 0)
            .select(dk, "band", "bucket", "fp")
            .join(
                self._pruned_read(self.bands, band_buckets).select(
                    "band", "bucket",
                    F.col(dk).alias("i_doc"), F.col("fp").alias("i_fp"),
                ),
                ["band", "bucket"],
            )
            .where(self_guard & (F.col("i_fp") != F.col("fp")))
            .groupBy(dk)
            .agg(F.min("i_doc").alias("match_id"))
            .join(exact.select(dk), dk, "leftanti")
            .select(dk, F.lit("near").alias("match_kind"), "match_id")
        )
        return exact.unionByName(near)

    def release(self) -> None:
        """Unpersist the last probe's cached sketch. Long-lived callers
        (the gated query battery, the incremental ingest loop) call
        this when done with a probe's results so the cache stays
        bounded (CLAUDE.md's sketch-cache discipline); the next
        ``probe`` also releases at entry."""
        if self._probe_sketch is not None:
            self._probe_sketch.unpersist()
            self._probe_sketch = None

    def candidate_pairs(self, band_cap: int | None = None) -> DataFrame:
        """Corpus-level near-dup candidate pairs straight from the
        maintained band table — the sketch the one-shot LSH pass
        (queries/textops.py) would have to recompute is ALREADY here,
        kept current by CDC. One self-equi-join on (band, bucket);
        ``(doc_a, doc_b)`` with ``doc_a < doc_b``, exact dups (equal
        fingerprints) flagged, each pair once; the fingerprint table's
        self-join rides along so exact dups among band-less (<2-token)
        docs are not missed.

        Hot-bucket cap: a band bucket holding more than ``band_cap``
        docs (a viral duplicate cluster on a NON-deduped corpus — the
        ingest flow bounds this by construction, a standalone index
        over raw documents does not) emits a STAR on its smallest doc
        id instead of all C(k,2) pairs — output linear in the cluster,
        connectivity for clustering/dedup preserved, pair-level recall
        inside the cluster traded (see queries/common.py
        BAND_BUCKET_CAP). The final per-pair aggregate already dedups
        across bands, so star and all-pairs rows merge cleanly.
        ``hot_bucket_stats`` surfaces how often the cap bound."""
        from gene_etl_spark.queries.common import BAND_BUCKET_CAP

        if band_cap is None:
            band_cap = BAND_BUCKET_CAP
        dk = self.doc_key
        b = self.bands.read()
        counts = b.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(dk).alias("_min_doc"),
            F.min_by("fp", dk).alias("_min_fp"),
        )
        bc = b.join(counts, ["band", "bucket"])
        small = bc.where(F.col("_n") <= band_cap)
        a = small.select(
            "band", "bucket", F.col(dk).alias("doc_a"), F.col("fp").alias("fp_a")
        )
        c = small.select(
            "band", "bucket", F.col(dk).alias("doc_b"), F.col("fp").alias("fp_b")
        )
        star_pairs = (
            bc.where((F.col("_n") > band_cap) & (F.col(dk) != F.col("_min_doc")))
            .select(
                F.col("_min_doc").alias("doc_a"),
                F.col(dk).alias("doc_b"),
                (F.col("_min_fp") == F.col("fp")).alias("exact"),
            )
        )
        band_pairs = (
            a.join(c, ["band", "bucket"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", (F.col("fp_a") == F.col("fp_b")).alias("exact"))
            .unionByName(star_pairs)
        )
        # only band-less docs (<2 tokens) need the fingerprint join —
        # equal normalized text implies equal token count, so every
        # exact pair among banded docs already collides on ALL bands;
        # an unrestricted fp self-join would re-derive those corpus-wide
        f = self.fps.read().where(F.col("n_tokens") < 2)
        fp_pairs = (
            f.select("fp", F.col(dk).alias("doc_a"))
            .join(f.select("fp", F.col(dk).alias("doc_b")), "fp")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", F.lit(True).alias("exact"))
        )
        return (
            band_pairs.unionByName(fp_pairs)
            .groupBy("doc_a", "doc_b")
            .agg(F.max("exact").alias("exact"))
        )

    def hot_bucket_stats(self, band_cap: int | None = None) -> dict:
        """Lineage for the hot-bucket cap: (band, bucket) slots over
        ``band_cap`` and the worst multiplicity — one tiny aggregate
        over the maintained band table."""
        from gene_etl_spark.queries.common import BAND_BUCKET_CAP

        if band_cap is None:
            band_cap = BAND_BUCKET_CAP
        row = (
            self.bands.read()
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.sum((F.col("_n") > band_cap).cast("long")).alias("capped"),
                F.max("_n").alias("worst"),
            )
            .collect()[0]
        )
        return {
            "n_capped_buckets": int(row.capped or 0),
            "max_multiplicity": int(row.worst or 0),
            "band_cap": band_cap,
        }
