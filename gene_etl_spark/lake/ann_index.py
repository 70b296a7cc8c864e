"""CDC-maintained ANN index: the embedding story connected to the
engine (round-4 verdict item 9).

``IvfVectorIndex`` keeps an inverted-file index over a CDC-maintained
embeddings LakeTable current WITHOUT rebuilds, by chaining the same
change-feed machinery the ContinuousRollup uses:

- **coarse quantizer**: sign-random-projection cells (``n_bits``
  deterministic hyperplanes → 2^n_bits cells). SRP needs no training
  and assignment is a row-local column expression — the property that
  makes incremental maintenance exact: a vector's cell depends only on
  its own embedding, never on global state that drifts.
- **assignment table**: a LakeTable keyed ``(cell, vec_id)`` and
  therefore BUCKETED BY CELL — probing a cell is a bucket-pruned scan.
  ``refresh()`` reads the base's change feed with UP preimages: every
  changed key's OLD embedding yields a tombstone for its old cell slot,
  every upsert's NEW embedding yields its new slot — a cell-moving
  update dirties exactly two slots, cost ∝ change volume, never the
  corpus. Fencing mirrors the rollup: ``batch_id = ann-v{a}-v{b}``,
  ``end_lsn`` = base version, recovered from the index's own snapshot
  chain.
- **centroid table**: a ContinuousRollup OVER the assignment table
  (per-cell element-wise mean + count) — chained CDC: base commit →
  assignment refresh → centroid refresh, each leg incremental. Search
  ranks cells by query↔centroid cosine (the IVF probe dial) and
  exact-reranks inside the probed cells.

At 10^9 vectors: refresh cost ∝ the slice, probe cost ∝ probed cells'
buckets, centroid maintenance ∝ dirty cells. No full-corpus pass
anywhere after the initial build.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gene_etl_spark.lake.changes import CHANGE_OP_COL, read_changes
from gene_etl_spark.lake.rollup import ContinuousRollup
from gene_etl_spark.lake.table import LakeTable
from gene_etl_spark.operators.dedup import lww_dedup_agg

ANN_SRP_SEED = 1729


def srp_cell_expr(emb_col: str, dim: int, n_bits: int) -> Column:
    """Deterministic SRP cell id: packed sign bits of ``n_bits``
    hyperplane dot products — a pure column expression (row-local, no
    state), identical for any partitioning or engine revision."""
    rng = np.random.RandomState(ANN_SRP_SEED)
    planes = rng.standard_normal((n_bits, dim))
    cell = F.lit(0).cast("int")
    for b in range(n_bits):
        consts = F.array(*[F.lit(float(x)) for x in planes[b]])
        dot = F.aggregate(
            F.zip_with(F.col(emb_col), consts, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cell = cell + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return cell


def nearest_cell_expr(emb_col: str, centroids: np.ndarray) -> Column:
    """Assignment under a refined (Lloyd) quantizer: argmax of
    emb · (centroid/‖centroid‖) over the K pinned centroid constants.
    Still a pure function of the row's OWN payload — the centroids are
    quantizer PARAMETERS pinned in ``_ann_meta.json`` exactly like the
    SRP seed, so incremental maintenance stays exact (a preimage maps
    to the same cell its upsert mapped to). Ties break to the lowest
    cell id via the packed (score, -cell) struct max; a zero-norm
    centroid (empty cell) scores -inf and can never win; a NaN dot is
    nanvl-guarded for the same reason the search cosines are."""
    cents = np.asarray(centroids, dtype=np.float64)
    packed = []
    neg_inf = F.lit(float("-inf"))
    for i, c in enumerate(cents):
        n = float(np.linalg.norm(c))
        if n > 0.0:
            consts = F.array(*[F.lit(float(x) / n) for x in c])
            dot = F.aggregate(
                F.zip_with(
                    F.col(emb_col), consts, lambda x, y: (x * y).cast("double")
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            score = F.coalesce(F.nanvl(dot, neg_inf), neg_inf)
        else:
            score = neg_inf
        packed.append(F.struct(score.alias("s"), F.lit(-i).alias("negc")))
    m = F.array_max(F.array(*packed))
    return (-m["negc"]).cast("int")


# Above this many inlined constants (K centroids × dim) the codegen'd
# expression tree stops being the fast path: Janino blows past method
# limits and Spark falls back to interpreted evaluation of a K·dim-term
# tree per row. The Arrow path (one numpy matmul per batch) takes over.
# The cut is a pure function of (K, dim), so a given index always
# assigns through ONE path — the quantizer stays a single deterministic
# function per table (the two paths may disagree only on exact score
# ties, so mixing them per-call would break incremental exactness).
NEAREST_CELL_CODEGEN_MAX_TERMS = 4096


def nearest_cell_pandas(emb_col: str, centroids: np.ndarray) -> Column:
    """Arrow-batched twin of :func:`nearest_cell_expr`: one numpy
    ``(batch × dim) @ (dim × K)`` matmul + argmax per Arrow batch
    instead of a K·dim-term codegen tree per row. Semantics match the
    expression path exactly: unit-normalized centroids, zero-norm
    centroid → -inf (never wins), NaN score → -inf, ties → lowest cell
    id (numpy argmax keeps the first max), NULL / wrong-length / all
    -inf rows → cell 0 (the expression path's struct-max over equal
    scores picks the greatest ``-i`` = cell 0)."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(cents, axis=1)
    safe = np.where(norms > 0.0, norms, 1.0)
    unit_t = (cents / safe[:, None]).T.copy()  # (dim, K), captured once
    dead = norms <= 0.0
    dim = cents.shape[1]

    @pandas_udf("int")
    def _assign(embs):
        import pandas as pd

        out = np.zeros(len(embs), dtype=np.int32)
        ok = [
            i
            for i, e in enumerate(embs)
            if e is not None and len(e) == dim
        ]
        if ok:
            mat = np.empty((len(ok), dim), dtype=np.float64)
            for j, i in enumerate(ok):
                mat[j] = np.asarray(embs.iloc[i], dtype=np.float64)
            scores = mat @ unit_t
            # NaN -> -inf via masking, NOT np.nan_to_num: nan_to_num
            # would also flatten the dead cells' genuine -inf to the
            # largest-negative FINITE float, letting a dead centroid
            # out-score an all-NaN row
            scores[np.isnan(scores)] = -np.inf
            if dead.any():
                scores[:, dead] = -np.inf
            out[ok] = np.argmax(scores, axis=1).astype(np.int32)
        return pd.Series(out)

    return _assign(F.col(emb_col))


def nearest_cell(emb_col: str, centroids: np.ndarray) -> Column:
    """Refined-quantizer assignment, sized to the quantizer: the inlined
    expression tree under ``NEAREST_CELL_CODEGEN_MAX_TERMS`` constants
    (whole-stage codegen, zero Python), the Arrow matmul path above it.
    The choice depends only on (K, dim) — pinned sidecar parameters —
    so every assignment for a given index goes through the same
    deterministic function."""
    cents = np.asarray(centroids, dtype=np.float64)
    if cents.size <= NEAREST_CELL_CODEGEN_MAX_TERMS:
        return nearest_cell_expr(emb_col, cents)
    return nearest_cell_pandas(emb_col, cents)


class IvfVectorIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        base: LakeTable,
        dim: int | None = None,
        n_bits: int | None = None,
        num_buckets: int = 8,
        emb_col: str = "embedding",
        vec_key: str | None = None,
    ):
        """``vec_key``: the column that uniquely identifies a vector.
        Defaults to the base's (single-column) key; pass it explicitly
        when the base uses a composite key whose one component is a
        unique vector id.

        Quantizer parameters (``dim``, ``n_bits``) are part of the
        INDEX's identity, not the caller's: a refresh run with a
        different n_bits/dim would map preimages to the wrong cells
        (tombstones miss, vectors duplicate across cells, centroids
        drift — silently). They are pinned in a ``_ann_meta.json``
        sidecar at creation; opening an existing index uses the stored
        values, and an explicitly passed conflicting value is an error.
        Creating a new index requires ``dim`` (``n_bits`` defaults
        to 4)."""
        import json as _json
        import os

        self.spark = spark
        self.path = path
        self.base = base
        self.emb_col = emb_col
        if vec_key is None:
            key = list(base.key_cols)
            if len(key) != 1:
                raise ValueError(
                    "IvfVectorIndex needs vec_key= when the base key is composite"
                )
            vec_key = key[0]
        self.vec_key = vec_key

        meta_path = os.path.join(os.path.abspath(path), "_ann_meta.json")
        self._meta_path = meta_path
        # refined (Lloyd) quantizer state — loaded from the sidecar below
        self.refined_centroids = None
        self.quantizer_gen = 0
        self._refine_batch_id = None
        self._refine_base_version = None
        if LakeTable.exists(path):
            self.table = LakeTable.load(spark, path)
            if os.path.exists(meta_path):
                with open(meta_path) as fh:
                    meta = _json.load(fh)
                for name, given in [
                    ("dim", dim),
                    ("n_bits", n_bits),
                    ("vec_key", vec_key),
                    ("emb_col", emb_col),
                ]:
                    stored = meta.get(name)
                    if given is not None and stored is not None and given != stored:
                        raise ValueError(
                            f"index at {path} was built with {name}={stored}; "
                            f"got {name}={given} — refreshing with different "
                            "quantizer parameters would corrupt the index"
                        )
                self.dim = int(meta["dim"])
                self.n_bits = int(meta["n_bits"])
                if meta.get("refined_centroids") is not None:
                    self.refined_centroids = np.asarray(
                        meta["refined_centroids"], dtype=np.float64
                    )
                    self.quantizer_gen = int(meta.get("quantizer_gen", 1))
                    self._refine_batch_id = meta.get("refine_batch_id")
                    self._refine_base_version = meta.get("refine_base_version")
            else:  # pre-sidecar index: trust the caller, but require dim
                if dim is None:
                    raise ValueError("dim is required for an index without _ann_meta.json")
                self.dim = int(dim)
                self.n_bits = int(n_bits if n_bits is not None else 4)
        else:
            if dim is None:
                raise ValueError("dim is required to create a new index")
            self.dim = int(dim)
            self.n_bits = int(n_bits if n_bits is not None else 4)
            import pyspark.sql.types as T

            emb_type = next(
                f.dataType for f in base.schema.fields if f.name == emb_col
            )
            key_type = next(
                f.dataType for f in base.schema.fields if f.name == self.vec_key
            )
            schema = T.StructType(
                [
                    T.StructField("cell", T.IntegerType(), False),
                    T.StructField(self.vec_key, key_type, False),
                    T.StructField(emb_col, emb_type, True),
                ]
            )
            self.table = LakeTable.create(
                spark, path, schema, key_cols=["cell", self.vec_key],
                num_buckets=num_buckets,
            )
            with open(meta_path, "w") as fh:
                _json.dump(
                    {
                        "dim": self.dim,
                        "n_bits": self.n_bits,
                        "vec_key": self.vec_key,
                        "emb_col": emb_col,
                        "srp_seed": ANN_SRP_SEED,
                    },
                    fh,
                )
        self.centroids = ContinuousRollup(
            spark,
            path.rstrip("/") + "_centroids",
            self.table,
            group_cols=["cell"],
            agg_exprs=[
                F.count(F.lit(1)).cast("long").alias("n_vecs"),
                F.array(
                    *[F.avg(F.col(emb_col)[d]) for d in range(self.dim)]
                ).alias("centroid"),
            ],
            num_buckets=4,
        )

    # ------------------------------------------------------------------ #
    def _cell(self) -> Column:
        if self.refined_centroids is not None:
            return nearest_cell(self.emb_col, self.refined_centroids)
        return srp_cell_expr(self.emb_col, self.dim, self.n_bits)

    def last_indexed_version(self) -> int:
        v = self.table.max_committed_end_lsn()
        return int(v) if v is not None else 0

    def refresh(self) -> dict:
        """Fold base commits since the last refresh into the assignment
        table, then fold the assignment commits into the centroid
        rollup. Broken feed chain → full rebuild (same contract as the
        rollup). Within one refresh, a tombstone and an upsert can land
        on the same (cell, vec) slot (update that does NOT move cells):
        the tombstone set is anti-joined against the upsert keys, and
        LSN-space doubles as belt-and-suspenders (tombstones commit at
        4·version, upserts at 4·version+1, both monotone; the ×4
        scale leaves +2/+3 headroom for refine_centroids' same-version
        reassignment commit)."""
        self.base._manifest_cache = None
        self.table._manifest_cache = None
        # crash heal: the refined quantizer was pinned to the sidecar
        # but the reassignment commit never landed (crash between the
        # two) — folding the feed under the new quantizer against
        # old-quantizer slots would make preimage tombstones miss, so
        # redo the (idempotent) reassignment first
        if (
            self._refine_batch_id is not None
            and self._refine_batch_id not in self.table.committed_batches()
        ):
            self._apply_reassignment(
                self._refine_batch_id, int(self._refine_base_version)
            )
        bm = self.base.manifest
        last = self.last_indexed_version()
        cur = bm["version"]
        if cur <= last:
            self.centroids.refresh()
            return {"refreshed": False, "from_version": last, "to_version": last}
        batch_id = f"ann-v{last}-v{cur}"
        if batch_id in self.table.committed_batches():
            self.centroids.refresh()
            return {"refreshed": False, "from_version": last, "to_version": cur}

        vk, ec = self.vec_key, self.emb_col
        ch = None
        try:
            # the change feed feeds three consumers (latest/ups via the
            # union AND the anti-join, pre once) — materialize it once,
            # like the rollup's dirty set, instead of re-deriving the
            # per-commit diff plans per consumer
            ch = read_changes(self.base, last, cur, include_preimages=True).persist()
            full_rebuild = False
        except ValueError:
            full_rebuild = True
        try:
            return self._refresh_inner(
                ch, full_rebuild, bm, batch_id, last, cur
            )
        finally:
            if ch is not None:
                ch.unpersist()

    def _refresh_inner(
        self, ch, full_rebuild: bool, bm: dict, batch_id: str, last: int, cur: int
    ) -> dict:
        vk, ec = self.vec_key, self.emb_col
        if full_rebuild:
            state = self.base.read(manifest=bm).select(
                self._cell().alias("cell"), F.col(vk), F.col(ec)
            )
            gone = (
                self.table.read()
                .select("cell", vk)
                .join(state.select("cell", vk), ["cell", vk], "leftanti")
            )
            ups = state
        else:
            # newest post-state per vec across the commit range (a vec
            # may change several times in (last, cur]): LWW over U AND D
            # rows by (_commit_version, _lsn) via the engine's own dedup
            # agg — a vec whose FINAL op is D must not resurrect through
            # an earlier U row in the same range
            post = ch.where(F.col(CHANGE_OP_COL).isin("U", "D")).select(
                F.col(vk), F.col(ec), F.col(CHANGE_OP_COL),
                "_commit_version", "_lsn",
            )
            latest = lww_dedup_agg(
                post, key_cols=(vk,), order_cols=("_commit_version", "_lsn")
            )
            ups = latest.where(F.col(CHANGE_OP_COL) == "U").select(
                self._cell().alias("cell"), F.col(vk), F.col(ec)
            )
            # EVERY pre-state slot of a changed key is a tombstone
            # candidate (covers updates AND deletes; a move chain
            # A→B→C tombstones both A and B)
            pre = ch.where(F.col(CHANGE_OP_COL) == "UP").select(
                self._cell().alias("cell"), F.col(vk)
            ).distinct()
            gone = pre.join(ups.select("cell", vk), ["cell", vk], "leftanti")

        import pyspark.sql.types as T

        emb_type = next(f.dataType for f in self.table.schema.fields if f.name == ec)
        updates = (
            ups.select("cell", vk, ec, F.lit("U").alias("op"))
            .withColumn("lsn", F.lit(4 * cur + 1).cast("long"))
            .unionByName(
                gone.select(
                    "cell",
                    vk,
                    F.lit(None).cast(emb_type).alias(ec),
                    F.lit("D").alias("op"),
                ).withColumn("lsn", F.lit(4 * cur).cast("long"))
            )
            .withColumn("ts", F.lit(None).cast("timestamp"))
        )
        try:
            result = self.table.merge(
                updates, batch_id=batch_id, start_lsn=last, end_lsn=cur
            )
        except Exception as e:
            from gene_etl_spark.lake.table import CommitConflict

            if isinstance(e, CommitConflict) and (
                batch_id in self.table.committed_batches()
                or self.last_indexed_version() > last
            ):
                self.centroids.refresh()
                return {"refreshed": False, "from_version": last, "to_version": cur}
            raise
        cent = self.centroids.refresh()
        return {
            "refreshed": True,
            "full_rebuild": full_rebuild,
            "from_version": last,
            "to_version": cur,
            "slots_changed": result.inserts + result.updates + result.deletes,
            "centroids": cent,
        }

    # ------------------------------------------------------------------ #
    # Lloyd refinement (round-5 verdict item 4): SRP cells are
    # training-free but cap single-probe recall (~0.73-0.77 measured) —
    # hyperplanes cut straight through natural clusters. One or two
    # Lloyd passes re-fit the 2^n_bits cells to the data, then the
    # WHOLE assignment table is rewritten under the refined quantizer
    # in one fenced commit (the rebucket pattern: a maintenance op, not
    # a feed fold). The refined centroids become pinned quantizer
    # parameters in _ann_meta.json — assignment stays a pure function
    # of a row's own payload, so incremental refresh stays exact.
    # ------------------------------------------------------------------ #
    def refine_centroids(self, iters: int = 2) -> dict:
        """Refine the coarse quantizer with ``iters`` Lloyd passes over
        the current corpus, pin the refined centroids, and reassign
        every vector. Cost ∝ corpus (a maintenance op, like rebucket —
        never on the per-batch path); requires the caller to be the
        index's only writer for the duration. Crash-safe: the sidecar
        records the reassignment batch_id before the commit, and
        ``refresh`` heals an un-landed reassignment idempotently."""
        import json as _json
        import os
        import uuid as _uuid

        self.refresh()  # assignment must mirror the base first
        self.base._manifest_cache = None
        cur = int(self.base.manifest["version"])
        K = 2**self.n_bits
        vecs = self.table.read().select(self.vec_key, self.emb_col).persist()
        try:
            cents = np.zeros((K, self.dim), dtype=np.float64)
            for r in self.centroids.read().select("cell", "centroid").collect():
                if r.centroid is not None:
                    cents[int(r.cell)] = np.asarray(r.centroid, dtype=np.float64)
            for _ in range(max(1, int(iters))):
                rows = (
                    vecs.withColumn(
                        "_nc", nearest_cell(self.emb_col, cents)
                    )
                    .groupBy("_nc")
                    .agg(
                        *[
                            F.avg(F.col(self.emb_col)[d]).alias(f"m{d}")
                            for d in range(self.dim)
                        ]
                    )
                    .collect()  # ≤ 2^n_bits rows — bounded
                )
                new = cents.copy()
                for r in rows:
                    new[int(r["_nc"])] = [
                        float(r[f"m{d}"] or 0.0) for d in range(self.dim)
                    ]
                cents = new

            gen = self.quantizer_gen + 1
            batch_id = f"ann-refine-g{gen}-v{cur}"
            with open(self._meta_path) as fh:
                meta = _json.load(fh)
            meta.update(
                {
                    "refined_centroids": cents.tolist(),
                    "quantizer_gen": gen,
                    "refine_batch_id": batch_id,
                    "refine_base_version": cur,
                }
            )
            tmp = self._meta_path + f".tmp-{_uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                _json.dump(meta, fh)
            os.replace(tmp, self._meta_path)
            self.refined_centroids = cents
            self.quantizer_gen = gen
            self._refine_batch_id = batch_id
            self._refine_base_version = cur
            moved = self._apply_reassignment(batch_id, cur)
        finally:
            vecs.unpersist()
        return {
            "refined": True,
            "generation": gen,
            "batch_id": batch_id,
            "base_version": cur,
            "slots_changed": moved,
        }

    def _apply_reassignment(self, batch_id: str, cur: int) -> int:
        """Rewrite every assignment slot under the current quantizer in
        one fenced commit: upsert each vector's (possibly new) cell,
        tombstone the vacated slots. LSNs land at 4·cur+2 (tombstones)
        and 4·cur+3 (upserts) — strictly above the last refresh's
        4·cur+1 so the merge's LWW guard never drops them, and strictly
        below the next refresh's 4·(cur+1). end_lsn stays ``cur``: the
        base-feed fence is untouched. Idempotent: a committed batch_id
        short-circuits."""
        if batch_id in self.table.committed_batches():
            self.centroids.refresh()
            return 0
        vk, ec = self.vec_key, self.emb_col
        state = self.table.read().select(
            self._cell().alias("cell"), F.col(vk), F.col(ec)
        )
        gone = (
            self.table.read()
            .select("cell", vk)
            .join(state.select("cell", vk), ["cell", vk], "leftanti")
        )
        emb_type = next(
            f.dataType for f in self.table.schema.fields if f.name == ec
        )
        updates = (
            state.select("cell", vk, ec, F.lit("U").alias("op"))
            .withColumn("lsn", F.lit(4 * cur + 3).cast("long"))
            .unionByName(
                gone.select(
                    "cell",
                    vk,
                    F.lit(None).cast(emb_type).alias(ec),
                    F.lit("D").alias("op"),
                ).withColumn("lsn", F.lit(4 * cur + 2).cast("long"))
            )
            .withColumn("ts", F.lit(None).cast("timestamp"))
        )
        result = self.table.merge(
            updates, batch_id=batch_id, start_lsn=cur, end_lsn=cur
        )
        self.centroids.refresh()
        return result.inserts + result.updates + result.deletes

    # ------------------------------------------------------------------ #
    def search_many(
        self, queries: DataFrame, k: int = 10, nprobe: int = 2,
        query_key: str = "query_id", query_col: str = "embedding",
    ) -> DataFrame:
        """Batch ANN: top-``k`` per query for a whole DataFrame of
        query vectors, with NO per-query driver loop — the bulk
        retrieval shape (dedup a candidate set, kNN features, eval
        retrieval) at 10^6 queries. Fully distributed:

        1. queries ⨯ broadcast(centroids) → per-(query, cell) rounded
           cosine; a window keeps each query's top-``nprobe`` cells;
        2. the probed (cell, query) pairs equi-join the assignment
           table on ``cell`` — the scan is pruned to the UNION of
           probed cells' lake buckets (≤ num_buckets ints collected);
        3. exact cosine re-rank per query (window top-k with
           deterministic tiebreak).

        Returns (query_key, vec_key, cell, cosine, rank). Per-query
        results equal ``search`` (rounded probe scores, same
        tiebreaks) — test-pinned, INCLUDING degenerate vectors: the
        query is pre-normalized with a norm-or-1 fallback (zero query →
        all scores 0.0, ties break by cell/vec id, like ``search``'s
        ``qn`` fallback), and a zero-norm centroid or index vector
        scores ``-1.0`` via ``nanvl`` instead of NaN — Spark sorts NaN
        ABOVE all doubles under desc(), so an unguarded 0/0 would probe
        a degenerate cell FIRST and let dead vectors outrank real
        ones."""
        from pyspark.sql import Window

        qk, qc, vk, ec = query_key, query_col, self.vec_key, self.emb_col
        cents = self.centroids.read().select(
            "cell", F.col("centroid").alias("_cent")
        )
        probe_w = Window.partitionBy(qk).orderBy(
            F.desc("_ccos"), F.asc("cell")
        )

        def _dot(a: Column, b: Column) -> Column:
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )

        def _norm(a: Column) -> Column:
            return F.sqrt(
                F.aggregate(
                    a, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")
                )
            )

        qn = F.col("_q_norm")
        probes = (
            # the query vector rides under a private name: the join
            # against the assignment table would otherwise collide
            # with the index's own embedding column. Normalized ONCE
            # here (norm-or-1, like search's qn) so downstream scores
            # are dot / other-side-norm.
            queries.select(qk, F.col(qc).alias("_q_raw"))
            .withColumn("_qn0", _norm(F.col("_q_raw")))
            .withColumn(
                "_q_norm",
                F.when(F.col("_qn0") > 0, F.col("_qn0")).otherwise(F.lit(1.0)),
            )
            .select(
                qk,
                F.transform(F.col("_q_raw"), lambda x: x.cast("double") / qn)
                .alias("_q_emb"),
            )
            .crossJoin(F.broadcast(cents))
            .select(
                qk,
                "_q_emb",
                "cell",
                F.coalesce(
                    F.nanvl(
                        F.round(
                            _dot(F.col("_q_emb"), F.col("_cent"))
                            / _norm(F.col("_cent")),
                            5,
                        ),
                        F.lit(-1.0),
                    ),
                    F.lit(-1.0),
                ).alias("_ccos"),
            )
            .withColumn("_pr", F.row_number().over(probe_w))
            .where(F.col("_pr") <= nprobe)
            .select(qk, "_q_emb", "cell")
        )
        cells = [
            r.cell for r in probes.select("cell").distinct().collect()
        ]
        buckets = sorted(
            {
                r.b
                for r in self.spark.createDataFrame(
                    [(c,) for c in cells] or [(None,)], "cell int"
                ).select(self.table.bucket_expr("cell").alias("b")).collect()
                if r.b is not None
            }
        )
        scan = (
            self.table.read(buckets=buckets)
            if cells and len(buckets) < self.table.num_buckets
            else self.table.read()
        )
        # dot / index-vector-norm (the query side is already normalized
        # above); a zero-norm index vector → 0/0 → nanvl → -1.0, exactly
        # the fixed `search` rerank
        cos = F.coalesce(
            F.nanvl(
                F.round(_dot(F.col("_q_emb"), F.col(ec)) / _norm(F.col(ec)), 5),
                F.lit(-1.0),
            ),
            F.lit(-1.0),
        )
        rank_w = Window.partitionBy(qk).orderBy(
            F.desc("cosine"), F.asc(vk)
        )
        return (
            probes.join(scan, "cell")
            .select(qk, vk, "cell", cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(rank_w))
            .where(F.col("rank") <= k)
        )

    def search(self, query_vec, k: int = 10, nprobe: int = 2) -> DataFrame:
        """Rank cells by query↔centroid cosine (≤2^n_bits rows collected
        — the IVF coarse pass), then exact cosine re-rank inside the
        probed cells via a bucket-pruned assignment-table read."""
        q = np.asarray(query_vec, dtype=np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        rows = self.centroids.read().select("cell", "centroid").collect()
        scored = []
        for r in rows:
            c = np.asarray(r.centroid, dtype=np.float64)
            n = np.linalg.norm(c)
            # rounded to 5 like every cross-engine cosine in the repo:
            # probe CHOICE becomes reproducible across engines/archs
            # (ties break by cell id), not just the final rerank
            scored.append((round(float(c @ qn / n), 5) if n > 0 else -1.0, r.cell))
        probes = [cell for _s, cell in sorted(scored, key=lambda t: (-t[0], t[1]))[:nprobe]]
        if not probes:
            return (
                self.table.read()
                .select(
                    self.vec_key, "cell", F.lit(0.0).alias("cosine")
                )
                .limit(0)
            )
        bdf = self.spark.createDataFrame([(c,) for c in probes], "cell int")
        buckets = sorted(
            {r.b for r in bdf.select(self.table.bucket_expr("cell").alias("b")).collect()}
        )
        qcol = F.array(*[F.lit(float(x)) for x in qn])
        dot = F.aggregate(
            F.zip_with(F.col(self.emb_col), qcol, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        norm = F.sqrt(
            F.aggregate(
                F.transform(F.col(self.emb_col), lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        return (
            self.table.read(buckets=buckets)
            .where(F.col("cell").isin([int(c) for c in probes]))
            .select(
                self.vec_key,
                "cell",
                # zero-norm index vector → 0/0, which Spark's Divide
                # yields NULL for (and a NaN could still arrive through
                # a NaN embedding) — score both -1.0, parity with the
                # -1.0 zero-norm centroid above and with search_many
                F.coalesce(
                    F.nanvl(F.round(dot / norm, 5), F.lit(-1.0)), F.lit(-1.0)
                ).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(self.vec_key))
            .limit(k)
        )
