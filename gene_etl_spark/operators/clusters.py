"""Duplicate clustering: connected components over near-dup candidate
pairs, as iterative min-label propagation WITH pointer-jumping in pure
DataFrame ops (no GraphFrames dependency — none exists in this
environment).

The dedup pair lists (``CorpusDedupIndex.candidate_pairs``, the gated
LSH queries) are EDGES; dedup policy usually wants one representative
per connected COMPONENT ("keep the smallest id of every duplicate
cluster"). The pairwise drop-the-larger rule keeps every LOCAL minimum
— for pairs (A,C),(B,C) it keeps both A and B although A~C~B chains
them — so clustering is the principled transitive closure.

Algorithm: each node's label starts as itself; every iteration is

1. **propagate** — each node takes the min of its own label and its
   neighbors' labels (one equi-join + one min-aggregate, distributed);
2. **shortcut** (pointer jumping) — each node then takes its LABEL's
   label (one self-join on the label table): if my best-known id v has
   itself already heard of a smaller id, I inherit it without waiting
   for it to walk the graph edge by edge.

Labels are always ids of reachable nodes and only decrease, so the
fixpoint is exactly the component minimum — the shortcut changes the
ROUND COUNT, not the result. Propagation alone converges in
O(component diameter) rounds, which a 10^6-node chain of mirrored
forum posts turns into 10^6 rounds; with the shortcut the known-min
distance doubles per round, so chains converge in O(log diameter) —
the adversarial-depth bound (round-4 verdict item 7), same shape as
the large-star/small-star MapReduce CC family. max_iters=25 therefore
bounds components of diameter ~2^25 rather than 25.

Each iteration's labels go through an EAGER ``localCheckpoint`` so the
lineage stays flat at any iteration count (a persist alone would chain
plans across iterations and blow up the optimizer on deep graphs); the
PREVIOUS iteration's checkpoint blocks are explicitly freed once the
new labels are materialized, so block usage stays O(nodes), not
O(iterations × nodes). ``Dataset.unpersist()`` is a silent no-op for
localCheckpoint blocks (it only consults the CacheManager, which never
sees localCheckpoint's direct RDD persist — measured on this Spark), so
the blocks are freed JVM-side by RDD id: snapshot
``getPersistentRDDs`` around each checkpoint and unpersist the diff one
round later. The RETURNED labels' blocks stay persisted — the caller
consumes that DataFrame. If another thread persists an RDD in the
narrow snapshot window it would be freed a round later too: worst case
a recompute of someone's cache, never wrong results (and the engine
never calls this concurrently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _persisted_rdd_ids(sc) -> set:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet()}


def _unpersist_rdds(sc, rdd_ids) -> None:
    jmap = sc._jsc.getPersistentRDDs()
    for rid in rdd_ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component): component = smallest node id reachable via
    the pair graph. Every node appearing in ``pairs`` gets a row."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    sc = pairs.sparkSession.sparkContext
    snap = _persisted_rdd_ids(sc)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    label_rdd_ids = _persisted_rdd_ids(sc) - snap
    try:
        for _ in range(max_iters):
            neighbor_min = (
                edges.join(
                    labels.select(
                        F.col("node").alias("dst"),
                        F.col("component").alias("_nc"),
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("node"))
                .agg(F.min("_nc").alias("_best"))
            )
            # carry the pre-round label as _old so the changed count
            # reads off the checkpoint itself — no extra join per round
            propagated = labels.join(neighbor_min, "node", "left").select(
                "node",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"), F.coalesce("_best", "component")
                ).alias("component"),
            )
            # pointer jumping: component ← label(component). Component
            # values are node ids present in `labels` (they originate
            # as node ids and mins thereof), so the left join hits;
            # coalesce guards the theoretical miss.
            snap = _persisted_rdd_ids(sc)
            new_labels = (
                propagated.join(
                    labels.select(
                        F.col("node").alias("component"),
                        F.col("component").alias("_cc"),
                    ),
                    "component",
                    "left",
                )
                .select(
                    "node",
                    "_old",
                    F.least(
                        F.col("component"), F.coalesce("_cc", "component")
                    ).alias("component"),
                )
                .localCheckpoint()  # eager: flat lineage per iteration
            )
            new_rdd_ids = _persisted_rdd_ids(sc) - snap
            changed = (
                new_labels.where(F.col("component") < F.col("_old")).count()
            )
            # previous round's checkpoint blocks — freed JVM-side,
            # Dataset.unpersist() would silently no-op (see module doc)
            _unpersist_rdds(sc, label_rdd_ids)
            label_rdd_ids = new_rdd_ids
            labels = new_labels.select("node", "component")
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
        )
    finally:
        edges.unpersist()


def duplicate_representatives(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component, is_representative): cluster-dedup decisions —
    keep exactly the smallest node of every duplicate component, drop
    the rest (nodes in no pair are untouched by construction: they
    never appear). ``max_iters`` threads through to
    ``connected_components`` — with pointer jumping it bounds diameter
    ~2^max_iters, but callers clustering adversarially deep graphs can
    still raise it."""
    cc = connected_components(pairs, a_col, b_col, max_iters=max_iters)
    return cc.select(
        "node",
        "component",
        (F.col("node") == F.col("component")).alias("is_representative"),
    )
