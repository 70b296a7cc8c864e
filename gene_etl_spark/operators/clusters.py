"""Duplicate clustering: connected components over near-dup candidate
pairs, as iterative min-label propagation in pure DataFrame ops (no
GraphFrames dependency — none exists in this environment).

The dedup pair lists (``CorpusDedupIndex.candidate_pairs``, the gated
LSH queries) are EDGES; dedup policy usually wants one representative
per connected COMPONENT ("keep the smallest id of every duplicate
cluster"). The pairwise drop-the-larger rule keeps every LOCAL minimum
— for pairs (A,C),(B,C) it keeps both A and B although A~C~B chains
them — so clustering is the principled transitive closure.

Algorithm: each node's label starts as itself; every iteration each
node takes the min of its own label and its neighbors' labels (one
equi-join + one min-aggregate per iteration, both fully distributed;
the per-iteration driver work is a single changed-row count).
Converges in O(component diameter) iterations — near-dup clusters are
shallow (stars/short chains), so a handful in practice; ``max_iters``
bounds adversarial chains and raises rather than returning a partial
clustering silently. Each iteration's labels go through an EAGER
``localCheckpoint`` so the lineage stays flat at any iteration count
(a persist alone would chain plans across iterations and blow up the
optimizer on deep graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
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
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce("_best", "component")
                    ).alias("component"),
                    (
                        F.coalesce("_best", "component") < F.col("component")
                    ).alias("_chg"),
                )
                .localCheckpoint()  # eager: flat lineage per iteration
            )
            changed = new_labels.where(F.col("_chg")).count()
            labels = new_labels.select("node", "component")
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
        )
    finally:
        edges.unpersist()


def duplicate_representatives(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """(node, component, is_representative): cluster-dedup decisions —
    keep exactly the smallest node of every duplicate component, drop
    the rest (nodes in no pair are untouched by construction: they
    never appear)."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.select(
        "node",
        "component",
        (F.col("node") == F.col("component")).alias("is_representative"),
    )
