"""Connected-component duplicate clustering (operators/clusters.py):
hand-computed fixtures, the pairs-vs-clusters semantic difference, and
a randomized cross-engine check against a DuckDB recursive-CTE twin."""

import random

import duckdb
import pytest

from gene_etl_spark.operators.clusters import (
    connected_components,
    duplicate_representatives,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r.node: r.component for r in connected_components(df).collect()
    }


def test_chain_star_and_singleton_free(spark):
    # chain 1-2-3, star 10-(11,12), pair 20-21
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (10, 12), (20, 21)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_clusters_beat_pairwise_drop(spark):
    """(A,C),(B,C): the pairwise drop-the-larger rule keeps BOTH A and
    B (each is a local minimum) although A~C~B chains them; clustering
    keeps exactly one representative."""
    a, b, c = 1, 2, 3
    pairs = [(a, c), (b, c)]
    pairwise_kept = {a, b, c} - {max(p) for p in pairs}
    assert pairwise_kept == {a, b}  # the rule's blind spot
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    reps = {
        r.node
        for r in duplicate_representatives(df).collect()
        if r.is_representative
    }
    assert reps == {a}


def test_matches_duckdb_recursive_oracle(spark):
    rng = random.Random(7)
    nodes = list(range(40))
    edges = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(30)
        }
    )
    got = _cc(spark, [(a, b) for a, b in edges])

    con = duckdb.connect()
    con.execute("create table edges(src bigint, dst bigint)")
    con.executemany(
        "insert into edges values (?, ?)",
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
    )
    exp = {
        n: c
        for n, c in con.sql(
            """
            WITH RECURSIVE reach(node, comp) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node
            )
            SELECT node, MIN(comp) FROM reach GROUP BY node
            """
        ).fetchall()
    }
    assert got == exp and len(got) > 0


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=1)


def test_deep_chain_converges_logarithmically(spark):
    """Adversarial depth (round-4 verdict item 7): a 3000-node path —
    the forum-mirror chain shape — would need ~3000 rounds of plain
    min-label propagation; pointer jumping must land it well inside the
    default 25-round budget (known-min distance is 2^k − 1 after k
    rounds, so ~13 rounds + the final no-change round here)."""
    n = 3000
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {
        r.node: r.component
        for r in connected_components(df, max_iters=16).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_max_iters_threads_through_representatives(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_representatives(df, max_iters=0)
    reps = {
        r.node
        for r in duplicate_representatives(df, max_iters=5).collect()
        if r.is_representative
    }
    assert reps == {1}


def test_checkpoint_blocks_freed_per_round(spark):
    """Each round's localCheckpoint blocks are freed JVM-side once the
    next round materializes (Dataset.unpersist is a silent no-op for
    localCheckpoint); only the FINAL labels checkpoint — the DataFrame
    the caller consumes — may remain persisted."""
    sc = spark.sparkContext

    def rdd_ids():
        return {int(k) for k in sc._jsc.getPersistentRDDs().keySet()}

    n = 200  # chain deep enough for several pointer-jumping rounds
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    before = rdd_ids()
    labels = connected_components(df)
    assert {r.component for r in labels.collect()} == {0}
    leaked = rdd_ids() - before
    assert len(leaked) <= 1, f"checkpoint blocks accumulated: {leaked}"
