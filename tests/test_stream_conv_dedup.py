"""Streaming CDC → chained conversation near-dup detection: the
ConversationDedupChain rides ingest_stream's maintainer hook, so every
committed epoch flows binlog → conv lake → per-conv document rollup →
dedup index in one pass, and the live candidate pairs equal a clean
rebuild over the final lake."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
from gene_etl_spark.lake.table import LakeTable
from gene_etl_spark.pipeline import ConversationDedupChain


def test_stream_maintained_conversation_dedup(spark, workdir):
    from gene_etl_spark.config import IngestConfig
    from gene_etl_spark.sources.simulate import generate_change_stream
    from gene_etl_spark.streaming.stream import ingest_stream

    # the simulator's duplicate-turn updates + skew give organically
    # similar conversations; near-dup pairs are whatever the sketch
    # finds — the assertion is chained-live == clean-rebuild
    generate_change_stream(
        os.path.join(workdir, "events"),
        n_convs=15,
        max_turns=6,
        n_events=600,
        seed=23,
        n_tranches=3,
        evolve_at_frac=0.0,
    )
    cfg = IngestConfig(
        lake_path=os.path.join(workdir, "lake"),
        events_path=os.path.join(workdir, "events"),
        ledger_path=os.path.join(workdir, "ledger"),
        metrics_path=os.path.join(workdir, "metrics"),
        validation_path=os.path.join(workdir, "validation"),
        num_buckets=8,
    )
    base = LakeTable.create(
        spark,
        cfg.lake_path,
        T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("role", T.StringType()),
                T.StructField("text", T.StringType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
    )
    chain = ConversationDedupChain(spark, base, os.path.join(workdir, "chain"))
    summary = ingest_stream(
        spark,
        cfg,
        os.path.join(workdir, "ckpt"),
        max_files_per_trigger=1,
        rollups=[chain],  # anything with refresh() qualifies
    )
    assert summary["epochs"] >= 2

    final = LakeTable.load(spark, cfg.lake_path)
    # rollup docs equal direct recompute over the final lake
    docs = {r.conv_id: r.text for r in chain.rollup.read().collect()}
    direct = {
        r.conv_id: r.text
        for r in final.read()
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda x: x["text"],
                ),
                " ",
            ).alias("text")
        )
        .collect()
    }
    assert docs == direct and len(docs) > 0

    # live chained index == clean rebuild over the final rollup
    fresh = CorpusDedupIndex(
        spark, os.path.join(workdir, "fresh"), chain.rollup.table
    )
    fresh.refresh()
    live = lambda t: {tuple(r) for r in t.read().collect()}  # noqa: E731
    assert live(chain.idx.bands) == live(fresh.bands)
    assert live(chain.idx.fps) == live(fresh.fps)
    got = {
        (r.doc_a, r.doc_b) for r in chain.candidate_pairs().collect()
    }
    exp = {(r.doc_a, r.doc_b) for r in fresh.candidate_pairs().collect()}
    assert got == exp
