"""Structured Streaming ingest: drain the binlog via availableNow and
assert the final lake state equals the oracle; rerun must be a no-op."""

import os

from gene_etl_spark.config import IngestConfig
from gene_etl_spark.oracle import assert_replay_equal, materialize_expected
from gene_etl_spark.sources.simulate import generate_change_stream
from gene_etl_spark.streaming.stream import ingest_stream


def test_streaming_ingest_equals_oracle(spark, workdir):
    generate_change_stream(
        os.path.join(workdir, "events"),
        n_convs=30,
        max_turns=15,
        n_events=3000,
        seed=11,
        n_tranches=6,
    )
    cfg = IngestConfig(
        lake_path=os.path.join(workdir, "lake"),
        events_path=os.path.join(workdir, "events"),
        ledger_path=os.path.join(workdir, "ledger"),
        metrics_path=os.path.join(workdir, "metrics"),
        validation_path=os.path.join(workdir, "validation"),
        num_buckets=8,
        num_salts=4,
        salt_threshold=0,
    )
    ckpt = os.path.join(workdir, "ckpt")
    summary = ingest_stream(spark, cfg, ckpt, max_files_per_trigger=2)
    assert summary["events"] == 3000
    assert summary["epochs"] >= 2  # several micro-batches, not one

    from gene_etl_spark.lake.table import LakeTable

    table = LakeTable.load(spark, cfg.lake_path)
    assert_replay_equal(
        table.read().toPandas(), materialize_expected(cfg.events_path)
    )

    # drain again with the same checkpoint: no new epochs, state unchanged
    v = table.version
    again = ingest_stream(spark, cfg, ckpt, max_files_per_trigger=2)
    assert again["events"] == 0
    assert LakeTable.load(spark, cfg.lake_path).version == v
