"""Property-based index maintenance equality (hypothesis).

For randomized churn shapes — edit rates, delete rates, insert bursts,
commit groupings, refresh cadence — the incrementally maintained
CorpusDedupIndex must equal a from-scratch rebuild over the same final
base state, for both sketch tables. This generalizes the fixed-seed
tests in test_dedup_index.py the way test_property_replay.py
generalizes the CDC e2e fixtures."""

import os
import random
import shutil

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
from gene_etl_spark.lake.table import LakeTable

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_etl_spark.session import get_spark

        _spark = get_spark(
            app_name="prop-dedup-index", cores=8, shuffle_partitions=8,
            driver_memory="8g",
        )
    return _spark


def _doc_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )


def _merge_schema():
    return T.StructType(
        list(_doc_schema().fields)
        + [
            T.StructField("op", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )


def _text(rng: random.Random, n_tokens: int) -> str:
    # small vocab → organic shingle overlap across docs (real near-dup
    # pressure on the band tables), including the occasional exact dup
    return " ".join(f"t{rng.randrange(40)}" for _ in range(n_tokens))


def _state(idx):
    return (
        {tuple(r) for r in idx.bands.read().collect()},
        {tuple(r) for r in idx.fps.read().collect()},
    )


@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(5, 30),
    n_commits=st.integers(2, 5),
    edit_frac=st.floats(0.0, 0.6),
    delete_frac=st.floats(0.0, 0.4),
    refresh_every=st.integers(1, 3),
)
def test_incremental_index_equals_rebuild_property(
    seed, n_docs, n_commits, edit_frac, delete_frac, refresh_every
):
    spark = _get_spark()
    rng = random.Random(seed)
    base = f"/tmp/prop_dix_{seed}_{n_docs}_{n_commits}"
    shutil.rmtree(base, ignore_errors=True)
    try:
        table = LakeTable.create(
            spark, os.path.join(base, "docs"), _doc_schema(),
            key_cols=["doc_id"], num_buckets=4,
        )
        idx = CorpusDedupIndex(spark, os.path.join(base, "dix"), table)
        live: set[int] = set()
        next_id = 0
        lsn = 0
        for c in range(n_commits):
            rows = []
            # inserts (always at least one so every commit is non-empty)
            for _ in range(rng.randint(1, n_docs)):
                rows.append((next_id, "en", _text(rng, rng.randint(1, 40)), "U"))
                live.add(next_id)
                next_id += 1
            # edits of live docs (band moves, possibly to exact dups)
            for d in rng.sample(sorted(live), int(len(live) * edit_frac)):
                rows.append((d, "en", _text(rng, rng.randint(1, 40)), "U"))
            # deletes
            dels = rng.sample(sorted(live), int(len(live) * delete_frac))
            for d in dels:
                rows.append((d, None, None, "D"))
                live.discard(d)
            # merge input must be key-deduped: collapse to the LAST op
            # per doc (dict insertion order = stream order) and mirror
            # it in `live`
            final: dict[int, tuple] = {}
            for did, lg, tx, op in rows:
                final[did] = (lg, tx, op)
            for did, (_lg, _tx, op) in final.items():
                (live.discard if op == "D" else live.add)(did)
            df = spark.createDataFrame(
                [(did, lg, tx, op, lsn + j + 1, None)
                 for j, (did, (lg, tx, op)) in enumerate(final.items())],
                _merge_schema(),
            )
            table.merge(
                df, batch_id=f"c{c}", start_lsn=lsn, end_lsn=lsn + len(final)
            )
            lsn += len(final)
            if (c + 1) % refresh_every == 0:
                idx.refresh()
        idx.refresh()  # catch any tail commits

        fresh = CorpusDedupIndex(spark, os.path.join(base, "dix_fresh"), table)
        fresh.refresh()
        assert _state(idx) == _state(fresh)
        # one fingerprint slot per live doc
        assert len({t for t in _state(idx)[1]}) == len(live) == table.read().count()
    finally:
        shutil.rmtree(base, ignore_errors=True)
