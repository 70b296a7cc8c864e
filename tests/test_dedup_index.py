"""CDC-maintained corpus dedup index (lake/dedup_index.py): stream
inserts, text edits, and deletes into a documents base table, refresh,
and assert the incrementally maintained sketch tables — fingerprints
AND LSH band slots AND probe decisions — equal a from-scratch rebuild
over the same base state."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.dedup_index import CorpusDedupIndex, sketch_docs
from gene_etl_spark.lake.table import LakeTable

VOCAB = [f"w{i:02d}" for i in range(97)]


def _text(i: int, n: int = 25) -> str:
    # docs are mostly-disjoint word windows: doc i and doc i+1 share
    # a long run (near-dups by construction), docs far apart share ~0
    return " ".join(VOCAB[(i * 3 + k) % 97] for k in range(n))


def _doc_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )


def _merge(spark, table, rows, lsn0, op="U"):
    df = spark.createDataFrame(
        [
            (did, "en", txt, op, lsn0 + j, None)
            for j, (did, txt) in enumerate(rows)
        ],
        T.StructType(
            list(_doc_schema().fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    table.merge(df, batch_id=f"{op}{lsn0}", start_lsn=lsn0 - 1, end_lsn=lsn0 + len(rows))


def _band_state(idx):
    return {
        (r.bucket, r.band, r.doc_id): r.fp for r in idx.bands.read().collect()
    }


def _fp_state(idx):
    return {(r.fp, r.doc_id): r.n_tokens for r in idx.fps.read().collect()}


@pytest.fixture()
def base(spark, workdir):
    return LakeTable.create(
        spark,
        os.path.join(workdir, "docs"),
        _doc_schema(),
        key_cols=["doc_id"],
        num_buckets=4,
    )


def test_incremental_equals_full_rebuild(spark, workdir, base):
    _merge(spark, base, [(i, _text(i)) for i in range(20)], lsn0=1)
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    r = idx.refresh()
    assert r["refreshed"]

    # change stream across three base commits: 5 rewritten texts (band
    # moves), 3 deletes, 4 inserts — then ONE refresh folds all three
    _merge(spark, base, [(i, _text(i + 50)) for i in range(5)], lsn0=100)
    _merge(spark, base, [(i, "") for i in (10, 11, 12)], lsn0=200, op="D")
    _merge(spark, base, [(i, _text(i)) for i in range(30, 34)], lsn0=300)
    r = idx.refresh()
    assert r["refreshed"] and not r["full_rebuild"]

    fresh = CorpusDedupIndex(spark, os.path.join(workdir, "dix_fresh"), base)
    fresh.refresh()

    assert _band_state(idx) == _band_state(fresh)
    assert _fp_state(idx) == _fp_state(fresh)
    # every live doc has exactly one fingerprint slot
    assert len(_fp_state(idx)) == base.read().count() == 21

    # probe parity on a mixed batch
    probe = spark.createDataFrame(
        [(1000, "en", _text(3)), (1001, "en", _text(70))], _doc_schema()
    )
    got = sorted(map(tuple, idx.probe(probe).collect()))
    exp = sorted(map(tuple, fresh.probe(probe).collect()))
    assert got == exp


def test_probe_exact_near_and_miss(spark, workdir, base):
    _merge(spark, base, [(i, _text(i)) for i in range(0, 40, 4)], lsn0=1)
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    idx.refresh()

    exact_txt = "  " + _text(8).upper().replace(" ", "   ") + " "  # normalizes equal
    near_toks = _text(4).split()
    near_toks[12] = "zz"  # one-token edit: ~92% shingle overlap
    probe = spark.createDataFrame(
        [
            (500, "en", exact_txt),
            (501, "en", " ".join(near_toks)),
            (502, "en", " ".join(VOCAB[x % 97] for x in range(60, 85, 1))[::-1]),
        ],
        _doc_schema(),
    )
    rows = {r.doc_id: (r.match_kind, r.match_id) for r in idx.probe(probe).collect()}
    assert rows[500] == ("exact", 8)
    assert rows[501] == ("near", 4)
    assert 502 not in rows


def test_deleted_doc_stops_matching(spark, workdir, base):
    _merge(spark, base, [(i, _text(i)) for i in range(8)], lsn0=1)
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    idx.refresh()
    probe = spark.createDataFrame([(900, "en", _text(5))], _doc_schema())
    assert idx.probe(probe).count() >= 1

    _merge(spark, base, [(5, "")], lsn0=50, op="D")
    idx.refresh()
    got = {r.doc_id: r.match_id for r in idx.probe(probe).collect()}
    assert got.get(900) != 5  # the deleted doc's slots are tombstoned
    # full cleanliness: no slot of doc 5 anywhere
    assert not [k for k in _band_state(idx) if k[2] == 5]
    assert not [k for k in _fp_state(idx) if k[1] == 5]


def test_refresh_idempotent_and_fenced(spark, workdir, base):
    _merge(spark, base, [(i, _text(i)) for i in range(6)], lsn0=1)
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    assert idx.refresh()["refreshed"]
    vb, vf = idx.bands.version, idx.fps.version
    out = idx.refresh()  # nothing new
    assert not out["refreshed"]
    assert (idx.bands.version, idx.fps.version) == (vb, vf)


def test_sketch_matches_corpus_level_lsh(spark, workdir):
    """Index sketches must agree with the one-shot corpus LSH
    (queries/textops.py lsh_buckets) — same constants, same buckets —
    so probe decisions are consistent with the gated dedup queries."""
    from gene_etl_spark.queries.textops import lsh_buckets

    docs = [(i, "en", _text(i, n=18)) for i in range(12)]
    df = spark.createDataFrame(docs, _doc_schema())
    df.write.parquet(os.path.join(workdir, "documents.parquet"))

    corpus = {
        (r.doc_id, r.band, r.bucket)
        for r in lsh_buckets(spark, workdir).select("doc_id", "band", "bucket").collect()
    }
    mine = {
        (r.doc_id, r.band, r.bucket)
        for r in sketch_docs(df, "doc_id", "text")
        .where(F.col("band") >= 0)
        .collect()
    }
    assert corpus == mine


def test_multi_version_preimages_tombstone_all(spark, workdir, base):
    """An edit chain A→B→C inside one refresh window must tombstone
    A's AND B's slots (per-version sketching, not a union sketch)."""
    _merge(spark, base, [(1, _text(1)), (2, _text(40))], lsn0=1)
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    idx.refresh()
    _merge(spark, base, [(1, _text(10))], lsn0=10)  # A -> B
    _merge(spark, base, [(1, _text(20))], lsn0=20)  # B -> C
    idx.refresh()
    fresh = CorpusDedupIndex(spark, os.path.join(workdir, "dix_fresh"), base)
    fresh.refresh()
    assert _band_state(idx) == _band_state(fresh)
    assert _fp_state(idx) == _fp_state(fresh)


def test_probe_reads_are_bucket_pruned(spark, workdir, base):
    """A small probe batch must scan only the lake buckets its sketch
    values hash into, not the whole index (the ANN cell-pruning
    analogue)."""
    _merge(spark, base, [(i, _text(i)) for i in range(30)], lsn0=1)
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    idx.refresh()
    probe = spark.createDataFrame([(700, "en", _text(5))], _doc_schema())
    res = idx.probe(probe)
    got = {r.doc_id: r.match_kind for r in res.collect()}
    assert got.get(700) == "exact"
    files = set(res.inputFiles())
    all_files = set(idx.bands.read().inputFiles()) | set(
        idx.fps.read().inputFiles()
    )
    assert files and files < all_files


def test_refresh_spans_base_compaction(spark, workdir, base):
    """A refresh range that includes a base compaction commit (which
    emits no change rows) plus real edits must still converge to the
    rebuild state — compaction is physical, not logical."""
    from gene_etl_spark.lake.maintenance import compact

    _merge(spark, base, [(i, _text(i)) for i in range(10)], lsn0=1)
    _merge(spark, base, [(i, _text(i + 30)) for i in range(3)], lsn0=20)
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    idx.refresh()
    compact(base, max_files_per_bucket=1)
    _merge(spark, base, [(5, _text(70)), (11, _text(11))], lsn0=40)
    r = idx.refresh()  # spans compaction + edit commits
    assert r["refreshed"] and not r["full_rebuild"]
    fresh = CorpusDedupIndex(spark, os.path.join(workdir, "dix_fresh"), base)
    fresh.refresh()
    assert _band_state(idx) == _band_state(fresh)
    assert _fp_state(idx) == _fp_state(fresh)


def test_candidate_pairs_match_lsh_oracle(spark, workdir):
    """Corpus-level pairs read off the CDC-maintained band table must
    equal the value-gated one-shot LSH oracle (DuckDB, same constants)
    over the same corpus — the index IS the sketch, verified
    cross-engine."""
    import duckdb
    from pyspark.sql import functions as F

    from gene_etl_spark.queries.textops import SQL_DEDUP_MINHASH_LSH

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "text"
    )
    tbl = LakeTable.create(
        spark, os.path.join(workdir, "docs"), _doc_schema(),
        key_cols=["doc_id"], num_buckets=4,
    )
    tbl.merge(
        docs.withColumn("op", F.lit("U"))
        .withColumn("lsn", F.lit(1).cast("long"))
        .withColumn("ts", F.lit(None).cast("timestamp")),
        batch_id="b1", start_lsn=0, end_lsn=1,
    )
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), tbl)
    idx.refresh()
    got = {(r.doc_a, r.doc_b) for r in idx.candidate_pairs().collect()}

    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = {(a, b) for a, b in con.sql(SQL_DEDUP_MINHASH_LSH).fetchall()}
    # band pairs must match exactly; extras can only be fp-identical
    # (band-less) exact dups, absent in this corpus
    assert got == exp and len(got) > 0


def test_refresh_survives_own_table_compaction(spark, workdir, base):
    """The sketch tables are ordinary LakeTables: compacting THEM
    between refreshes (folding their accumulated per-refresh commits)
    must not disturb subsequent incremental maintenance."""
    from gene_etl_spark.lake.maintenance import compact

    _merge(spark, base, [(i, _text(i)) for i in range(8)], lsn0=1)
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
    idx.refresh()
    _merge(spark, base, [(i, _text(i + 20)) for i in range(2)], lsn0=30)
    idx.refresh()
    compact(idx.bands, max_files_per_bucket=1)
    compact(idx.fps, max_files_per_bucket=1)
    _merge(spark, base, [(3, _text(50)), (9, _text(9))], lsn0=60)
    _merge(spark, base, [(6, "")], lsn0=80, op="D")
    r = idx.refresh()
    assert r["refreshed"] and not r["full_rebuild"]
    fresh = CorpusDedupIndex(spark, os.path.join(workdir, "dix_fresh"), base)
    fresh.refresh()
    assert _band_state(idx) == _band_state(fresh)
    assert _fp_state(idx) == _fp_state(fresh)


def test_param_pinning(spark, workdir, base):
    _merge(spark, base, [(1, _text(1))], lsn0=1)
    CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base).refresh()
    meta = os.path.join(workdir, "dix_fp", "_dedup_meta.json")
    assert os.path.exists(meta)
    import json

    stored = json.load(open(meta))
    stored["num_hashes"] = 99
    json.dump(stored, open(meta, "w"))
    with pytest.raises(ValueError, match="sketch parameters"):
        CorpusDedupIndex(spark, os.path.join(workdir, "dix"), base)
