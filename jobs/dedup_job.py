"""spark-submit entry point for CDC-maintained corpus-dedup index upkeep.

Keeps the dedup sketch tables (lake/dedup_index.py) current over a
documents lake table without re-sketching the corpus — the scheduled
companion to jobs/ingest_job.py for the text column:

    # refresh (or catch up) after new document commits
    spark-submit --py-files dist/gene_etl_spark.zip jobs/dedup_job.py \
        --warehouse /data/warehouse --table documents refresh

    # dedup an incoming parquet batch against the WHOLE indexed corpus
    spark-submit --py-files dist/gene_etl_spark.zip jobs/dedup_job.py \
        --warehouse /data/warehouse --table documents \
        probe --batch /data/incoming/batch.parquet --out /data/decisions

Each ``refresh`` folds every base snapshot committed since the last run
into the fingerprint and LSH band tables (cost ∝ the change volume: an
edited document tombstones its old slots and upserts the new ones) and
is idempotent under replay (fenced per sketch table through the index's
own snapshot chain). ``probe`` writes one decision row per duplicated
incoming doc: (doc_id, match_kind exact|near, match_id).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="dedup index refresh / probe")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--table", default="documents", help="base table dir name")
    ap.add_argument(
        "--name", default=None, help="index dir name (default dedup_<table>)"
    )
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("refresh")
    p = sub.add_parser("probe")
    p.add_argument("--batch", required=True, help="parquet path of incoming docs")
    p.add_argument("--out", default=None, help="write decisions as parquet here")
    args = ap.parse_args()

    from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
    from gene_etl_spark.lake.table import LakeTable
    from gene_etl_spark.session import get_spark

    spark = get_spark(app_name=f"dedup-{args.table}", cores=args.cores)
    base = LakeTable.load(spark, os.path.join(args.warehouse, args.table))
    name = args.name or f"dedup_{args.table}"
    idx = CorpusDedupIndex(
        spark,
        os.path.join(args.warehouse, name),
        base,
        text_col=args.text_col,
        num_buckets=args.num_buckets,
    )
    if args.cmd == "refresh":
        print(json.dumps(idx.refresh(), default=str))
    else:
        decisions = idx.probe(spark.read.parquet(args.batch))
        if args.out:
            decisions.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out}))
        else:
            rows = decisions.collect()
            print(json.dumps([r.asDict() for r in rows]))
        idx.release()


if __name__ == "__main__":
    main()
