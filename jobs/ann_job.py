"""spark-submit entry point for CDC-maintained ANN index upkeep.

Keeps an IVF-style vector index (lake/ann_index.py) current over an
embeddings lake table without rebuilds — the scheduled companion to
jobs/ingest_job.py for the embedding column:

    # refresh (or catch up) the index after new embedding commits
    spark-submit --py-files dist/gene_etl_spark.zip jobs/ann_job.py \
        --warehouse /data/warehouse --table embeddings --dim 768 \
        refresh

    # probe it
    spark-submit --py-files dist/gene_etl_spark.zip jobs/ann_job.py \
        --warehouse /data/warehouse --table embeddings --dim 768 \
        search --query-json '[0.1, -0.4, ...]' --k 10 --nprobe 4

Each ``refresh`` folds every base snapshot committed since the last run
into the assignment table and the centroid rollup (cost ∝ the change
volume — a cell-moving embedding update touches exactly two slots) and
is idempotent under replay (fenced through the index's own snapshot
chain).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="ANN index refresh / search")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--table", default="embeddings", help="base table dir name")
    ap.add_argument("--name", default=None, help="index dir name (default ann_<table>)")
    ap.add_argument(
        "--dim", type=int, default=None,
        help="embedding dimension (required when CREATING an index; an "
        "existing index reads it from its _ann_meta.json sidecar)",
    )
    ap.add_argument(
        "--n-bits", type=int, default=None,
        help="SRP bits, 2^bits cells (create default 4; an existing "
        "index reads it from its sidecar — passing a conflicting value "
        "is an error, never a silent re-quantization)",
    )
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("refresh")
    s = sub.add_parser("search")
    s.add_argument("--query-json", required=True, help="JSON array of floats")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--nprobe", type=int, default=2)
    args = ap.parse_args()

    from gene_etl_spark.lake.ann_index import IvfVectorIndex
    from gene_etl_spark.lake.table import LakeTable
    from gene_etl_spark.session import get_spark

    spark = get_spark(app_name=f"ann-{args.table}", cores=args.cores)
    base = LakeTable.load(spark, os.path.join(args.warehouse, args.table))
    name = args.name or f"ann_{args.table}"
    idx = IvfVectorIndex(
        spark,
        os.path.join(args.warehouse, name),
        base,
        dim=args.dim,
        n_bits=args.n_bits,
        num_buckets=args.num_buckets,
    )
    if args.cmd == "refresh":
        print(json.dumps(idx.refresh(), default=str))
    else:
        q = json.loads(args.query_json)
        rows = idx.search(q, k=args.k, nprobe=args.nprobe).collect()
        print(json.dumps([r.asDict() for r in rows]))


if __name__ == "__main__":
    main()
