"""spark-submit entry point for lake-table maintenance.

The operational half of the lake layer (the Iceberg maintenance-
procedures analogue — reference: the ETL's persistence layer has no
table upkeep at all; this is the 10^10-event operability the north
rule's continuous ingest implies):

    spark-submit --py-files dist/gene_etl_spark.zip jobs/maintenance_job.py \
        --table /data/warehouse/transcripts compact [--max-files 1]

    ... expire [--keep-last 10]
    ... vacuum [--older-than-sec 600] [--dry-run]
    ... rebucket --num-buckets 256
    ... snapshots            # history + timestamp-travel resolution table
    ... tag corpus-2026q3 [--version 41]   # retention-pin a snapshot
    ... drop-tag corpus-2026q3
    ... tags
    ... rollback --version 41 | --tag corpus-2026q3

Each subcommand prints ONE JSON line so schedulers can parse results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="lake table maintenance")
    ap.add_argument("--table", required=True, help="lake table path")
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("compact", help="rewrite fragmented/delta-carrying buckets")
    p.add_argument("--max-files", type=int, default=1)
    p.add_argument(
        "--target-file-size-mb", type=int, default=None,
        help="split rewritten buckets into ~this-sized key-sorted files",
    )
    p.add_argument(
        "--sort-by", default=None,
        help="comma-separated within-file clustering columns (default: key)",
    )
    p.add_argument(
        "--cluster", choices=("lex", "zorder"), default="lex",
        help="zorder: bit-interleave --sort-by quantile ranks so data"
        " skipping prunes on every clustered column, not just the first",
    )

    p = sub.add_parser("expire", help="expire old snapshots (fencing history kept)")
    p.add_argument("--keep-last", type=int, default=10)

    p = sub.add_parser("vacuum", help="reclaim files no live snapshot references")
    p.add_argument("--older-than-sec", type=float, default=600.0)
    p.add_argument("--dry-run", action="store_true")

    p = sub.add_parser("rebucket", help="partition-spec evolution: new bucket count")
    p.add_argument("--num-buckets", type=int, required=True)
    p.add_argument(
        "--target-file-size-mb", type=int, default=None,
        help="cluster the new layout in the same rewrite pass",
    )
    p.add_argument("--sort-by", default=None)
    p.add_argument("--cluster", choices=("lex", "zorder"), default="lex")

    sub.add_parser("snapshots", help="list live snapshots (version, ts, operation)")

    p = sub.add_parser("tag", help="pin a live snapshot under an immutable name")
    p.add_argument("name")
    p.add_argument("--version", type=int, default=None, help="default: current")

    p = sub.add_parser("drop-tag", help="remove a tag (snapshot expirable again)")
    p.add_argument("name")

    sub.add_parser("tags", help="list tags (name -> version)")

    p = sub.add_parser(
        "rollback", help="restore a live snapshot's content as a new commit"
    )
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--version", type=int, default=None)
    g.add_argument("--tag", default=None)

    p = sub.add_parser(
        "prune-report",
        help="data-skipping dry-run: files kept vs skipped for a predicate",
    )
    p.add_argument(
        "--where", required=True,
        help='JSON conjunction, e.g. \'[["score", ">=", 100],'
        ' ["tool", "not_null", null]]\'',
    )

    args = ap.parse_args()

    from gene_etl_spark.lake import maintenance
    from gene_etl_spark.lake.table import LakeTable
    from gene_etl_spark.session import get_spark

    spark = get_spark(app_name=f"maintenance-{args.cmd}", cores=args.cores)
    table = LakeTable.load(spark, args.table)

    if args.cmd == "compact":
        out = maintenance.compact(
            table,
            max_files_per_bucket=args.max_files,
            target_file_size_bytes=(
                args.target_file_size_mb * 1024 * 1024
                if args.target_file_size_mb
                else None
            ),
            sort_cols=args.sort_by.split(",") if args.sort_by else None,
            cluster=args.cluster,
        )
    elif args.cmd == "expire":
        out = maintenance.expire_snapshots(table, keep_last=args.keep_last)
    elif args.cmd == "vacuum":
        out = maintenance.vacuum(
            table, dry_run=args.dry_run, older_than_sec=args.older_than_sec
        )
    elif args.cmd == "rebucket":
        out = maintenance.rebucket(
            table,
            args.num_buckets,
            target_file_size_bytes=(
                args.target_file_size_mb * 1024 * 1024
                if args.target_file_size_mb
                else None
            ),
            sort_cols=args.sort_by.split(",") if args.sort_by else None,
            cluster=args.cluster,
        )
    elif args.cmd == "tag":
        out = maintenance.tag(table, args.name, version=args.version)
    elif args.cmd == "drop-tag":
        out = maintenance.drop_tag(table, args.name)
    elif args.cmd == "tags":
        out = {"table": args.table, "tags": maintenance.list_tags(table)}
    elif args.cmd == "rollback":
        out = maintenance.rollback(table, version=args.version, tag_name=args.tag)
    elif args.cmd == "prune-report":
        where = [tuple(c) for c in json.loads(args.where)]
        out = {"table": args.table, "where": json.loads(args.where),
               **table.prune_report(where)}
    else:  # snapshots
        rows = [
            {
                "version": m["version"],
                "committed_at_ms": m.get("committed_at_ms"),
                "operation": (m.get("summary") or {}).get("operation"),
                "clustering": (m.get("summary") or {}).get("clustering"),
                "live": os.path.exists(table._manifest_path(m["version"])),
            }
            for m in table.history()
        ]
        out = {"table": args.table, "snapshots": rows}

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
