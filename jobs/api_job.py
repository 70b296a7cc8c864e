"""spark-submit entry point for the REST control/read API.

Serves the reference's HTTP surface (app.py:58-428) over the Spark
engine: health, config validate, synchronous ingest runs with a job
tracker, paginated registry results, statistics, validation log.

    spark-submit --py-files dist/gene_etl_spark.zip jobs/api_job.py \
        --warehouse /data/warehouse --events-path /data/binlog \
        [--sf-dir /data/tables] [--host 0.0.0.0] [--port 8080]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="REST API over the CDC engine")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--events-path", default=None)
    ap.add_argument("--sf-dir", default=None, help="parquet root for /results")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--merge-mode", choices=["cow", "mor"], default="cow")
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    ap.add_argument(
        "--token", default=None, help="Bearer token required on every route"
    )
    ap.add_argument(
        "--workspace-root",
        default=None,
        help="confine POSTed run-config paths under this root "
        "(default: the warehouse dir)",
    )
    ap.add_argument(
        "--insecure",
        action="store_true",
        help="allow a non-loopback bind without --token",
    )
    args = ap.parse_args()

    if (
        args.host not in ("127.0.0.1", "localhost", "::1")
        and not args.token
        and not args.insecure
    ):
        ap.error(
            "refusing a non-loopback bind without --token "
            "(pass --insecure to override)"
        )

    from gene_etl_spark.api import ApiServer
    from gene_etl_spark.config import IngestConfig
    from gene_etl_spark.session import get_spark

    default_config = None
    if args.events_path:
        default_config = IngestConfig(
            lake_path=os.path.join(args.warehouse, "transcripts"),
            events_path=args.events_path,
            ledger_path=os.path.join(args.warehouse, "ingest_ledger"),
            metrics_path=os.path.join(args.warehouse, "ingest_metrics"),
            validation_path=os.path.join(args.warehouse, "validation_log"),
            num_buckets=args.num_buckets,
            merge_mode=args.merge_mode,
        )

    spark = get_spark(app_name="cdc-api", cores=args.cores)
    server = ApiServer(
        spark,
        sf_dir=args.sf_dir,
        default_config=default_config,
        host=args.host,
        port=args.port,
        token=args.token,
        workspace_root=args.workspace_root or args.warehouse,
    )
    print(f"gene-etl-spark API listening on {server.url}")
    server.serve_forever()


if __name__ == "__main__":
    main()
