"""spark-submit entry point for continuous-rollup maintenance.

Runs (or catches up) an incrementally maintained aggregate over an
ingested lake table — the scheduled companion to jobs/ingest_job.py:

    spark-submit --py-files dist/gene_etl_spark.zip jobs/rollup_job.py \
        --warehouse /data/warehouse --name daily_by_role \
        --group-cols role --time-bucket day \
        --count n_turns --sum-length-of text total_chars

Each invocation folds every base snapshot committed since the last run
into the rollup (cost ∝ what changed, via the change feed with
preimages) and is idempotent under replay (fenced through the rollup's
own snapshot chain). ``--time-bucket`` adds a derived
``date_trunc(<unit>, ts)`` group column — the hypertable shape.

The aggregate vocabulary here is deliberately declarative (count /
sum / sum-of-length) so the job surface stays config-driven like the
reference's job API; richer aggregates compose in code via
``ContinuousRollup`` directly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="continuous rollup refresh")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--table", default="transcripts", help="base table dir name")
    ap.add_argument("--name", required=True, help="rollup dir name under the warehouse")
    ap.add_argument("--group-cols", nargs="*", default=[])
    ap.add_argument(
        "--time-bucket",
        default=None,
        help="date_trunc unit over ts (e.g. day, hour) added as group col 'bucket'",
    )
    ap.add_argument("--count", default=None, metavar="ALIAS", help="COUNT(*) AS <alias>")
    ap.add_argument(
        "--sum", nargs=2, action="append", default=[], metavar=("COL", "ALIAS"),
        help="SUM(col) AS alias (repeatable)",
    )
    ap.add_argument(
        "--sum-length-of", nargs=2, action="append", default=[],
        metavar=("COL", "ALIAS"), help="SUM(length(col)) AS alias (repeatable)",
    )
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gene_etl_spark.lake.rollup import ContinuousRollup
    from gene_etl_spark.lake.table import LakeTable
    from gene_etl_spark.session import get_spark

    if not (args.count or args.sum or args.sum_length_of):
        ap.error("at least one aggregate (--count / --sum / --sum-length-of)")
    if not (args.group_cols or args.time_bucket):
        ap.error("no group columns (--group-cols and/or --time-bucket)")

    # Column expressions need a live SparkContext: build them post-session
    spark = get_spark(app_name=f"rollup-{args.name}", cores=args.cores)
    aggs = []
    if args.count:
        aggs.append(F.count(F.lit(1)).cast("long").alias(args.count))
    for col, alias in args.sum:
        aggs.append(F.sum(col).alias(alias))
    for col, alias in args.sum_length_of:
        aggs.append(F.sum(F.length(col)).cast("long").alias(alias))

    group_cols = list(args.group_cols)
    derived = {}
    if args.time_bucket:
        group_cols = ["bucket"] + group_cols
        derived["bucket"] = F.date_trunc(args.time_bucket, "ts")
    base = LakeTable.load(spark, os.path.join(args.warehouse, args.table))
    roll = ContinuousRollup(
        spark,
        os.path.join(args.warehouse, f"rollup_{args.name}"),
        base,
        group_cols,
        aggs,
        num_buckets=args.num_buckets,
        derived=derived,
    )
    summary = roll.refresh()
    summary["rows"] = roll.read().count()
    print(json.dumps(summary, default=str))


if __name__ == "__main__":
    main()
