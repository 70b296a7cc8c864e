"""spark-submit entry point for training-corpus construction.

Runs the composed pipeline (quality gate → exact dedup → LSH near-dup
removal → optional decontamination → stratified mixing → sequence
packing) and writes the packed layout + kept corpus as Parquet:

    spark-submit --py-files dist/gene_etl_spark.zip jobs/corpus_job.py \
        --docs-dir /data/corpus --out /data/packed \
        [--eval-parquet /data/benchmarks.parquet] \
        [--fractions '{"en": 1.0, "de": 0.5}'] [--window 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="corpus build: clean -> mix -> pack")
    ap.add_argument("--docs-dir", required=True,
                    help="dir containing documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--eval-parquet", default=None,
                    help="eval set (doc_id, text) for decontamination")
    ap.add_argument("--min-tokens", type=int, default=30)
    ap.add_argument("--fractions", default=None,
                    help='JSON lang->fraction, e.g. {"en": 1.0}')
    ap.add_argument("--default-fraction", type=float, default=1.0)
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    args = ap.parse_args()

    from gene_etl_spark.pipeline import build_corpus
    from gene_etl_spark.session import get_spark

    spark = get_spark(app_name="corpus-build", cores=args.cores)
    eval_df = (
        spark.read.parquet(args.eval_parquet) if args.eval_parquet else None
    )
    out = build_corpus(
        spark,
        args.docs_dir,
        eval_set=eval_df,
        min_tokens=args.min_tokens,
        lang_fractions=json.loads(args.fractions) if args.fractions else None,
        default_fraction=args.default_fraction,
        window=args.window,
        seed=args.seed,
    )
    out["kept"].write.mode("overwrite").parquet(os.path.join(args.out, "kept"))
    out["packed"].write.mode("overwrite").parquet(os.path.join(args.out, "packed"))
    print(json.dumps(out["stats"]))


if __name__ == "__main__":
    main()
