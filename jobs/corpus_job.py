"""spark-submit entry point for training-corpus construction.

One-shot mode runs the composed pipeline (quality gate → exact dedup →
LSH near-dup removal → optional decontamination → stratified mixing →
sequence packing) and writes the packed layout + kept corpus as
Parquet:

    spark-submit --py-files dist/gene_etl_spark.zip jobs/corpus_job.py \
        --docs-dir /data/corpus --out /data/packed \
        [--eval-parquet /data/benchmarks.parquet] \
        [--fractions '{"en": 1.0, "de": 0.5}'] [--window 2048]

``--streaming`` instead drains the docs directory epoch-by-epoch into
a corpus LakeTable + CDC-maintained dedup index under --out (resumable
via --checkpoint; each epoch is deduped against the accumulated corpus
through the index, cost ∝ the epoch):

    spark-submit ... jobs/corpus_job.py --docs-dir /data/incoming \
        --out /data/warehouse --streaming --checkpoint /data/ckpt \
        [--eval-parquet ...] [--fractions ...]
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
    ap.add_argument("--streaming", action="store_true",
                    help="incremental mode: drain --docs-dir into a corpus "
                    "LakeTable + dedup index under --out")
    ap.add_argument("--checkpoint", default=None,
                    help="streaming checkpoint dir (default <out>/ckpt)")
    args = ap.parse_args()

    from gene_etl_spark.pipeline import build_corpus
    from gene_etl_spark.session import get_spark

    spark = get_spark(app_name="corpus-build", cores=args.cores)
    eval_df = (
        spark.read.parquet(args.eval_parquet) if args.eval_parquet else None
    )
    if args.streaming:
        import pyspark.sql.types as T

        from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
        from gene_etl_spark.lake.table import LakeTable
        from gene_etl_spark.streaming.corpus import corpus_stream

        corpus_path = os.path.join(args.out, "documents")
        if LakeTable.exists(corpus_path):
            corpus = LakeTable.load(spark, corpus_path)
        else:
            corpus = LakeTable.create(
                spark,
                corpus_path,
                T.StructType(
                    [
                        T.StructField("doc_id", T.LongType(), False),
                        T.StructField("lang", T.StringType(), True),
                        T.StructField("text", T.StringType(), True),
                    ]
                ),
                key_cols=["doc_id"],
                num_buckets=16,
            )
        idx = CorpusDedupIndex(
            spark, os.path.join(args.out, "dedup_documents"), corpus
        )
        res = corpus_stream(
            spark,
            args.docs_dir,
            corpus,
            idx,
            args.checkpoint or os.path.join(args.out, "ckpt"),
            min_tokens=args.min_tokens,
            eval_set=eval_df,
            lang_fractions=(
                json.loads(args.fractions) if args.fractions else None
            ),
            default_fraction=args.default_fraction,
            seed=args.seed,
        )
        print(json.dumps(res))
        return
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
