"""Round-7 optimization harness (NOT the driver contract — bench.py is).

Per spark_optimization_guide.md §1: times each headline query in
isolation through the noop sink with repeats (so one-off cache/plan
effects are visible), labels jobs, and captures .explain("formatted")
into plans/r07/ for before/after plan diffs.

Usage:
    python bench_extra.py [--repeats 3] [--plans before|after|none]
                          [--queries q1,q2,...] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, materialize  # noqa: E402  (frozen driver list)

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", choices=["before", "after", "none"], default="none")
    ap.add_argument("--queries", default=None, help="comma list; default: bench HEADLINE")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from gene_etl_spark.queries import all_queries
    from gene_etl_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=cores, shuffle_partitions=cores)
    queries, _ = all_queries()
    names = args.queries.split(",") if args.queries else [q for q in HEADLINE]

    if not args.no_warmup:
        # same battery-lifetime warmup as bench.py
        materialize(queries["semijoin"](spark, sf_dir))
        materialize(queries["pairwise_corr"](spark, sf_dir))
        materialize(queries["dedup_minhash_lsh"](spark, sf_dir))

    if args.plans != "none":
        os.makedirs(PLANS_DIR, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        df = fn(spark, sf_dir)
        if args.plans != "none":
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for i in range(args.repeats):
            # re-invoke the query fn each repeat: memo caches behave as in
            # the real battery, and plan construction cost is included once
            df_i = df if i == 0 else fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name} [r{i}]")
            t0 = time.time()
            materialize(df_i)
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"runs": runs, "min": min(runs)}
        print(f"{name:26s} {runs}", flush=True)

    total_min = round(sum(v["min"] for v in out.values()), 3)
    print(json.dumps({"sum_of_min": total_min, "sf_dir": sf_dir}))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
