"""Self-check harness mimicking the driver's correctness gate:
run each queries() entry on Spark and its oracle_sql() on DuckDB over
the same parquet tables; compare row count, column names, and an
order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    d = df[cols]
    rows = sorted(
        ",".join(norm_cell(v) for v in row) for row in d.itertuples(index=False, name=None)
    )
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from gene_etl_spark.session import get_spark

    spark = get_spark(app_name="selfcheck", cores=8, shuffle_partitions=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:28s} spark error: {type(e).__name__}: {str(e)[:200]}")
            continue
        sn, scols, sh = frame_hash(spark_df)
        if name not in oracles:
            print(f"rows  {name:28s} rows={sn} (no oracle — rows-only) {time.time()-t0:5.1f}s")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:28s} duckdb error: {str(e)[:200]}")
            continue
        dn, dcols, dh = frame_hash(duck_df)
        ok = (sn == dn) and (scols == dcols) and (sh == dh)
        status = "OK  " if ok else "FAIL"
        print(f"{status}  {name:28s} rows={sn}/{dn} cols={'=' if scols==dcols else 'DIFF'} hash={'=' if sh==dh else 'DIFF'} {time.time()-t0:5.1f}s")
        if not ok:
            failures.append(name)
            if scols != dcols:
                print(f"      spark cols: {scols}\n      duck  cols: {dcols}")
            elif sn == dn:
                # show first differing row for debugging
                a = spark_df[sorted(spark_df.columns)].copy()
                b = duck_df[sorted(duck_df.columns)].copy()
                ra = sorted(",".join(norm_cell(v) for v in r) for r in a.itertuples(index=False, name=None))
                rb = sorted(",".join(norm_cell(v) for v in r) for r in b.itertuples(index=False, name=None))
                for x, y in zip(ra, rb):
                    if x != y:
                        print(f"      spark: {x[:220]}\n      duck : {y[:220]}")
                        break
    print("\n%d failures" % len(failures), sorted(failures) if failures else "")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
