"""Dev harness: emulate the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, sorted column names,
and the full sorted multiset of row values (exact equality after a portable
canonicalization). Usage::

    python scripts/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if v is None:
        return ("none",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (int,)):
        return ("i", int(v))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon(x) for x in v))
    return ("s", str(v))


def rows_key(df_rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in df_rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("oracle-compare")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):6d}  (rows-only, no oracle)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchall()
            dcols = [d[0] for d in con.description]
        except Exception as exc:
            print(f"{name:28s} ORACLE SQL ERROR: {exc}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(ddf)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_vals = False
        if ok_count and ok_cols:
            sk = rows_key([tuple(r) for r in srows], scols)
            dk = rows_key(ddf, dcols)
            ok_vals = sk == dk
            if not ok_vals:
                diffs = [
                    (a, b) for a, b in zip(sk, dk) if a != b
                ][:3]
                print(f"{name:28s} VALUE MISMATCH ({len(diffs)}+ rows differ)")
                for a, b in diffs:
                    print(f"   spark: {a}")
                    print(f"   duck : {b}")
        status = "OK" if (ok_count and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
            if not ok_count:
                print(f"{name:28s} ROWCOUNT spark={len(srows)} duck={len(ddf)}")
            if not ok_cols:
                print(f"{name:28s} COLS spark={sorted(scols)} duck={sorted(dcols)}")
        print(f"{name:28s} rows={len(srows):6d}  {status}")

    spark.stop()
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
