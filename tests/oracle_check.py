"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() twin at sf0.01, compare row count + order-insensitive
values (columns sorted by name, floats rounded)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    only = sys.argv[1:] or None
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {exc}")
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL {name}: row count {len(a)} vs {len(b)}")
        elif a != b:
            failures.append(name)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        else:
            print(f"ok   {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
