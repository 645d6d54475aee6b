"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where present, its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, sorted column names, dtypes and an order-insensitive
canonicalized value multiset.  Usage:

    PYTHONPATH=/root/repo python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize a value for order-insensitive comparison."""
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from beehive_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sorted(sdf.columns)
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            duck_cols_raw = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        duck_cols = sorted(duck_cols_raw)
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if spark_cols != duck_cols:
            problems.append(f"cols spark={spark_cols} duck={duck_cols}")
        if not problems:
            sset = sorted(
                tuple(canon(row[c]) for c in spark_cols) for row in spark_rows
            )
            didx = [duck_cols_raw.index(c) for c in duck_cols]
            dset = sorted(
                tuple(canon(row[i]) for i in didx) for row in duck_rows
            )
            if sset != dset:
                n_bad = sum(1 for a, b in zip(sset, dset) if a != b)
                problems.append(f"values differ ({n_bad} rows); first diff:")
                for a, b in zip(sset, dset):
                    if a != b:
                        problems.append(f"  spark={a}")
                        problems.append(f"  duck ={b}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
        else:
            print(f"ok   {name}: {len(spark_rows)} rows match "
                  f"({time.time()-t0:.1f}s)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
