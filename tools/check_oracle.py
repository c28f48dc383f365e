#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the same
sf, compare row count, column names/types, and an order-insensitive value
multiset (doubles compared after the queries' own rounding).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and represent with enough digits
        if v == 0:
            return "0"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return repr(v)


def frame_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        s_cols, s_ms = frame_to_multiset(scols, srows)
        o_cols, o_ms = frame_to_multiset(ocols, orows)
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} != {len(orows)}")
        if s_cols != o_cols:
            status.append(f"columns {s_cols} != {o_cols}")
        if not status and s_ms != o_ms:
            ndiff = sum(1 for a, b in zip(s_ms, o_ms) if a != b)
            example = next((a, b) for a, b in zip(s_ms, o_ms) if a != b)
            status.append(f"values differ in {ndiff}/{len(s_ms)} rows, e.g.\n"
                          f"    spark:  {example[0][:200]}\n"
                          f"    duckdb: {example[1][:200]}")
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
