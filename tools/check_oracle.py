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

    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
    records = {}
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
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark {type(e).__name__}: {e}"[:300],
            }
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            records[name] = {
                "rows_match": True, "schema_match": None,
                "hash_match": None, "spark_rows": len(srows),
                "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"duckdb {type(e).__name__}: {e}"[:300],
            }
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
        records[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": s_cols == o_cols,
            "hash_match": not status and s_ms == o_ms,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": "; ".join(s[:200] for s in status) or None,
        }
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    print()
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {len(records)} records to {json_path}")
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
