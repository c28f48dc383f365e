"""Audit every gate in __spark_entry__.queries() for driver-hasher-risky
output columns: boolean dtypes and empty-string values. The r06/r07
`expectations` hash-fail was traced to a boolean column plus an ''
sentinel — representations that canonicalize differently across hashers
(True vs true vs 1; '' vs NULL). This tool makes the whole 152-gate
surface string/numeric-only by inspection.

Usage: python tools/audit_gate_types.py [sf_dir] [--values]
  schema pass always runs (cheap — no job execution);
  --values additionally executes each gate and scans string columns
  for '' (slow — runs every gate).
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
    check_values = "--values" in sys.argv

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .appName("audit_gate_types")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs = e.queries()
    bool_hits = []
    empty_hits = []
    errs = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as ex:  # noqa: BLE001
            errs.append((name, repr(ex)[:120]))
            continue
        bools = [c for c, t in df.dtypes if t == "boolean"]
        if bools:
            bool_hits.append((name, bools))
        if check_values:
            from pyspark.sql import functions as F

            strs = [c for c, t in df.dtypes if t == "string"]
            if strs:
                agg = df.agg(
                    *[
                        F.sum((F.col(c) == "").cast("int")).alias(c)
                        for c in strs
                    ]
                ).first()
                empties = [c for c in strs if (agg[c] or 0) > 0]
                if empties:
                    empty_hits.append((name, empties))
        print(f"  ok {name}", flush=True)
    print("\n=== BOOLEAN COLUMNS ===")
    for name, cols in bool_hits:
        print(f"  {name}: {cols}")
    if not bool_hits:
        print("  (none)")
    if check_values:
        print("=== EMPTY-STRING VALUES ===")
        for name, cols in empty_hits:
            print(f"  {name}: {cols}")
        if not empty_hits:
            print("  (none)")
    print("=== ERRORS ===")
    for name, ex in errs:
        print(f"  {name}: {ex}")
    if not errs:
        print("  (none)")


if __name__ == "__main__":
    main()
