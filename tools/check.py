#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Assumes `graft.Verify` was already run (sbt "runMain graft.Verify <sfdir>
<outdir>"). For each query: load the Spark parquet result, run the oracle
SQL from oracle_sql.json in DuckDB over the same tables, sort columns by
name and rows by all columns, compare values.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


# Cross-engine type classes. The driver's hash is dtype-sensitive:
# DuckDB typing an output column HUGEINT (uncast windowed/plain SUM over
# BIGINT) or DECIMAL (bare-literal arithmetic) flips the driver hash even
# when every stringified value matches — the 5-round x5 flake class.
# Int widths within INT64 are interchangeable; HUGEINT/DECIMAL are not.
def type_class(t):
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT"
    if t in ("FLOAT", "DOUBLE"):
        return "FLOAT"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if t.startswith("DECIMAL"):
        return "DECIMAL"          # poison: driver hash flips
    if t in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        return "HUGEINT"          # poison: driver hash flips
    return t                      # VARCHAR, BOOLEAN, DATE, LIST, ...


def canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            canon_row.append(v)
        out.append(tuple(str(x) for x in canon_row))
    return sorted(out)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        # testdata tables are single files; ScaleProbe's scaled corpus
        # lands each table as a DIRECTORY of part files — glob those so
        # the same oracle gate runs at probe scale (r17 verdict #3)
        path = f"{sfdir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Queries that threw inside Verify have no parquet dir; surface them
    # as explicit FAILs instead of letting them vanish from the report
    # (the round-8 failure mode).
    try:
        failures = json.load(open(f"{outdir}/_failures.json"))
    except Exception:
        failures = {}
    for name, err in sorted(failures.items()):
        print(f"FAIL {name}: verify threw: {err}")
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        if name in failures:
            continue  # already reported above
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
                f" FROM read_parquet('{outdir}/{name}/*.parquet')").fetchall()
            ora_rel = con.sql(sql)
            ora_cols = sorted(ora_rel.columns)
            ora_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in ora_cols) +
                f" FROM ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if spark_cols != ora_cols:
            print(f"FAIL {name}: schema {spark_cols} != {ora_cols}")
            n_fail += 1
            continue
        spark_types = dict(zip(spark_rel.columns,
                               [type_class(t) for t in spark_rel.types]))
        ora_types = dict(zip(ora_rel.columns,
                             [type_class(t) for t in ora_rel.types]))
        bad_types = [(c, spark_types[c], ora_types[c])
                     for c in spark_cols if spark_types[c] != ora_types[c]]
        if bad_types:
            print(f"FAIL {name}: dtype mismatch {bad_types} "
                  "(HUGEINT/DECIMAL oracle output flips the driver hash — "
                  "cast ::BIGINT / ::DOUBLE)")
            n_fail += 1
            continue
        a, b = canon(spark_rows), canon(ora_rows)
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} != {len(b)}")
            n_fail += 1
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[0]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} passed, {n_fail} failed ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
