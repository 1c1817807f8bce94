#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py [sf_dir] [verify_out]

Reads each Spark result parquet under verify_out/<name>/, runs the DuckDB
twin from verify_out/oracle_sql.json over the same sf_dir tables, sorts
columns by name, canonicalizes values, and diffs. Mirrors (as closely as we
can infer) the driver's row/schema/hash compare.
"""
import json, math, sys, glob

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # strict: both sides pre-ROUND their aggregates, so the doubles must
        # be identical to full precision for the driver's hash to match
        return "%.12g" % v
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    return [cols[i] for i in order], [tuple(canon(r[i]) for i in order) for r in data]


def main():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    names = sorted(glob.glob(f"{OUT}/*/"))
    n_pass = n_fail = n_rowsonly = 0
    for path in names:
        name = path.rstrip("/").split("/")[-1]
        if ONLY and name not in ONLY:
            continue
        try:
            spark_cols, spark_rows = rows_of(
                con.execute(f"SELECT * FROM read_parquet('{path}*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS {name}: no oracle, rows={len(spark_rows)}")
            n_rowsonly += 1
            continue
        try:
            ora_cols, ora_rows = rows_of(con.execute(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if spark_cols != ora_cols:
            print(f"FAIL {name}: schema {spark_cols} vs {ora_cols}")
            n_fail += 1
            continue
        if spark_rows == ora_rows:
            print(f"PASS {name}: rows={len(spark_rows)}")
            n_pass += 1
        else:
            n_fail += 1
            if len(spark_rows) != len(ora_rows):
                print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(ora_rows)}")
            else:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(spark_rows, ora_rows)) if a != b]
                print(f"FAIL {name}: {len(diffs)} differing rows of {len(spark_rows)}; first 3:")
                for i, a, b in diffs[:3]:
                    print(f"  row {i}: spark={a}\n            ora={b}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
