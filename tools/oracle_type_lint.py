#!/usr/bin/env python3
"""Oracle-output TYPE lint: fail on twin output columns the driver's
pandas-based hasher mangles.

The driver hashes DuckDB results through pandas.  Column types outside
{BOOLEAN, INTEGER-family up to BIGINT, FLOAT/DOUBLE, VARCHAR, BLOB, DATE,
TIMESTAMP*} round-trip unfaithfully there:

  * HUGEINT / UHUGEINT  -> float64  (516259 renders "516259.0", hash flips)
  * DECIMAL(p,s)        -> float64 or object, scale-dependent
  * LIST / ARRAY / STRUCT / MAP -> ndarray/objects (r7: pandas crash on x45/x46)

DuckDB types an uncast SUM(BIGINT) as HUGEINT, so every aggregate twin must
CAST its sums — this lint is the guard rail (r8: x48/x51/x55 shipped red for
a round because nothing checked output types).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/lint_out __none__"
  python3 tools/oracle_type_lint.py /root/testdata/sf0.001 /tmp/lint_out/oracle_sql.json

Binding only (duckdb relation .types) — no query executes, so this is
seconds even with 175 twins.  Exit 1 on any hit.
"""
import json
import re
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lint_out/oracle_sql.json"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Prefix match over str(DuckDBPyType); everything else is hasher-safe.
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "LIST", "ARRAY", "STRUCT", "MAP",
          "UNION", "BIT", "INTERVAL", "UINT64", "UBIGINT")


def main():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.load(open(ORACLE))
    # Staleness gate (r9 verdict: the lint ran against a round-old dump and
    # silently type-checked only 175 of 205 twins).  The dump must carry
    # exactly the oracleSql registry of the CURRENT SparkEntry.scala — count
    # twinned keys the same way inventory_lint does and hard-fail on drift.
    entry = open("src/main/scala/graft/SparkEntry.scala", encoding="utf-8").read()
    counts = {}
    for k in re.findall(r'"((?:x|q)\d+[a-z0-9_]*)"\s*->', entry):
        counts[k] = counts.get(k, 0) + 1
    registry = {k for k, c in counts.items() if c >= 2}
    if set(oracle) != registry:
        stale = sorted(set(oracle) - registry)
        missing = sorted(registry - set(oracle))
        print(f"STALE-DUMP: oracle_sql.json has {len(oracle)} twins, "
              f"SparkEntry has {len(registry)} — re-dump via graft.Verify "
              f"(tools/lint.sh does this). "
              f"stale={stale[:5]}{'…' if len(stale) > 5 else ''} "
              f"missing={missing[:5]}{'…' if len(missing) > 5 else ''}")
        sys.exit(1)
    bad = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            cols, types = rel.columns, [str(t).upper() for t in rel.types]
        except Exception as e:  # binding error is its own finding
            print(f"BIND-FAIL {name}: {e}")
            bad += 1
            continue
        hits = [(c, t) for c, t in zip(cols, types)
                if any(t.startswith(b) for b in BANNED)]
        if hits:
            bad += 1
            print(f"TYPE-FAIL {name}: " + ", ".join(f"{c}:{t}" for c, t in hits))
    print(f"{'FAIL' if bad else 'OK'}: {bad} of {len(oracle)} twins emit "
          "hasher-unsafe output types")
    sys.exit(1 if bad else 0)


main()
