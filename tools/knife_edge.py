#!/usr/bin/env python3
"""Knife-edge scanner: find ROUND'd aggregates sitting ON a rounding boundary.

The q48 failure class: an aggregate whose true value lands exactly on a
.xxxx5 boundary (e.g. 2975.92/64 = 46.49875) rounds differently across
engines/formulations, so a query can pass at one sf and silently diverge at
another when the fixture changes. This tool detects the hazard BEFORE it
bites: for every declared oracle query it strips each ROUND(expr[, n]) down
to the raw expr (paren-aware), re-runs the unrounded query in DuckDB at each
sf, and flags any double output within `TOL` of a half-way boundary at any
rounding scale the query uses.

Usage: python3 tools/knife_edge.py [verify_out] [sf_dir ...]
  verify_out: dir containing oracle_sql.json (default /tmp/verify_out)
  sf_dirs:    default all three /root/testdata/sf* fixtures

Exit code is 0 with warnings (advisory: a flagged edge means "this value
would diverge if the two engines disagreed on half-way rounding here" — the
dround() contract makes them agree; the scanner exists so a future fixture
or query change can't resurrect the class unnoticed).
"""
import json
import math
import re
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
TOL = 1e-8


def strip_rounds(sql):
    """Replace every ROUND(expr[, n]) with (expr); return (sql', scales)."""
    scales = set()
    out = sql
    while True:
        m = re.search(r"\bROUND\s*\(", out, re.IGNORECASE)
        if not m:
            break
        start = m.start()
        i = m.end()
        depth = 1
        top_comma = None
        while i < len(out) and depth:
            c = out[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_comma = i
            i += 1
        if depth:  # unbalanced — bail rather than mangle
            return sql, scales
        if top_comma is not None:
            inner = out[m.end():top_comma]
            ndigits = out[top_comma + 1:i - 1].strip()
            try:
                scales.add(int(ndigits))
            except ValueError:
                pass
        else:
            inner = out[m.end():i - 1]
            scales.add(0)  # single-arg ROUND: the *10^k/10^k dround idiom
        out = out[:start] + "(" + inner + ")" + out[i:]
    return out, scales


def frac_dist_to_half(x, scale):
    y = x * (10.0 ** scale)
    if not math.isfinite(y) or abs(y) > 2 ** 52:
        return 1.0
    f = y - math.floor(y)
    return abs(f - 0.5)


def scan(sf_dir, oracle):
    hits = []
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    for name, sql in sorted(oracle.items()):
        stripped, scales = strip_rounds(sql)
        if not scales:
            continue
        try:
            cur = con.execute(stripped)
        except Exception as e:
            hits.append((name, "?", f"unrounded twin failed: {e}"))
            continue
        cols = [d[0] for d in cur.description]
        for row in cur.fetchall():
            for col, v in zip(cols, row):
                if not isinstance(v, float) or not math.isfinite(v):
                    continue
                for s in scales:
                    d = frac_dist_to_half(v, s)
                    if d < TOL:
                        hits.append((name, col,
                                     f"value {v!r} is {d:.2e} from the .5 boundary at scale 1e-{s}"))
    return hits


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf_dirs = sys.argv[2:] or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    total = 0
    for sf in sf_dirs:
        hits = scan(sf, oracle)
        total += len(hits)
        print(f"== {sf}: {len(hits)} knife edge(s)")
        for name, col, msg in hits:
            print(f"  {name}.{col}: {msg}")
    print(f"\n{total} total — every hit is a value whose cross-engine agreement "
          "depends on identical half-way rounding (dround guarantees it today).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
