#!/usr/bin/env bash
# Round lint wrapper — the one entry point (README checklist).  Re-dumps the
# oracle registry FRESH via graft.Verify before type-linting, so the lint can
# never run against a stale twin set (r9: a round-old dump silently checked
# only 175 of 205 twins); oracle_type_lint.py additionally hard-fails if the
# dump's key set differs from SparkEntry's.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
OUT=/tmp/lint_out
rm -rf "$OUT"

python3 tools/inventory_lint.py

# __none__ skips query execution: Verify only dumps oracle_sql.json.
sbt --client "runMain graft.Verify $SF_DIR $OUT __none__" \
  || sbt "runMain graft.Verify $SF_DIR $OUT __none__"

python3 tools/oracle_type_lint.py "$SF_DIR" "$OUT/oracle_sql.json"
echo "lint.sh: all green"
