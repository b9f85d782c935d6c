#!/bin/sh
# Null-robustness oracle gate: the full Spark-vs-DuckDB hash comparison,
# but on a null-injected mirror of the testdata (make_null_testdata.py
# nulls a deterministic slice of every nullable payload column). Catches
# (a) crashes on null values reaching kernels/model-state fetches, and
# (b) null-SEMANTICS divergence between a Spark query and its oracle SQL
# (null grouping, NULLS FIRST/LAST ordering, null-rejecting joins) that
# null-free data can never exercise. PASS* rows (order-only divergence)
# count as failures here: the driver's hash is order-sensitive.
set -e
SRC=${1:-/root/testdata/sf0.001}
DIR=${2:-/tmp/graft_nulls}
OUT=${DIR}_out
cd "$(dirname "$0")/.."
python3 tools/make_null_testdata.py "$SRC" "$DIR"
sbt -batch "runMain graft.Verify $DIR $OUT" 2>&1 | grep -E '\[verify\]' && exit 1
python3 tools/selfcheck.py "$DIR" "$OUT" | tee /tmp/null_gate_report.txt
! grep -q 'PASS\*\|FAIL' /tmp/null_gate_report.txt
