#!/bin/sh
# Adversarial-skew oracle gate: the full Spark-vs-DuckDB hash comparison
# on a heavily duplicated mirror (1/3 of documents share one text, 1/3 of
# embeddings share one vector, 1/3 of events share one user). Proves the
# dedup/ANN skew guards (salting, pair bounds, bucket caps) are
# BIT-TRANSPARENT under real mass collision — answers must still match
# the oracle exactly, not just complete.
set -e
SRC=${1:-/root/testdata/sf0.001}
DIR=${2:-/tmp/graft_skew}
OUT=${DIR}_out
cd "$(dirname "$0")/.."
python3 tools/make_skew_testdata.py "$SRC" "$DIR"
sbt -batch "runMain graft.Verify $DIR $OUT" 2>&1 | grep -E '\[verify\]' && exit 1
python3 tools/selfcheck.py "$DIR" "$OUT" | tee /tmp/skew_gate_report.txt
! grep -q 'PASS\*\|FAIL' /tmp/skew_gate_report.txt
