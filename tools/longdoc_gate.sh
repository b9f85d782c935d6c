#!/bin/sh
# Long-document oracle gate: full Spark-vs-DuckDB hash comparison on a
# mirror where a deterministic slice of documents is inflated to
# thousands of words. Catches per-document loops and harness bounds that
# only break past the base corpus's ~100-word ceiling — fixed chunk-index
# caps, packer oversize paths, kernel buffers over long token arrays.
set -e
SRC=${1:-/root/testdata/sf0.001}
DIR=${2:-/tmp/graft_longdoc}
OUT=${DIR}_out
cd "$(dirname "$0")/.."
python3 tools/make_longdoc_testdata.py "$SRC" "$DIR"
sbt -batch "runMain graft.Verify $DIR $OUT" 2>&1 | grep -E '\[verify\]' && exit 1
python3 tools/selfcheck.py "$DIR" "$OUT" | tee /tmp/longdoc_gate_report.txt
! grep -q 'PASS\*\|FAIL' /tmp/longdoc_gate_report.txt
