#!/bin/sh
# Unicode-text oracle gate: full Spark-vs-DuckDB hash comparison on a
# mirror whose documents carry multi-byte text (CJK, accents, Greek,
# emoji, combining sequences). Catches engine disagreements on text
# primitives — byte- vs codepoint-based functions, UTF-8 hashing,
# string→blob conversions — that an ASCII corpus never exercises.
set -e
SRC=${1:-/root/testdata/sf0.001}
DIR=${2:-/tmp/graft_unicode}
OUT=${DIR}_out
cd "$(dirname "$0")/.."
python3 tools/make_unicode_testdata.py "$SRC" "$DIR"
sbt -batch "runMain graft.Verify $DIR $OUT" 2>&1 | grep -E '\[verify\]' && exit 1
python3 tools/selfcheck.py "$DIR" "$OUT" | tee /tmp/unicode_gate_report.txt
! grep -q 'PASS\*\|FAIL' /tmp/unicode_gate_report.txt
