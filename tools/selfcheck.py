#!/usr/bin/env python3
"""Self-check harness mirroring the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<query>/ parquet dirs plus <outDir>/oracle_sql.json. Runs each
oracle SQL in DuckDB against the raw testdata tables and compares with the
Spark result: column names (sorted), row count, and values (exact, both in
result order and as a sorted multiset).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

    con = duckdb.connect()
    for t in TABLES:
        # driver legs ship one file per table; engine-synthesized legs
        # (tools/Synth) write Spark-style directories — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    # Merge the failure manifest: a query that threw inside Verify must
    # appear as an explicit FAIL row here even though its output dir now
    # holds only the one-row _graft_error marker (or nothing at all).
    try:
        with open(f"{out_dir}/_failures.json") as f:
            failures = json.load(f)
    except FileNotFoundError:
        failures = {}

    n_pass = n_fail = 0
    for name, err in sorted(failures.items()):
        print(f"FAIL {name}: verify-side error: {err}")
        n_fail += 1
    for name, sql in sorted(oracles.items()):
        if name in failures:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue

        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns differ spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        g = got[gcols]
        w = want[wcols]
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            n_fail += 1
            continue
        grows = [tuple(norm(v) for v in r) for r in g.itertuples(index=False)]
        wrows = [tuple(norm(v) for v in r) for r in w.itertuples(index=False)]
        if grows == wrows:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif sorted(grows) == sorted(wrows):
            print(f"PASS* {name} ({len(g)} rows; ORDER DIFFERS — fix the ORDER BY)")
            n_pass += 1
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(grows, wrows)) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(g)} rows differ; first: "
                  f"row {diffs[0][0]} spark={diffs[0][1]} oracle={diffs[0][2]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail "
          f"({len(oracles)} oracle queries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
