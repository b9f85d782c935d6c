#!/usr/bin/env python3
"""Null-injected mirror of a testdata dir (driver-side tooling only).

Copies every table, then NULLs a deterministic slice of the nullable
"payload" columns (documents.text/lang, events.props/value/event_type,
embeddings.embedding/label, customer/supplier comment-ish strings).
Key/id columns stay intact — the gate is about value-column null
semantics, not referential integrity.

Usage: python3 tools/make_null_testdata.py [srcDir] [dstDir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_nulls"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# per-table: {column: modulus} — row is NULLed when id % modulus == 0
RULES = {
    "documents": {"text": ("doc_id", 17), "lang": ("doc_id", 13),
                  "source": ("doc_id", 11)},
    "events": {"props": ("event_id", 17), "value": ("event_id", 13),
               "event_type": ("event_id", 19)},
    "embeddings": {"embedding": ("vec_id", 17), "label": ("vec_id", 13)},
    "customer": {"c_comment": ("c_custkey", 17)},
    "supplier": {"s_comment": ("s_suppkey", 17)},
}


def null_inject_arrow(src, dst, rules):
    """pyarrow path: preserves the physical schema exactly — events.ts has
    shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS); the mirror must
    carry whichever the source has (DuckDB rewriting would coerce it)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    t = pq.read_table(src)
    for c, (key, mod) in rules.items():
        ids = t[key].to_numpy()
        mask = pa.array((ids % mod) == 0)
        arr = t[c].combine_chunks()
        new = pc.if_else(mask, pa.nulls(len(t), arr.type), arr)
        t = t.set_column(t.schema.get_field_index(c), t.schema.field(c), new)
    pq.write_table(t, dst)
    return t.num_rows


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        rules = RULES.get(t, {})
        if t == "events":
            n = null_inject_arrow(src, f"{DST}/{t}.parquet", rules)
        else:
            cols = [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
            sel = []
            for c in cols:
                if c in rules:
                    key, mod = rules[c]
                    sel.append(f"CASE WHEN {key} % {mod} = 0 "
                               f"THEN NULL ELSE {c} END AS {c}")
                else:
                    sel.append(c)
            con.execute(
                f"COPY (SELECT {', '.join(sel)} FROM read_parquet('{src}')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
            ).fetchone()[0]
        print(f"{t}: {n} rows -> {DST}/{t}.parquet"
              + (f" (nulled: {', '.join(rules)})" if rules else ""))


if __name__ == "__main__":
    main()
