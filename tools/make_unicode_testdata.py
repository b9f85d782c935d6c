#!/usr/bin/env python3
"""Unicode-text mirror of a testdata dir (driver-side tooling).

The synthetic corpus is lowercase ASCII; real LLM-log/corpus text is
not. This mirror rewrites a deterministic slice of documents.text into
multi-byte unicode — CJK, accented latin, Greek, emoji (outside the
BMP), and a combining sequence — while preserving the single-space word
structure the queries tokenize on. Every engine-visible primitive the
queries rely on (UTF-8 md5 bytes, codepoint length, split-on-space,
list/array equality) must agree between Spark and DuckDB for the oracle
comparison to stay green.

Usage: python3 tools/make_unicode_testdata.py [srcDir] [dstDir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_unicode"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# deterministic per-word replacements: word i (by position) of a rewritten
# document maps to GLYPHS[i % len(GLYPHS)] + the original word
GLYPHS = ["中文", "héllo", "Ωμέγα", "🙂", "ñé", "クジラ", "ü̈",  # u + double diaeresis (combining)
          "한글"]


def rewrite(text):
    words = text.split(" ")
    return " ".join(GLYPHS[i % len(GLYPHS)] + w for i, w in enumerate(words))


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{DST}/{t}.parquet"
        if t == "documents":
            import pyarrow as pa
            import pyarrow.parquet as pq
            tbl = pq.read_table(src)
            ids = tbl["doc_id"].to_numpy()
            texts = tbl["text"].to_pylist()
            new = [rewrite(x) if (x is not None and i % 5 == 0) else x
                   for i, x in zip(ids, texts)]
            tbl = tbl.set_column(tbl.schema.get_field_index("text"),
                                 tbl.schema.field("text"),
                                 pa.array(new, pa.string()))
            pq.write_table(tbl, dst)
            n = tbl.num_rows
            note = " (doc_id%5 rewritten to unicode)"
        elif t == "events":
            # copy via pyarrow to preserve the source ts type (ns or µs)
            import pyarrow.parquet as pq
            tbl = pq.read_table(src)
            pq.write_table(tbl, dst)
            n = tbl.num_rows
            note = ""
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst}' (FORMAT PARQUET)")
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
            note = ""
        print(f"{t}: {n} rows{note}")


if __name__ == "__main__":
    main()
