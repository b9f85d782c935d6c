#!/usr/bin/env python3
"""Long-document mirror of a testdata dir (driver-side tooling).

The synthetic corpus tops out around 100 words per document; a real
crawl has million-token outliers. This mirror inflates a deterministic
slice of documents (doc_id % 11 == 3) to 2000 + 3*doc_id words by
cycling the document's own words, and keeps n_chars consistent with the
new text. That exercises every per-document loop at a length the base
corpus never reaches: data-derived chunk-index bounds, sequence-packer
oversize handling, shingle/minhash kernels over thousands of tokens,
and the LM/bigram explodes — while the 3-words-per-doc_id spacing keeps
any two long documents more than 5 chars apart, so the edit-distance
query's ±5 blocking never pairs two inflated texts (levenshtein on two
10k-char strings would be a gate-runtime problem, not an engine
disagreement).

Usage: python3 tools/make_longdoc_testdata.py [srcDir] [dstDir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_longdoc"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def inflate(doc_id, text):
    words = text.split(" ")
    target = 2000 + 3 * int(doc_id)
    out = [words[i % len(words)] for i in range(target)]
    return " ".join(out)


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
            new = [inflate(i, x) if (x is not None and i % 11 == 3) else x
                   for i, x in zip(ids, texts)]
            tbl = tbl.set_column(tbl.schema.get_field_index("text"),
                                 tbl.schema.field("text"),
                                 pa.array(new, pa.string()))
            nchars = pa.array([len(x) if x is not None else None for x in new],
                              tbl.schema.field("n_chars").type)
            tbl = tbl.set_column(tbl.schema.get_field_index("n_chars"),
                                 tbl.schema.field("n_chars"), nchars)
            pq.write_table(tbl, dst)
            n = tbl.num_rows
            n_long = sum(1 for i, x in zip(ids, texts)
                         if x is not None and i % 11 == 3)
            note = f" ({n_long} docs inflated to 2000+3*doc_id words)"
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
