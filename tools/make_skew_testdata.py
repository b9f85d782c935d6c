#!/usr/bin/env python3
"""Adversarially-skewed mirror of a testdata dir (driver-side tooling).

A third of all documents share ONE text (mass exact+near duplicates →
every dedup family collides into giant buckets, exercising the skew
guards' salted path); a third of all embeddings share ONE vector (the
semantic/LSH/ANN analog); a third of events share one user_id (hot-key
aggregation). Ids and the events timestamp type are preserved.

Usage: python3 tools/make_skew_testdata.py [srcDir] [dstDir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_skew"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def skew_events_arrow(src, dst):
    """pyarrow path (preserves the source ts type, ns or µs): user_id % 3
    == 0 rows all collapse onto user 0."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    t = pq.read_table(src)
    uid = t["user_id"].to_numpy()
    mask = pa.array((uid % 3) == 0)
    new = pc.if_else(mask, pa.scalar(0, t.schema.field("user_id").type),
                     t["user_id"].combine_chunks())
    t = t.set_column(t.schema.get_field_index("user_id"),
                     t.schema.field("user_id"), new)
    pq.write_table(t, dst)
    return t.num_rows


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{DST}/{t}.parquet"
        if t == "events":
            n = skew_events_arrow(src, dst)
            note = " (user_id%3 -> user 0)"
        elif t == "documents":
            con.execute(f"""
              COPY (
                SELECT d.doc_id,
                       CASE WHEN d.doc_id % 3 = 0 THEN h.text ELSE d.text
                       END AS text,
                       d.lang, d.source,
                       CASE WHEN d.doc_id % 3 = 0 THEN h.n_chars
                       ELSE d.n_chars END AS n_chars
                FROM read_parquet('{src}') d
                CROSS JOIN (SELECT text, n_chars FROM read_parquet('{src}')
                            WHERE doc_id = 0) h
              ) TO '{dst}' (FORMAT PARQUET)""")
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
            note = " (doc_id%3 -> doc 0's text)"
        elif t == "embeddings":
            con.execute(f"""
              COPY (
                SELECT e.vec_id,
                       CASE WHEN e.vec_id % 3 = 0 THEN h.embedding
                       ELSE e.embedding END AS embedding,
                       e.label
                FROM read_parquet('{src}') e
                CROSS JOIN (SELECT embedding FROM read_parquet('{src}')
                            WHERE vec_id = 1) h
              ) TO '{dst}' (FORMAT PARQUET)""")
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
            note = " (vec_id%3 -> vec 1's embedding)"
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
