package graft.queries

import org.apache.spark.sql.functions._

/** JSONL source/sink interop — the lingua franca of training-data
  * exchange (every public corpus drop and eval harness speaks it).
  *
  * The corpus is written as JSON Lines and read back with an EXPLICIT
  * schema (production JSONL readers never pay the inference scan — at
  * 100 TB, schema inference is a full extra pass). The oracle then
  * aggregates the ORIGINAL parquet table: equality proves the round-trip
  * byte-exact, with the text leg pinned by a content-hash sum — JSON
  * string escaping (quotes, backslashes, control chars, non-ASCII — the
  * unicode gate runs this query over hostile text) must reproduce the
  * exact bytes or the md5-sum diverges.
  *
  * Scale shape: both directions are embarrassingly parallel (per-file
  * write, per-file read, no shuffle until the final small groupBy);
  * JSONL's only scale cost vs parquet is the ~3× byte inflation and
  * the absence of column pruning, which is why it is an EXCHANGE format
  * here, not a storage format.
  */
object JsonlQuery {

  import TextQueries.duckMd5num

  val roundtrip = Q(
    "q_jsonl_roundtrip",
    (s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft_jsonl").toString
      val docs = tbl(s, dir, "documents")
      docs.write.mode("overwrite").json(s"$base/docs.jsonl")
      val back = s.read.schema(docs.schema).json(s"$base/docs.jsonl")
      // hashes are 60-bit: sum them mod a prime so the checksum stays in
      // long range at any corpus size (ANSI mode overflows otherwise)
      back.groupBy(col("lang"))
        .agg(cnt("n_docs"), sum(col("n_chars")).as("chars_sum"),
          sum(expr("md5num(text) % 1000003")).as("text_hash_sum"),
          sum(expr("md5num(source) % 1000003")).as("source_hash_sum"))
        .orderBy("lang")
    },
    Some(s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
                   CAST(SUM(${duckMd5num("text")} % 1000003) AS BIGINT)
                     AS text_hash_sum,
                   CAST(SUM(${duckMd5num("source")} % 1000003) AS BIGINT)
                     AS source_hash_sum
            FROM documents GROUP BY lang ORDER BY lang NULLS FIRST"""))

  val all: Seq[Q] = Seq(roundtrip)
}
