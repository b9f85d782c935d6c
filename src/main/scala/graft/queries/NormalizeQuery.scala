package graft.queries

import org.apache.spark.sql.functions._

import TextQueries.duckMd5num

/** Canonicalization-aware exact dedup over documents: text is first
  * canonicalized by the native `norm_text` kernel (Unicode NFC +
  * ASCII-lower + ASCII-whitespace collapse — the standard pre-dedup
  * cleanup, so decomposed accents or stray whitespace can't defeat
  * hash-exact dedup), then grouped by the canonical hash with the usual
  * min-id keeper rule. The oracle recomputes the SAME canonicalization
  * with DuckDB built-ins (`nfc_normalize` ∘ `translate` ∘
  * `regexp_replace` ∘ `trim`) and compares the canonical STRINGS
  * byte-for-byte — a hash match proves the JDK's and utf8proc's NFC
  * agree on every document (the unicode gate mirror feeds this
  * combining marks, fullwidth forms, and multi-script text).
  */
object NormalizeQuery {

  private val az = ('a' to 'z').mkString
  private val AZ = ('A' to 'Z').mkString

  val normalizeText = Q(
    "q_normalize_text",
    (s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          expr("norm_text(text)").as("canon"))
        .withColumn("h", expr("md5num(canon)"))
      val firsts = d.groupBy("h").agg(min("doc_id").as("m"))
      d.join(firsts, Seq("h"))
        .select(col("doc_id"), col("canon"),
          (col("canon") =!= col("text")).as("changed"),
          when(col("m") < col("doc_id"), col("m")).as("canon_dup_of"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (
              SELECT doc_id, text,
                     trim(regexp_replace(
                       translate(nfc_normalize(text), '$AZ', '$az'),
                       '[ \\t\\n\\r\\f]+', ' ', 'g'), ' ') AS canon
              FROM documents WHERE text IS NOT NULL),
            hh AS (
              SELECT doc_id, text, canon, ${duckMd5num("canon")} AS h
              FROM d),
            f AS (SELECT h, MIN(doc_id) AS m FROM hh GROUP BY h)
            SELECT doc_id, canon, canon <> text AS changed,
                   CASE WHEN m < doc_id THEN m END AS canon_dup_of
            FROM hh JOIN f USING (h)
            ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(normalizeText)
}
