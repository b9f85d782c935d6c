package graft.queries

import org.apache.spark.sql.functions._

/** Subword tokenization ([[graft.ops.SubwordTokenizer]]): frequency-based
  * vocabulary induction + greedy longest-match encode, oracle-replayed in
  * full — DuckDB retrains the vocabulary (same total order) and re-walks
  * every word with a recursive CTE whose match ladder is textually the
  * kernel's rule, then fingerprints the complete subword sequence. A
  * hash-match therefore proves every token of every document identical.
  */
object TokenizeQuery {

  private val k = 48

  val tokenize = Q(
    "q_tokenize_subword",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val vocab = graft.ops.SubwordTokenizer.trainVocab(docs, "text", k)
      graft.ops.SubwordTokenizer
        .tokenize(docs.filter(col("text").isNotNull), "text", vocab)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          size(col("toks")).cast("long").as("n_subwords"),
          expr("md5num(concat_ws('|', toks))").as("tok_fp"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE
            w AS (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents WHERE text IS NOT NULL),
            words AS (
              SELECT doc_id, widx, ws[widx] AS word
              FROM (SELECT doc_id, ws,
                           unnest(generate_series(1, len(ws))) AS widx
                    FROM w)),
            allw AS (SELECT word FROM words WHERE len(word) > 0),
            grams AS (
              SELECT unnest(flatten(
                [[substr(word, i, n)
                  for i in generate_series(1, len(word) - n + 1)]
                 for n in generate_series(2, 4)])) AS g
              FROM allw),
            topg AS (
              SELECT g FROM (SELECT g, COUNT(*) AS c FROM grams GROUP BY g)
              ORDER BY c DESC, g LIMIT $k),
            singles AS (
              SELECT DISTINCT substr(word, i, 1) AS g
              FROM (SELECT word, unnest(generate_series(1, len(word))) AS i
                    FROM allw)),
            vl AS (SELECT list_distinct(list(g)) AS vlist
                   FROM (SELECT g FROM singles UNION SELECT g FROM topg)),
            rec AS (
              SELECT doc_id, widx, word, vlist,
                     1 AS pos, 0 AS step, NULL::VARCHAR AS tok
              FROM words CROSS JOIN vl WHERE len(word) > 0
              UNION ALL
              SELECT doc_id, widx, word, vlist,
                     pos + len(tok2) AS pos, step + 1, tok2 AS tok
              FROM (
                SELECT doc_id, widx, word, vlist, pos, step,
                       COALESCE(
                         CASE WHEN list_contains(vlist, substr(word, pos, 4))
                              THEN substr(word, pos, 4) END,
                         CASE WHEN list_contains(vlist, substr(word, pos, 3))
                              THEN substr(word, pos, 3) END,
                         CASE WHEN list_contains(vlist, substr(word, pos, 2))
                              THEN substr(word, pos, 2) END,
                         substr(word, pos, 1)) AS tok2
                FROM rec WHERE pos <= len(word))),
            agg AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_subwords,
                     string_agg(tok, '|' ORDER BY widx, step) AS s
              FROM rec WHERE tok IS NOT NULL GROUP BY doc_id)
            SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
                   COALESCE(a.n_subwords, 0) AS n_subwords,
                   ('0x' || substr(md5(COALESCE(a.s, '')), 1, 15))::BIGINT
                     AS tok_fp
            FROM w LEFT JOIN agg a ON w.doc_id = a.doc_id
            ORDER BY w.doc_id"""),
    bench = true)

  val all: Seq[Q] = Seq(tokenize)
}
