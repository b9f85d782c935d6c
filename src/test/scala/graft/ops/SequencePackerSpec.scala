package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Packing semantics pinned on hand-built streams: boundary assignment,
  * oversized docs, partial final sequences, stream independence.
  */
class SequencePackerSpec extends SparkSpec {
  import spark.implicits._

  private def packed(rows: Seq[(String, Long, Long)]) =
    SequencePacker.pack(
        rows.toDF("stream", "doc_id", "tokens"),
        "tokens", budget = 10, Seq("stream"), Seq("doc_id"))
      .orderBy("stream", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(r.fieldIndex("seq_idx")),
        r.getLong(r.fieldIndex("seq_offset"))))

  test("docs fill sequences contiguously; a doc starting at the boundary " +
    "opens the next sequence") {
    val out = packed(Seq(
      ("a", 1L, 4L), ("a", 2L, 6L), // exactly fills seq 0
      ("a", 3L, 3L),                // starts seq 1 at offset 0
      ("a", 4L, 9L)))               // tokens_before=13 -> seq 1, offset 3
    assert(out === Seq(
      ("a", 1L, 0L, 0L), ("a", 2L, 0L, 4L),
      ("a", 3L, 1L, 0L), ("a", 4L, 1L, 3L)))
  }

  test("a doc longer than the budget stays whole in its starting " +
    "sequence; the successor's index skips past it") {
    val out = packed(Seq(
      ("a", 1L, 25L),  // seq 0, overflows into 1 and 2
      ("a", 2L, 2L)))  // tokens_before=25 -> seq 2, offset 5
    assert(out === Seq(("a", 1L, 0L, 0L), ("a", 2L, 2L, 5L)))
  }

  test("streams pack independently and stats report fills") {
    val df = Seq(
      ("a", 1L, 7L), ("a", 2L, 7L),  // seq0: doc1 (7), doc2 starts seq0@7?
      ("b", 9L, 10L))
      .toDF("stream", "doc_id", "tokens")
    val p = SequencePacker.pack(df, "tokens", 10, Seq("stream"), Seq("doc_id"))
    val stats = SequencePacker
      .sequenceStats(p, "tokens", 10, Seq("stream"))
      .orderBy("stream", "seq_idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(r.fieldIndex("fill_ratio"))))
    // stream a: doc1 seq0 (7 tokens), doc2 tokens_before=7 -> seq0 too
    // (starts inside seq0's remaining 3), total 14 tokens -> ratio capped 1.0
    // stream b: one exact-fill sequence
    assert(stats === Seq(
      ("a", 0L, 2L, 14L, 1.0),
      ("b", 0L, 1L, 10L, 1.0)))
  }

  test("budget must be positive") {
    val df = Seq(("a", 1L, 1L)).toDF("stream", "doc_id", "tokens")
    intercept[IllegalArgumentException] {
      SequencePacker.pack(df, "tokens", 0, Seq("stream"), Seq("doc_id"))
    }
  }
}
