package graft.ops

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping windows with provenance; clamped tail; empty docs " +
    "dropped") {
    val docs = Seq(
      (1L, (1 to 35).map(i => s"w$i").mkString(" ")), // 3 chunks
      (2L, (1 to 15).map(i => s"w$i").mkString(" ")), // exactly one stride
      (3L, "solo"),
      (4L, "")) // empty text -> split yields one empty token... see below
      .toDF("doc_id", "text")
    val out = Chunker.chunk(docs, "text", chunkWords = 20, stride = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).sortBy(t => (t._1, t._2))

    val d1 = out.filter(_._1 == 1L)
    assert(d1.length === 3) // starts 0, 15, 30 (35 words, ceil(35/15)=3)
    assert(d1(0)._3.startsWith("w1 w2") && d1(0)._4 === 20L)
    assert(d1(1)._3.startsWith("w16 ") && d1(1)._4 === 20L)
    // overlap: chunk 1 ends at w35, chunk 0 covers w1..w20, chunk 1
    // covers w16..w35 — 5 shared words
    assert(d1(1)._3.endsWith("w35"))
    assert(d1(2)._3 === (31 to 35).map(i => s"w$i").mkString(" "))
    assert(d1(2)._4 === 5L) // clamped tail

    assert(out.filter(_._1 == 2L).map(t => (t._2, t._4)).toSeq
      === Seq((0L, 15L))) // n == stride: exactly one chunk, no empty tail
    assert(out.filter(_._1 == 3L).map(_._3).toSeq === Seq("solo"))
    // split("", " ") is [""], size 1 -> one chunk of the empty token;
    // callers filter empty docs upstream (q_chunk_docs relies on the
    // corpus contract of non-empty text)
    assert(out.filter(_._1 == 4L).length === 1)
  }

  test("chunks join back to their source (provenance edge survives)") {
    val docs = Seq((7L, "en", (1 to 40).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val chunks = Chunker.chunk(docs, "text")
    val joined = chunks.join(docs.select("doc_id", "lang"), Seq("doc_id"))
    assert(joined.count() === chunks.count())
    assert(chunks.columns.toSeq ===
      Seq("doc_id", "lang", "chunk_idx", "chunk", "n_words"))
  }

  test("invalid parameters are refused") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, "text", chunkWords = 10, stride = 11)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, "text", chunkWords = 10, stride = 0)
    }
  }
}
