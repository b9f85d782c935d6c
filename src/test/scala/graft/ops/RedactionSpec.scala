package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): (String, Seq[Long]) = {
    val (clean, counts) = Redaction.scrubWithCounts(col("raw"))
    val row = Seq(s).toDF("raw")
      .select(clean.as("redacted") +: counts: _*).collect().head
    (row.getString(0), (1 to 4).map(row.getLong(_)))
  }

  test("each rule redacts its shape; surrounding text is untouched") {
    val (r, n) = redact(
      "mail bob.smith+x@corp.example.com or https://a.example.net/p?q=1 " +
        "host 192.168.0.1 call 415-555-0199 done")
    assert(r === "mail <EMAIL> or <URL> host <IP> call <PHONE> done")
    assert(n === Seq(1L, 1L, 1L, 1L))
  }

  test("ordering contract: an IP inside a URL is one URL hit, not a " +
    "phantom IP; dotted hosts in emails are not URLs") {
    val (r, n) = redact("see http://10.0.0.7/admin and write a@b.co now")
    assert(r === "see <URL> and write <EMAIL> now")
    assert(n === Seq(1L, 1L, 0L, 0L))
  }

  test("multiple hits per rule are all replaced and counted") {
    val (r, n) = redact("x@y.io a@b.co 1.2.3.4 5.6.7.8 111-222-3333")
    assert(r === "<EMAIL> <EMAIL> <IP> <IP> <PHONE>")
    assert(n === Seq(2L, 0L, 2L, 1L))
  }

  test("clean text passes through byte-identical with zero counters") {
    val (r, n) = redact("nothing sensitive here 42 times")
    assert(r === "nothing sensitive here 42 times")
    assert(n === Seq(0L, 0L, 0L, 0L))
  }
}
