package graft.retrieve

import java.nio.file.Files

import graft.SparkSpec

class RetrieverSpec extends SparkSpec {

  private def ckpt() =
    new CheckpointStore(spark, Files.createTempDirectory("ckpt").toString)

  test("retry policy: classified backoff (background_retrieval.py:161-248)") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val p = RetryPolicy(maxRetries = 3, sleep = sleeps += _, jitter = () => 0.5)

    // timeouts: exponential 2^attempt seconds, success on 3rd try
    var n = 0
    val r = p.run { () =>
      n += 1
      if (n < 3) throw new TimeoutException("t/o") else "ok"
    }
    assert(r === Right("ok"))
    assert(sleeps.toSeq === Seq(2000L, 4000L))

    // rate limit: jittered, capped
    sleeps.clear()
    var m = 0
    p.run { () =>
      m += 1
      if (m < 2) throw new RateLimitException("429") else "ok"
    }
    assert(sleeps.toSeq === Seq((2000 * 1.05).toLong))

    // client errors never retry
    var k = 0
    val bad = p.run { () => k += 1; throw new ClientException(404, "nope") }
    assert(bad.isLeft && k === 1)

    // exhausted retries → Left
    val dead = p.run[String] { () => throw new ServerException(500, "down") }
    assert(dead.left.exists(_.contains("ServerException")))
  }

  test("checkpoint resume: processed ids are skipped via anti-join " +
    "(test_background_retrieval.py:152-180)") {
    import spark.implicits._
    val store = ckpt()
    store.append(Seq(("resp-1", true, ""), ("resp-3", true, "")))

    val calls = spark.sparkContext.collectionAccumulator[String]("calls")
    val client = new ResponseClient {
      def retrieve(id: String): String = { calls.add(id); s"body-$id" }
    }
    val input = Seq(("resp-1", "c1"), ("resp-2", "c2"), ("resp-3", "c3"),
      ("resp-4", "c4")).toDF("response_id", "custom_id")
    val output = Retriever.retrieve(spark, input, client, store,
      RetryPolicy(sleep = _ => ()))
    val out = output.results.collect()

    assert(out.length === 4)
    val byId = out.map(r => r.getString(0) -> r.getString(2)).toMap
    assert(byId("resp-1") === "already_processed")
    assert(byId("resp-3") === "already_processed")
    assert(byId("resp-2") === "completed")
    assert(calls.value.size() === 2) // only unprocessed ids hit the API

    // A10: synthetic events logged per attempt, skipped rows log nothing
    val events = output.events.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("run_id")))
    assert(events.count(_._1 == "background_retrieval_attempt") === 2)
    assert(events.count(_._1 == "background_retrieval_complete") === 2)
    assert(events.forall(e => Set("resp-2", "resp-4").contains(e._2)))
    output.unpersist()
  }

  test("partial failures land as error rows, not task failures " +
    "(test_background_retrieval.py:209-238)") {
    import spark.implicits._
    val client = new ResponseClient {
      def retrieve(id: String): String =
        if (id == "resp-bad") throw new ClientException(400, "malformed")
        else s"ok-$id"
    }
    val input = Seq(("resp-ok", "a"), ("resp-bad", "b"))
      .toDF("response_id", "custom_id")
    val output = Retriever.retrieve(spark, input, client, ckpt(),
      RetryPolicy(sleep = _ => ()))
    val out = output.results.collect()
    val byId = out.map(r => r.getString(0) ->
      (r.getString(2), r.getString(4))).toMap
    assert(byId("resp-ok")._1 === "completed")
    assert(byId("resp-bad")._1 === "error")
    assert(byId("resp-bad")._2.contains("client_error_400"))
    // the failure logged a background_retrieval_error event (A10)
    assert(output.events.filter(
      org.apache.spark.sql.functions.col("event_type") ===
        "background_retrieval_error").count() === 1L)
    output.unpersist()
  }

  test("checkpoint compaction keeps last per id " +
    "(background_retrieval.py:352-366)") {
    val store = ckpt()
    store.append(Seq(("r1", false, "transient")))
    store.append(Seq(("r1", true, ""), ("r2", true, "")))
    store.compact()
    val rows = store.load().collect()
      .map(r => r.getAs[String]("response_id") ->
        r.getAs[Boolean]("processed")).toMap
    assert(rows === Map("r1" -> true, "r2" -> true))
    assert(store.load().count() === 2L) // duplicates gone
  }
}
