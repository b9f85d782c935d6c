package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class JsonSpec extends AnyFunSuite {

  test("primitives and order-preserving objects") {
    assert(Json.write(Json.obj("b" -> 1, "a" -> "x")) === """{"b":1,"a":"x"}""")
    assert(Json.write(Seq(1, "two", true, null)) === """[1,"two",true,null]""")
    assert(Json.write(None) === "null")
    assert(Json.write(Some(2L)) === "2")
    assert(Json.write(3.5) === "3.5")
    assert(Json.write(4.0) === "4") // integral doubles stay integral
  }

  test("string escaping covers control chars") {
    assert(Json.write("a\"b\\c\nd") === "\"a\\\"b\\\\c\\nd\\u0001\"")
  }

  test("fallback chain: throwable and arbitrary objects never fail") {
    // mirrors _safe_json_dumps fallback (reference logger.py:152-166)
    assert(Json.write(new RuntimeException("boom")) ===
      """{"message":"boom","type":"RuntimeException"}""")
    final class Opaque { override def toString = "opaque-1" }
    assert(Json.write(new Opaque) === "\"opaque-1\"")
  }

  test("nested maps and sequences") {
    val payload = Json.obj(
      "execution" -> Json.obj("tags" -> Seq("t1", "t2"), "metadata" -> Map.empty),
      "data" -> Json.obj("usage" -> Json.obj("total_tokens" -> 10)))
    assert(Json.write(payload) ===
      """{"execution":{"tags":["t1","t2"],"metadata":{}},"data":{"usage":{"total_tokens":10}}}""")
  }
}
