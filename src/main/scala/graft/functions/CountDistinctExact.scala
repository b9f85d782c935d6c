package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing an exact distinct count with a set buffer —
  * the engine's UDAF surface (SURVEY §2.9 notes none is *required* for
  * parity; this demonstrates the extension point the sketch/aggregate
  * family plugs into, and is oracle-checkable because it is exact).
  * Partial sets merge map-side like any Spark aggregate.
  *
  * The buffer is a Map-as-set under an `ExpressionEncoder` — a Tungsten
  * map, NOT `Encoders.kryo`. Kryo's FieldSerializer reflects into
  * `java.nio.ByteBuffer` internals, which JDK 17 module encapsulation
  * forbids unless the JVM was launched with `--add-opens java.base/
  * java.nio=ALL-UNNAMED`; the failure surfaces only at buffer
  * serialization time, i.e. only on JVMs the build didn't configure
  * (caught by the round-6 Verify failure manifest on a plain `java -cp`
  * run). A native encoder has no such launch-flag dependency, and its
  * partial buffers shuffle as Tungsten rows instead of opaque blobs.
  */
class CountDistinctExact extends Aggregator[String, Map[String, Boolean], Long] {
  override def zero: Map[String, Boolean] = Map.empty
  override def reduce(b: Map[String, Boolean], a: String): Map[String, Boolean] =
    if (a == null || b.contains(a)) b else b + (a -> true)
  override def merge(b1: Map[String, Boolean], b2: Map[String, Boolean]): Map[String, Boolean] =
    b1 ++ b2
  override def finish(b: Map[String, Boolean]): Long = b.size.toLong
  override def bufferEncoder: Encoder[Map[String, Boolean]] =
    ExpressionEncoder[Map[String, Boolean]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
