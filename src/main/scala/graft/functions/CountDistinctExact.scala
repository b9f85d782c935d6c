package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing an exact distinct count with a set buffer —
  * the engine's UDAF surface (SURVEY §2.9 notes none is *required* for
  * parity; this demonstrates the extension point the sketch/aggregate
  * family plugs into, and is oracle-checkable because it is exact).
  * Partial sets merge map-side like any Spark aggregate.
  */
class CountDistinctExact extends Aggregator[String, mutable.HashSet[String], Long] {
  override def zero: mutable.HashSet[String] = mutable.HashSet.empty
  override def reduce(b: mutable.HashSet[String], a: String): mutable.HashSet[String] = {
    if (a != null) b += a
    b
  }
  override def merge(b1: mutable.HashSet[String], b2: mutable.HashSet[String]): mutable.HashSet[String] =
    b1 ++= b2
  override def finish(b: mutable.HashSet[String]): Long = b.size.toLong
  override def bufferEncoder: Encoder[mutable.HashSet[String]] =
    Encoders.kryo[mutable.HashSet[String]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
