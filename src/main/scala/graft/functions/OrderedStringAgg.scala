package graft.functions

import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}

/** `STRING_AGG(value ORDER BY key)` as a typed [[Aggregator]]
  * (SURVEY §2.10 — the one optional custom aggregate; reference
  * `constants.py:54-73` builds ordinal-ordered schema/clustering
  * strings in BigQuery SQL).
  *
  * The buffer holds (key, value) pairs; merge concatenates buffers and
  * the final sort happens once in `finish`, so partial aggregation
  * still combines map-side. Equivalent to the builtin composition
  * `array_join(transform(array_sort(collect_list(struct(k, v))), ...))`
  * — this form exists for ergonomics and as the engine's demonstration
  * of a custom typed aggregate.
  */
final class OrderedStringAgg(sep: String = ",")
  extends Aggregator[(Long, String), List[(Long, String)], String] {

  override def zero: List[(Long, String)] = Nil

  override def reduce(b: List[(Long, String)], a: (Long, String)): List[(Long, String)] =
    a :: b

  override def merge(b1: List[(Long, String)], b2: List[(Long, String)]): List[(Long, String)] =
    b1 ::: b2

  override def finish(r: List[(Long, String)]): String =
    r.sortBy(identity).map(_._2).mkString(sep)

  override def bufferEncoder: Encoder[List[(Long, String)]] =
    Encoders.kryo[List[(Long, String)]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object OrderedStringAgg {
  /** Typed column usable in `Dataset.select`/`agg`. */
  def apply(sep: String = ","): TypedColumn[(Long, String), String] =
    new OrderedStringAgg(sep).toColumn
}
