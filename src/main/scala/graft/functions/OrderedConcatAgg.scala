package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` that concatenates strings in explicit `pos` order —
  * the single-pass alternative to `collect_list(struct) → array_sort →
  * concat` for document assembly (SURVEY.md §2.12: "a
  * TypedImperativeAggregate-style Aggregator if we want single-pass
  * render").
  *
  * The buffer keeps (pos, fragment) pairs; merge is list concat, ordering
  * is imposed once at `finish` — associative and commutative as a
  * distributed aggregate must be, deterministic because `pos` is an
  * explicit encounter-order column (SURVEY.md §7.4 order-sensitivity
  * note). Registered per-query via `.toColumn`; usable in
  * `groupBy(...).agg(OrderedConcatAgg.toColumn)` or typed
  * `KeyValueGroupedDataset.agg`.
  */
object OrderedConcatAgg extends Aggregator[(Int, String), List[(Int, String)], String] {
  override def zero: List[(Int, String)] = Nil
  override def reduce(b: List[(Int, String)], a: (Int, String)): List[(Int, String)] =
    a :: b
  override def merge(b1: List[(Int, String)], b2: List[(Int, String)]): List[(Int, String)] =
    b1 ::: b2
  override def finish(r: List[(Int, String)]): String =
    r.sortBy(_._1).map(_._2).mkString
  override def bufferEncoder: Encoder[List[(Int, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Int, String)]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
