package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Scored candidate for top-k aggregation. */
final case class Scored(score: Double, id: Long)

/** Bounded top-k as a typed Aggregator: keeps only k candidates in the
  * buffer, so the PARTIAL aggregation (map side) already truncates — the
  * shuffle carries at most k rows per partition per key instead of every
  * scored candidate. That's the difference between an ANN top-k that
  * shuffles O(|corpus|·|queries|) rows (window/row_number) and one that
  * shuffles O(k·partitions·|queries|).
  *
  * Ordering: score desc, id asc (deterministic ties) — identical to the
  * window-based ranking, so results are interchangeable.
  */
final case class TopKAgg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(xs: List[Scored]): List[Scored] =
    xs.sortWith(better).take(k)

  override def zero: List[Scored] = Nil
  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    if (buf.size < k) trim(a :: buf)
    else if (better(a, buf.last)) trim(a :: buf)
    else buf
  override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
    trim(b1 ::: b2)
  override def finish(r: List[Scored]): Seq[Scored] = r.sortWith(better)
  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
