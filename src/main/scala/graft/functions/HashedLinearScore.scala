package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the hashed-feature linear scorer
  * (TextStats.hashedLinearScoreQ30): computes EXACTLY
  * `aggregate(transform(split(trim(text),'\s+'),
  *            t -> w[conv(substr(md5(t),1,2),16,10) % n]), 0L, +)`
  * — the first md5 byte is the bucket, Q30 long weights sum exactly —
  * but as one fused loop: a single reused MessageDigest, no per-token
  * hex-string/array allocation, no intermediate token array column.
  * Byte-compatible with the SQL formulation, so the same DuckDB oracle
  * (weight table as VALUES) checks this path too. Trim matches SQL TRIM
  * (space 0x20 only, NOT Java's <=0x20) and the split matches Java-regex
  * `\s+` with limit -1 — the exact semantics of Spark's trim()/split().
  */
case class HashedLinearScoreQ30(child: Expression, weights: Seq[Long])
    extends UnaryExpression {

  require(weights.nonEmpty && weights.size <= 256,
    "bucket count must fit the first md5 byte (1..256)")

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_linear_score_q30"

  @transient private lazy val wArr: Array[Long] = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    HashedLinearScore.compute(input.asInstanceOf[UTF8String], wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", wArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedLinearScore.compute($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScoreQ30 =
    copy(child = newChild)
}

object HashedLinearScore {
  def compute(u: UTF8String, weights: Array[Long]): Long = {
    // UTF8String.trim() removes the space character only — identical to
    // SQL TRIM / Spark's trim() (Java String.trim would also eat \t\n and
    // diverge from the column formulation)
    val s = u.trim().toString
    val toks = s.split("\\s+", -1) // "" -> [""], like Spark's split
    val md = MessageDigest.getInstance("MD5")
    val n = weights.length
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes("UTF-8"))
      acc += weights((d(0) & 0xFF) % n)
      i += 1
    }
    acc
  }
}
