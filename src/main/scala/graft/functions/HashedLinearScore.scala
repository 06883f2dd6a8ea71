package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the hashed-feature linear scorer
  * (TextStats.hashedLinearScoreQ30): computes EXACTLY
  * `aggregate(transform(split(wsTrim(text),'\s+'),
  *            t -> w[conv(substr(md5(t),1,2),16,10) % n]), 0L, +)`
  * — the first md5 byte is the bucket, Q30 long weights sum exactly —
  * but as one fused loop: a single reused MessageDigest, no per-token
  * hex-string/array allocation, no intermediate token array column.
  * Byte-compatible with the SQL formulation, so the same DuckDB oracle
  * (weight table as VALUES) checks this path too. Edge trimming matches
  * TextStats.wsTrim (the Java-regex `\s` class [ \t\n\x0B\f\r] on both
  * ends — NOT Java String.strip's Unicode whitespace) and the split
  * matches Java-regex `\s+` with limit -1 — the exact semantics of the
  * column composition `split(wsTrim(text), "\\s+")`.
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
  // the Java-regex \s class — the char set wsTrim/split("\\s+") match on
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(u: UTF8String, weights: Array[Long]): Long = {
    // strip the \s class from both ends — identical to wsTrim's
    // regexp_replace(text, "^\\s+|\\s+$", "") (Java String.strip would
    // eat Unicode whitespace \s does not and diverge from the column
    // formulation)
    val str = u.toString
    var lo = 0
    var hi = str.length
    while (lo < hi && isWs(str.charAt(lo))) lo += 1
    while (hi > lo && isWs(str.charAt(hi - 1))) hi -= 1
    val s = str.substring(lo, hi)
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
