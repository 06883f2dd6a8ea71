package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-exact MinHash over md5: computes EXACTLY the same signature as
  * the SQL formulation
  * `min(substr(md5(substr(text,i,L)),8w+1,8))` for w∈[0,4) and groups
  * `md5(g || shingle)` for k>4 — but natively: one reused MessageDigest,
  * no per-shingle string or hex allocation, window minimums tracked as
  * unsigned 32-bit ints (hex lexicographic order ≡ unsigned numeric
  * order), hex-encoded once at the end. Byte-compatible with any
  * ANSI-SQL engine computing the same expression, so DuckDB-oracle checks
  * keep passing while the per-shingle cost drops to a digest update.
  */
case class Md5MinHashSignature(child: Expression, k: Int, shingleLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "md5_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    Md5MinHash.compute(input.asInstanceOf[UTF8String], k, shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5MinHash.compute($c, $k, $shingleLen)")

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSignature =
    copy(child = newChild)
}

object Md5MinHash {
  private val hexChars = "0123456789abcdef".toCharArray

  /** min over shingles of each 32-bit window of md5(groupPrefix+shingle);
    * identical to the SQL min(substr(md5hex,·,8)) because hex strings of
    * equal length compare lexicographically as unsigned numerics. */
  def compute(u: UTF8String, k: Int, shingleLen: Int): GenericArrayData = {
    val s = u.toString
    // SQL substr/length (Spark UTF8String and DuckDB alike) count Unicode
    // code points, not UTF-16 units — window by code point or surrogate
    // pairs split into U+FFFD and signatures diverge cross-engine.
    val n = s.codePointCount(0, s.length)
    // char offset of each code-point boundary (cpOff(i) = char index of
    // the i-th code point; cpOff(n) = s.length)
    val cpOff = new Array[Int](n + 1)
    var ci = 0
    var cp = 0
    while (cp < n) { cpOff(cp) = ci; ci = s.offsetByCodePoints(ci, 1); cp += 1 }
    cpOff(n) = s.length
    val nGroups = (k + 3) / 4
    val mins = Array.fill(nGroups * 4)(0xFFFFFFFFL)
    val md = MessageDigest.getInstance("MD5")
    val effLen = math.min(math.max(n, 1), shingleLen)
    val last = math.max(n - effLen, 0)
    // group prefixes "1","2",… match md5(concat(lit(g), shingle))
    val prefixes = (0 until nGroups).map(g =>
      if (g == 0) Array.emptyByteArray else g.toString.getBytes("UTF-8")).toArray
    var start = 0
    while (start <= last) {
      val end = math.min(start + effLen, n)
      val windowBytes = s.substring(cpOff(start), cpOff(end)).getBytes("UTF-8")
      var g = 0
      while (g < nGroups) {
        md.reset()
        if (prefixes(g).nonEmpty) md.update(prefixes(g))
        md.update(windowBytes)
        val d = md.digest()
        var w = 0
        while (w < 4) {
          val v = ((d(4 * w) & 0xFFL) << 24) | ((d(4 * w + 1) & 0xFFL) << 16) |
            ((d(4 * w + 2) & 0xFFL) << 8) | (d(4 * w + 3) & 0xFFL)
          if (v < mins(4 * g + w)) mins(4 * g + w) = v
          w += 1
        }
        g += 1
      }
      start += 1
    }
    val out = new Array[AnyRef](k)
    var i = 0
    while (i < k) {
      val v = mins(i)
      val cs = new Array[Char](8)
      var j = 0
      while (j < 8) {
        cs(j) = hexChars(((v >>> (28 - 4 * j)) & 0xF).toInt)
        j += 1
      }
      out(i) = UTF8String.fromString(new String(cs))
      i += 1
    }
    new GenericArrayData(out)
  }
}
