package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature as a native Catalyst expression.
  *
  * The portable md5 path (graft.ext.Dedup.minhashSignature) explodes
  * shingles and allocates a string + digest per shingle; this expression
  * computes the k-hash signature in ONE pass over the UTF-8 bytes with
  * zero allocation per shingle: a rolling polynomial base hash per window
  * plus k universal-hash mixes (h*Aᵢ+Bᵢ over Z/2⁶⁴). Stays inside
  * whole-stage codegen via a static helper call (the same pattern Spark's
  * own hash expressions use) — no UDF boundary, no serialization.
  *
  * Scale note: turns the dedup signature stage from (shuffle of exploded
  * shingles) into a pure projection; at 100 TB the signature pass is then
  * IO-bound, which is the optimum.
  */
case class MinHashSignature(child: Expression, k: Int, shingleLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHash.compute(input.asInstanceOf[UTF8String], k, shingleLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHash.compute($c, $k, $shingleLen))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHash {
  // odd multipliers/offsets for the k universal-hash mixes (splitmix64-ish)
  private def mixA(i: Int): Long = 0x9E3779B97F4A7C15L * (2L * i + 1)
  private def mixB(i: Int): Long = 0xC2B2AE3D27D4EB4FL * (i + 1)

  /** One pass over the UTF-8 bytes: rolling polynomial hash per window of
    * `shingleLen` bytes, k mins of (h*Aᵢ+Bᵢ). Texts shorter than one
    * window hash the whole text. Returns k longs. */
  def compute(s: UTF8String, k: Int, shingleLen: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    val mins = Array.fill(k)(Long.MaxValue)
    val base = 0x100000001B3L // FNV-ish odd base
    if (n == 0) {
      var i = 0
      while (i < k) { mins(i) = mixB(i); i += 1 }
      return mins
    }
    // window shorter than shingleLen => single whole-text window
    val effLen = math.min(n, shingleLen)
    var basePow = 1L // base^(effLen-1), for the rolling drop term
    var p = 0
    while (p < effLen - 1) { basePow *= base; p += 1 }
    var h = 0L
    var w = 0
    while (w < effLen) { h = h * base + (bytes(w) & 0xFF); w += 1 }
    var start = 0
    while (true) {
      // finalize-mix the window hash through each universal hash
      var i = 0
      while (i < k) {
        var g = h * mixA(i) + mixB(i)
        g ^= (g >>> 31); g *= 0x7FB5D329728EA185L; g ^= (g >>> 27)
        if (g < mins(i)) mins(i) = g
        i += 1
      }
      if (start + effLen >= n) return mins
      // roll: drop bytes(start), add bytes(start+effLen)
      h = (h - (bytes(start) & 0xFF) * basePow) * base + (bytes(start + effLen) & 0xFF)
      start += 1
    }
    mins
  }
}
