package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints over a TRUE rolling hash (the
  * Rabin-Karp / MOSS construction):
  *
  *   1. polynomial rolling hash of every k=8-char gram of the lowercased
  *      text — each next gram's hash is O(1) from the previous
  *      (h' = (h − c₀·Bᵏ⁻¹)·B + c_k, 64-bit wraparound), not a rehash;
  *   2. an avalanche finalizer (murmur3 fmix64) to decorrelate
  *      neighboring grams before selection;
  *   3. winnowing with window w=16: keep each window's minimum finalized
  *      hash (ties → rightmost), which guarantees any shared substring of
  *      length ≥ w+k−1 = 23 chars yields at least one shared fingerprint
  *      (the MOSS guarantee — WinnowSpec asserts it);
  *   4. output = the ascending-sorted distinct fingerprint set.
  *
  * Contrast with the md5 content fingerprint (exact-dup identity) and
  * shingle sets (word-level Jaccard): winnowing fingerprints localize
  * COPIED SPANS, the plagiarism/contamination-detection primitive. Same
  * scale posture as the other kernels: one narrow pass in the scan stage,
  * only the small fingerprint sets travel. */
case class WinnowFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprint$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "graft_winnow_fp"
}

object WinnowFingerprint {

  final val K = 8 // gram length (chars)
  final val W = 16 // winnow window (grams)
  private final val B = 1000003L // odd polynomial base, wraps mod 2^64
  // B^(K-1) for the O(1) roll-out of the leading char
  private final val BK1: Long = {
    var p = 1L
    var i = 0
    while (i < K - 1) { p *= B; i += 1 }
    p
  }

  /** murmur3 fmix64 avalanche. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def compute(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val n = s.length
    if (n < K) return new GenericArrayData(Array.emptyLongArray)
    val nGrams = n - K + 1
    // rolling k-gram hashes, finalized
    val h = new Array[Long](nGrams)
    var rh = 0L
    var i = 0
    while (i < K) { rh = rh * B + s.charAt(i); i += 1 }
    h(0) = fmix64(rh)
    i = 1
    while (i < nGrams) {
      rh = (rh - s.charAt(i - 1) * BK1) * B + s.charAt(i + K - 1)
      h(i) = fmix64(rh)
      i += 1
    }
    // winnow: min per window of W grams, ties → rightmost occurrence
    val set = new java.util.HashSet[java.lang.Long]()
    if (nGrams <= W) {
      var best = 0
      i = 1
      while (i < nGrams) { if (h(i) <= h(best)) best = i; i += 1 }
      set.add(h(best))
    } else {
      var w0 = 0
      while (w0 + W <= nGrams) {
        var best = w0
        i = w0 + 1
        while (i < w0 + W) { if (h(i) <= h(best)) best = i; i += 1 }
        set.add(h(best))
        w0 += 1
      }
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  def winnowFingerprint(c: Column): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(c)))
}
