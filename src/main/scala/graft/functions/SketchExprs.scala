package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row sketch kernels — the same "collapse an explode+shuffle stage
  * into a narrow map" move as [[ShingleSet]], applied to the two
  * similarity sketches:
  *
  *   - [[SimHash64]]: text → 64-bit SimHash signature. Value-identical to
  *     the composed bit-vote aggregation it replaced (distinct xxhash64'd
  *     tokens vote ±1 per bit, sign → bit), but computed in one pass per
  *     row instead of exploding every token and shuffling 64 vote sums
  *     per document.
  *   - [[MinHashSketch]]: shingle-hash set → k minhashes, where the i-th
  *     hash function is seed-i xxhash64 over the shingle's 64-bit hash
  *     (one strong base hash + k independent rehashes — the standard
  *     single-hash minhash family). Replaces a groupBy computing k
  *     column-wise mins over exploded shingles.
  *
  * At 100 TB both sketches become pure scan-stage work; the only shuffle
  * left in the LSH pipelines is the (band, bucket) candidate join, which
  * is the part that actually needs data movement. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels$$.MODULE$$.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "graft_simhash64"
}

/** k seed-indexed minhashes over an array<long> shingle-hash set; empty
  * input yields an empty array (callers must filter — a sentinel would
  * make all empty docs band together). */
case class MinHashSketch(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels$$.MODULE$$.minhashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "graft_minhash_sketch"
}

object SketchKernels {

  /** SimHash of the distinct `[a-z0-9]+` tokens of the lowercased text:
    * each distinct token's xxhash64 votes ±1 on each of 64 bit positions;
    * positive vote sum → signature bit set. Identical semantics to
    * `sign(Σ_tokens (bit(h,j)*2-1)) per j` over `xxhash64(token)`. */
  def simhash64(text: UTF8String): Long = {
    val s = text.toLowerCase.toString
    val n = s.length
    val seen = new java.util.HashSet[java.lang.Long]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val st = i
        while (i < n && {
          val c2 = s.charAt(i)
          (c2 >= 'a' && c2 <= 'z') || (c2 >= '0' && c2 <= '9')
        }) i += 1
        val h = XxHash64Function.hash(
          UTF8String.fromString(s.substring(st, i)), StringType, 42L)
        if (seen.add(h)) {
          var j = 0
          while (j < 64) {
            votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
            j += 1
          }
        }
      } else i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** k minhashes: min over the set of seed-i xxhash64 of each element. */
  def minhashes(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = XxHash64Function.hash(hs.getLong(j), LongType, i.toLong)
        if (h < best) best = h
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  def simHash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def minHashSketch(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSketch(ColumnBridge.expression(c), k))
}
