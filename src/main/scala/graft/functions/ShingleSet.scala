package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** text → ascending-sorted distinct xxhash64 word-bigram shingle set, in
  * ONE per-row kernel.
  *
  * Semantically identical to the composed form
  * `sort_array(collect_set(xxhash64(explode(bigrams(toks(text))))))` the
  * near-dup pipeline originally used (same tokenizer `[^a-z0-9]+` on
  * lowercased text, same adjacent-bigram "a b" shingles, same seed-42
  * xxhash64 via [[XxHash64Function]]) — but with radically different
  * physics: the composed form EXPLODES ~60 shingle rows per document and
  * pays a full shuffle + hash aggregation to regroup them, while this
  * expression computes the finished set inside the scan stage with zero
  * shuffle. At 100 TB the explode form shuffles ~60× the corpus row
  * count before deduplication even starts; this is a narrow map.
  *
  * The interpreted eval and the codegen path share [[ShingleSet.compute]];
  * codegen emits a single static call, so the expression stays inside
  * WholeStageCodegen like the other graft kernels. */
case class ShingleSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleSet$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "graft_shingle_set"
}

object ShingleSet {

  /** Shared kernel: tokenize `[a-z0-9]+` runs of the lowercased text,
    * hash each adjacent bigram "a b" with seed-42 xxhash64 (identical to
    * the builtin `xxhash64(string)`), dedup, sort ascending. */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val n = s.length
    // collect token [start,end) runs
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val tok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (tok) {
        val st = i
        while (i < n && {
          val c2 = s.charAt(i)
          (c2 >= 'a' && c2 <= 'z') || (c2 >= '0' && c2 <= '9')
        }) i += 1
        starts.add(st); ends.add(i)
      } else i += 1
    }
    val nt = starts.size()
    if (nt < 2) return new GenericArrayData(Array.emptyLongArray)
    val set = new java.util.HashSet[java.lang.Long](nt * 2)
    val sb = new java.lang.StringBuilder(64)
    var t = 1
    while (t < nt) {
      sb.setLength(0)
      sb.append(s, starts.get(t - 1), ends.get(t - 1))
      sb.append(' ')
      sb.append(s, starts.get(t), ends.get(t))
      set.add(XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L))
      t += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  def shingleSet(c: Column): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(c)))
}
