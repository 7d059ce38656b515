package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** |A ∩ B| for two ascending-sorted array<long> columns — a codegen'd
  * two-pointer merge.
  *
  * This is the set-similarity verification kernel: `size(array_intersect)`
  * would build a hash set per row; this runs O(|A|+|B|) primitive
  * comparisons inside WholeStageCodegen with zero allocation, which is
  * what makes exact Jaccard verification affordable over millions of
  * candidate pairs. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      s"""
         |int $na = $l.numElements(); int $nb = $r.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $l.getLong($i); long $y = $r.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
  override def prettyName: String = "graft_sorted_intersect_count"
}

object SortedIntersectCount {
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedIntersectAtLeast(a: Column, b: Column, required: Column): Column =
    ColumnBridge.column(SortedIntersectAtLeast(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      ColumnBridge.expression(required)))
}

/** |A ∩ B| ≥ required for two ascending-sorted array<long> columns — the
  * decision form of [[SortedIntersectCount]] with bidirectional early
  * exit, for join conditions that only need the THRESHOLD answer.
  *
  * The full-count kernel walks both arrays to the end on every pair; in
  * an all-pairs similarity join almost every pair is far BELOW the
  * threshold, so the merge loop here bails as soon as the remaining
  * elements cannot reach `required` (count + min(remaining) < required)
  * or as soon as they already have (count ≥ required). On dissimilar
  * pairs that halves the comparisons; the exact count is then
  * recomputed only for the ~handful of qualifying pairs. Result-
  * identical to `sortedIntersectCount(a, b) >= required` by
  * construction — both exits are implied bounds, never heuristics. */
case class SortedIntersectAtLeast(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(l: Any, r: Any, t: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val req = t.asInstanceOf[Long]
    val na = a.numElements()
    val nb = b.numElements()
    if (req <= 0) return true
    var i = 0; var j = 0; var c = 0L
    // loop while the bound c + min(na-i, nb-j) can still reach req
    while (c < req && c + math.min(na - i, nb - j) >= req) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c >= req
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r, t) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val c = ctx.freshName("c"); val req = ctx.freshName("req")
      s"""
         |int $na = $l.numElements(); int $nb = $r.numElements();
         |long $req = $t;
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($c < $req &&
         |    $c + java.lang.Math.min($na - $i, $nb - $j) >= $req) {
         |  long $x = $l.getLong($i); long $y = $r.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = ($req <= 0) || ($c >= $req);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "graft_sorted_intersect_at_least"
}
