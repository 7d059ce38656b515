package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for vector arithmetic (SURVEY.md §4's only
  * identified custom-Expression candidates).
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`) are
  * interpreted — every row allocates a zipped array and evaluates a
  * lambda per element, which made the kNN scan ~20× slower than the
  * underlying arithmetic. These expressions generate a tight primitive
  * loop inside WholeStageCodegen instead: no allocation, no virtual
  * calls, same left-to-right sequential fold — so results stay
  * bit-identical to both the HOF form and DuckDB's list arithmetic
  * (the oracle contract).
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** scalar combine step, e.g. product or squared difference */
  protected def combine(x: Double, y: Double): Double
  /** java source for the combine step over element vars `a`/`b` */
  protected def combineCode(a: String, b: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += combine(x.getDouble(i), y.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xa = $l.getDouble($i);
         |  double $yb = $r.getDouble($i);
         |  ${ev.value}Acc += ${combineCode(xa, yb)};
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ over two array<double> columns. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(a: String, b: String): String =
    s"$a * $b"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** Σ (aᵢ−bᵢ)² over two array<double> columns. */
case class SquaredDistance(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override protected def combine(x: Double, y: Double): Double = {
    val d = x - y; d * d
  }
  override protected def combineCode(a: String, b: String): String =
    s"($a - $b) * ($a - $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
  override def prettyName: String = "graft_l2sq"
}

object VectorExprs {
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def squaredDistance(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
