package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, ShingleSet, SortedIntersectCount, SquaredDistance}
import graft.plans.{RowNumberTopKRewrite, TopKStrategy}

/** Session extensions: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.GraftExtensions`)
  * registers
  *
  *   - the TopKPerKey planner strategy (graft.plans), and
  *   - the native codegen expressions as SQL functions:
  *       graft_dot(a, b)      — Σ aᵢ·bᵢ over array<double>
  *       graft_l2sq(a, b)     — Σ (aᵢ−bᵢ)² over array<double>
  *       graft_set_intersect(a, b) — |A∩B| over sorted array<long>
  *       graft_shingle_set(text)   — sorted distinct hashed bigram shingles
  *
  * so `spark.sql("SELECT graft_dot(e1, e2) ...")` works without touching
  * the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def binary(name: String, make: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, s"$name(a, b)"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, s"$name takes exactly 2 arguments")
        make(exprs(0), exprs(1))
      })

  private def unary(name: String, make: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, s"$name(a)"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, s"$name takes exactly 1 argument")
        make(exprs(0))
      })

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => RowNumberTopKRewrite)
    // per-file deletion-vector dispatch for SQL reads of MOR tables:
    // Union(vectorized BatchScan over dv-free files, masked read of
    // dv'd files) instead of a table-wide row-based fallback
    e.injectOptimizerRule(_ => graft.sql.MorPerFileDispatch)
    e.injectFunction(binary("graft_dot", DotProduct))
    e.injectFunction(binary("graft_l2sq", SquaredDistance))
    e.injectFunction(binary("graft_set_intersect", SortedIntersectCount))
    e.injectFunction(unary("graft_shingle_set", ShingleSet))
  }
}
