package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: the ubiquitous "top-k per key" SQL idiom
  *
  *   SELECT ... FROM (SELECT ..., row_number() OVER
  *     (PARTITION BY p ORDER BY o) rn FROM t) WHERE rn <= k   -- rn dropped
  *
  * plans, by default, as Filter over Window — which shuffles EVERY input
  * row to its key's reducer before ranking (Spark's own
  * InferWindowGroupLimit only bounds rows per key AFTER they reach and
  * sort on the reducer side pre-3.5-style; the window itself survives).
  * When the rank column is discarded above the filter, the whole
  * Filter+Window pair is equivalent to [[TopKPerKey]], whose partial
  * phase caps the shuffle at k rows per key per map partition — at 100 TB
  * the difference between shuffling the table and shuffling k·partitions
  * rows per key.
  *
  * Fires only when provably safe:
  *   - the Window computes exactly ONE expression: an aliased
  *     row_number() (rank/dense_rank admit ties and are NOT top-k);
  *   - the predicate bounds that row number by a literal (`rn <= k`,
  *     `rn < k+1`, `rn = 1`); other conjuncts commute with the limit
  *     (row numbers don't depend on them) and are re-applied above;
  *   - the projection above discards the rank column, so eliminating the
  *     Window is unobservable;
  *   - the partition keys are deterministic and non-empty (global top-k
  *     is TakeOrdered's job, and an empty clustering would funnel
  *     everything through one reducer).
  *
  * Registered via [[graft.GraftExtensions]], so plain `spark.sql` text
  * gets the scale path with no API opt-in.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** k such that `pred` ⟺ rn <= k, if it has that shape. */
  private def boundOf(pred: Expression, rn: Attribute): Option[Int] =
    pred match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.semanticEquals(rn) => Some(1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window))
        if w.windowExpressions.length == 1 &&
          w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty &&
          w.partitionSpec.forall(_.deterministic) =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber, _), _) =>
          val rn = alias.toAttribute
          val (rnPreds, rest) =
            splitConjunctivePredicates(cond).partition(
              _.references.contains(rn))
          val k = rnPreds match {
            case Seq(one) => boundOf(one, rn)
            case _        => None
          }
          val refsOk =
            projectList.forall(_.references.subsetOf(w.child.outputSet)) &&
            rest.forall(_.references.subsetOf(w.child.outputSet))
          k match {
            case Some(kk) if kk > 0 && refsOk =>
              val limited = TopKPerKey(w.partitionSpec, w.orderSpec, kk,
                w.child)
              Project(projectList,
                if (rest.isEmpty) limited else Filter(rest.reduce(And), limited))
            case _ => p
          }
        case _ => p
      }
  }
}
