package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator custom plan (SURVEY.md §2.4 X9 at scale): top-k rows per
  * key as a first-class physical operator —
  * LogicalPlan + Strategy + two-phase SparkPlan, the (c) tier of the
  * custom-operator preference order.
  *
  * Why not `row_number().over(...)` + filter? The window form shuffles
  * EVERY row to its key's reducer before ranking. This operator plans as
  *
  *   PartialTopKPerKeyExec   (map-side: top-k per key per partition)
  *     → Exchange(key)       (shuffles ≤ k·partitions rows per key)
  *   TopKPerKeyExec          (reduce-side: top-k per key, final)
  *
  * — the same partial/final contract as hash aggregation, so shuffle
  * volume is bounded by k·partitions·keys instead of the full input. At
  * 100 TB with k=10 that is the difference between shuffling 100 TB and
  * shuffling gigabytes.
  *
  * Both phases share one streaming implementation: EnsureRequirements
  * gives each phase (keys ++ order)-sorted input, so "top-k per key" is a
  * run-length scan that emits the first k rows of each key run — no heap,
  * no state beyond one row.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

abstract class TopKPerKeyExecBase extends UnaryExecNode {
  def keys: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var current: UnsafeRow = null
      var n = 0
      it.filter { row =>
        val kRow = keyProj(row)
        if (current == null || kRow != current) {
          current = kRow.copy()
          n = 0
        }
        n += 1
        n <= limit
      }
    }
  }
}

/** Map-side phase: no distribution requirement — prunes each input
  * partition to ≤ k rows per key before the shuffle. */
case class PartialTopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends TopKPerKeyExecBase {
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution)
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Reduce-side phase: requires clustering on the keys (EnsureRequirements
  * inserts the exchange) and emits the final top-k per key. */
case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends TopKPerKeyExecBase {
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k,
        PartialTopKPerKeyExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Top-k rows per key. `orderCols` should give a total order within a
    * key (add tiebreakers) for deterministic output.
    *
    * The key/order expressions are harvested from an ANALYZED probe plan
    * (`repartition(keys).sortWithinPartitions(order)`) rather than
    * converted directly: Spark 4's Column→Expression conversion is lazy
    * and a directly-converted sort Column smuggles a non-serializable
    * ColumnNode into the physical plan. The analyzer produces clean
    * catalyst-native SortOrder/Attribute trees. */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{RepartitionByExpression, Sort}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val probe = df.repartition(keyCols: _*).sortWithinPartitions(orderCols: _*)
    val lp = ColumnBridge.logicalPlan(probe)
    val sortNode = lp.collectFirst { case s: Sort => s }
      .getOrElse(throw new IllegalStateException(
        s"unexpected probe plan shape:\n$lp"))
    val repart = sortNode.child.collectFirst {
        case r: RepartitionByExpression => r }
      .getOrElse(throw new IllegalStateException(
        s"unexpected probe plan shape:\n$lp"))
    ColumnBridge.ofRows(spark,
      TopKPerKey(repart.partitionExpressions, sortNode.order, k, repart.child))
  }
}
