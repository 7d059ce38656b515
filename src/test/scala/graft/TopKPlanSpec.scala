package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k-per-key operator must (a) plan as the two-phase
  * partial/final pipeline with exactly one exchange between phases and
  * (b) return exactly what the declarative window form returns. */
class TopKPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("plans as Partial -> Exchange -> Final with map-side pruning") {
    val df = ops.Windows.qTopkPerKey(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopKPerKey"))
    assert(plan.contains("TopKPerKey"))
    val partialIdx = plan.indexOf("PartialTopKPerKey")
    val finalIdx = plan.indexOf("TopKPerKey")
    assert(finalIdx < partialIdx) // final sits above partial in the tree
    val between = plan.substring(finalIdx, partialIdx)
    assert(between.contains("Exchange"), s"no exchange between phases:\n$plan")
  }

  test("matches the window row_number form exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"))
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey",
        "l_extendedprice")
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .collect().map(_.toString)
    val viaCustom = ops.Windows.qTopkPerKey(spark, sf)
      .collect().map(_.toString)
    assert(viaCustom.sameElements(viaWindow))
  }
}
