package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partition layout + partition pruning: a filter on the
  * partition column must land in PartitionFilters (directories skipped at
  * planning time), not as a row-level filter — at 100 TB this is the
  * difference between listing 3 directories and scanning everything. */
class PartitionPruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val out = "target/graft_io/partitioned_orders"

  test("filters on the partition column prune directories, not rows") {
    Tables.orders(spark, sf)
      .write.mode("overwrite")
      .partitionBy("o_orderstatus")
      .parquet(out)

    val df = spark.read.parquet(out).where(col("o_orderstatus") === "F")
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters"))
      .getOrElse(fail(s"no PartitionFilters in:\n$plan"))
    assert(scanLine.contains("o_orderstatus"), scanLine)
    // row-level PushedFilters must NOT need the partition column
    val pushed = scanLine.substring(scanLine.indexOf("PushedFilters: ["))
    val pushedList = pushed.substring(0, pushed.indexOf("]") + 1)
    assert(!pushedList.contains("o_orderstatus"), pushedList)

    val expected = Tables.orders(spark, sf)
      .where(col("o_orderstatus") === "F").count()
    assert(df.count() == expected)
  }
}
