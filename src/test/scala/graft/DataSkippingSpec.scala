package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-group data skipping via sorted writes: range-partitioning +
  * sorting a table on its filter key at WRITE time gives every parquet
  * file/row-group a narrow min/max band, so a selective filter prunes
  * most of the data at the reader — the second tier of the skipping
  * stack (tier 1: directory-level partition pruning, PartitionPruningSpec;
  * tier 3: pushed predicates, PlanAuditSpec). At 100 TB this is the
  * difference between scanning a shard and scanning the corpus. */
class DataSkippingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    assert(scans.nonEmpty, "no file scan in plan:\n" + plan.toString.take(500))
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("sorted write prunes row groups; unsorted write scans everything") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val total = li.count()
    val sortedDir = "target/test_skip/sorted"
    val unsortedDir = "target/test_skip/unsorted"
    // sorted: range-partition on the key then sort within partitions —
    // each output file carries a narrow, disjoint l_orderkey band
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sortedDir)
    // unsorted control: round-robin partitions, every file spans the
    // whole key range
    li.repartition(8).write.mode("overwrite").parquet(unsortedDir)

    val pred = col("l_orderkey") === 42
    val sortedRows = scanOutputRows(
      spark.read.parquet(sortedDir).where(pred))
    val unsortedRows = scanOutputRows(
      spark.read.parquet(unsortedDir).where(pred))
    // the sorted layout must let the reader skip most of the table; the
    // unsorted layout can only skip files that miss the key by accident
    assert(unsortedRows * 2 >= total,
      s"unsorted layout skipped implausibly much: $unsortedRows vs $total")
    assert(sortedRows * 4 <= unsortedRows,
      s"sorted layout skipped too little: $sortedRows vs $unsortedRows")
  }
}
