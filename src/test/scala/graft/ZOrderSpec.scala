package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustered writes must prune row groups on BOTH clustering
  * columns, where a linear sort prunes only its own sort key — the
  * multi-dimensional tier of the data-skipping stack (see
  * DataSkippingSpec for the single-column tier). */
class ZOrderSpec extends AnyFunSuite {

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

  test("morton interleave is monotone in each coordinate's bit prefix") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L),
      (1023L, 1023L))
    val got = rows.toDF("a", "b")
      .select(ops.Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // hand-computed morton codes: z(a,b) = interleave(a even, b odd bits)
    assert(got == Seq(0L, 1L, 2L, 3L, 12L, 1048575L), got.toString)
  }

  test("z-order layout prunes scans on BOTH dimensions; linear on one") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val total = li.count()
    val zDir = "target/test_zorder/z"
    val linDir = "target/test_zorder/linear"
    ops.Layout.zorderWrite(li, "l_orderkey", "l_partkey", zDir, files = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linDir)
    // a z-ordered write must not lose or duplicate rows
    assert(spark.read.parquet(zDir).count() == total)

    // probe with mid-range point values that exist in the data
    val okVal = li.stat.approxQuantile("l_orderkey", Array(0.5), 0.0).head
    val pkVal = li.stat.approxQuantile("l_partkey", Array(0.5), 0.0).head
    def rows(dir: String, c: String, v: Double): Long =
      scanOutputRows(spark.read.parquet(dir).where(col(c) === v.toLong))

    val zA   = rows(zDir, "l_orderkey", okVal)
    val zB   = rows(zDir, "l_partkey", pkVal)
    val linA = rows(linDir, "l_orderkey", okVal)
    val linB = rows(linDir, "l_partkey", pkVal)

    // linear: near-perfect on its sort key, helpless on the other column
    assert(linA * 8 <= total, s"linear failed on its own key: $linA/$total")
    assert(linB * 2 > total, s"linear implausibly pruned dim B: $linB/$total")
    // z-order: real pruning on BOTH dimensions (16 files → each file
    // spans ~1/4 of each column's range, so a point filter reads ~1/4)
    assert(zA * 2 <= total, s"z-order failed to prune dim A: $zA/$total")
    assert(zB * 2 <= total, s"z-order failed to prune dim B: $zB/$total")
    assert(zB * 3 <= linB * 2,
      s"z-order not better than linear on dim B: $zB vs $linB")
  }
}
