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

  test("k-ary morton interleave: bit j of rank i lands at position j*k+i") {
    import spark.implicits._
    val rows = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (1L, 1L, 1L), (2L, 0L, 0L), (3L, 3L, 3L))
    val got = rows.toDF("a", "b", "c")
      .select(ops.Layout.zValueN(
        Seq(col("a"), col("b"), col("c")), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // k=3, bits=2: a0→bit0, b0→bit1, c0→bit2, a1→bit3, b1→bit4, c1→bit5
    assert(got == Seq(1L, 2L, 4L, 7L, 8L, 63L), got.toString)
  }

  test("THREE-column z-order: each clustering column prunes files independently") {
    import ops.Layout._
    import spark.implicits._
    val table = "target/graft_io/spec/zorder3"
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    // three mutually-uncorrelated uniform keys: a linear sort on any one
    // would scatter the other two across every file
    val df = spark.range(0, 60000).select(
      (col("id") % 97).as("a"),
      ((col("id") * 31) % 89).as("b"),
      ((col("id") * 57) % 83).as("c"))
    // 64 files over the 9-bit (3 cols × 3 bucket bits) z space: each
    // file is a ~8-cell z run, i.e. a near-cube spanning ~2 of the 8
    // buckets per column — so a one-bucket point predicate must rule
    // out most files on EVERY column
    commitSnapshot(spark, table,
      zArrangedN(df, Seq("a", "b", "c"), files = 64, buckets = 8),
      statsColumns = Seq("a", "b", "c"))
    assert(readSnapshot(spark, table).count() == 60000)
    // a point predicate on EACH of the three columns must rule out most
    // files from its recorded bounds alone — the property a two-column
    // cap could never give the third column
    Seq("a", "b", "c").foreach { c =>
      val (kept, total) = fileSelection(spark, table,
        Seq(SkipRange(c, 5L, 5L)))
      assert(total >= 40 && kept.size <= total / 2,
        s"column $c pruned nothing: ${kept.size} of $total files")
    }
    // and pruning never changes answers
    val got = readSnapshotWhere(spark, table, Seq(SkipRange("b", 5L, 5L)))
      .count()
    assert(got == df.where(col("b") === 5).count())
    // DDL path: zorder_by accepts three columns now (arity was capped
    // at exactly two through r16)
    setTableProps(spark, table,
      Map(ClusterZorderProp -> "a,b,c"), Nil)
    // …but seven refuse
    intercept[IllegalArgumentException] {
      setTableProps(spark, table,
        Map(ClusterZorderProp -> "a,b,c,a,b,c,a"), Nil)
    }
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
