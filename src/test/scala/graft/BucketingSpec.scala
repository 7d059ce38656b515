package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-design proof for the 100 TB posture: bucketed tables joined on
  * the bucket key produce a sort-merge join with NO shuffle exchange —
  * the Spark analogue of the reference's B-tree indexes on join keys
  * (ETLCNPJFinalEmpresaEstabelecimentos.py:176-182), but one that
  * co-locates BOTH sides of the big fact⋈fact join. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs shuffle-free") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory persists — clear the physical locations too
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.lineitem(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val li = spark.table("li_bucketed")
    val o = spark.table("o_bucketed")
    // disable auto-broadcast so the join strategy decision is about
    // co-location, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the join itself must not shuffle either side: the only exchange
      // allowed is the one for the final small groupBy
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"lineitem side shuffled:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side shuffled:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum == 6000L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("one-file-per-bucket sorted tables join without Sort nodes") {
    // the OTHER half of the bucketed win: sortBy metadata only removes
    // the SMJ's per-side Sort when each bucket is a single file (Spark
    // must otherwise merge several sorted files and re-sorts instead).
    // repartition on the bucket key before the write puts each bucket's
    // rows in exactly one task -> one file; at warehouse scale this is
    // why compaction to one-file-per-bucket pays for itself on every
    // subsequent join.
    spark.sql("DROP TABLE IF EXISTS li_b1")
    spark.sql("DROP TABLE IF EXISTS o_b1")
    Seq("li_b1", "o_b1").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.lineitem(spark, sf).repartition(8, col("l_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b1")
    Tables.orders(spark, sf).repartition(8, col("o_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_b1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // since 3.0 (SPARK-28632) the scan only ADVERTISES its sort order
    // behind this conf — planning overhead of per-bucket file-count
    // checks isn't paid by default; a warehouse that compacts to
    // one-file-per-bucket turns it on to get sort-free joins
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
      "true")
    try {
      val li = spark.table("li_b1")
      val o = spark.table("o_b1")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(li("l_orderkey"), o("o_totalprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join shuffled:\n$plan")
      assert(!plan.contains("Sort "),
        s"single-file sorted buckets still re-sorted:\n$plan")
      assert(joined.count() == 6000L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }
}
