package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RowNumberTopKRewrite optimizer rule: the row_number()-then-filter
  * idiom must plan as the two-phase TopKPerKey operator (no Window exec,
  * bounded shuffle), produce identical rows, and refuse to fire when the
  * rewrite would be observable (rank kept, rank()/dense_rank(), wrong
  * bound direction). */
class RowNumberRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate only applies extensions when it CREATES the session;
    // clear the handles so this spec gets an extensions-enabled session
    // regardless of suite order (the SparkContext itself is reused).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  private val sf = "/root/testdata/sf0.001"

  private def topkIdiom = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"))
    Tables.lineitem(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3 && col("l_quantity") > 1.0)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice",
        "l_quantity")
  }

  test("rn<=k with the rank dropped plans as partial/final TopKPerKey") {
    val p = topkIdiom.queryExecution.executedPlan.toString
    assert(p.contains("PartialTopKPerKey"), p.take(1500))
    assert(p.contains("TopKPerKey"))
    assert(!p.contains("Window"), "Window survived the rewrite:\n" + p.take(1500))
    // the non-rank conjunct must still be applied
    assert(p.replaceAll("#\\d+L?", "").contains("l_quantity > 1.0"), p.take(1500))
  }

  test("SQL-text top-k per key gets the same plan with no API opt-in") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("rnr_lineitem")
    val df = spark.sql(
      """SELECT l_suppkey, l_orderkey, l_extendedprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
        |             l_partkey) AS rn
        |  FROM rnr_lineitem) WHERE rn <= 2""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartialTopKPerKey"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("rewritten results equal the unrewritten window form") {
    // keeping rn in the output blocks the rewrite — that plan is the
    // reference implementation
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"))
    val reference = Tables.lineitem(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3 && col("l_quantity") > 1.0)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice",
        "l_quantity", "rn")
    assert(reference.queryExecution.executedPlan.toString.contains("Window"),
      "reference plan must NOT be rewritten (rn is observable)")
    val expect = reference.drop("rn")
      .collect().map(_.toString).sorted.toSeq
    val got = topkIdiom.collect().map(_.toString).sorted.toSeq
    assert(got == expect)
  }

  test("rank()/kept-rank/lower-bound shapes are left alone") {
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_extendedprice"))
    // rank() admits ties — not a row limit
    val viaRank = Tables.lineitem(spark, sf)
      .withColumn("rk", rank().over(w)).where(col("rk") <= 3).drop("rk")
    assert(!viaRank.queryExecution.executedPlan.toString
      .contains("PartialTopKPerKey"))
    // rn >= k keeps the TAIL — not a top-k
    val tail = Tables.lineitem(spark, sf)
      .withColumn("rn", row_number().over(w)).where(col("rn") >= 3).drop("rn")
    assert(!tail.queryExecution.executedPlan.toString
      .contains("PartialTopKPerKey"))
  }
}
