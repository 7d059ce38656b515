package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The session-extensions registration path: custom expressions callable
  * from SQL text, strategy injected at session build time. Uses its own
  * SparkSession (withExtensions can't be retrofitted onto the shared
  * one); newSession() keeps the underlying SparkContext shared. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate only applies extensions when it CREATES the session;
    // clear the active/default handles so this spec gets its own session
    // regardless of which spec ran first (the SparkContext is reused).
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

  test("graft_* functions are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  graft_l2sq(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS l2,
        |  graft_set_intersect(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS k,
        |  size(graft_shingle_set('the quick brown fox')) AS ns
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 8.0)
    assert(r.getLong(2) == 2L)
    assert(r.getInt(3) == 3)
  }

  test("TopKStrategy is available without experimental registration") {
    // the strategy is injected by the extension; the API path also works
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val out = plans.TopKPerKey.topKPerKey(li,
      Seq(li("l_suppkey")), Seq(li("l_extendedprice").desc,
        li("l_orderkey"), li("l_linenumber"), li("l_partkey")), 2)
    assert(out.count() == 20) // 10 suppliers × 2
  }
}
