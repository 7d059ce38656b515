package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The binned range join must plan as a hash EQUI-join (per-event cost
  * independent of band count) where the plain interval join is a
  * nested-loop predicate fan-out — that plan difference IS the operator. */
class RangeBinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("binned form is a BroadcastHashJoin, plain form is a BNL") {
    val binned = ops.SetOps.qRangeJoinBinned(spark, sf)
      .queryExecution.executedPlan.toString
    assert(binned.contains("BroadcastHashJoin"), binned.take(600))
    assert(!binned.contains("BroadcastNestedLoopJoin"), binned.take(600))
    val plain = ops.SetOps.qRangeJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plain.contains("BroadcastNestedLoopJoin"), plain.take(600))
  }

  test("binned and plain forms agree row for row") {
    val a = ops.SetOps.qRangeJoinBinned(spark, sf).collect().map(_.toString)
    val b = ops.SetOps.qRangeJoin(spark, sf).collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
