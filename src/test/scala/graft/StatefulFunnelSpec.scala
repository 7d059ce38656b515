package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStream, StatefulFunnel}

/** The streaming ordered-funnel must agree with the batch iterated-min
  * funnel over the same finite event set (single-batch replay): same
  * users, same stage flags. */
class StatefulFunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("flatMapGroupsWithState funnel == batch iterated-min funnel") {
    val q = StatefulFunnel
      .funnel(spark, EventStream.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("funnel_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = ops.Behavior.qFunnel(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("did_view"),
        r.getAs[Long]("did_click"), r.getAs[Long]("did_purchase")))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    assert(streamed.exists(_._4 == 1L),
      "fixture must exercise a full view->click->purchase conversion")
  }
}
