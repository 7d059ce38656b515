package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStream, StatefulSessions}

/** Streaming sessionization must agree with the batch gap-sessionizer
  * over the same finite event set (single-batch replay). */
class StatefulSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("flatMapGroupsWithState sessions == batch window sessions") {
    val q = StatefulSessions
      .sessionize(spark, EventStream.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = ops.Advanced.qSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
