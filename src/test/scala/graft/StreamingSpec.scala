package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Streaming semantics = batch semantics over the same data: drive the
  * streaming windowed aggregation synchronously (memory sink) and compare
  * against the batch q_time_window totals. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts equal the batch operator's") {
    val q = EventStream.windowedCounts(EventStream.readEvents(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_out")
    val batch = ops.Windows.qTimeWindow(spark, sf)
    assert(streamed.count() == batch.count())
    import org.apache.spark.sql.functions._
    val sTotal = streamed.agg(sum("n")).collect().head.getLong(0)
    val bTotal = batch.agg(sum("n")).collect().head.getLong(0)
    assert(sTotal == bTotal && sTotal == 1000L)
  }

  test("streaming dedup passes through unique event_ids") {
    val q = EventStream.dedupedEvents(EventStream.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("dedup_out").count()
    assert(n == 1000L) // ids are unique in the fixture → all pass
  }
}
