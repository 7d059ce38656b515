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

  test("streaming windowed KMV distinct-user estimates equal the batch sketch") {
    import org.apache.spark.sql.functions._
    val q = EventStream
      .windowedDistinctUsers(EventStream.readEvents(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("kmv_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("kmv_out")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    val batch = Events.events(spark, sf)
      .groupBy(window(col("ts_t"), "1 hour").as("w"))
      .agg(graft.functions.KmvDistinct
        .kmvDistinct(xxhash64(col("user_id"))).as("est"))
      .select(col("w.start"), col("est"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming windowed HDR value-quantile sketches are byte-identical to batch") {
    import org.apache.spark.sql.functions._
    val q = EventStream
      .windowedValueQuantiles(EventStream.readEvents(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hdr_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hdr_out")
      .collect().map(r => (r.getTimestamp(0), r.getAs[Array[Byte]](1).toSeq))
      .toMap
    val batch = Events.events(spark, sf)
      .groupBy(window(col("ts_t"), "1 hour").as("w"))
      .agg(graft.functions.HdrHistogram.hdrSketch(
        (graft.Tables.dec2(col("value")) * 100).cast("long")).as("sk"))
      .select(col("w.start"), col("sk"))
      .collect().map(r => (r.getTimestamp(0), r.getAs[Array[Byte]](1).toSeq))
      .toMap
    assert(streamed.nonEmpty)
    // bucket counts add under union, so streaming-state merge order
    // cannot change the serialized sketch — bytes, not just estimates
    assert(streamed == batch)
  }

  test("watermark accepts in-horizon late data and drops beyond-horizon late data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // (epoch-seconds, event_type, value) driven batch by batch so the
    // 2-hour watermark in EventStream.windowedCounts visibly advances.
    val ms = MemoryStream[(Long, String, Double)](spark)
    val events = ms.toDF().toDF("tsec", "event_type", "value")
      .withColumn("ts_t", timestamp_seconds(col("tsec")))
    val q = EventStream.windowedCounts(events)
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_out")
      .start()
    def h(hh: Int, mm: Int): Long = hh * 3600L + mm * 60L
    try {
      // batch 1: two rows in window [10:00,11:00) + one at 13:30 that
      // moves the watermark to 11:30 at batch end
      ms.addData((h(10, 0), "a", 1.0), (h(10, 30), "a", 1.0),
        (h(13, 30), "a", 1.0))
      q.processAllAvailable()
      // batch 2: 10:45 is LATE beyond the 11:30 watermark → dropped;
      // 12:15 is within horizon → accepted. [10:00,11:00) closes & emits.
      ms.addData((h(10, 45), "a", 1.0), (h(12, 15), "a", 1.0))
      q.processAllAvailable()
      // batch 3: 16:30 advances the watermark to 14:30 at batch end
      ms.addData((h(16, 30), "a", 1.0))
      q.processAllAvailable()
      // batch 4: triggers emission of [12:00,13:00) and [13:00,14:00)
      ms.addData((h(17, 0), "a", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("wm_out")
      .select(col("wstart").cast("long").as("ws"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(h(10, 0)) == 2L, "late 10:45 beyond watermark must be dropped")
    assert(out(h(12, 0)) == 1L, "in-horizon 12:15 must be accepted")
    assert(out(h(13, 0)) == 1L)
    assert(!out.contains(h(16, 0)), "open window must not emit in append mode")
  }

  test("stream-stream interval join == batch interval join") {
    val q = EventStream.purchaseClickJoin(EventStream.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssj_out")
    // batch form over the same data and the same join window
    import org.apache.spark.sql.functions._
    val ev = graft.Events.events(spark, sf)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_t").as("c_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts_t").as("p_ts"))
    val batch = purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
    assert(streamed.count() == batch.count())
    assert(streamed.count() > 0)
    val sPairs = streamed.select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bPairs = batch.select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sPairs == bPairs)
  }

  test("foreachBatch warehouse ingest totals equal the batch aggregation") {
    import org.apache.spark.sql.functions._
    val wh = "target/test_stream_wh"
    val ckpt = "target/test_stream_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val q = EventStream.ingestToWarehouse(
      EventStream.readEvents(spark, sf), wh, ckpt)
    try q.processAllAvailable() finally q.stop()
    val warehoused = spark.read.parquet(wh)
      .groupBy("event_type")
      .agg(sum("n").cast("long").as("n"), sum("sum_value").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = graft.Events.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(warehoused == direct)
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

  test("stream-static enrichment join equals the batch join") {
    import org.apache.spark.sql.functions._
    val customers = Tables.customer(spark, sf)
    val q = EventStream.enrichedEvents(
        EventStream.readEvents(spark, sf), customers)
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("enrich_out")
    assert(streamed.count() == 1000L) // left join preserves every event
    val batch = graft.Events.events(spark, sf)
      .join(broadcast(customers.select(col("c_custkey").as("user_id"),
        col("c_mktsegment"))), Seq("user_id"), "left")
    val sMatched = streamed.where(col("c_mktsegment").isNotNull).count()
    val bMatched = batch.where(col("c_mktsegment").isNotNull).count()
    assert(sMatched == bMatched && sMatched > 0)
  }
}
