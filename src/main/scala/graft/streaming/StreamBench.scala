package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming micro-benchmark: rows/s through each stateful streaming
  * pipeline at SPARK_GRAFT_SF_DIR — the state-store regression signal the
  * batch bench can't see (all streaming ops are spec-proven ≡ batch, but
  * a state-store slowdown would never show up in `graft.Bench`).
  *
  * Each pipeline replays the sf dir's parquet through the file streaming
  * source into a noop sink and reports input rows / wall seconds, fastest
  * of two runs (same warmup rationale as Bench). Prints ONE JSON line and
  * self-persists it to STREAMBENCH.json (driver stdout tails truncate).
  */
object StreamBench {

  private def withIngestTime(docs: DataFrame): DataFrame =
    docs.withColumn("ingest_t", timestamp_seconds(col("doc_id")))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()

    def readDocs(): DataFrame = withIngestTime(
      spark.readStream
        .schema(spark.read.parquet(s"$sfDir/documents.parquet").schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sfDir))

    /** One timed replay: fresh checkpoint, noop sink, synchronous drain. */
    def timeOnce(rows: Long, mode: String)(build: () => DataFrame): Double = {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-streambench").toString
      val t0 = System.nanoTime()
      val q = build()
        .writeStream.outputMode(mode)
        .option("checkpointLocation", ckpt)
        .format("noop")
        .start()
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      rows / sec
    }
    def bench(rows: Long, mode: String)(build: () => DataFrame): Double = {
      val a = timeOnce(rows, mode)(build)
      val b = timeOnce(rows, mode)(build)
      math.rint(math.max(a, b)) // rows/s: HIGHER of two runs, whole rows
    }

    val results = Seq(
      // watermarked windowed agg (HDFSBackedStateStore aggregation state)
      "stream_windowed_counts" -> bench(nEvents, "update")(() =>
        EventStream.windowedCounts(EventStream.readEvents(spark, sfDir))),
      // KMV TypedImperativeAggregate merging inside streaming state
      "stream_windowed_distinct" -> bench(nEvents, "update")(() =>
        EventStream.windowedDistinctUsers(
          EventStream.readEvents(spark, sfDir))),
      // flatMapGroupsWithState sessionization (per-user state fold)
      "stream_sessions" -> bench(nEvents, "append")(() =>
        StatefulSessions
          .sessionize(spark, EventStream.readEvents(spark, sfDir)).toDF()),
      // dropDuplicatesWithinWatermark fingerprint dedup (eviction state)
      "stream_ingest_dedup" -> bench(nDocs, "append")(() =>
        DocIngest.dedupOnIngest(readDocs())))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"stream_rows_per_sec","unit":"rows/sec","pipelines":$qs,"n_events":$nEvents,"n_docs":$nDocs,"sf":"$sfDir"}"""
    println(line)
    val repoDir = {
      val r = new java.io.File("/root/repo")
      if (r.isDirectory) r else new java.io.File(".")
    }
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT",
      new java.io.File(repoDir, "STREAMBENCH.json").getPath)
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(line) finally w.close()
    spark.stop()
  }
}
