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
  *
  * Measurement honesty (the round-8 1,010 rows/s finding): the documents
  * table is 20× smaller than events at every sf, so a single-file replay
  * measured (5,000 rows ÷ ~5 s of per-query FIXED cost — query start,
  * one micro-batch, 32 state-partition commits, the watermark's no-data
  * batch, stop) — a denominator artifact, not a state-store cost; the
  * event pipelines pay the same ~4-5 s wall over 100k rows. The ingest
  * dedup pipeline therefore streams a REPLAYED source: K distinct-id
  * copies of the documents table staged as K files (untimed setup),
  * consumed one file per micro-batch. That is also the more honest
  * shape for the operator itself — an ingest edge sees a steady stream
  * of mostly-new fingerprints across many micro-batches with an
  * advancing watermark (state insert + eviction both exercised), not
  * one giant batch of history. Per-pipeline wall seconds ride along in
  * the JSON so a fixed-cost artifact is self-evident next time.
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

    // ---- replayed ingest source for the dedup pipeline (untimed setup):
    // K copies of the documents table with disjoint doc_id ranges, one
    // file each, so the file source forms K micro-batches of mostly-new
    // fingerprints with an advancing ingest_t watermark.
    val replayK = 20
    val ingestDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-replay")
    val docsBase = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until replayK).foreach { i =>
      val stage = java.nio.file.Files
        .createTempDirectory("graft-ingest-stage")
      docsBase
        .withColumn("doc_id", col("doc_id") + lit(i * nDocs))
        .coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.move(p,
          ingestDir.resolve(f"batch$i%03d.parquet")))
    }
    val nReplayed = replayK * nDocs

    def readDocsReplayed(): DataFrame = withIngestTime(
      spark.readStream
        .schema(docsBase.schema)
        .option("maxFilesPerTrigger", "1") // one file per micro-batch
        .parquet(ingestDir.toString))

    /** One timed replay: fresh checkpoint, noop sink, synchronous drain.
      * Returns (rows/s, wall seconds). */
    def timeOnce(rows: Long, mode: String)
        (build: () => DataFrame): (Double, Double) = {
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
      (rows / sec, sec)
    }
    def bench(rows: Long, mode: String)
        (build: () => DataFrame): (Double, Double) = {
      val a = timeOnce(rows, mode)(build)
      val b = timeOnce(rows, mode)(build)
      // rows/s: HIGHER of two runs (and its wall), whole rows
      val best = if (a._1 >= b._1) a else b
      (math.rint(best._1), math.rint(best._2 * 1000) / 1000)
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
      // dropDuplicatesWithinWatermark fingerprint dedup (eviction state),
      // measured at steady state over K one-file micro-batches, with
      // state partitions sized to the per-batch row count (the round-8
      // root cause: inheriting the batch shuffle default oversharded the
      // state 32 ways and per-batch commit cost drowned the row work —
      // see DocIngest.statePartitionsFor)
      "stream_ingest_dedup" -> {
        val batchParts = DocIngest.statePartitionsFor(nDocs, cpus.toInt)
        spark.conf.set("spark.sql.shuffle.partitions", batchParts.toString)
        val r = bench(nReplayed, "append")(() =>
          DocIngest.dedupOnIngest(readDocsReplayed()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        r
      })

    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val walls = results.map { case (k, (_, w)) => "\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"stream_rows_per_sec","unit":"rows/sec","pipelines":$qs,"wall_sec":$walls,"n_events":$nEvents,"n_docs":$nDocs,"n_ingest_replayed":$nReplayed,"sf":"$sfDir"}"""
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
