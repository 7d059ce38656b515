package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** Pins the manifest streaming source ([[graft.streaming.ManifestStreamProvider]]):
  * version-offset incremental delivery, commit-granular admission
  * control, checkpoint resume, startingVersion, and the loud refusal on
  * a REPLACE commit inside a batch range (the [[graft.ops.Layout.readChanges]]
  * contract lifted to Structured Streaming). */
class ManifestStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private var nameSeq = 0
  private def freshName(): String = { nameSeq += 1; s"mstream_$nameSeq" }

  private def freshTable(suffix: String): String = {
    val t = s"target/graft_io/spec/stream_$suffix"
    val root = new Path(t)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(root, true)
    t
  }

  private def nation: DataFrame = Tables.nation(spark, sf)

  private def startStream(table: String, name: String,
      options: Map[String, String] = Map.empty,
      checkpoint: Option[String] = None) = {
    var reader = spark.readStream.format("graft-manifest")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val writer = reader.load(table)
      .select(col("n_nationkey"), col("n_name"))
      .writeStream.format("memory").queryName(name)
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }

  test("each commit arrives exactly once; batches carry only the delta") {
    import graft.ops.Layout._
    val table = freshTable("inc")
    commitSnapshot(spark, table, nation.where(col("n_nationkey") < 10))
    val name = freshName()
    val q = startStream(table, name)
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 10,
        "initial snapshot batch must stream the full v1 content")
      // a second commit must arrive as a delta — no re-read of v1 rows
      commitSnapshot(spark, table, nation.where(col("n_nationkey") >= 10))
      q.processAllAvailable()
      val got = spark.table(name)
      assert(got.count() == nation.count(),
        "the appended commit's rows did not arrive")
      assert(got.select("n_nationkey").distinct().count() == nation.count(),
        "a row was delivered twice — the source re-read an old version")
      // idle trigger: nothing new, nothing re-delivered
      q.processAllAvailable()
      assert(spark.table(name).count() == nation.count())
    } finally q.stop()
  }

  test("maxVersionsPerTrigger drains a commit backlog one version per batch") {
    import graft.ops.Layout._
    val table = freshTable("cap")
    commitSnapshot(spark, table, nation.where(col("n_nationkey") < 8))
    commitSnapshot(spark, table,
      nation.where(col("n_nationkey") >= 8 && col("n_nationkey") < 16))
    commitSnapshot(spark, table, nation.where(col("n_nationkey") >= 16))
    val name = freshName()
    val q = startStream(table, name,
      Map("maxVersionsPerTrigger" -> "1"))
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == nation.count())
      // admission control: three commits → three non-empty micro-batches
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 3,
        s"expected 3 capped batches, saw ${batches.length}")
    } finally q.stop()
  }

  test("startingVersion skips history before it") {
    import graft.ops.Layout._
    val table = freshTable("sv")
    val v1 = commitSnapshot(spark, table,
      nation.where(col("n_nationkey") < 12))
    commitSnapshot(spark, table, nation.where(col("n_nationkey") >= 12))
    val name = freshName()
    val q = startStream(table, name,
      Map("startingVersion" -> v1.toString))
    try {
      q.processAllAvailable()
      val got = spark.table(name)
      assert(got.count() == nation.where(col("n_nationkey") >= 12).count())
      assert(got.agg(min(col("n_nationkey"))).head.getInt(0) == 12,
        "a pre-startingVersion row leaked into the stream")
    } finally q.stop()
  }

  test("checkpoint restart resumes at the committed version, not from scratch") {
    import graft.ops.Layout._
    val table = freshTable("ckpt")
    val ckpt = freshTable("ckpt_loc")  // reuse the deleter for fresh dirs
    val out = freshTable("ckpt_out")   // file sink: supports recovery
    commitSnapshot(spark, table, nation.where(col("n_nationkey") < 12))
    def run(): Unit = {
      val q = spark.readStream.format("graft-manifest").load(table)
        .select(col("n_nationkey"), col("n_name"))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 12)
    // new data lands while no stream is running; the restarted query on
    // the same checkpoint must append ONLY the delta — a source that
    // re-read v1 would duplicate the first 12 rows in the sink
    commitSnapshot(spark, table, nation.where(col("n_nationkey") >= 12))
    run()
    val got = spark.read.parquet(out)
    assert(got.count() == nation.count(),
      "restart re-delivered rows before the checkpointed version")
    assert(got.select("n_nationkey").distinct().count() == nation.count())
  }

  test("a REPLACE commit inside the batch range fails the stream loudly") {
    import graft.ops.Layout._
    val table = freshTable("repl")
    commitSnapshot(spark, table, nation.where(col("n_nationkey") < 12))
    val name = freshName()
    val q = startStream(table, name)
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 12)
      // copy-on-write delete = REPLACE: the next batch's line-diff is
      // not a change log, the stream must refuse rather than answer wrong
      deleteWhere(spark, table, col("n_nationkey") === 3)
      val ex = intercept[StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("REPLACE") ||
        Option(ex.getCause).exists(_.getMessage.contains("REPLACE")),
        s"wrong failure: ${ex.getMessage}")
    } finally q.stop()
  }
}
