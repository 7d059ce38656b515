package graft

/** Dev utility: measure the manifest metadata plane's cost as a
  * function of table FILE COUNT — the scaling axis the per-key bench
  * never exercises (sf0.1 tables hold tens of files; a 100 TB table
  * holds ~800k).
  *
  *   runMain graft.ManifestScaleProbe [sizes=10000,50000,200000] [commits=20]
  *
  * For each size N it builds a table whose head manifest lists N lines
  * (synthetic paths through the REAL commit protocol —
  * [[ops.Layout.appendEntriesUnchecked]], the CAS loop minus data
  * staging; the metadata plane never opens data files, so line realness
  * does not change what is measured), then reports:
  *
  *   - `commit_ms`: mean wall per ONE-LINE append commit (the
  *     streaming-sink / CDC-upsert shape) over `commits` commits
  *   - `commit_bytes`: mean manifest bytes WRITTEN per such commit
  *   - `cold_read_ms`: head file-list reconstruction with an
  *     invalidated cache (the planning-time cost of one fresh reader)
  *
  * One JSON line per run. Pre-r20 (full-rewrite manifests) both commit
  * columns grow linearly in N — the wall the r19 verdict named; the
  * r20 delta+checkpoint format is flat in N for commits and bounded by
  * checkpoint-interval full reads for cold reads. Numbers are recorded
  * in BASELINE.md. Not part of the driver contract.
  */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.lift(0).getOrElse("10000,50000,200000")
      .split(",").map(_.trim.toInt).toSeq
    val commits = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = GraftSession.builder("local[4]", Some(4)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = s"target/manifest_probe_${System.nanoTime()}"
    // a realistic line: txn-dir path + @bytes + one bounds group
    def line(i: Long): String =
      f"data/txn-seed/f$i%08d.parquet@131072\tid\t$i\t$i"
    val results = sizes.map { n =>
      val table = s"$base/t$n"
      ops.Layout.dropTable(spark, table)
      ops.Layout.commitSnapshot(spark, table,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
      var at = 0L
      while (at < n) { // chunked setup: few commits, each O(n) once
        val c = math.min(100000L, n - at)
        ops.Layout.appendEntriesUnchecked(spark, table,
          (at until at + c).map(line))
        at += c
      }
      val root = new org.apache.hadoop.fs.Path(table)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val samples = (0 until commits).map { i =>
        val t0 = System.nanoTime()
        val v = ops.Layout.appendEntriesUnchecked(spark, table,
          Seq(line(10000000L + i)))
        val ms = (System.nanoTime() - t0) / 1e6
        (ms, fs.getFileStatus(new org.apache.hadoop.fs.Path(
          root, s"manifests/v$v.manifest")).getLen)
      }
      val commitMs = samples.map(_._1).sum / commits
      val p50Ms = samples.map(_._1).sorted.apply(commits / 2)
      val maxMs = samples.map(_._1).max
      val bytes = samples.map(_._2).sum
      ops.Layout.invalidateManifestCache(spark, table)
      val r0 = System.nanoTime()
      val head = ops.Layout.currentVersion(fs, root)
      val nLines = ops.Layout.versionFilePaths(fs, root, head).size
      val coldMs = (System.nanoTime() - r0) / 1e6
      require(nLines == n + 3 + commits,
        s"probe self-check: head lists $nLines lines, " +
          s"expected ${n + 3 + commits}")
      f""""$n":{"commit_ms":$commitMs%.2f,"commit_ms_p50":$p50Ms%.2f,""" +
        f""""commit_ms_max":$maxMs%.2f,""" +
        f""""commit_bytes":${bytes / commits},"cold_read_ms":$coldMs%.2f}"""
    }
    println(s"""{"probe":"manifest_scale","commits":$commits,""" +
      s""""sizes":{${results.mkString(",")}}}""")
    spark.stop()
  }
}
