package graft

import org.apache.spark.sql.functions._

/** Dev utility (not part of the driver contract): measures the cost of
  * a SQL SELECT over a merge-on-read snapshot with ONE dv'd file vs the
  * same table with none — the r17 verdict's acceptance probe for the
  * per-file deletion-vector dispatch ([[graft.sql.MorPerFileDispatch]]).
  * Before the dispatch, any live dv forced the WHOLE version onto the
  * row-based scan; after it, only the dv'd file pays.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.DvProbe [nFiles rowsPerFile]"
  *
  * Prints one line per phase: full-scan aggregate wall seconds over
  * (a) the clean table, (b) the 1-dv-file table, (c) the same with the
  * dispatch disabled-equivalent comparison (all files dv'd).
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.lift(0).map(_.toInt).getOrElse(64)
    val rows = args.lift(1).map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = "target/graft_io/dvprobe_wh"
    val cat = graft.sql.GraftSql.catalogFor(spark, wh)
    val t = s"$cat.default.dvprobe"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v DOUBLE, s STRING)
                 |TBLPROPERTIES ('graft.rowlevel.mode' = 'mor')"""
      .stripMargin)
    spark.range(nFiles * rows)
      // range-clustered so `k < 50` lands in exactly one file
      .repartitionByRange(nFiles, col("id"))
      .sortWithinPartitions("id")
      .select(col("id").as("k"), (col("id") * 1.5).as("v"),
        concat(lit("payload-"), col("id")).as("s"))
      .createOrReplaceTempView("dvprobe_src")
    spark.sql(s"INSERT INTO $t SELECT * FROM dvprobe_src")

    def timed(label: String): Double = {
      // warm once, then min of three
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.sql(s"SELECT COUNT(*) AS n, SUM(v) AS sv, " +
          s"MAX(length(s)) AS ml FROM $t WHERE k % 7 != 3").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val best = Seq(once(), once(), once()).min
      println(f"DVPROBE $label%-12s $best%.3f s")
      best
    }

    val clean = timed("no-dv")
    // one dv'd file: delete a handful of rows from the first file only
    spark.sql(s"DELETE FROM $t WHERE k < 50")
    val oneDv = timed("one-dv-file")
    // worst case: a dv on EVERY file (delete one row per file's range)
    spark.sql(s"DELETE FROM $t WHERE k % $rows = 99")
    val allDv = timed("all-dv")
    println(f"DVPROBE ratio one-dv/clean = ${oneDv / clean}%.3f, " +
      f"all-dv/clean = ${allDv / clean}%.3f " +
      s"($nFiles files x $rows rows)")
    spark.stop()
  }
}
